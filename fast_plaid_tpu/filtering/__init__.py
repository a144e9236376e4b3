"""SQLite metadata filtering (API parity with fast_plaid.filtering)."""

from fast_plaid_tpu.filtering.filtering import create, delete, get, update, where

__all__ = ["create", "update", "delete", "get", "where"]
