"""Honest device synchronization for remote-attached device services.

``jax.block_until_ready`` can return before execution completes through a
remote device service (measured: block 0.000 s vs 91 s value pull on a
fresh executable), so timed regions synchronize by PULLING a value from
the computation's output instead. The naive idiom ``x.ravel()[0]``
dispatches an eager reshape whose output is a full device-side COPY of
``x`` — at a 6 GB cache that copy both doubles transient HBM (measured
RESOURCE_EXHAUSTED at 2M docs) and adds real copy time to whatever is
being timed. ``value_pull`` fetches one element through a tiny slice
program: true completion at ~one RTT, zero big allocations.
"""

from __future__ import annotations

import jax

__all__ = ["value_pull"]


def value_pull(*arrays) -> None:
    """Force true completion of every array by fetching one element each.

    Accepts arrays or pytrees; non-array leaves are ignored. The [0,...,0]
    index compiles one trivial gather per distinct shape (cached) whose
    execution cannot start before the producer finished.
    """
    for w in jax.tree_util.tree_leaves(arrays):
        if hasattr(w, "ndim"):
            jax.device_get(w[(0,) * w.ndim])
