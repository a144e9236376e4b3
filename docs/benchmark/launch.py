"""Sweep BEIR datasets through the benchmark harness (parity with the
reference's docs/benchmark/launch.py).

    python docs/benchmark/launch.py --datasets scifact nfcorpus fiqa
"""

from __future__ import annotations

import argparse
import subprocess
import sys

DEFAULT_DATASETS = [
    "scifact",
    "nfcorpus",
    "arguana",
    "fiqa",
    "scidocs",
    "quora",
    "trec-covid",
    "webis-touche2020",
]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--datasets", nargs="+", default=DEFAULT_DATASETS)
    parser.add_argument(
        "--model", default="answerdotai/answerai-colbert-small-v1"
    )
    parser.add_argument("--output", default="results")
    args = parser.parse_args()

    for dataset in args.datasets:
        print(f"=== {dataset} ===", flush=True)
        code = subprocess.call(
            [
                sys.executable,
                "docs/benchmark/benchmark.py",
                "--dataset",
                dataset,
                "--model",
                args.model,
                "--output",
                args.output,
            ]
        )
        if code != 0:
            print(f"{dataset} failed with exit code {code}", file=sys.stderr)


if __name__ == "__main__":
    main()
