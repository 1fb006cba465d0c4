"""Run the full BASELINE benchmark config matrix on the real TPU.

Writes one JSON line per config to stdout and the collected results to
``BENCH_MATRIX.json`` at the repo root.  The distributed city-scale config
is exercised separately (samples/sample_distributed_schur.py --city).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_matrix.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import BASELINES, run_config  # noqa: E402


def main() -> None:
    results = {}
    for config in BASELINES:
        res = run_config(config)
        results[config] = res
        print(json.dumps(res), flush=True)
    out = os.path.join(os.path.dirname(__file__), "..", "BENCH_MATRIX.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
