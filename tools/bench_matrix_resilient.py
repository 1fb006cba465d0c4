"""bench_matrix with tunnel-flap resilience: each config runs in its OWN
subprocess, preceded by a probe-health wait, with one retry — a mid-run
tunnel outage (observed several times on 2026-08-21) loses at most one
config attempt instead of wedging the whole sweep.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_matrix_resilient.py
Writes BENCH_MATRIX.json (same schema as tools/bench_matrix.py) and prints
one JSON line per config with the bracketing probe readings.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = [
    "kitti00_mono", "kitti00_stereo", "kitti00_mixed",
    "kitti00_huber_f32", "kitti07_mono",
]


def probe_ok(timeout=180):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tunnel_probe.py")],
        capture_output=True, text=True, timeout=timeout + 30, cwd=REPO,
    )
    line = (r.stdout.strip().splitlines() or [""])[-1]
    try:
        return json.loads(line)
    except json.JSONDecodeError:
        return None


def wait_healthy(max_attempts=20):
    for a in range(max_attempts):
        try:
            p = probe_ok()
        except subprocess.TimeoutExpired:
            p = None
        if p is not None:
            return p
        print(f"probe attempt {a + 1} failed (tunnel flap); waiting 120 s",
              flush=True)
        time.sleep(120)
    raise SystemExit("tunnel never became healthy")


def run_one(config):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), config],
        capture_output=True, text=True, timeout=1500, cwd=REPO,
    )
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-2000:])
        raise RuntimeError(f"bench {config} rc={r.returncode}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    results = {}
    for config in CONFIGS:
        for attempt in (1, 2, 3):
            pre = wait_healthy()
            try:
                res = run_one(config)
            except (RuntimeError, subprocess.TimeoutExpired, json.JSONDecodeError) as e:
                print(f"{config} attempt {attempt} failed: {e}", flush=True)
                continue
            res["probe_pre"] = pre
            try:
                res["probe_post"] = probe_ok()
            except subprocess.TimeoutExpired:
                res["probe_post"] = None  # post-run flap; pre reading stands
            results[config] = res
            print(json.dumps(res), flush=True)
            break
        else:
            raise SystemExit(f"{config}: all attempts failed")
    out = os.path.join(REPO, "BENCH_MATRIX.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
