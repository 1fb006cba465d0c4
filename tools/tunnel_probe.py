"""Axon-tunnel health probe: dispatch round-trip latency + upload bandwidth.

The tunnel's fixed dispatch latency (27-56+ ms) and upload bandwidth
(20-80 MB/s) drift by the HOUR, and degraded periods swing end-to-end
benchmark numbers by 2-4x with no code change (measured 2026-08-20: the
same commit timed 1.04 s and 3.5+ s two hours apart).  Run this BEFORE and
AFTER every timed measurement and record both; a timing without a probe
attached is not evidence.

Healthy reference points: dispatch ~27-30 ms, upload ~40-80 MB/s.
"""

from __future__ import annotations

import json
import time


def probe() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    f = jax.jit(lambda a: a + 1.0)
    x = jnp.ones((8,))
    f(x)
    float(f(x)[0])  # force the axon pipeline before timing
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x)[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    a = np.ones((10_000_000,), np.float32)  # 40 MB
    t0 = time.perf_counter()
    y = jax.device_put(a)
    y.block_until_ready()
    float(y[0])
    dt = time.perf_counter() - t0
    return {
        "dispatch_ms_median": round(ts[2] * 1e3, 1),
        "dispatch_ms_all": [round(t * 1e3, 1) for t in ts],
        "upload_MBps": round(40.0 / dt, 1),
        "platform": jax.devices()[0].platform,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }


def healthy(p: dict) -> bool:
    # "healthy enough to record": mid-range conditions.  Best observed is
    # ~27 ms / 80 MB/s; degraded periods run 45-60 ms / 17-23 MB/s.
    return p["dispatch_ms_median"] <= 40.0 and p["upload_MBps"] >= 30.0


if __name__ == "__main__":
    p = probe()
    print(json.dumps(p))
    raise SystemExit(0 if healthy(p) else 1)
