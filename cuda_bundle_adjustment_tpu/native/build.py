"""Build the native helpers: ``python -m cuda_bundle_adjustment_tpu.native.build``."""

from __future__ import annotations

import os
import subprocess
import sys


def build() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    srcs = [
        os.path.join(here, "symbolic.cpp"),
        os.path.join(here, "layout.cpp"),
    ]
    out = os.path.join(here, "libtba_symbolic.so")
    # compile to a temp name then rename: the rename is atomic, so a
    # concurrent process either sees the old library or the complete new one
    tmp = out + f".tmp{os.getpid()}"
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        *srcs,
        "-o",
        tmp,
    ]
    try:
        subprocess.run(cmd, check=True)
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return out


def ensure_built() -> str | None:
    """Build the native helpers on demand (first ctypes load in a tree where
    the .so is absent or older than its sources).  Returns the library path,
    or None when building is unavailable/disabled — callers fall back to the
    numpy implementations.  ``TBA_NO_NATIVE_BUILD=1`` disables (tests use it
    to pin the fallback path)."""
    if os.environ.get("TBA_NO_NATIVE_BUILD"):
        return None
    here = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(here, "libtba_symbolic.so")
    srcs = [
        os.path.join(here, "symbolic.cpp"),
        os.path.join(here, "layout.cpp"),
    ]
    try:
        if os.path.exists(out) and os.path.getmtime(out) >= max(
            os.path.getmtime(s) for s in srcs
        ):
            return out
        return build()
    except Exception:
        return out if os.path.exists(out) else None


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
