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
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        *srcs,
        "-o",
        out,
    ]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
