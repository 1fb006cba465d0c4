"""Hardware-gated kernel-exactness tests (run: TBA_TPU_TESTS=1 pytest -m tpu).

The double-float Schur kernel's exactness claim is only checkable on real
hardware — interpret mode re-simplifies the two-sum compensation
(tests/test_groups.py relaxes to f32 tolerance there).  This wraps
``tools/tpu_parity.py`` as a pytest so hardware runs gate regressions in
``_opaque``/two-sum ordering instead of relying on a manually-refreshed
artifact (VERDICT r2, weak #4).

The tool runs in a SUBPROCESS: the test suite's conftest pins this process to
the CPU backend, and backend selection is per-process.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.tpu


def test_tpu_kernel_parity_tool():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the axon plugin pick the TPU
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tpu_parity.py")],
        cwd=REPO, capture_output=True, text=True, timeout=3600, env=env,
    )
    sys.stdout.write(r.stdout)
    sys.stderr.write(r.stderr[-2000:])
    assert r.returncode == 0, "tpu_parity tool failed (see output above)"
    assert "KERNEL PARITY: OK" in r.stdout
    assert "PARITY: OK" in r.stdout  # end-to-end chi2-trace sample
