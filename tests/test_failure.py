"""Numerical-failure handling: a failed factorization must reject the trial.

The reference treats a Cholesky zero pivot as solve() == false, which the LM
loop turns into rho = -1 (trial rejected, lambda re-damped)
(/root/reference/src/cholesky.hpp:59-92, cuda_linear_solver.cpp:48-52,
cuda_graph_optimisation.cpp:89).  Our solvers return success=False the same
way; these tests pin that path.
"""

import jax.numpy as jnp
import numpy as np

from cuda_bundle_adjustment_tpu.solver.block_solver import (
    _solve_reduced_blocks,
    solve_pose_only,
)
from cuda_bundle_adjustment_tpu.types import SystemBlocks


def test_singular_reduced_system_reports_failure():
    Pa = 3
    # blocks: all-zero diagonal blocks -> singular scaled system
    nnz = Pa
    blocks = jnp.zeros((nnz, 36), jnp.float64)
    brow = jnp.arange(Pa, dtype=jnp.int32)
    bcol = jnp.arange(Pa, dtype=jnp.int32)
    diag_pos = jnp.arange(Pa, dtype=jnp.int32)
    bsc = jnp.ones((Pa, 6), jnp.float64)
    xp, ok = _solve_reduced_blocks(blocks, brow, bcol, diag_pos, bsc, Pa, False)
    assert not bool(ok)


def test_singular_pose_only_reports_failure():
    Pa = 2
    sys = SystemBlocks(
        Hpp=jnp.zeros((Pa, 6, 6), jnp.float64),
        bp=jnp.ones((Pa, 6), jnp.float64),
        Hll=None,
        bl=None,
        Hpl=None,
    )
    xp, ok = solve_pose_only(sys, jnp.asarray(0.0))
    assert not bool(ok)


def test_lm_redamps_after_failure():
    """A graph whose first solve fails (rank-deficient at lambda=0 regime)
    still converges: the loop re-damps instead of crashing."""
    import cuda_bundle_adjustment_tpu as tba

    rng = np.random.default_rng(0)
    poses = tba.PoseVertexSet()
    v = tba.PoseVertex(0, tba.Se3(np.array([0.0, 0, 0, 1]), [0.3, 0, 0]))
    poses.add_vertex(v)
    planes = tba.PlaneEdgeSet()
    planes.set_information(1.0)
    # all normals identical: only 1 of 6 DoF constrained -> singular Hpp
    n = np.array([1.0, 0.0, 0.0])
    for _ in range(10):
        X = rng.uniform(-1, 1, 3)
        e = tba.PlaneEdge()
        e.set_measurement(tba.PointToPlaneMatch(n, float(n @ X), X))
        e.set_information(1.0)
        e.set_vertex(v, 0)
        planes.add_edge(e)
    opt = tba.TpuGraphOptimisation.create()
    opt.add_vertex_set(poses)
    opt.add_edge_set(planes)
    opt.initialize()
    opt.optimize(10)  # must not raise
    trace = [s.chi2 for s in opt.batch_statistics().get()]
    assert np.isfinite(trace[-1])
    assert trace[-1] <= trace[0] + 1e-12
