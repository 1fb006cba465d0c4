"""Bundle-adjustment measurement models: mono, stereo and depth edges.

Each model provides two pure, batched stage functions used by the block
solver under jit:

* ``chi(graph, data, rk, delta)``   -> per-edge robustified chi2 ``[E]``
* ``terms(graph, data, rk, delta)`` -> ``(JP [E,M,6], JL [E,M,3], e [E,M], w [E])``

where ``w = omega * rho'(omega ||e||^2) * active`` and the Jacobians follow the
g2o convention ``J = -d(proj)/d(state)`` so that ``b = sum w J^T e`` is the
negative gradient (see :mod:`..ops.jacobians`).

Functional parity with the reference kernels:

* mono/stereo error+chi:  cuda_block_solver.cu:1059-1110 (``e = proj - meas``,
  ``chi = rho(omega ||e||^2)``)
* mono/stereo quadratic form: cuda_block_solver.cu:1151-1220
* depth error: cuda_block_solver.cu:2302-2374 (``e = meas - proj_depth``);
  the reference reuses the *stereo* Jacobian kernel for depth edges
  (ba_types.h:204-233 calls ``constructQuadraticForm_<3>``), and we reproduce
  that behaviour.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..graph import BaseEdge, EdgeSet
from ..ops import jacobians as J
from ..ops import projection as proj
from ..ops.robust import robust_derivative, robustify
from ..types import GraphArrays, PackedEdges


def _gather(graph: GraphArrays, data: PackedEdges):
    q = graph.q[data.pose_idx]
    t = graph.t[data.pose_idx]
    Xw = graph.Xw[data.lm_idx]
    return q, t, Xw


def _chi_projective(residual_fn, graph, data, rk, delta):
    q, t, Xw = _gather(graph, data)
    e, _ = residual_fn(q, t, Xw, data.meas, data.cam)
    # select (not multiply) so inert padding edges with degenerate geometry
    # (z = 0 => inf residuals) cannot poison the reduction with NaNs
    mask = data.active > 0
    e = jnp.where(mask[..., None], e, 0.0)
    x = data.omega * jnp.sum(e * e, axis=-1)
    return robustify(rk, delta, x) * data.active


def _terms_projective(residual_fn, jac_fn, graph, data, rk, delta):
    q, t, Xw = _gather(graph, data)
    e, Xc = residual_fn(q, t, Xw, data.meas, data.cam)
    mask = data.active > 0
    e = jnp.where(mask[..., None], e, 0.0)
    x = data.omega * jnp.sum(e * e, axis=-1)
    w = data.omega * robust_derivative(rk, delta, x) * data.active
    JP, JL = jac_fn(Xc, q, data.cam)
    JP = jnp.where(mask[..., None, None], JP, 0.0)
    JL = jnp.where(mask[..., None, None], JL, 0.0)
    return JP, JL, e, w


class MonoModel:
    MDIM = 2
    HAS_LANDMARK = True

    @staticmethod
    def chi(graph, data, rk, delta):
        return _chi_projective(proj.residual_mono, graph, data, rk, delta)

    @staticmethod
    def terms(graph, data, rk, delta):
        return _terms_projective(proj.residual_mono, J.jacobians_mono, graph, data, rk, delta)


class StereoModel:
    MDIM = 3
    HAS_LANDMARK = True

    @staticmethod
    def chi(graph, data, rk, delta):
        return _chi_projective(proj.residual_stereo, graph, data, rk, delta)

    @staticmethod
    def terms(graph, data, rk, delta):
        return _terms_projective(
            proj.residual_stereo, J.jacobians_stereo, graph, data, rk, delta
        )


class DepthModel:
    """Inverse-depth BA edge; reuses the stereo Jacobian like the reference."""

    MDIM = 3
    HAS_LANDMARK = True

    @staticmethod
    def chi(graph, data, rk, delta):
        return _chi_projective(proj.residual_depth, graph, data, rk, delta)

    @staticmethod
    def terms(graph, data, rk, delta):
        return _terms_projective(
            proj.residual_depth, J.jacobians_stereo, graph, data, rk, delta
        )


# ---------------------------------------------------------------------------
# user-facing edge / edge-set classes
# ---------------------------------------------------------------------------


class MonoEdge(BaseEdge):
    """Monocular projection edge (pose, landmark) with a 2D pixel measurement."""

    NVERTS = 2


class StereoEdge(BaseEdge):
    """Stereo projection edge with a ``[u_l, v, u_r]`` measurement."""

    NVERTS = 2


class DepthEdge(BaseEdge):
    """Depth edge with a ``[u, v, 1/z]`` measurement."""

    NVERTS = 2


class MonoEdgeSet(EdgeSet):
    KIND = "mono"
    MDIM = 2
    NVERTS = 2


class StereoEdgeSet(EdgeSet):
    KIND = "stereo"
    MDIM = 3
    NVERTS = 2


class DepthEdgeSet(EdgeSet):
    KIND = "depth"
    MDIM = 3
    NVERTS = 2
