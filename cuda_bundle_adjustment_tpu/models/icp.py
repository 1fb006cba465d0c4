"""Pose-only ICP measurement models: point-to-line and point-to-plane edges.

Component-form SoA compute like models/ba.py.  Functional parity targets in
the reference: ``LineEdgeSet``/``PlaneEdgeSet``
(/root/reference/include/icp_types.h:19-107) and their kernels
(cuda_block_solver.cu:2380-2536).  Two reference quirks are intentionally
reproduced because they are observable behaviour:

* the line chi accumulates the *raw* residual, not ``omega * e^2``
  (cuda_block_solver.cu:2409);
* neither quadratic form applies the robust-kernel derivative, only omega
  (cuda_block_solver.cu:2489-2491, 2531-2534).

One quirk is NOT reproduced: the reference's ICP Jacobians interleave
rotation/translation columns inconsistently with its own pose update, and the
line Jacobian multiplies uninitialised memory (cuda_block_solver.cu:2284-2290).
We use the mathematically correct Jacobians in the standard ``[omega,
upsilon]`` ordering (validated against finite differences in
``tests/test_jacobians.py``).

Measurement payload layout (component-first ``[K, E]``):

* line:  ``[ax ay az bx by bz length px py pz]`` (10 rows)
* plane: ``[nx ny nz d px py pz]`` (7 rows)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..graph import BaseEdge, EdgeSet
from ..ops import components as C
from ..types import GraphArrays, PackedEdges


def _pose_comps(graph: GraphArrays, data: PackedEdges):
    qT = graph.q.T
    tT = graph.t.T
    pi = data.pose_idx
    q = tuple(qT[i][pi] for i in range(4))
    t = tuple(tT[i][pi] for i in range(3))
    return C.rotmat_comps(*q), t


def _cross(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


class LineModel:
    MDIM = 1
    HAS_LANDMARK = False

    @staticmethod
    def _residual_and_grad(graph, data):
        m = data.meas
        a = (m[0], m[1], m[2])
        b = (m[3], m[4], m[5])
        length = m[6]
        p = (m[7], m[8], m[9])
        R, t = _pose_comps(graph, data)
        Pw = C.project_w2c_comps(R, t[0], t[1], t[2], p[0], p[1], p[2])
        ux, uy, uz = (Pw[0] - a[0], Pw[1] - a[1], Pw[2] - a[2])
        vx, vy, vz = (Pw[0] - b[0], Pw[1] - b[1], Pw[2] - b[2])
        cx, cy, cz = _cross(ux, uy, uz, vx, vy, vz)
        cn = jnp.sqrt(cx * cx + cy * cy + cz * cz)
        e = cn / length
        # de/dPw = ((a - b) x c/|c|) / L
        inv_cn = 1.0 / jnp.maximum(cn, 1e-12)
        abx, aby, abz = a[0] - b[0], a[1] - b[1], a[2] - b[2]
        gx, gy, gz = _cross(abx, aby, abz, cx * inv_cn, cy * inv_cn, cz * inv_cn)
        g = (gx / length, gy / length, gz / length)
        return e, Pw, g

    @staticmethod
    def chi(graph, data, rk, delta):
        e, _, _ = LineModel._residual_and_grad(graph, data)
        # reference quirk: chi accumulates the raw distance
        return e * data.active

    @staticmethod
    def terms(graph, data, rk, delta):
        e, Pw, g = LineModel._residual_and_grad(graph, data)
        # J = de/dxi = [Pw x g, g]; negate for the g2o convention
        jwx, jwy, jwz = _cross(Pw[0], Pw[1], Pw[2], g[0], g[1], g[2])
        jp = tuple(-c for c in (jwx, jwy, jwz, g[0], g[1], g[2]))
        w = data.omega * data.active
        pose_stack, _, _ = C.weighted_block_stacks((jp,), None, (e,), w)
        return pose_stack, None, None

    @staticmethod
    def terms_chi(graph, data, rk, delta):
        out = LineModel.terms(graph, data, rk, delta)
        return (*out, LineModel.chi(graph, data, rk, delta))


class PlaneModel:
    MDIM = 1
    HAS_LANDMARK = False

    @staticmethod
    def _residual_and_grad(graph, data):
        m = data.meas
        n = (m[0], m[1], m[2])
        d = m[3]
        p = (m[4], m[5], m[6])
        R, t = _pose_comps(graph, data)
        Pw = C.project_w2c_comps(R, t[0], t[1], t[2], p[0], p[1], p[2])
        e = n[0] * Pw[0] + n[1] * Pw[1] + n[2] * Pw[2] - d
        return e, Pw, n

    @staticmethod
    def chi(graph, data, rk, delta):
        e, _, _ = PlaneModel._residual_and_grad(graph, data)
        return data.omega * e * e * data.active

    @staticmethod
    def terms(graph, data, rk, delta):
        e, Pw, n = PlaneModel._residual_and_grad(graph, data)
        # J = [Pw x n, n]; negate for the g2o convention
        jwx, jwy, jwz = _cross(Pw[0], Pw[1], Pw[2], n[0], n[1], n[2])
        jp = tuple(-c for c in (jwx, jwy, jwz, n[0], n[1], n[2]))
        w = data.omega * data.active
        pose_stack, _, _ = C.weighted_block_stacks((jp,), None, (e,), w)
        return pose_stack, None, None

    @staticmethod
    def terms_chi(graph, data, rk, delta):
        out = PlaneModel.terms(graph, data, rk, delta)
        return (*out, PlaneModel.chi(graph, data, rk, delta))


class LineEdge(BaseEdge):
    """Point-to-line ICP edge; measurement is a :class:`PointToLineMatch`."""

    NVERTS = 1


class PlaneEdge(BaseEdge):
    """Point-to-plane ICP edge; measurement is a :class:`PointToPlaneMatch`."""

    NVERTS = 1


class LineEdgeSet(EdgeSet):
    KIND = "line"
    MDIM = 1
    NVERTS = 1


class PlaneEdgeSet(EdgeSet):
    KIND = "plane"
    MDIM = 1
    NVERTS = 1
