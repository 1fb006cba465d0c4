"""Pose-only ICP measurement models: point-to-line and point-to-plane edges.

Functional parity targets in the reference: ``LineEdgeSet``/``PlaneEdgeSet``
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
"""

from __future__ import annotations

import jax.numpy as jnp

from ..graph import BaseEdge, EdgeSet
from ..ops import jacobians as J
from ..ops import projection as proj
from ..types import GraphArrays, PackedEdges


def _line_parts(meas: jnp.ndarray):
    return meas[..., 0:3], meas[..., 3:6], meas[..., 6], meas[..., 7:10]


def _plane_parts(meas: jnp.ndarray):
    return meas[..., 0:3], meas[..., 3], meas[..., 4:7]


class LineModel:
    MDIM = 1
    HAS_LANDMARK = False

    @staticmethod
    def chi(graph: GraphArrays, data: PackedEdges, rk, delta):
        a, b, length, point = _line_parts(data.meas)
        q = graph.q[data.pose_idx]
        t = graph.t[data.pose_idx]
        e, _ = proj.residual_point_to_line(q, t, point, a, b, length)
        # reference quirk: chi accumulates the raw distance
        return e * data.active

    @staticmethod
    def terms(graph: GraphArrays, data: PackedEdges, rk, delta):
        a, b, length, point = _line_parts(data.meas)
        q = graph.q[data.pose_idx]
        t = graph.t[data.pose_idx]
        e, _ = proj.residual_point_to_line(q, t, point, a, b, length)
        JP = -J.jacobians_point_to_line(q, t, point, a, b, length)  # g2o convention
        w = data.omega * data.active
        return JP, None, e[..., None], w


class PlaneModel:
    MDIM = 1
    HAS_LANDMARK = False

    @staticmethod
    def chi(graph: GraphArrays, data: PackedEdges, rk, delta):
        normal, d, point = _plane_parts(data.meas)
        q = graph.q[data.pose_idx]
        t = graph.t[data.pose_idx]
        e, _ = proj.residual_point_to_plane(q, t, point, normal, d)
        return data.omega * e * e * data.active

    @staticmethod
    def terms(graph: GraphArrays, data: PackedEdges, rk, delta):
        normal, d, point = _plane_parts(data.meas)
        q = graph.q[data.pose_idx]
        t = graph.t[data.pose_idx]
        e, _ = proj.residual_point_to_plane(q, t, point, normal, d)
        JP = -J.jacobians_point_to_plane(q, t, point, normal)  # g2o convention
        w = data.omega * data.active
        return JP, None, e[..., None], w


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
