"""Build optimisers directly from raw problem arrays (no per-edge objects)."""

from __future__ import annotations

from typing import Optional

from ..graph import GraphOptimisationOptions
from ..optimizer import TpuGraphOptimisation
from .synthetic import BAProblem


def optimizer_from_problem(
    problem: BAProblem,
    options: Optional[GraphOptimisationOptions] = None,
    rk: int = 0,
    delta: float = 1.0,
) -> TpuGraphOptimisation:
    """Create an optimiser packed from a :class:`BAProblem`.

    ``initialize()`` must NOT be called on the result (the arrays are already
    packed); call ``optimize(n)`` directly.  Results stay in
    ``opt.solver.graph`` (``q``/``t``/``Xw`` device arrays).
    """
    opt = TpuGraphOptimisation(options)
    opt.solver.initialize_from_arrays(
        pose_q=problem.pose_q,
        pose_t=problem.pose_t,
        num_active_poses=problem.num_active_poses,
        landmarks=problem.landmarks,
        num_active_landmarks=problem.num_active_landmarks,
        edge_specs=[
            dict(
                kind=problem.kind,
                meas=problem.meas,
                pose_idx=problem.pose_idx,
                lm_idx=problem.lm_idx,
                omega=problem.omega,
                cam=problem.cam,
                rk=rk,
                delta=delta,
            )
        ],
    )
    return opt
