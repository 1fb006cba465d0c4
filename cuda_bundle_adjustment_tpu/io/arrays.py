"""Build optimisers directly from raw problem arrays (no per-edge objects)."""

from __future__ import annotations

from typing import Optional, Union

from ..graph import GraphOptimisationOptions
from ..optimizer import TpuGraphOptimisation
from .synthetic import BAProblem, MixedBAProblem


def optimizer_from_problem(
    problem: Union[BAProblem, MixedBAProblem],
    options: Optional[GraphOptimisationOptions] = None,
    rk: int = 0,
    delta: float = 1.0,
    outlier_threshold: float = 0.0,
) -> TpuGraphOptimisation:
    """Create an optimiser packed from a :class:`BAProblem` (single edge set)
    or :class:`MixedBAProblem` (several edge sets over shared vertices —
    mono+stereo pairs merge onto the group-layout fast path).

    ``initialize()`` must NOT be called on the result (the arrays are already
    packed); call ``optimize(n)`` directly.  Results stay in
    ``opt.solver.graph`` (``q``/``t``/``Xw`` device arrays).
    """
    opt = TpuGraphOptimisation(options)
    if isinstance(problem, MixedBAProblem):
        specs = [
            dict(s, rk=rk, delta=delta, outlier_threshold=outlier_threshold)
            for s in problem.specs
        ]
    else:
        specs = [
            dict(
                kind=problem.kind,
                meas=problem.meas,
                pose_idx=problem.pose_idx,
                lm_idx=problem.lm_idx,
                omega=problem.omega,
                cam=problem.cam,
                rk=rk,
                delta=delta,
                outlier_threshold=outlier_threshold,
            )
        ]
    opt.solver.initialize_from_arrays(
        pose_q=problem.pose_q,
        pose_t=problem.pose_t,
        num_active_poses=problem.num_active_poses,
        landmarks=problem.landmarks,
        num_active_landmarks=problem.num_active_landmarks,
        edge_specs=specs,
    )
    return opt
