"""Measurement models (edge types) and their packed stage functions."""

from .ba import (
    DepthEdge,
    DepthEdgeSet,
    DepthModel,
    MonoEdge,
    MonoEdgeSet,
    MonoModel,
    StereoEdge,
    StereoEdgeSet,
    StereoModel,
)
from .icp import LineEdge, LineEdgeSet, LineModel, PlaneEdge, PlaneEdgeSet, PlaneModel
from .measurements import PointToLineMatch, PointToPlaneMatch

MODEL_REGISTRY = {
    "mono": MonoModel,
    "stereo": StereoModel,
    "depth": DepthModel,
    "line": LineModel,
    "plane": PlaneModel,
}

__all__ = [
    "MODEL_REGISTRY",
    "MonoEdge",
    "MonoEdgeSet",
    "MonoModel",
    "StereoEdge",
    "StereoEdgeSet",
    "StereoModel",
    "DepthEdge",
    "DepthEdgeSet",
    "DepthModel",
    "LineEdge",
    "LineEdgeSet",
    "LineModel",
    "PlaneEdge",
    "PlaneEdgeSet",
    "PlaneModel",
    "PointToLineMatch",
    "PointToPlaneMatch",
]
