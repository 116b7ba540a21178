from . import oriented_plane
from .association import (
    PlaneLandmarkBook,
    match_plane,
    plane_to_world,
    transform_plane_cov,
)
from .extraction import PlaneDetection, extract_planes, fit_plane_lsq
from .plane_node import (
    PlaneNodeDetection,
    extract_plane_node,
    extract_plane_nodes_batch,
    predict_plane_node,
    predict_plane_node_finish,
    predict_plane_node_start,
)
from .propagation import PropagationResult, propagate_plane, propagate_planes
from .psd import inflate_if_uncertain, repair_plane_cov

__all__ = [
    "oriented_plane",
    "PlaneLandmarkBook", "match_plane", "plane_to_world",
    "transform_plane_cov",
    "PlaneDetection", "extract_planes", "fit_plane_lsq",
    "PlaneNodeDetection", "extract_plane_node",
    "extract_plane_nodes_batch", "predict_plane_node",
    "predict_plane_node_start", "predict_plane_node_finish",
    "PropagationResult", "propagate_plane", "propagate_planes",
    "repair_plane_cov", "inflate_if_uncertain",
]
