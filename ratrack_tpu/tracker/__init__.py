"""On-device clustering, optimal transport, and track association."""

from .dbscan import dbscan
from .sinkhorn import log_optimal_transport_masked
from .state import TrackState, init_state, DESC_DIM
from .association import (cluster_descriptors, greedy_gt_match, associate,
                          AssocResult)

__all__ = [
    "dbscan", "log_optimal_transport_masked", "TrackState", "init_state",
    "DESC_DIM", "cluster_descriptors", "greedy_gt_match", "associate",
    "AssocResult",
]
