"""Masked fixed-shape point-cloud ops (TPU replacement for pointnet2_cuda)."""

from .neighborhood import (square_distance, knn, knn_chunked,
                           knn_auto, ball_query, ball_query_chunked,
                           ball_query_auto, three_nn, top_k_exact)
from .sampling import (furthest_point_sample, identity_sample,
                       identity_gather, gather, group)
from .grouping import (query_and_group, three_interpolate,
                       three_interpolate_weights, interpolate_features)

__all__ = [
    "square_distance", "knn", "knn_chunked", "knn_auto",
    "ball_query", "ball_query_chunked", "ball_query_auto", "three_nn",
    "top_k_exact",
    "furthest_point_sample", "identity_sample", "identity_gather",
    "gather", "group",
    "query_and_group", "three_interpolate", "three_interpolate_weights",
    "interpolate_features",
]
