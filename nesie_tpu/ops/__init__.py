from .pointops import (
    set_ball_query_impl,
    square_distance,
    furthest_point_sample,
    furthest_point_sample_with_features,
    points_sampler,
    set_fps_impl,
    set_three_nn_impl,
    ball_query,
    gather_points,
    group_points,
    three_nn,
    three_interpolate,
    knn,
)
from .roiaware_pool import roiaware_pool3d

__all__ = [
    "square_distance",
    "furthest_point_sample",
    "furthest_point_sample_with_features",
    "points_sampler",
    "set_fps_impl",
    "set_ball_query_impl",
    "set_three_nn_impl",
    "ball_query",
    "gather_points",
    "group_points",
    "three_nn",
    "three_interpolate",
    "knn",
    "roiaware_pool3d",
]
