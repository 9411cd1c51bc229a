from .geometry2d import (
    Obstacles2D, planar_robot_signed_dist, planar_robot_collision,
    point_segment_dist, segment_segment_dist, point_rect_sd,
    segment_circle_signed_dist, segment_rect_signed_dist,
)
