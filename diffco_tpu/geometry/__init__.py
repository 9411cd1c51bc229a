from .geometry2d import (
    Obstacles2D, planar_robot_signed_dist, planar_robot_collision,
    point_segment_dist, segment_segment_dist, point_rect_sd,
    segment_circle_signed_dist, segment_rect_signed_dist,
    rect_rect_signed_dist, rigid_body_signed_dist,
)
from .geometry3d import (
    SceneArrays, scene_from_dict, spheres_vs_scene_signed_dist,
    sphere_set_self_distance, sphere_sdf, box_sdf, cylinder_sdf,
    capsule_sdf,
)
from .mesh import (
    load_mesh, load_stl, load_obj, spheres_from_mesh,
    spheres_from_primitive, surface_points,
)
