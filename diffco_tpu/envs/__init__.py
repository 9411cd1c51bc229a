from .shape_env import ShapeEnv
from .collision_env import CollisionEnv
from .moveit_scene import load_moveit_scene, parse_scene_text
