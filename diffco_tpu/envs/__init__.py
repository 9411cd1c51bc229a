from .shape_env import ShapeEnv
from .collision_env import CollisionEnv
