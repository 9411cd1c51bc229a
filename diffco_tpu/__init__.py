"""diffco_tpu — TPU-native differentiable proxy collision detection.

A from-scratch JAX/XLA/Pallas re-design of the DiffCo framework
(differentiable kernel-perceptron collision proxies for robot motion
planning). The compute path is pure jit-compiled functions over fixed-shape
arrays: batched forward kinematics, fused kernel score evaluation,
on-device perceptron training, and scanned trajectory optimization.

Top-level exports mirror the reference package layout
(/root/reference/diffco/__init__.py:1-4) so downstream code ports
mechanically.
"""

from . import utils
from . import kernels
# alias matching the reference's module name (``from diffco import kernel``)
kernel = kernels

from . import optim
from . import routines

from .robots import (
    Model, RevolutePlanarRobot, RigidPlanarBody, RigidBody, DHParameters,
    DHChainRobot, BaxterLeftArmFK, BaxterRightArmFK, BaxterFK,
    BaxterDualArmFK, PandaFK, DualPandaFK, PointRobot1D, ChainSpec,
)
from .robots import analytic as model  # reference calls this module `model`
from .robots.urdf import (
    URDFRobot, MultiURDFRobot, KUKAiiwa, FrankaPanda, TwoLinkRobot,
    TrifingerEdu, robot_description_folder,
)
from .perceptron import (Perceptron, DiffCo, DiffCoBeta, MultiDiffCo,
                         MultiDimDiffCo)
from .checkers import (
    CollisionChecker, RBFDiffCo, ForwardKinematicsDiffCo,
    HybridForwardKinematicsDiffCo, OptimisticChecker,
)
from .envs import ShapeEnv, CollisionEnv, load_moveit_scene
from .envs.shape_env import PCDEnv
from . import geometry
from . import profiling
from .sampler import OptimSampler
from .planning import MotionPlanner, RRTStar
from .dynamics import (ObstacleMotion, LinearMotion, SineMotion,
                       Dynamic1DChecker)
from .robots.capsule_chain import CapsuleChainCollision
# legacy obstacle-list API (the reference's deprecated/ names, still used
# by its experiment scripts: scripts/active.py:24, speed_compare.py:18)
from . import legacy
from .legacy import (Obstacle, FCLObstacle, FCLChecker,
                     Simple1DDynamicObstacle, Simple1DDynamicChecker)

__version__ = '0.1.0'
