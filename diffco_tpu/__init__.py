"""diffco_tpu — TPU-native differentiable proxy collision detection.

A from-scratch JAX/XLA/Pallas re-design of the DiffCo framework
(differentiable kernel-perceptron collision proxies for robot motion
planning). The compute path is pure jit-compiled functions over fixed-shape
arrays: batched forward kinematics, fused kernel score evaluation,
on-device perceptron training, and scanned trajectory optimization.
"""

from . import utils
from . import kernels
# torch-style alias so downstream code matching the reference import layout
# (``from diffco import kernel``) ports over mechanically.
kernel = kernels

from .robots import (
    Model, RevolutePlanarRobot, RigidPlanarBody, RigidBody, DHParameters,
    DHChainRobot, BaxterLeftArmFK, BaxterRightArmFK, BaxterFK,
    BaxterDualArmFK, PandaFK, DualPandaFK, PointRobot1D, ChainSpec,
)

__version__ = '0.1.0'
