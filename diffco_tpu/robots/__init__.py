from .analytic import (
    Model, RevolutePlanarRobot, RigidPlanarBody, RigidBody, DHParameters,
    DHChainRobot, BaxterLeftArmFK, BaxterRightArmFK, BaxterFK,
    BaxterDualArmFK, PandaFK, DualPandaFK, PointRobot1D,
)
from .kinematics import (
    ChainSpec, fk_link_poses, fk_selected_positions, fk_collision_pieces,
    chain_from_joint_list, FIXED, REVOLUTE, PRISMATIC,
)
