"""ROS/MoveIt ground-truth interface (optional; requires rospy).

Parity target: /root/reference/diffco/collision_interfaces/ros_interface.py
(ROSRobotEnv :30-81, PlanningSceneModifier :84-125). The reference's
implementation is partially broken (undefined ``states`` at :56-68 and a
missing StateValidity import); this version fixes those while keeping the
same surface. All functionality degrades to clear ImportErrors when ROS is
absent — ROS is robot middleware, never part of the TPU compute path.

.. warning:: EXPERIMENTAL — no real rospy/MoveIt exists in this build
   environment. The service-call and scene-diff plumbing is covered by
   mocked-transport tests (tests/test_ros_interface.py); behavior against
   a live MoveIt stack is unverified.
"""
from __future__ import annotations

import numpy as np

try:
    import rospy
    from moveit_msgs.srv import GetStateValidity, GetStateValidityRequest
    from moveit_msgs.msg import RobotState, PlanningScene, CollisionObject
    from shape_msgs.msg import SolidPrimitive
    from geometry_msgs.msg import Pose
    from sensor_msgs.msg import JointState
    _HAS_ROS = True
except ImportError:
    _HAS_ROS = False


def _ensure_node(name: str):
    """Publishers/ServiceProxies need an initialized node
    (ref ros_interface.py:32 calls rospy.init_node); init_node may only
    run once per process, so skip when one is already up."""
    is_init = getattr(getattr(rospy, 'core', None), 'is_initialized', None)
    if is_init is not None and is_init():
        return
    rospy.init_node(name, anonymous=True, disable_signals=True)


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
        _ensure_node(f'diffco_{self.name}')
        rospy.wait_for_service('/check_state_validity', timeout=10)
        self._sv = rospy.ServiceProxy('/check_state_validity',
                                      GetStateValidity)
        param = (f'{robot_topic}/joint_names' if robot_topic
                 else 'joint_names')
        self._joint_names = rospy.get_param(param, None)
        if not self._joint_names:
            # fail HERE with the cause, not later with a reshape error
            # against n_dofs == 0
            raise ValueError(
                f'ROS param {param!r} is unset or empty; set it to the '
                f'ordered joint-name list for the StateValidity checks')
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
    (ref ros_interface.py:84-125, which drives
    PlanningSceneInterface.add_box/add_mesh; here the equivalent
    CollisionObject diffs are published directly).

    obstacles: ``{name: {'pose': (x, y, z), 'dim': (dx, dy, dz),
    'orientation': (x, y, z, w) optional, 'z_offset': float optional,
    'frame_id': str optional}}``.
    """

    def __init__(self, obstacles: dict, port=None):
        if not _HAS_ROS:
            raise ImportError('PlanningSceneModifier requires rospy')
        self._obstacles = obstacles
        _ensure_node('diffco_scene_modifier')
        self._scene_pub = rospy.Publisher('planning_scene', PlanningScene,
                                          queue_size=5)

    def permute_obstacles(self, pose_dict):
        for name, pose in pose_dict.items():
            self._obstacles[name]['pose'] = pose
        self.publish_scene()

    def _collision_object(self, name, spec):
        if spec.get('is_mesh'):
            raise NotImplementedError(
                'mesh obstacles need moveit_commander.'
                'PlanningSceneInterface.add_mesh (the reference path); '
                'use box dims here, or the self-contained ShapeEnv')
        co = CollisionObject()
        co.id = name
        co.header.frame_id = spec.get('frame_id', 'world')
        # ADD with an existing id replaces the object, so the same diff
        # both creates and moves obstacles
        co.operation = CollisionObject.ADD
        pose = Pose()
        p = spec.get('pose', (0.0, 0.0, 0.0))
        pose.position.x = float(p[0])
        pose.position.y = float(p[1])
        pose.position.z = float(p[2]) + float(spec.get('z_offset', 0.0))
        quat = spec.get('orientation') or (0.0, 0.0, 0.0, 1.0)
        (pose.orientation.x, pose.orientation.y,
         pose.orientation.z, pose.orientation.w) = map(float, quat)
        prim = SolidPrimitive()
        prim.type = SolidPrimitive.BOX
        prim.dimensions = [float(v) for v in spec['dim']]
        co.primitives = [prim]
        co.primitive_poses = [pose]
        return co

    def publish_scene(self):
        """Publish every tracked obstacle as a CollisionObject diff — an
        empty diff (the previous behavior) changed nothing in MoveIt and
        silently invalidated later StateValidity queries."""
        scene = PlanningScene()
        scene.is_diff = True
        scene.world.collision_objects = [
            self._collision_object(name, spec)
            for name, spec in self._obstacles.items()]
        self._scene_pub.publish(scene)
