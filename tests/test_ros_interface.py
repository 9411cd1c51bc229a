"""Exercise diffco_tpu.ros_interface against a mocked ROS transport.

No rospy exists in this environment, so these tests inject minimal fake
``rospy`` / ``moveit_msgs`` / ``shape_msgs`` / ``geometry_msgs`` /
``sensor_msgs`` modules and reload the module — verifying the node
bring-up, service-call, and planning-scene-diff plumbing (the parts the
reference left broken or that a live stack would reject) without real
robot middleware.
"""
import importlib
import sys
import types

import numpy as np
import pytest


class _FakeJointState:
    def __init__(self, name=(), position=()):
        self.name = list(name)
        self.position = list(position)


class _FakeRobotState:
    def __init__(self):
        self.joint_state = None


class _FakeRequest:
    def __init__(self):
        self.robot_state = None


class _FakeResult:
    def __init__(self, valid):
        self.valid = valid


class _FakeServiceProxy:
    """Marks a config invalid (in collision) when its first joint > 0."""

    def __init__(self, name, srv_type):
        self.name = name
        self.srv_type = srv_type
        self.calls = []

    def __call__(self, req):
        self.calls.append(req)
        q0 = req.robot_state.joint_state.position[0]
        return _FakeResult(valid=not (q0 > 0))


class _FakePublisher:
    def __init__(self, topic, msg_type, queue_size=0):
        self.topic = topic
        self.published = []

    def publish(self, msg):
        self.published.append(msg)


class _FakeWorld:
    def __init__(self):
        self.collision_objects = []


class _FakePlanningScene:
    def __init__(self):
        self.is_diff = False
        self.world = _FakeWorld()


class _FakeHeader:
    def __init__(self):
        self.frame_id = ''


class _FakeCollisionObject:
    ADD = 0
    REMOVE = 1

    def __init__(self):
        self.id = ''
        self.header = _FakeHeader()
        self.operation = None
        self.primitives = []
        self.primitive_poses = []


class _XYZW:
    def __init__(self):
        self.x = self.y = self.z = 0.0
        self.w = 1.0


class _FakePose:
    def __init__(self):
        self.position = _XYZW()
        self.orientation = _XYZW()


class _FakeSolidPrimitive:
    BOX = 1

    def __init__(self):
        self.type = None
        self.dimensions = []


@pytest.fixture()
def ros_interface_mocked(monkeypatch):
    joint_names = ['j1', 'j2', 'j3']
    node_state = {'initialized': False, 'init_calls': 0}

    rospy = types.ModuleType('rospy')
    rospy.wait_for_service = lambda name, timeout=None: None
    rospy.ServiceProxy = _FakeServiceProxy
    rospy.Publisher = _FakePublisher

    def get_param(key, default=None):
        if key.endswith('/joint_names') and 'my_robot' in key:
            return joint_names
        return default

    rospy.get_param = get_param

    def init_node(name, anonymous=False, disable_signals=False):
        node_state['initialized'] = True
        node_state['init_calls'] += 1

    rospy.init_node = init_node
    core = types.ModuleType('rospy.core')
    core.is_initialized = lambda: node_state['initialized']
    rospy.core = core

    moveit_msgs = types.ModuleType('moveit_msgs')
    srv = types.ModuleType('moveit_msgs.srv')
    srv.GetStateValidity = object()
    srv.GetStateValidityRequest = _FakeRequest
    msg = types.ModuleType('moveit_msgs.msg')
    msg.RobotState = _FakeRobotState
    msg.PlanningScene = _FakePlanningScene
    msg.CollisionObject = _FakeCollisionObject
    moveit_msgs.srv = srv
    moveit_msgs.msg = msg

    shape_msgs = types.ModuleType('shape_msgs')
    shape_msg = types.ModuleType('shape_msgs.msg')
    shape_msg.SolidPrimitive = _FakeSolidPrimitive
    shape_msgs.msg = shape_msg

    geometry_msgs = types.ModuleType('geometry_msgs')
    geometry_msg = types.ModuleType('geometry_msgs.msg')
    geometry_msg.Pose = _FakePose
    geometry_msgs.msg = geometry_msg

    sensor_msgs = types.ModuleType('sensor_msgs')
    sensor_msg = types.ModuleType('sensor_msgs.msg')
    sensor_msg.JointState = _FakeJointState
    sensor_msgs.msg = sensor_msg

    for name, mod in [('rospy', rospy), ('moveit_msgs', moveit_msgs),
                      ('moveit_msgs.srv', srv), ('moveit_msgs.msg', msg),
                      ('shape_msgs', shape_msgs),
                      ('shape_msgs.msg', shape_msg),
                      ('geometry_msgs', geometry_msgs),
                      ('geometry_msgs.msg', geometry_msg),
                      ('sensor_msgs', sensor_msgs),
                      ('sensor_msgs.msg', sensor_msg)]:
        monkeypatch.setitem(sys.modules, name, mod)

    import diffco_tpu.ros_interface as ri
    importlib.reload(ri)
    ri._node_state = node_state      # expose for assertions
    yield ri
    # restore the module to its ROS-less state for other tests
    for name in ['rospy', 'moveit_msgs', 'moveit_msgs.srv',
                 'moveit_msgs.msg', 'shape_msgs', 'shape_msgs.msg',
                 'geometry_msgs', 'geometry_msgs.msg',
                 'sensor_msgs', 'sensor_msgs.msg']:
        sys.modules.pop(name, None)
    importlib.reload(ri)


def test_ros_env_collision_labels(ros_interface_mocked):
    ri = ros_interface_mocked
    env = ri.ROSRobotEnv(robot_topic='/my_robot')
    assert env._n_dofs == 3
    # Publisher/ServiceProxy need a node (ref ros_interface.py:32)
    assert ri._node_state['initialized']
    q = np.array([[0.5, 0.0, 0.0],    # first joint > 0 -> invalid
                  [-0.2, 1.0, 0.0],
                  [0.1, -1.0, 2.0]])
    labels = env.collision(q)
    assert labels.dtype == bool
    assert labels.tolist() == [True, False, True]
    # each config produced exactly one service call with the joint names
    assert len(env._sv.calls) == 3
    js = env._sv.calls[0].robot_state.joint_state
    assert js.name == ['j1', 'j2', 'j3']
    assert js.position == [0.5, 0.0, 0.0]


def test_ros_env_flat_config(ros_interface_mocked):
    env = ros_interface_mocked.ROSRobotEnv(robot_topic='/my_robot')
    labels = env.collision(np.array([1.0, 0.0, 0.0]))
    assert labels.tolist() == [True]


def test_ros_env_missing_joint_names_fails_fast(ros_interface_mocked):
    """An unset joint_names param must raise a clear error at
    construction, not a reshape-into-(…, 0) error at query time."""
    ri = ros_interface_mocked
    with pytest.raises(ValueError, match='joint_names'):
        ri.ROSRobotEnv(robot_topic='/other_robot')


def test_init_node_called_once(ros_interface_mocked):
    ri = ros_interface_mocked
    ri.ROSRobotEnv(robot_topic='/my_robot')
    ri.PlanningSceneModifier({})
    assert ri._node_state['init_calls'] == 1   # second bring-up skipped


def test_planning_scene_modifier_publishes_objects(ros_interface_mocked):
    """publish_scene must carry real CollisionObject diffs — an empty
    is_diff scene changes nothing in MoveIt."""
    ri = ros_interface_mocked
    obstacles = {'box': {'pose': [0, 0, 0], 'dim': [0.2, 0.3, 0.4],
                         'z_offset': 0.1}}
    mod = ri.PlanningSceneModifier(obstacles)
    mod.permute_obstacles({'box': [1.0, 2.0, 3.0]})
    assert obstacles['box']['pose'] == [1.0, 2.0, 3.0]
    assert len(mod._scene_pub.published) == 1
    scene = mod._scene_pub.published[0]
    assert scene.is_diff is True
    assert len(scene.world.collision_objects) == 1
    co = scene.world.collision_objects[0]
    assert co.id == 'box' and co.operation == _FakeCollisionObject.ADD
    assert co.primitives[0].dimensions == [0.2, 0.3, 0.4]
    pose = co.primitive_poses[0]
    assert (pose.position.x, pose.position.y) == (1.0, 2.0)
    assert pose.position.z == pytest.approx(3.1)   # pose z + z_offset


def test_planning_scene_mesh_rejected(ros_interface_mocked):
    ri = ros_interface_mocked
    mod = ri.PlanningSceneModifier(
        {'m': {'pose': [0, 0, 0], 'is_mesh': True,
               'mesh_file': 'x.stl', 'dim': [1, 1, 1]}})
    with pytest.raises(NotImplementedError):
        mod.publish_scene()


def test_import_error_without_ros():
    """Without rospy the classes raise a clear ImportError (the advertised
    degradation path)."""
    import diffco_tpu.ros_interface as ri
    if ri._HAS_ROS:   # pragma: no cover - impossible in this environment
        pytest.skip('real ROS present')
    with pytest.raises(ImportError):
        ri.ROSRobotEnv(robot_topic='/x')
    with pytest.raises(ImportError):
        ri.PlanningSceneModifier({})
