"""Exercise diffco_tpu.ros_interface against a mocked ROS transport.

No rospy exists in this environment, so these tests inject minimal fake
``rospy`` / ``moveit_msgs`` / ``sensor_msgs`` modules and reload the
module — verifying the service-call plumbing (the part the reference left
broken: undefined ``states`` at ros_interface.py:56-68 and the missing
StateValidity import) without real robot middleware.
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


class _FakePlanningScene:
    def __init__(self):
        self.is_diff = False


@pytest.fixture()
def ros_interface_mocked(monkeypatch):
    joint_names = ['j1', 'j2', 'j3']

    rospy = types.ModuleType('rospy')
    rospy.wait_for_service = lambda name, timeout=None: None
    rospy.ServiceProxy = _FakeServiceProxy
    rospy.Publisher = _FakePublisher
    rospy.get_param = lambda key, default=None: joint_names

    moveit_msgs = types.ModuleType('moveit_msgs')
    srv = types.ModuleType('moveit_msgs.srv')
    srv.GetStateValidity = object()
    srv.GetStateValidityRequest = _FakeRequest
    msg = types.ModuleType('moveit_msgs.msg')
    msg.RobotState = _FakeRobotState
    msg.PlanningScene = _FakePlanningScene
    msg.CollisionObject = object()
    moveit_msgs.srv = srv
    moveit_msgs.msg = msg

    sensor_msgs = types.ModuleType('sensor_msgs')
    sensor_msg = types.ModuleType('sensor_msgs.msg')
    sensor_msg.JointState = _FakeJointState
    sensor_msgs.msg = sensor_msg

    for name, mod in [('rospy', rospy), ('moveit_msgs', moveit_msgs),
                      ('moveit_msgs.srv', srv), ('moveit_msgs.msg', msg),
                      ('sensor_msgs', sensor_msgs),
                      ('sensor_msgs.msg', sensor_msg)]:
        monkeypatch.setitem(sys.modules, name, mod)

    import diffco_tpu.ros_interface as ri
    importlib.reload(ri)
    yield ri
    # restore the module to its ROS-less state for other tests
    for name in ['rospy', 'moveit_msgs', 'moveit_msgs.srv',
                 'moveit_msgs.msg', 'sensor_msgs', 'sensor_msgs.msg']:
        sys.modules.pop(name, None)
    importlib.reload(ri)


def test_ros_env_collision_labels(ros_interface_mocked):
    ri = ros_interface_mocked
    env = ri.ROSRobotEnv(robot_topic='/my_robot')
    assert env._n_dofs == 3
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


def test_planning_scene_modifier(ros_interface_mocked):
    ri = ros_interface_mocked
    obstacles = {'box': {'pose': [0, 0, 0]}}
    mod = ri.PlanningSceneModifier(obstacles)
    mod.permute_obstacles({'box': [1.0, 2.0, 3.0]})
    assert obstacles['box']['pose'] == [1.0, 2.0, 3.0]
    assert len(mod._scene_pub.published) == 1
    assert mod._scene_pub.published[0].is_diff is True


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
