"""Regression tests for the checkers/geometry2d/analytic/robot_data
review pass."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import diffco_tpu as dc
from diffco_tpu.geometry import Obstacles2D, planar_robot_collision
from diffco_tpu.robots import PointRobot1D, RevolutePlanarRobot


def test_point_robot_rand_configs_normalized():
    """PointRobot1D configs are normalized (x, t) pairs in [0, 1]^2 — the
    inherited sampler broadcast a [N, 1] draw against the [2, 2] raw
    limits into out-of-domain [N, 2] workspace values."""
    robot = PointRobot1D([[0.0, 10.0], [0.0, 5.0]])
    q = np.asarray(robot.rand_configs(64, jax.random.PRNGKey(0)))
    assert q.shape == (64, 2)
    assert (q >= 0).all() and (q <= 1).all()


def test_scalar_link_length():
    r = RevolutePlanarRobot(1.5, link_width=0.3, dof=3)
    assert r.dof == 3
    assert np.allclose(np.asarray(r.link_length), [1.5, 1.5, 1.5])
    with pytest.raises(ValueError, match='dof'):
        RevolutePlanarRobot(1.5, link_width=0.3)


def test_update_before_fit_raises():
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([('circle', (1.2, 0.8), 0.5)])
    ck = dc.RBFDiffCo(robot=robot,
                      gt_check_func=lambda qq: planar_robot_collision(
                          robot, obs, qq), seed=0)
    with pytest.raises(RuntimeError, match='fit'):
        ck.update()


def test_tiny_fit_has_nonempty_verify():
    """num_samples small enough that int(0.1 * N) == 0 must still hold
    out at least one row (an empty verify set crashed the safety-bias
    min() reduction)."""
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([('circle', (1.2, 0.8), 0.5)])
    ck = dc.RBFDiffCo(robot=robot,
                      gt_check_func=lambda qq: planar_robot_collision(
                          robot, obs, qq), seed=0)
    acc, tpr, tnr = ck.fit(num_samples=8, verify_ratio=0.1)
    assert np.isfinite(ck.safety_bias)


def test_empty_obstacles_signed_dist_points():
    obs = Obstacles2D()
    d = obs.signed_dist_points(jnp.zeros((5, 2)))
    assert d.shape == (5, 0)


def test_panda_simple_wrist_covered():
    """The vendored panda URDF must carry collision geometry along the
    0.214 m link7-to-hand flange stretch (a bar midway used to label
    free)."""
    from diffco_tpu import robot_data
    path = robot_data.generate_panda_like_urdf(
        load_gripper=False,
        path='/tmp/_panda_wrist_check.urdf')
    text = open(path).read()
    assert text.count('cylinder') == 4      # d = 0.333/0.316/0.384/0.214
    assert 'length="0.214"' in text
