import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffco_tpu.robots import RevolutePlanarRobot
from diffco_tpu.geometry import (Obstacles2D, planar_robot_signed_dist,
                                 planar_robot_collision)
from diffco_tpu.sampler import OptimSampler
from diffco_tpu.planning import MotionPlanner, RRTStar


@pytest.fixture(scope='module')
def world():
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([
        ('circle', (1.6, 1.1), 0.7)])

    def dist_est(q):
        return planar_robot_signed_dist(robot, obs, q).max(axis=-1)

    def collision(q):
        return planar_robot_collision(robot, obs, q)

    return robot, obs, dist_est, collision


def test_optim_escape(world):
    robot, obs, dist_est, collision = world
    # collect colliding configurations
    q = robot.rand_configs(300, jax.random.PRNGKey(0))
    hits = np.asarray(collision(q))
    q_coll = q[np.where(hits)[0][:32]]
    assert len(q_coll) > 0
    sampler = OptimSampler(robot, dist_est, lr=0.1, max_steps=80)
    q_free = sampler.optim_escape(q_coll)
    frac_escaped = 1 - float(jnp.mean(collision(q_free)))
    assert frac_escaped > 0.8
    # resample baseline also works
    out, checks = sampler.resample_escape(q_coll, jax.random.PRNGKey(1))
    assert checks >= len(q_coll)


def test_rrt_connect(world):
    robot, obs, dist_est, collision = world
    q = robot.rand_configs(128, jax.random.PRNGKey(3))
    free = ~np.asarray(collision(q))
    idx = np.where(free)[0]
    start, goal = np.asarray(q[idx[0]]), np.asarray(q[idx[-1]])
    planner = MotionPlanner(robot, collision, step_size=0.4)
    path = planner.plan(start, goal, max_iters=500)
    assert path is not None
    assert np.allclose(path[0], start, atol=1e-6)
    assert np.allclose(path[-1], goal, atol=1e-6)
    # the densified path is collision-free under the ground truth
    hits = np.asarray(collision(jnp.asarray(path, jnp.float32)))
    assert not hits.any()
    assert planner.cnt_check > 0


def test_rrt_star(world):
    robot, obs, dist_est, collision = world
    q = robot.rand_configs(128, jax.random.PRNGKey(11))
    free = ~np.asarray(collision(q))
    idx = np.where(free)[0]
    start, goal = np.asarray(q[idx[0]]), np.asarray(q[idx[-1]])
    planner = RRTStar(robot, collision, score_fn=lambda q: dist_est(q),
                      step_size=0.5, radius=1.0, seed=1)
    path = planner.plan(start, goal, max_iters=600, goal_tol=0.5)
    assert path is not None
    hits = np.asarray(collision(jnp.asarray(path, jnp.float32)))
    assert not hits.any()


def test_manifold_jac_det_known_values():
    """For a 2-link planar arm with unit links, the end-effector Jacobian
    determinant is |l1 l2 sin(q2)| — the rejection density must track it."""
    from diffco_tpu.sampler import manifold_jac_det
    from diffco_tpu.robots import RevolutePlanarRobot
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)

    def ee_transform(q):
        return robot.fkine(q)[:, -1, :]   # end-effector position [B, 2]

    q = jnp.stack([jnp.zeros(5),
                   jnp.asarray([0.1, 0.5, 1.0, 2.0, 3.0])], axis=1)
    det = np.asarray(manifold_jac_det(ee_transform, q))
    expected = np.abs(np.sin(np.asarray(q[:, 1])))
    assert np.allclose(det, expected, atol=2e-2)


def test_uniform_sample_on_transformed_manifold_shifts_distribution(key):
    """FK-manifold sampling must accept high-jac-det configurations more
    often: the accepted set's mean jac-det exceeds the uniform draw's
    (ref collision_checkers.py:396-452 acceptance rule)."""
    from diffco_tpu.sampler import (
        manifold_jac_det, uniform_sample_on_transformed_manifold)
    from diffco_tpu.robots import RevolutePlanarRobot
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)

    def ee_transform(q):
        return robot.fkine(q)[:, -1, :]

    n = 512
    q_manifold = uniform_sample_on_transformed_manifold(
        robot, ee_transform, n, key)
    assert q_manifold.shape == (n, 2)
    q_uniform = robot.rand_configs(n, jax.random.PRNGKey(123))
    det_m = float(manifold_jac_det(ee_transform, q_manifold).mean())
    det_u = float(manifold_jac_det(ee_transform, q_uniform).mean())
    # E[det] under manifold sampling = E[det^2]/E[det] >= E[det] uniform
    assert det_m > det_u * 1.05


def test_generate_dataset_sample_transform(key):
    """sample_transform plumbs through the checker dataset generator."""
    from diffco_tpu.checkers import RBFDiffCo
    from diffco_tpu.robots import RevolutePlanarRobot
    from diffco_tpu.geometry import Obstacles2D, planar_robot_signed_dist
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([('circle', (1.5, 1.0), 0.6)])

    def gt(q):
        return planar_robot_signed_dist(robot, obs, q).max(axis=-1) > 0

    checker = RBFDiffCo(robot=robot, gt_check_func=gt)
    q, labels, dists = checker._generate_dataset(
        None, None, None, 256,
        sample_transform=lambda q: robot.fkine(q)[:, -1, :])
    assert q.shape == (256, 2)
    assert labels.shape == (256,)
