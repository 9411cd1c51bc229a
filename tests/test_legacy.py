import numpy as np
import jax
import jax.numpy as jnp

from diffco_tpu.legacy import (Obstacle, FCLObstacle, FCLChecker,
                               Simple1DDynamicObstacle,
                               Simple1DDynamicChecker)
from diffco_tpu.dynamics import LinearMotion
from diffco_tpu.robots import RevolutePlanarRobot


def test_obstacle_point_collision():
    # ref Obstacles.py:18: circle size is the DIAMETER (norm < size/2)
    circ = Obstacle('circle', (2.0, 0.0), 1.0)
    assert bool(circ.is_collision(jnp.asarray([2.4, 0.0]))[0])
    assert not bool(circ.is_collision(jnp.asarray([2.75, 0.0]))[0])
    assert not bool(circ.is_collision(jnp.asarray([0.0, 0.0]))[0])
    rect = Obstacle('rect', (0.0, 2.0), (2.0, 1.0))
    assert bool(rect.is_collision(jnp.asarray([0.5, 2.2]))[0])
    assert not bool(rect.is_collision(jnp.asarray([2.0, 2.0]))[0])


def test_fcl_checker_predict(key):
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obstacles = [FCLObstacle('circle', (1.5, 1.0), 0.6, category=0),
                 FCLObstacle('rect', (-1.2, -1.0), (1.2, 1.2), category=1)]
    checker = FCLChecker(obstacles, robot=robot, label_type='class',
                         num_class=2)
    q = robot.rand_configs(100, key)
    labels, dists = checker.predict(q, distance=True)
    assert labels.shape == (100, 2) and dists.shape == (100, 2)
    # labels match the sign of signed distances (FCLChecker.py semantics)
    assert np.all(np.asarray(labels) == (np.asarray(dists) > 0) * 2 - 1)


def test_simple_1d_dynamic_checker():
    obs = Simple1DDynamicObstacle(1.0, LinearMotion(0.5, 2.0))
    checker = Simple1DDynamicChecker([obs])
    # at t=0: obstacle in [1.5, 2.5]
    labels, dists = checker.predict(jnp.asarray([[2.0, 0.0], [0.0, 0.0]]))
    assert int(labels[0, 0]) == 1 and int(labels[1, 0]) == -1
    # at t=4: obstacle centered at 4
    labels2, _ = checker.predict(jnp.asarray([[4.0, 4.0]]))
    assert int(labels2[0, 0]) == 1


def test_simple_1d_dynamic_checker_with_robot():
    """Reference signature (FCLChecker.py:93-102): (obstacles, robot),
    with predict() unnormalizing [0, 1] configs through robot limits."""
    from diffco_tpu.robots import PointRobot1D
    obs = Simple1DDynamicObstacle(1.0, LinearMotion(0.5, 2.0))
    limits = [[0.0, 10.0], [0.0, 10.0]]
    robot = PointRobot1D(limits)
    checker = Simple1DDynamicChecker([obs], robot)
    # normalized (0.2, 0.0) -> raw (2.0, 0.0): inside the obstacle at t=0
    labels, _ = checker.predict(jnp.asarray([[0.2, 0.0], [0.0, 0.0]]))
    assert int(labels[0, 0]) == 1 and int(labels[1, 0]) == -1
