import numpy as np
import jax
import jax.numpy as jnp

from diffco_tpu.geometry import (
    Obstacles2D, planar_robot_signed_dist, planar_robot_collision,
    point_segment_dist, segment_circle_signed_dist,
    segment_rect_signed_dist, point_rect_sd,
)
from diffco_tpu.robots import RevolutePlanarRobot


import pytest
pytestmark = pytest.mark.smoke  # fast single-core tier (pyproject)


def test_point_segment_dist():
    a = jnp.asarray([0.0, 0.0])
    b = jnp.asarray([2.0, 0.0])
    assert np.isclose(float(point_segment_dist(jnp.asarray([1.0, 1.0]), a, b)),
                      1.0, atol=1e-5)
    assert np.isclose(float(point_segment_dist(jnp.asarray([3.0, 0.0]), a, b)),
                      1.0, atol=1e-5)
    assert np.isclose(float(point_segment_dist(jnp.asarray([-1.0, -1.0]), a, b)),
                      np.sqrt(2), atol=1e-5)


def test_segment_circle_signed_dist():
    a = jnp.asarray([0.0, 0.0])
    b = jnp.asarray([2.0, 0.0])
    # circle above the segment, separated
    sd = segment_circle_signed_dist(a, b, jnp.asarray([1.0, 2.0]), 0.5, 0.1)
    assert np.isclose(float(sd), 0.5 + 0.1 - 2.0, atol=1e-5)  # negative
    # circle overlapping
    sd2 = segment_circle_signed_dist(a, b, jnp.asarray([1.0, 0.2]), 0.5, 0.1)
    assert float(sd2) > 0


def test_point_rect_sd_oriented():
    # unit square rotated 45 degrees at origin
    c = jnp.asarray([0.0, 0.0])
    half = jnp.asarray([1.0, 1.0])
    ang = jnp.asarray(np.pi / 4)
    # point along world x at distance sqrt(2): exactly at the rotated corner
    p = jnp.asarray([np.sqrt(2), 0.0])
    assert np.isclose(float(point_rect_sd(p, c, half, ang)), 0.0, atol=1e-4)
    assert float(point_rect_sd(jnp.asarray([0.0, 0.0]), c, half, ang)) < 0


def test_segment_rect_signed_dist_separation():
    c = jnp.asarray([5.0, 0.0])
    half = jnp.asarray([1.0, 1.0])
    a, b = jnp.asarray([0.0, 0.0]), jnp.asarray([2.0, 0.0])
    sd = segment_rect_signed_dist(a, b, c, half, jnp.asarray(0.0), 0.0)
    assert np.isclose(float(sd), -2.0, atol=1e-4)  # gap = 5 - 2 - 1


def test_segment_rect_signed_dist_penetration():
    c = jnp.asarray([2.0, 0.0])
    half = jnp.asarray([1.0, 1.0])
    a, b = jnp.asarray([0.0, 0.0]), jnp.asarray([4.0, 0.0])
    sd = segment_rect_signed_dist(a, b, c, half, jnp.asarray(0.0), 0.0)
    assert float(sd) > 0.5  # segment passes fully through the box


def test_segment_rect_corner_distance():
    # diagonal segment near a corner
    c = jnp.asarray([0.0, 0.0])
    half = jnp.asarray([1.0, 1.0])
    a, b = jnp.asarray([2.0, 0.0]), jnp.asarray([0.0, 2.0])
    sd = segment_rect_signed_dist(a, b, c, half, jnp.asarray(0.0), 0.0)
    # nearest: corner (1,1) to segment x+y=2 -> dist = 0
    assert np.isclose(float(sd), 0.0, atol=1e-4)


def test_planar_robot_collision_labels():
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([
        ('circle', (2.0, 0.0), 0.5),
    ])
    # straight config reaches (2, 0): collision. Folded back: free.
    q = jnp.asarray([[0.0, 0.0], [np.pi / 2, 0.0]])
    labels = np.asarray(planar_robot_collision(robot, obs, q))
    assert labels[0] and not labels[1]
    sd = np.asarray(planar_robot_signed_dist(robot, obs, q))
    assert sd[0, 0] > 0 and sd[1, 0] < 0


def test_signed_dist_grad():
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([
        ('circle', (2.0, 0.0), 0.5), ('rect', (0.0, 2.0), (1.0, 1.0))])

    def f(q):
        return jnp.sum(planar_robot_signed_dist(robot, obs, q[None]))

    g = jax.grad(f)(jnp.asarray([0.3, -0.4]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_multi_class_obstacles():
    obs = Obstacles2D.from_obstacle_list([
        ('circle', (2.0, 0.0), 0.5, 0),
        ('rect', (0.0, 2.0), (1.0, 1.0), 1),
    ])
    assert obs.num_class == 2
    assert list(obs.obstacle_classes) == [0, 1]
