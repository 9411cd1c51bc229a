"""Regression tests for the env/dynamics/legacy parity pass: reference-
exact 2D layouts, PandaEnv distance convention, PCDEnv parameter
preservation, and the compiled dynamic-obstacle ground truth."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffco_tpu.dynamics import (LinearMotion, SineMotion, ObstacleMotion,
                                 Dynamic1DChecker)
from diffco_tpu.envs.presets2d import ENVS, get_env, narrow_env
from diffco_tpu.envs.shape_env import PCDEnv


def test_preset_layouts_match_reference():
    """Coordinate-exact parity with the reference's predefined_obstacles
    (2d_data_generation.py:9-58) for the layouts the benchmark matrix
    runs under."""
    assert ENVS['1rect'] == [('rect', (3, 2), (2, 2))]
    assert ENVS['3circle'] == [('circle', (0, 4.5), 1.0),
                               ('circle', (-2, -3), 2.0),
                               ('circle', (-2, 2), 1.5)]
    assert ENVS['1rect_1circle_7d'] == [('circle', (-2, 3), 1.0),
                                        ('rect', (3, 2), (2, 2))]
    assert ENVS['3circle_7d'] == [('circle', (-2, 2), 1.0),
                                  ('circle', (-3, 3), 1.0),
                                  ('circle', (-6, -3), 1.0)]
    assert ENVS['2class_2'] == [('rect', (0, 3), (16, 0.5), 1),
                                ('rect', (0, -3), (16, 0.5), 0)]
    assert ENVS['2class_1'][3] == ('circle', (-5, -2), 1.5, 1)
    assert ENVS['2class_1'][4] == ('circle', (-3, -6), 1.0, 1)
    assert '2circle' in ENVS and '2instance_big' in ENVS


def test_narrow_env_reference_semantics():
    """7d_narrow: unit boxes split into y >= 1 and y <= -1 bands
    (2d_data_generation.py:60-76) — fixed size, |y| band gap of 2."""
    obs = narrow_env()
    assert len(obs) == 300
    sizes = {o[2] for o in obs}
    assert sizes == {(1.0, 1.0)}
    ys = np.asarray([o[1][1] for o in obs])
    assert ((ys >= 1.0) | (ys <= -1.0)).all()
    assert (ys >= 1.0).sum() == 150 and (ys <= -1.0).sum() == 150


def test_dynamic_checker_compiled_path_matches_eager():
    """Scalar Linear/Sine motions take the ONE-program jitted route; a
    custom ObstacleMotion subclass falls back to the eager loop — both
    must agree."""
    motions = [(LinearMotion(0.5, 2.0), 0.6),
               (SineMotion(2.0, 0.8, 0.3, 7.0), 0.5)]
    ck = Dynamic1DChecker(motions)
    assert ck._params is not None          # compiled route

    class Custom(ObstacleMotion):
        def predict(self, t):
            return 0.5 * t + 2.0

    ck_eager = Dynamic1DChecker([(Custom(), 0.6),
                                 (SineMotion(2.0, 0.8, 0.3, 7.0), 0.5)])
    assert ck_eager._params is None        # fallback route

    xt = jnp.stack([jnp.linspace(0, 10, 64), jnp.linspace(0, 10, 64)], 1)
    a = np.asarray(ck.signed_dist(xt))
    b = np.asarray(ck_eager.signed_dist(xt))
    assert a.shape == b.shape == (64, 2)
    assert np.allclose(a, b, atol=1e-5)


def test_pcdenv_update_preserves_params():
    pc = np.random.RandomState(0).rand(100, 3).astype(np.float32)
    env = PCDEnv(pc, point_radius=0.07, max_points=50)
    assert len(env.point_cloud) == 50
    assert np.allclose(np.asarray(env.scene.sph_r), 0.07)
    env.update_point_cloud(pc[:30])
    assert np.allclose(np.asarray(env.scene.sph_r), 0.07)
    assert env.max_points == 50


def test_panda_env_distance_convention():
    """PandaEnv.distance follows the reference (panda_envs.py:67-69):
    positive separation when free, negative when colliding, and an
    obstacle-free env reports +inf instead of crashing."""
    from diffco_tpu.envs.panda_envs import PandaEnv, PandaSingleCylinderEnv

    empty = PandaEnv(load_gripper=False, link_spheres=8)
    d = empty.distance(jnp.zeros((2, empty.robot.dof)))
    assert d == [float('inf'), float('inf')]

    env = PandaSingleCylinderEnv(load_gripper=False, link_spheres=8)
    qs = env.robot.rand_configs(48, jax.random.PRNGKey(0))
    dists = np.asarray(env.distance(qs))
    colls = np.asarray(env.is_collision(qs))
    assert colls.any() and not colls.all()
    # colliding -> penetration -> negative separation; free -> positive
    assert (dists[colls] < 0).all()
    assert (dists[~colls] > 0).all()
