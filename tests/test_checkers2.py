"""Second checker test batch: hybrid checking, multi-robot, update with
verification split, and the reference's proxy-faster-than-exact speed
assertion (test_fkine_diffco.py:72-100)."""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import diffco_tpu as dc
from diffco_tpu.robots.urdf import _data_path
from diffco_tpu.robots import RevolutePlanarRobot
from diffco_tpu.geometry import Obstacles2D, planar_robot_collision

HAS_ROBOT_DATA = os.path.isdir(dc.robot_description_folder)


def _world():
    robot = RevolutePlanarRobot(1.0, link_width=0.2, dof=2)
    obs = Obstacles2D.from_obstacle_list([
        ('circle', (1.6, 1.0), 0.7), ('rect', (-1.2, -1.0), (1.2, 1.2))])

    def gt(q):
        return planar_robot_collision(robot, obs, q)

    return robot, obs, gt


def test_update_with_verify_split(key):
    robot, obs, gt = _world()
    checker = dc.RBFDiffCo(robot=robot, gt_check_func=gt)
    checker.fit(num_samples=1200)
    # update WITH a verification split (exercises the exist-mask/verify
    # interaction: supports must stay in the training split)
    acc, tpr, tnr = checker.update(num_samples=200, verify=0.2)
    assert acc is not None and np.isfinite(acc)
    q = robot.rand_configs(50, key)
    s = checker.collision_score(q)
    assert np.all(np.isfinite(np.asarray(s)))


def test_hybrid_checker(key):
    robot, obs, gt = _world()
    checker = dc.HybridForwardKinematicsDiffCo(
        robot=robot, gt_check_func=gt)
    checker.fit(num_samples=1200)
    q = robot.rand_configs(300, key)
    labels = np.asarray(checker.collision(q))
    gt_labels = np.asarray(gt(q))
    # hybrid re-checks the uncertain band with ground truth -> accuracy
    # must be at least as good as the raw proxy
    raw = np.asarray(checker.collision_score(q)).reshape(-1) > 0
    assert (labels == gt_labels).mean() >= (raw == gt_labels).mean() - 1e-9
    # lazy variant also runs
    checker.lazy_line_check = True
    labels2 = np.asarray(checker.collision(q))
    assert labels2.shape == (300,)


def test_optimistic_checker(key):
    robot, obs, gt = _world()
    checker = dc.OptimisticChecker(robot=robot, gt_check_func=gt)
    checker.fit(num_samples=800)
    q = robot.rand_configs(20, key)
    assert isinstance(checker.in_collision(q, optimistic=True), bool)
    assert isinstance(checker.in_collision(q, optimistic=False), bool)


def test_proxy_faster_than_gt_batch(key):
    """Reference speed assert (test_fkine_diffco.py:72-100): batched proxy
    inference must not be slower than the exact check. The oracle here is
    the native C++ backend (diffco_tpu.native, libfcl's role in the
    reference) querying the robot's collision spheres against the scene —
    a much stronger comparator than the batched JAX geometric GT."""
    from diffco_tpu import native
    if not native.available():
        pytest.skip('native backend unavailable')
    T1, T2 = np.eye(4), np.eye(4)
    T1[:3, 3] = [1.0, 1.0, 0.2]
    T2[:3, 3] = [-1.0, 0.5, 0.15]
    env = dc.ShapeEnv(shapes={
        'box1': {'type': 'Box', 'params': {'extents': [0.5, 0.5, 0.5]},
                 'transform': T1},
        'sphere1': {'type': 'Sphere', 'params': {'radius': 0.4},
                    'transform': T2}})
    robot = dc.TwoLinkRobot(setup_acm=False, link_spheres=8)
    checker = dc.ForwardKinematicsDiffCo(robot=robot, environment=env)
    checker.fit(num_samples=1000)
    q = robot.rand_configs(1000, key)
    ns = native.NativeScene(env.scene)
    radii = np.asarray(robot.link_sphere_radii, np.float64)

    def gt_native(qq):
        centers = np.asarray(robot.sphere_centers_world(qq), np.float64)
        return native.spheres_vs_scene(centers, radii, ns)

    # proxy path = the jitted serving score (what the optimizers call);
    # best-of-N single-shot times to shed CI host noise
    score = checker.score_fn()
    jax.block_until_ready(score(q))
    gt_native(q)
    dc_times, gt_times = [], []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.block_until_ready(score(q))
        dc_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        gt_native(q)
        gt_times.append(time.perf_counter() - t0)
    assert min(dc_times) <= min(gt_times), (dc_times, gt_times)


def test_multi_urdf_robot(key):
    """Dual-robot wrapper (ref test_fkine_diffco.py:192-232 scaled
    down)."""
    r1 = dc.TwoLinkRobot(setup_acm=False)
    base2 = np.eye(4)
    base2[0, 3] = 2.5
    r2 = dc.URDFRobot(
        _data_path('2link_robot.urdf', vendored='2link_robot.urdf'),
        base_transform=base2, setup_acm=False)
    multi = dc.MultiURDFRobot([r1, r2])
    assert multi._n_dofs == 4
    q = multi.rand_configs(64, key)
    pts = multi.fkine(q)
    assert pts.shape[0] == 64 and pts.shape[-1] == 3
    labels = multi.collision(q)
    assert labels.shape == (64,)
    fk_list = multi.compute_forward_kinematics_all_links(q)
    assert len(fk_list) == 2


def test_multi_urdf_fkdiffco_fit(key):
    """Dual-robot FK-DiffCo fit (ref test_fkine_diffco.py:192-232):
    two 2-link robots with offset bases, inter-robot collision included."""
    r1 = dc.TwoLinkRobot(setup_acm=False)
    base2 = np.eye(4)
    base2[0, 3] = 1.6  # close enough that the arms can reach each other
    r2 = dc.URDFRobot(
        _data_path('2link_robot.urdf', vendored='2link_robot.urdf'),
        base_transform=base2, setup_acm=False)
    multi = dc.MultiURDFRobot([r1, r2])
    T = np.eye(4)
    T[:3, 3] = [0.8, 0.9, 0.15]
    env = dc.ShapeEnv(shapes={
        'post': {'type': 'Cylinder', 'params': {'radius': 0.3,
                                                'height': 1.0},
                 'transform': T}})
    rate = float(jnp.mean(multi.collision(
        multi.rand_configs(500, key), other=env)))
    assert 0.02 < rate < 0.98  # nontrivial labels
    fkdc = dc.ForwardKinematicsDiffCo(robot=multi, environment=env)
    acc, tpr, tnr = fkdc.fit(num_samples=2000)
    assert tpr >= 0.85
    scores = fkdc.collision_score(multi.rand_configs(32, key))
    assert np.all(np.isfinite(np.asarray(scores)))
