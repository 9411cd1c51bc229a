"""Parity tests for the fully-fused DH-FK + score + gradient kernel
(ops/fk_score.py) and the analytic FK JVP (robots/fk_jvp.py).

Kernel bodies run through the Pallas interpreter on CPU
(DIFFCO_PALLAS_INTERPRET=1) so the exact production kernel code is
exercised; the on-TPU timing lives in benchmarks/RESULTS.md.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffco_tpu.ops import fk_score
from diffco_tpu.ops.fused_score import _poly_score_xla
from diffco_tpu.robots import (PandaFK, BaxterLeftArmFK, BaxterDualArmFK,
                               DualPandaFK)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv('DIFFCO_PALLAS_INTERPRET', '1')


def _setup(robot, key, S=64, B=192):
    k1, k2, k3 = jax.random.split(key, 3)
    q_sup = robot.rand_configs(S, k1)
    sup = robot.fkine(q_sup).reshape(S, -1)
    w = jax.random.normal(k2, (S,)) * 0.05
    q = robot.rand_configs(B, k3)
    return sup, w, q


@pytest.mark.parametrize('robot_cls', [PandaFK, BaxterLeftArmFK])
def test_fused_fk_score_matches_xla_fp32(robot_cls, key):
    robot = robot_cls()
    sup, w, q = _setup(robot, key)
    spec = fk_score.robot_spec(robot)
    score, dq = fk_score._dh_score_grad_pallas(q, sup, w, spec,
                                               use_bf16=False)
    pts = robot.fkine(q, flat=True)
    ref = _poly_score_xla(pts, sup, w).reshape(-1)
    np.testing.assert_allclose(np.asarray(score), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    ref_grad = jax.grad(
        lambda qq: _poly_score_xla(robot.fkine(qq, flat=True),
                                   sup, w).sum())(q)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(ref_grad),
                               rtol=1e-3, atol=1e-3)


def test_custom_vjp_route(key):
    """dh_polyharmonic_score: value + VJP both come from the one fused
    pass (bf16 production precision)."""
    robot = PandaFK()
    sup, w, q = _setup(robot, key)
    spec = fk_score.robot_spec(robot)

    def total(qq):
        return fk_score.dh_polyharmonic_score(qq, sup, w, spec).sum()

    v, g = jax.value_and_grad(total)(q)
    ref_v = _poly_score_xla(robot.fkine(q, flat=True), sup, w).sum()
    ref_g = jax.grad(
        lambda qq: _poly_score_xla(robot.fkine(qq, flat=True),
                                   sup, w).sum())(q)
    assert abs(float(v) - float(ref_v)) / abs(float(ref_v)) < 2e-2
    denom = np.abs(np.asarray(ref_g)).max()
    assert np.abs(np.asarray(g) - np.asarray(ref_g)).max() / denom < 5e-2


def test_auto_router_fallback_matches(key):
    """Off-TPU / small batch the auto router must reproduce the
    FK + fused-score path bit-for-bit (it IS that path)."""
    robot = PandaFK()
    sup, w, q = _setup(robot, key, B=32)
    out = fk_score.fk_polyharmonic_score_auto(q, robot, sup, w)
    ref = _poly_score_xla(robot.fkine(q, flat=True), sup, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # pre-generalization name stays importable
    assert (fk_score.dh_polyharmonic_score_auto
            is fk_score.fk_polyharmonic_score_auto)


# -- analytic FK JVP (robots/fk_jvp.py) ------------------------------------


@pytest.mark.parametrize('robot_cls', [PandaFK, BaxterLeftArmFK,
                                       BaxterDualArmFK, DualPandaFK])
def test_fk_jvp_grad_matches_autodiff(robot_cls, key):
    robot = robot_cls()
    q = robot.rand_configs(16, key)

    def loss_new(qq):
        p = robot.fkine(qq)
        return jnp.sum(jnp.sin(p) * jnp.cos(0.7 * p))

    g_new = jax.grad(loss_new)(q)
    # numeric oracle (independent of both AD paths)
    eps = 1e-4
    q_np = np.asarray(q, np.float64)
    g_num = np.zeros_like(q_np)
    for j in range(q.shape[1]):
        qp = q_np.copy(); qp[:, j] += eps
        qm = q_np.copy(); qm[:, j] -= eps
        g_num[:, j] = (
            np.asarray(jax.vmap(lambda r: loss_new(r[None]))(
                jnp.asarray(qp, jnp.float32)))
            - np.asarray(jax.vmap(lambda r: loss_new(r[None]))(
                jnp.asarray(qm, jnp.float32)))) / (2 * eps)
    denom = np.abs(g_num).max() + 1e-9
    assert np.abs(np.asarray(g_new) - g_num).max() / denom < 1e-2


def test_fk_jvp_second_order(key):
    """fkine must stay twice-differentiable (jax.hessian is used by the
    trust-constr optimizer, optim.py:633): custom_jvp, not custom_vjp."""
    robot = PandaFK()
    q = robot.rand_configs(1, key)[0]

    def loss(qq):
        return robot.fkine(qq.reshape(1, -1)).sum()

    h = jax.hessian(loss)(q)
    h_ref = jax.hessian(
        lambda qq: robot._fkine_soa_autodiff(qq.reshape(1, -1)).sum())(q)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=1e-4, atol=1e-5)


def test_fk_jvp_forward_exact(key):
    robot = PandaFK()
    q = robot.rand_configs(8, key)
    new = robot.fkine(q)
    old = robot._fkine_soa_autodiff(q).reshape(new.shape)
    np.testing.assert_allclose(np.asarray(new), np.asarray(old),
                               rtol=1e-6, atol=1e-6)


# -- general chain FK (make_chain_fkine, URDF hot paths) -------------------


def _urdf(name, **kw):
    import os
    from diffco_tpu import robot_data
    from diffco_tpu.robots.urdf import URDFRobot
    robot_data.ensure_default_assets()
    return URDFRobot(os.path.join(robot_data.data_dir, name), **kw)


@pytest.mark.parametrize('urdf,kw', [
    ('trifinger_simple.urdf', {'setup_acm': False, 'link_spheres': 2}),
    ('lift_rig.urdf', {'setup_acm': False, 'link_spheres': 2}),
])
def test_chain_fkine_matches_scan_fk(urdf, kw, key):
    """The analytic-JVP chain FK must match the pose-scan oracle on
    trees (trifinger) and prismatic+mimic chains (lift_rig), for both
    control points and sphere centers."""
    robot = _urdf(urdf, **kw)
    q = robot.rand_configs(8, key)
    # control points: new path vs old selected-translation path
    new_pts = np.asarray(robot.fkine(q))
    rot, tr = robot.fk_poses(q)
    sel = robot._unique_position_link_indices()
    old_pts = np.asarray(tr[:, sel])
    np.testing.assert_allclose(new_pts, old_pts, rtol=1e-5, atol=1e-6)
    # sphere centers: new path vs the pose-composed formula
    new_c = np.asarray(robot.sphere_centers_world(q))
    R = rot[:, robot.sphere_link_idx]
    t = tr[:, robot.sphere_link_idx]
    c = robot.link_sphere_centers[None, :, None, :]
    old_c = np.asarray(jnp.sum(R * c, axis=-1) + t)
    np.testing.assert_allclose(new_c, old_c, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('urdf,kw', [
    ('trifinger_simple.urdf', {'setup_acm': False, 'link_spheres': 2}),
    ('lift_rig.urdf', {'setup_acm': False, 'link_spheres': 2}),
])
def test_chain_fkine_grad_matches_numeric(urdf, kw, key):
    robot = _urdf(urdf, **kw)
    q = robot.rand_configs(4, key)

    def loss(qq):
        p = robot.fkine(qq)
        return jnp.sum(jnp.sin(p) * jnp.cos(0.7 * p))

    g = np.asarray(jax.grad(loss)(q))
    eps = 1e-4
    q_np = np.asarray(q, np.float64)
    g_num = np.zeros_like(q_np)
    for j in range(q.shape[1]):
        qp = q_np.copy(); qp[:, j] += eps
        qm = q_np.copy(); qm[:, j] -= eps
        g_num[:, j] = (float(loss(jnp.asarray(qp, jnp.float32)))
                       - float(loss(jnp.asarray(qm, jnp.float32)))) / (2 * eps)
    # numeric diff sums over the batch; compare summed analytic grads
    np.testing.assert_allclose(g.sum(0), g_num.sum(0) / q.shape[0] * 1,
                               rtol=5e-2, atol=1e-3)


@pytest.mark.parametrize('urdf,kw', [
    ('panda_simple.urdf', {'setup_acm': False, 'link_spheres': 2}),
    ('trifinger_simple.urdf', {'setup_acm': False, 'link_spheres': 2}),
    ('lift_rig.urdf', {'setup_acm': False, 'link_spheres': 2}),
])
def test_fused_chain_score_matches_xla_fp32(urdf, kw, key):
    """The general-chain Pallas kernel (serial, tree, prismatic+mimic)
    vs the XLA oracle, fp32."""
    robot = _urdf(urdf, **kw)
    sup, w, q = _setup(robot, key, S=32, B=160)
    cs = fk_score.robot_chain_statics(robot)
    score, dq = fk_score._chain_score_grad_pallas(q, sup, w, cs,
                                                  use_bf16=False)
    pts = robot.fkine(q).reshape(q.shape[0], -1)
    ref = _poly_score_xla(pts, sup, w).reshape(-1)
    np.testing.assert_allclose(np.asarray(score), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    ref_grad = jax.grad(
        lambda qq: _poly_score_xla(robot.fkine(qq).reshape(qq.shape[0], -1),
                                   sup, w).sum())(q)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(ref_grad),
                               rtol=1e-3, atol=1e-3)


def test_chain_custom_vjp_route(key):
    robot = _urdf('panda_simple.urdf', setup_acm=False, link_spheres=2)
    sup, w, q = _setup(robot, key, S=32, B=160)
    cs = fk_score.robot_chain_statics(robot)

    def total(qq):
        return fk_score.chain_polyharmonic_score(qq, sup, w, cs).sum()

    v, g = jax.value_and_grad(total)(q)
    ref_v = _poly_score_xla(robot.fkine(q).reshape(q.shape[0], -1),
                            sup, w).sum()
    ref_g = jax.grad(
        lambda qq: _poly_score_xla(robot.fkine(qq).reshape(qq.shape[0], -1),
                                   sup, w).sum())(q)
    assert abs(float(v) - float(ref_v)) / (abs(float(ref_v)) + 1e-9) < 2e-2
    denom = np.abs(np.asarray(ref_g)).max() + 1e-9
    assert np.abs(np.asarray(g) - np.asarray(ref_g)).max() / denom < 5e-2


def test_tile_b_lane_alignment():
    """Batch tiles must be multiples of 256 (the lane dimension of every
    BlockSpec in the fused kernels) and capped at 1024 per the round-3
    tile sweep; non-power-of-two support pads must not produce ragged
    tiles like 2^20 // 1152 = 910."""
    for S in (64, 128, 512, 1024, 1152, 2048, 4096, 5000, 8192):
        tb = fk_score._tile_b(S)
        assert tb % 256 == 0
        assert 256 <= tb <= 1024
    assert fk_score._tile_b(512) == 1024
    assert fk_score._tile_b(1152) == 768
    assert fk_score._tile_b(8192) == 256


@pytest.mark.smoke
def test_multi_class_fused_matches_xla_fp32(key):
    """Multi-class kernel (shared FK + distance sweep, per-class score/su
    rows): scores and per-class config gradients match the XLA
    formulation class by class."""
    robot = PandaFK()
    k1, k2, k3 = jax.random.split(key, 3)
    S, B, C = 64, 192, 3
    q_sup = robot.rand_configs(S, k1)
    sup = robot.fkine(q_sup).reshape(S, -1)
    W = jax.random.normal(k2, (S, C)) * 0.05
    q = robot.rand_configs(B, k3)
    spec = fk_score.robot_spec(robot)
    score, dq = fk_score._dh_multi_score_grad_pallas(q, sup, W, spec,
                                                     use_bf16=False)
    assert score.shape == (B, C) and dq.shape == (C, B, 7)
    for c in range(C):
        ref = _poly_score_xla(robot.fkine(q, flat=True),
                              sup, W[:, c]).reshape(-1)
        np.testing.assert_allclose(np.asarray(score[:, c]),
                                   np.asarray(ref), rtol=1e-4, atol=1e-4)
        ref_grad = jax.grad(
            lambda qq: _poly_score_xla(robot.fkine(qq, flat=True),
                                       sup, W[:, c]).sum())(q)
        np.testing.assert_allclose(np.asarray(dq[c]),
                                   np.asarray(ref_grad),
                                   rtol=1e-3, atol=1e-3)


def test_multi_class_custom_vjp_route(key):
    """dh_polyharmonic_multi_score: the VJP mixes per-class gradients
    with the upstream cotangent (production bf16 precision)."""
    robot = PandaFK()
    k1, k2, k3, k4 = jax.random.split(key, 4)
    S, B, C = 64, 192, 3
    q_sup = robot.rand_configs(S, k1)
    sup = robot.fkine(q_sup).reshape(S, -1)
    W = jax.random.normal(k2, (S, C)) * 0.05
    q = robot.rand_configs(B, k3)
    mix = jax.random.normal(k4, (C,))
    spec = fk_score.robot_spec(robot)

    def total(qq):
        return (fk_score.dh_polyharmonic_multi_score(qq, sup, W, spec)
                * mix[None, :]).sum()

    v, g = jax.value_and_grad(total)(q)

    def ref_total(qq):
        pts = robot.fkine(qq, flat=True)
        return sum(float(mix[c]) * _poly_score_xla(pts, sup, W[:, c]).sum()
                   for c in range(C))

    ref_v = ref_total(q)
    ref_g = jax.grad(ref_total)(q)
    assert abs(float(v) - float(ref_v)) / (abs(float(ref_v)) + 1e-9) < 2e-2
    denom = np.abs(np.asarray(ref_g)).max() + 1e-9
    assert np.abs(np.asarray(g) - np.asarray(ref_g)).max() / denom < 5e-2


def test_chain_multi_class_fused_matches_xla(key):
    """URDF-chain multi-class kernel: per-class scores + cotangent-mixed
    VJP against the XLA formulation."""
    robot = _urdf('panda_simple.urdf', setup_acm=False, link_spheres=2)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    S, B, C = 32, 160, 2
    q_sup = robot.rand_configs(S, k1)
    sup = robot.fkine(q_sup).reshape(S, -1)
    W = jax.random.normal(k2, (S, C)) * 0.05
    q = robot.rand_configs(B, k3)
    mix = jax.random.normal(k4, (C,))
    cs = fk_score.robot_chain_statics(robot)
    score, dq = fk_score._chain_multi_score_grad_pallas(q, sup, W, cs,
                                                        use_bf16=False)
    assert score.shape == (B, C) and dq.shape == (C, B, q.shape[1])
    for c in range(C):
        ref = _poly_score_xla(robot.fkine(q).reshape(B, -1),
                              sup, W[:, c]).reshape(-1)
        np.testing.assert_allclose(np.asarray(score[:, c]),
                                   np.asarray(ref), rtol=1e-4, atol=1e-4)

    def total(qq):
        return (fk_score.chain_polyharmonic_multi_score(qq, sup, W, cs)
                * mix[None, :]).sum()

    def ref_total(qq):
        pts = robot.fkine(qq).reshape(qq.shape[0], -1)
        return sum(float(mix[c]) * _poly_score_xla(pts, sup, W[:, c]).sum()
                   for c in range(C))

    v, g = jax.value_and_grad(total)(q)
    ref_v = ref_total(q)
    ref_g = jax.grad(ref_total)(q)
    assert abs(float(v) - float(ref_v)) / (abs(float(ref_v)) + 1e-9) < 2e-2
    denom = np.abs(np.asarray(ref_g)).max() + 1e-9
    assert np.abs(np.asarray(g) - np.asarray(ref_g)).max() / denom < 5e-2
