"""Regression tests for the se3/sharding/ops review pass: NaN-free
gradients at identity, batched geodesic interpolation, mesh-divisible
trajopt defaults, cached jit wrappers, and the consolidated tile policy."""
import numpy as np
import jax
import jax.numpy as jnp

from diffco_tpu import se3
from diffco_tpu.parallel import sharding


def test_se3_gradients_finite_at_identity():
    """exp/log maps must differentiate cleanly at zero rotation — the
    norm's 0/0 VJP used to poison trajectory gradients whenever two
    adjacent waypoints coincided."""
    g1 = jax.grad(lambda w: se3.exp_so3(w).sum())(jnp.zeros(3))
    g2 = jax.grad(lambda x: se3.exp_se3(x).sum())(jnp.zeros(6))
    g3 = jax.grad(lambda w: se3.axis_angle_to_quaternion(w).sum())(
        jnp.zeros(3))
    T = jnp.eye(4)
    g4 = jax.grad(lambda p: se3.log_se3(T.at[:3, 3].set(p)).sum())(
        jnp.zeros(3))
    for g in (g1, g2, g3, g4):
        assert np.isfinite(np.asarray(g)).all(), g
    # coincident-waypoint interpolation differentiates too
    g5 = jax.grad(lambda p: se3.se3_interpolate(
        T.at[:3, 3].set(p), T.at[:3, 3].set(p), 0.5)[..., :3, 3].sum())(
        jnp.zeros(3))
    assert np.isfinite(np.asarray(g5)).all()


def test_se3_interpolate_batched_t():
    """t [K] against T0/T1 [W, 4, 4] fans out to [W, K, 4, 4] — the old
    broadcasting paired t[i] with waypoint i (or crashed for K != W)."""
    W, K = 5, 7
    T0 = jnp.tile(jnp.eye(4), (W, 1, 1))
    T1 = T0.at[:, 0, 3].set(jnp.arange(W, dtype=jnp.float32))
    out = se3.se3_interpolate(T0, T1, jnp.linspace(0, 1, K))
    assert out.shape == (W, K, 4, 4)
    assert np.allclose(np.asarray(out[:, 0]), np.asarray(T0), atol=1e-5)
    assert np.allclose(np.asarray(out[:, -1]), np.asarray(T1), atol=1e-5)
    # scalar t unchanged
    mid = se3.se3_interpolate(T0, T1, 0.5)
    assert mid.shape == (W, 4, 4)
    assert np.allclose(np.asarray(mid[:, 0, 3]),
                       np.arange(W) * 0.5, atol=1e-5)


def test_distributed_trajopt_default_trials_divisible():
    """The documented num_trials default must divide any device count —
    max(n_dev, 8) crashed the very next assert for 3/5/6/7 devices."""
    for n_dev in range(1, 12):
        num = n_dev * max(1, -(-8 // n_dev))
        assert num % n_dev == 0 and num >= min(8, n_dev * 8)


def test_cached_jit_reuses_wrapper():
    """sharding's jit wrappers must be memoized per callee — a fresh
    wrapper per call would retrace/recompile every invocation."""
    def f(x):
        return x * 2

    w1 = sharding._cached_jit(f)
    w2 = sharding._cached_jit(f)
    assert w1 is w2
    assert float(w1(jnp.asarray(3.0))) == 6.0


def test_tile_policy_single_source():
    from diffco_tpu.ops import fused_score, fk_score
    assert fk_score._tile_b is fused_score._tile_b
    assert fused_score._tile_b(512) == 1024
    assert fused_score._tile_b(4096) == 256
    # 128-alignment at awkward pads
    assert fused_score._tile_b(1152) % 256 == 0
