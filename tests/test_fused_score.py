"""Parity tests for the fused score kernels.

The Pallas kernel bodies run through the interpreter on CPU
(DIFFCO_PALLAS_INTERPRET=1), so the exact production kernel code is
exercised against the XLA formulation — the on-TPU A/B timing lives in
benchmarks/fused_ab.json via scripts/bench_fused_ab.py.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffco_tpu.ops import fused_score as fs


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv('DIFFCO_PALLAS_INTERPRET', '1')


@pytest.fixture
def data(key):
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (300, 21))
    s = jax.random.normal(k2, (128, 21))
    w = jax.random.normal(k3, (128,)) * 0.05
    return x, s, w


def test_fused_fwd_matches_xla_fp32(data):
    x, s, w = data
    score, dx = fs._poly_score_grad_pallas(x, s, w, use_bf16=False)
    ref = fs._poly_score_xla(x, s, w).reshape(-1)
    assert np.allclose(np.asarray(score), np.asarray(ref),
                       rtol=1e-4, atol=1e-4)


def test_fused_grad_matches_autodiff_fp32(data):
    x, s, w = data
    _, dx = fs._poly_score_grad_pallas(x, s, w, use_bf16=False)
    ref_grad = jax.grad(
        lambda q: fs._poly_score_xla(q, s, w).sum())(x)
    assert np.allclose(np.asarray(dx), np.asarray(ref_grad),
                       rtol=1e-3, atol=1e-3)


def test_fused_bf16_close(data):
    """bf16 MXU inputs: the production precision — relative error must
    stay well under the DiffCo safety-bias scale."""
    x, s, w = data
    score, _ = fs._poly_score_grad_pallas(x, s, w, use_bf16=True)
    ref = fs._poly_score_xla(x, s, w).reshape(-1)
    denom = np.max(np.abs(np.asarray(ref)))
    rel = np.max(np.abs(np.asarray(score) - np.asarray(ref))) / denom
    assert rel < 2e-2, f'bf16 relative error {rel}'


def test_custom_vjp_path(data):
    """value_and_grad through polyharmonic_score_fused == XLA autodiff."""
    x, s, w = data
    v1, g1 = jax.value_and_grad(
        lambda q: fs.polyharmonic_score_fused(q, s, w).sum())(x)
    v2, g2 = jax.value_and_grad(
        lambda q: fs._poly_score_xla(q, s, w).sum())(x)
    assert np.allclose(float(v1), float(v2), rtol=1e-2)
    denom = np.max(np.abs(np.asarray(g2))) + 1e-9
    assert np.max(np.abs(np.asarray(g1) - np.asarray(g2))) / denom < 2e-2


def test_xla_bf16_close(data):
    x, s, w = data
    ref = fs._poly_score_xla(x, s, w).reshape(-1)
    got = fs._poly_score_xla(x, s, w, bf16=True).reshape(-1)
    denom = np.max(np.abs(np.asarray(ref)))
    assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) / denom < 2e-2


def test_polyharmonic_score_mask_epsilon(data):
    x, s, w = data
    mask = jnp.arange(128) < 100
    got = fs.polyharmonic_score(x, s, w, valid_mask=mask,
                                epsilon=2.0).reshape(-1)
    ref = fs._poly_score_xla(
        x, s, w * mask / 2.0).reshape(-1)
    assert np.allclose(np.asarray(got), np.asarray(ref),
                       rtol=1e-4, atol=1e-4)


def test_non_divisible_batch(key):
    """Batch not a multiple of the tile: padding must be trimmed exactly."""
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (37, 9))
    s = jax.random.normal(k2, (64, 9))
    w = jax.random.normal(k3, (64,))
    score, dx = fs._poly_score_grad_pallas(x, s, w, use_bf16=False)
    assert score.shape == (37,)
    assert dx.shape == (37, 9)
    ref = fs._poly_score_xla(x, s, w).reshape(-1)
    assert np.allclose(np.asarray(score), np.asarray(ref),
                       rtol=1e-4, atol=1e-4)


def test_rq_score_matches_kernel_formula(key):
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (50, 6))
    s = jax.random.normal(k2, (32, 6))
    w = jax.random.normal(k3, (32,))
    got = fs.rq_score(x, s, w, gamma=10.0, p=2).reshape(-1)
    d2 = jnp.sum((x[:, None] - s[None]) ** 2, axis=-1)
    ref = ((1.0 + 5.0 * d2) ** -2) @ w
    assert np.allclose(np.asarray(got), np.asarray(ref),
                       rtol=1e-3, atol=1e-3)
