"""Tests for volume rendering / alpha compositing (ops/compositing.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from cvnerf_tpu.ops.compositing import volume_render


def _manual_composite(raw, t, dirs, white_bkg=False):
    """Straight numpy re-derivation of reference main.py:170-204."""
    deltas = t[..., 1:] - t[..., :-1]
    deltas = np.concatenate([deltas, np.full_like(deltas[..., :1], 1e10)], -1)
    deltas = deltas * np.linalg.norm(dirs[..., None, :], axis=-1)
    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    alpha = 1.0 - np.exp(-np.maximum(raw[..., 3], 0.0) * deltas)
    ones = np.ones_like(alpha[..., :1])
    trans = np.cumprod(np.concatenate([ones, 1 - alpha + 1e-10], -1),
                       -1)[..., :-1]
    weights = alpha * trans
    out = (weights[..., None] * rgb).sum(-2)
    acc = weights.sum(-1)
    if white_bkg:
        out = out + (1 - acc[..., None])
    return out, weights, acc


def test_matches_manual_derivation():
    rng = np.random.RandomState(0)
    raw = rng.randn(6, 9, 4).astype(np.float32)
    t = np.sort(rng.rand(6, 9).astype(np.float32), -1) * 4 + 2
    dirs = rng.randn(6, 3).astype(np.float32)
    out = volume_render(jnp.asarray(raw), jnp.asarray(t), jnp.asarray(dirs))
    exp_rgb, exp_w, exp_acc = _manual_composite(raw, t, dirs)
    # float32 cumprod ordering differences bound the match to ~1e-5.
    np.testing.assert_allclose(np.asarray(out["rgb"]), exp_rgb, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["weights"]), exp_w, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["acc"]), exp_acc, rtol=1e-4,
                               atol=1e-5)


def test_weights_are_valid_pdf_prefix():
    # Transmittance weights are nonnegative and sum to ≤ 1 (+tiny eps slack).
    rng = np.random.RandomState(1)
    raw = rng.randn(16, 32, 4).astype(np.float32) * 3
    t = np.cumsum(np.abs(rng.rand(16, 32)) + 0.01, -1).astype(np.float32)
    dirs = rng.randn(16, 3).astype(np.float32)
    out = volume_render(jnp.asarray(raw), jnp.asarray(t), jnp.asarray(dirs))
    w = np.asarray(out["weights"])
    assert (w >= 0).all()
    assert (w.sum(-1) <= 1.0 + 1e-4).all()


def test_opaque_first_sample_dominates():
    # A huge density at the first sample → pixel color = sigmoid(rgb_0).
    raw = np.zeros((1, 4, 4), np.float32)
    raw[0, 0, :3] = [5.0, -5.0, 0.0]
    raw[0, 0, 3] = 1e6
    t = np.array([[1.0, 2.0, 3.0, 4.0]], np.float32)
    dirs = np.array([[0.0, 0.0, -1.0]], np.float32)
    out = volume_render(jnp.asarray(raw), jnp.asarray(t), jnp.asarray(dirs))
    expected = 1 / (1 + np.exp(-np.array([5.0, -5.0, 0.0])))
    np.testing.assert_allclose(np.asarray(out["rgb"][0]), expected, atol=1e-5)


def test_empty_space_white_background():
    raw = np.zeros((2, 8, 4), np.float32)
    raw[..., 3] = -100.0  # relu → zero density everywhere
    t = np.broadcast_to(np.linspace(2, 6, 8, dtype=np.float32), (2, 8)).copy()
    dirs = np.array([[0, 0, -1.0], [0, 1.0, 0]], np.float32)
    out = volume_render(jnp.asarray(raw), jnp.asarray(t), jnp.asarray(dirs),
                        white_bkg=True)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-5)
    out2 = volume_render(jnp.asarray(raw), jnp.asarray(t), jnp.asarray(dirs),
                         white_bkg=False)
    np.testing.assert_allclose(np.asarray(out2["rgb"]), 0.0, atol=1e-5)


def test_density_noise_changes_output_stochastically():
    rng = np.random.RandomState(2)
    raw = rng.randn(4, 16, 4).astype(np.float32)
    t = np.broadcast_to(np.linspace(2, 6, 16, dtype=np.float32),
                        (4, 16)).copy()
    dirs = rng.randn(4, 3).astype(np.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a = volume_render(jnp.asarray(raw), jnp.asarray(t), jnp.asarray(dirs),
                      key=k1, noise_std=1.0)
    b = volume_render(jnp.asarray(raw), jnp.asarray(t), jnp.asarray(dirs),
                      key=k2, noise_std=1.0)
    c = volume_render(jnp.asarray(raw), jnp.asarray(t), jnp.asarray(dirs),
                      key=k1, noise_std=1.0)
    assert not np.allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]))
    np.testing.assert_array_equal(np.asarray(a["rgb"]), np.asarray(c["rgb"]))


def test_jit_and_grad_clean():
    # The composite must be differentiable w.r.t. raw with no NaNs.
    rng = np.random.RandomState(3)
    raw = jnp.asarray(rng.randn(8, 12, 4).astype(np.float32))
    t = jnp.asarray(np.broadcast_to(
        np.linspace(2, 6, 12, dtype=np.float32), (8, 12)).copy())
    dirs = jnp.asarray(rng.randn(8, 3).astype(np.float32))

    def loss(r):
        return jnp.mean(volume_render(r, t, dirs)["rgb"] ** 2)

    g = jax.jit(jax.grad(loss))(raw)
    assert np.isfinite(np.asarray(g)).all()
