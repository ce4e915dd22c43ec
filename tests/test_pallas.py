"""Equivalence tests: Pallas fused kernel vs the jnp oracle (interpret mode
on CPU; the same tests run compiled on real TPU via bench/verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvnerf_tpu.models.nerf_mlp import (
    NerfMLPConfig,
    apply_nerf,
    init_nerf_params,
)
from cvnerf_tpu.ops.encoding import freq_encode
from cvnerf_tpu.ops.pallas.fused_mlp import (
    _enc_layout,
    _encoding_constants,
    _split_rows,
    fused_nerf_apply,
)


def _oracle(params, points, viewdirs, cfg, compute_dtype=jnp.float32):
    xe = freq_encode(points.astype(jnp.float32), cfg.xyz_freqs)
    de = freq_encode(viewdirs.astype(jnp.float32), cfg.dir_freqs)
    return apply_nerf(params, xe, de, cfg, compute_dtype=compute_dtype)


def test_encoding_constants_match_freq_encode():
    """P @ split(x) recovers the fp32 phases 2^k·x BIT-exactly in the
    [id | sin | cos] block layout, and the block-trig form reproduces
    freq_encode under the layout's permutation."""
    L = 4
    rows, sin_rows, perm = _enc_layout(L)
    p = _encoding_constants(L)
    assert p.shape == (rows, 16)
    x = np.random.RandomState(0).randn(5, 3).astype(np.float32)
    x4 = np.concatenate([x, np.zeros((5, 1), np.float32)], -1)
    xs = np.asarray(_split_rows(jnp.asarray(x4.T)), np.float32)   # [16, 5]
    # exact mantissa split: the three slices sum back to x bitwise
    np.testing.assert_array_equal(xs[0:4] + xs[4:8] + xs[8:12], x4.T)
    s = (np.asarray(p, np.float32) @ xs).T                        # [5, rows]
    # phases are bit-exact vs direct 2^k·x (both exponent-shift exact):
    # sin-block row 8+3k+i and cos-block row 8+sin_rows+3k+i hold 2^k·x_i
    for k in range(L):
        np.testing.assert_array_equal(
            s[:, 8 + 3 * k:8 + 3 * k + 3], (2.0 ** k) * x)
        np.testing.assert_array_equal(
            s[:, 8 + sin_rows + 3 * k:8 + sin_rows + 3 * k + 3],
            (2.0 ** k) * x)
    enc = np.concatenate(
        [s[:, 0:8], np.sin(s[:, 8:8 + sin_rows]),
         np.cos(s[:, 8 + sin_rows:])], axis=1)
    expected = np.asarray(freq_encode(jnp.asarray(x), L))
    np.testing.assert_allclose(enc[:, perm], expected, rtol=1e-5, atol=1e-6)
    # pad rows carry only sin(0)=0 / cos(0)=1 / id 0 — inert vs zero weights
    pad = np.setdiff1d(np.arange(rows), perm)
    assert set(np.unique(np.round(enc[:, pad], 7))) <= {0.0, 1.0}


@pytest.mark.parametrize("cfg", [
    NerfMLPConfig(),                                      # full-size
    NerfMLPConfig(xyz_freqs=4, dir_freqs=2,
                  trunk_width=64, head_width=32),         # tiny
])
def test_fused_matches_oracle_fp32(cfg):
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    n = 300  # deliberately not a tile multiple
    pts = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 2
    dirs = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    got = fused_nerf_apply(params, pts, dirs, cfg,
                           compute_dtype=jnp.float32, tile=128,
                           interpret=True)
    want = _oracle(params, pts, dirs, cfg)
    assert got.shape == (n, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_bf16_close_to_fp32_oracle():
    cfg = NerfMLPConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    n = 256
    pts = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 2
    dirs = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    got = fused_nerf_apply(params, pts, dirs, cfg,
                           compute_dtype=jnp.bfloat16, tile=128,
                           interpret=True)
    want = np.asarray(_oracle(params, pts, dirs, cfg))
    got = np.asarray(got)
    # bf16 matmuls: relative agreement, and identical bf16-vs-bf16 behavior
    # is checked against the bf16 oracle below.
    want_bf16 = np.asarray(_oracle(params, pts, dirs, cfg,
                                   compute_dtype=jnp.bfloat16))
    err_vs_bf16 = np.abs(got - want_bf16).max()
    err_vs_fp32 = np.abs(got - want).max()
    assert err_vs_bf16 < 0.15, err_vs_bf16
    assert err_vs_fp32 < 0.3, err_vs_fp32


def test_fused_padding_is_inert():
    # Results for the first n points must not depend on pad-tail contents.
    cfg = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=64,
                        head_width=32)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (130, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (130, 3))
    full = fused_nerf_apply(params, pts, dirs, cfg,
                            compute_dtype=jnp.float32, tile=128,
                            interpret=True)
    head = fused_nerf_apply(params, pts[:100], dirs[:100], cfg,
                            compute_dtype=jnp.float32, tile=128,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(full[:100]), np.asarray(head),
                               rtol=1e-5, atol=1e-5)
