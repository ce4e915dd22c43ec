"""Gradient-equivalence tests: Pallas fused backward vs jax.grad of the jnp
oracle (interpret mode on CPU)."""

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
from cvnerf_tpu.ops.pallas.fused_mlp_bwd import fused_nerf_train_apply

TINY = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=64, head_width=32)


def _setup(cfg, n=200, seed=0):
    params = init_nerf_params(jax.random.PRNGKey(seed), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 3)) * 2
    dirs = jax.random.normal(jax.random.PRNGKey(seed + 2), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    tgt = jax.random.uniform(jax.random.PRNGKey(seed + 3), (n, 4))
    return params, pts, dirs, tgt


def _oracle_loss(params, pts, dirs, tgt, cfg):
    xe = freq_encode(pts, cfg.xyz_freqs)
    de = freq_encode(dirs, cfg.dir_freqs)
    out = apply_nerf(params, xe, de, cfg, compute_dtype=jnp.float32)
    return jnp.mean((out - tgt) ** 2)


def _fused_loss(params, pts, dirs, tgt, cfg):
    out = fused_nerf_train_apply(params, pts, dirs, cfg, jnp.float32, 128,
                                 True)
    return jnp.mean((out - tgt) ** 2)


@pytest.mark.parametrize("cfg", [TINY, NerfMLPConfig()])
def test_param_grads_match_oracle(cfg):
    params, pts, dirs, tgt = _setup(cfg)
    g_oracle = jax.grad(_oracle_loss)(params, pts, dirs, tgt, cfg)
    g_fused = jax.grad(_fused_loss)(params, pts, dirs, tgt, cfg)

    assert set(g_fused.keys()) == set(g_oracle.keys())
    for name in g_oracle:
        for k in ("w", "b"):
            a = np.asarray(g_oracle[name][k])
            b = np.asarray(g_fused[name][k])
            assert a.shape == b.shape, (name, k, a.shape, b.shape)
            scale = max(np.abs(a).max(), 1e-8)
            np.testing.assert_allclose(
                b / scale, a / scale, rtol=0, atol=2e-3,
                err_msg=f"{name}/{k}")


def test_bf16_param_grads_close_to_oracle():
    """The production --bf16 training path: bf16 kernel gradients must track
    the fp32 oracle to bf16 tolerance (relative to each layer's scale)."""
    cfg = TINY
    params, pts, dirs, tgt = _setup(cfg)

    def bf16_loss(p):
        out = fused_nerf_train_apply(p, pts, dirs, cfg, jnp.bfloat16, 128,
                                     True)
        return jnp.mean((out - tgt) ** 2)

    g_oracle = jax.grad(_oracle_loss)(params, pts, dirs, tgt, cfg)
    g_bf16 = jax.grad(bf16_loss)(params)
    for name in g_oracle:
        for k in ("w", "b"):
            a = np.asarray(g_oracle[name][k])
            b = np.asarray(g_bf16[name][k])
            scale = max(np.abs(a).max(), 1e-8)
            # Interpret mode quantizes to true bf16 (no TPU excess
            # precision), so per-element error can reach ~2^-4 of the
            # layer's gradient scale.
            np.testing.assert_allclose(
                b / scale, a / scale, rtol=0, atol=8e-2,
                err_msg=f"{name}/{k}")
            # Gradients are alive, not zeroed by a bad mask/cast.
            assert np.abs(b).max() > 0, (name, k)


def test_value_matches_forward():
    params, pts, dirs, tgt = _setup(TINY)
    v_fused = float(_fused_loss(params, pts, dirs, tgt, TINY))
    v_oracle = float(_oracle_loss(params, pts, dirs, tgt, TINY))
    np.testing.assert_allclose(v_fused, v_oracle, rtol=1e-4)


def test_point_grads_are_zero_by_contract():
    params, pts, dirs, tgt = _setup(TINY)

    def loss_wrt_pts(p):
        out = fused_nerf_train_apply(params, p, dirs, TINY, jnp.float32,
                                     128, True)
        return jnp.mean((out - tgt) ** 2)

    g = jax.grad(loss_wrt_pts)(pts)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_grads_accumulate_across_tiles():
    # n spanning multiple grid steps must equal the sum of per-chunk grads.
    cfg = TINY
    params, pts, dirs, tgt = _setup(cfg, n=384)

    g_full = jax.grad(_fused_loss)(params, pts, dirs, tgt, cfg)

    # Mean over 384 = weighted mean of two halves.
    g_a = jax.grad(_fused_loss)(params, pts[:192], dirs[:192], tgt[:192],
                                cfg)
    g_b = jax.grad(_fused_loss)(params, pts[192:], dirs[192:], tgt[192:],
                                cfg)
    combined = jax.tree.map(lambda a, b: 0.5 * (a + b), g_a, g_b)
    for (name, layer), (_, layer_c) in zip(
            sorted(g_full.items()), sorted(combined.items())):
        np.testing.assert_allclose(np.asarray(layer["w"]),
                                   np.asarray(layer_c["w"]),
                                   rtol=1e-3, atol=1e-6, err_msg=name)
