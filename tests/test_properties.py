"""Property and robustness tests across the render/train stack."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig, init_nerf_params
from cvnerf_tpu.ops.encoding import freq_encode
from cvnerf_tpu.ops.sampling import sample_pdf
from cvnerf_tpu.render.renderer import RenderConfig, render_rays

TINY = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=64, head_width=32)


def _rays(n, seed=0):
    k = jax.random.PRNGKey(seed)
    ro = jax.random.normal(jax.random.fold_in(k, 0), (n, 3))
    rd = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd, vd


def test_encoding_finite_at_extremes():
    x = jnp.array([[1e4, -1e4, 0.0], [1e-30, -1e-30, 1.0]])
    out = freq_encode(x, 10)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.abs(np.asarray(out)[:, 3:]) <= 1.0 + 1e-6).all()


def test_sample_pdf_handles_zero_weights():
    # All-zero weights → eps smoothing keeps the pdf valid; samples stay in
    # the bin range, no NaNs (mirrors the reference's eps, utils.py:12-16).
    bins = jnp.linspace(2.0, 6.0, 17)[None, :]
    weights = jnp.zeros((1, 16))
    s = sample_pdf(jax.random.PRNGKey(0), bins, weights, 32)
    s = np.asarray(s)
    assert np.isfinite(s).all()
    assert (s >= 2.0 - 1e-5).all() and (s <= 6.0 + 1e-5).all()


def test_sample_pdf_spiky_pdf_no_nan():
    bins = jnp.linspace(0.0, 1.0, 17)[None, :]
    weights = jnp.zeros((1, 16)).at[0, 7].set(1e10)
    s = np.asarray(sample_pdf(jax.random.PRNGKey(1), bins, weights, 64))
    assert np.isfinite(s).all()


def test_render_grads_finite_under_ndc_and_noise():
    cfg = RenderConfig(n_coarse=8, n_fine=8, perturb=True, noise_std=1.0,
                       mlp=TINY)
    params = {"coarse": init_nerf_params(jax.random.PRNGKey(0), TINY),
              "fine": init_nerf_params(jax.random.PRNGKey(1), TINY)}
    n = 32
    # NDC-style rays: origins near plane, dirs toward -z.
    ro = jnp.concatenate([jax.random.normal(jax.random.PRNGKey(2), (n, 2))
                          * 0.1, -jnp.ones((n, 1))], -1)
    rd = jnp.concatenate([jax.random.normal(jax.random.PRNGKey(3), (n, 2))
                          * 0.01, 2 * jnp.ones((n, 1))], -1)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    def loss(p):
        out = render_rays(jax.random.PRNGKey(4), p, ro, rd, vd,
                          jnp.zeros((n,)), jnp.ones((n,)), cfg)
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["rgb_coarse"] ** 2)

    g = jax.grad(loss)(params)
    for net in g.values():
        for layer in net.values():
            assert np.isfinite(np.asarray(layer["w"])).all()


def test_weights_sum_bounded_through_renderer():
    cfg = RenderConfig(n_coarse=16, n_fine=16, perturb=True, mlp=TINY)
    params = {"coarse": init_nerf_params(jax.random.PRNGKey(0), TINY),
              "fine": init_nerf_params(jax.random.PRNGKey(1), TINY)}
    ro, rd, vd = _rays(64)
    out = render_rays(jax.random.PRNGKey(2), params, ro, rd, vd,
                      jnp.full((64,), 2.0), jnp.full((64,), 6.0), cfg)
    acc = np.asarray(out["acc"])
    assert (acc >= 0).all() and (acc <= 1 + 1e-4).all()
    # Expected depth lies within the sampled interval when opacity > 0.
    depth = np.asarray(out["depth"])
    assert (depth[acc > 0.01] <= 6.0 * (acc[acc > 0.01] + 1e-3)).all()


def test_degenerate_single_ray():
    cfg = RenderConfig(n_coarse=8, n_fine=4, perturb=False, mlp=TINY)
    params = {"coarse": init_nerf_params(jax.random.PRNGKey(0), TINY),
              "fine": init_nerf_params(jax.random.PRNGKey(1), TINY)}
    ro, rd, vd = _rays(1)
    out = render_rays(jax.random.PRNGKey(2), params, ro, rd, vd,
                      jnp.full((1,), 2.0), jnp.full((1,), 6.0), cfg)
    assert out["rgb"].shape == (1, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
