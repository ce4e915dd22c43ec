"""Tests for the reference-shaped convenience API (render with rays=/c2w=)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig, init_nerf_params
from cvnerf_tpu.ops import compute_rays, ray_grid
from cvnerf_tpu.render import RenderConfig, render

TINY = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=64, head_width=32)


def _params():
    return {"coarse": init_nerf_params(jax.random.PRNGKey(0), TINY),
            "fine": init_nerf_params(jax.random.PRNGKey(1), TINY)}


def test_compute_rays_alias():
    c2w = jnp.eye(4)[:3]
    a = compute_rays(4, 6, 8.0, c2w)
    b = ray_grid(4, 6, 8.0, c2w)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_render_with_c2w():
    cfg = RenderConfig(n_coarse=8, n_fine=8, mlp=TINY).eval_mode()
    c2w = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 4.0]])
    rgb, extras = render(jax.random.PRNGKey(0), _params(), 8, 10, 9.0,
                         chunk=64, c2w=c2w, ndc=False, near=2.0, far=6.0,
                         cfg=cfg)
    assert rgb.shape == (8, 10, 3)
    assert extras["rgb_coarse"].shape == (8, 10, 3)
    assert extras["acc"].shape == (8, 10)


def test_render_with_ray_batch_matches_c2w():
    cfg = RenderConfig(n_coarse=8, n_fine=8, mlp=TINY).eval_mode()
    c2w = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 4.0]])
    key = jax.random.PRNGKey(0)
    rgb_img, _ = render(key, _params(), 8, 10, 9.0, chunk=64, c2w=c2w,
                        ndc=False, near=2.0, far=6.0, cfg=cfg)
    rays = ray_grid(8, 10, 9.0, c2w)
    rgb_rays, _ = render(key, _params(), 8, 10, 9.0, chunk=64, rays=rays,
                         ndc=False, near=2.0, far=6.0, cfg=cfg)
    assert rgb_rays.shape == (8, 10, 3)
    np.testing.assert_allclose(np.asarray(rgb_img), np.asarray(rgb_rays),
                               rtol=1e-4, atol=1e-5)


def test_render_requires_exactly_one_source():
    cfg = RenderConfig(n_coarse=4, n_fine=0, mlp=TINY).eval_mode()
    with pytest.raises(ValueError, match="exactly one"):
        render(jax.random.PRNGKey(0), _params(), 8, 8, 9.0, cfg=cfg)


def test_render_defaults_to_ndc_like_reference():
    # The reference render() defaults ndc=True (main.py:49); ours matches.
    cfg = RenderConfig(n_coarse=4, n_fine=0, mlp=TINY).eval_mode()
    c2w = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0.0]])
    key = jax.random.PRNGKey(0)
    default_out, _ = render(key, _params(), 8, 8, 10.0, chunk=64, c2w=c2w,
                            cfg=cfg)
    ndc_out, _ = render(key, _params(), 8, 8, 10.0, chunk=64, c2w=c2w,
                        ndc=True, cfg=cfg)
    non_ndc, _ = render(key, _params(), 8, 8, 10.0, chunk=64, c2w=c2w,
                        ndc=False, cfg=cfg)
    np.testing.assert_array_equal(np.asarray(default_out),
                                  np.asarray(ndc_out))
    assert not np.allclose(np.asarray(default_out), np.asarray(non_ndc))
