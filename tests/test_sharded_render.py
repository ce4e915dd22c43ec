"""Mesh-sharded full-frame rendering: identical pixels on 1 vs 8 devices."""

import jax
import jax.numpy as jnp
import numpy as np

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig, init_nerf_params
from cvnerf_tpu.parallel.mesh import make_mesh, replicated_sharding
from cvnerf_tpu.render.frames import render_image
from cvnerf_tpu.render.renderer import RenderConfig

TINY = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=64, head_width=32)


def test_sharded_render_matches_single_device():
    mesh = make_mesh()
    params = {"coarse": init_nerf_params(jax.random.PRNGKey(0), TINY),
              "fine": init_nerf_params(jax.random.PRNGKey(1), TINY)}
    params_rep = jax.device_put(params, replicated_sharding(mesh))
    # Stochastic resampling on (eval mode keeps it, like the reference) —
    # per-ray RNG must make sharded == unsharded.
    cfg = RenderConfig(n_coarse=8, n_fine=8, mlp=TINY).eval_mode()
    c2w = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 4.0]])

    single = render_image(jax.random.PRNGKey(2), params, 16, 16, 16.0, c2w,
                          2.0, 6.0, cfg, chunk=128)
    sharded = render_image(jax.random.PRNGKey(2), params_rep, 16, 16, 16.0,
                           c2w, 2.0, 6.0, cfg, chunk=128, mesh=mesh)
    np.testing.assert_allclose(np.asarray(single["rgb"]),
                               np.asarray(sharded["rgb"]),
                               rtol=1e-4, atol=1e-5)


def test_sharded_render_rejects_bad_chunk():
    mesh = make_mesh()
    params = {"coarse": init_nerf_params(jax.random.PRNGKey(0), TINY),
              "fine": init_nerf_params(jax.random.PRNGKey(1), TINY)}
    cfg = RenderConfig(n_coarse=4, n_fine=0, mlp=TINY).eval_mode()
    c2w = jnp.eye(4)[:3]
    import pytest
    with pytest.raises(ValueError, match="divisible"):
        render_image(jax.random.PRNGKey(0), params, 8, 8, 8.0, c2w,
                     2.0, 6.0, cfg, chunk=100, mesh=mesh)
