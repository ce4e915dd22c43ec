"""Validates the production multi-chip configuration: the Pallas fused MLP
(interpret mode) running inside shard_map on the 8-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
from cvnerf_tpu.parallel.mesh import make_mesh
from cvnerf_tpu.render.renderer import RenderConfig
from cvnerf_tpu.train.loop import TrainConfig, make_train_step
from cvnerf_tpu.train.state import create_train_state

TINY = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=64, head_width=32)


def _cfg(pallas):
    return TrainConfig(
        height=16, width=16, focal=16.0, near=2.0, far=6.0,
        n_rays=64, lr=5e-3, lr_decay=250,
        render=RenderConfig(n_coarse=8, n_fine=8, perturb=True,
                            noise_std=1.0, mlp=TINY, pallas=pallas))


def _scene():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)[:3]] * 2)
    poses[:, 2, 3] = 4.0
    return images, jnp.asarray(poses)


def test_pallas_inside_shard_map_matches_jnp_path():
    mesh = make_mesh()
    images, poses = _scene()
    idx = jnp.arange(2, dtype=jnp.int32)

    def run(pallas):
        state = create_train_state(jax.random.PRNGKey(0), lr=5e-3,
                                   lr_decay=250, mlp=TINY)
        step = make_train_step(_cfg(pallas), mesh)
        metrics = None
        for i in range(2):
            state, metrics = step(state, jax.random.PRNGKey(i), images,
                                  poses, idx, False)
        return state, metrics

    s_jnp, m_jnp = run("off")
    s_pal, m_pal = run("interpret")
    # Same math through the kernel: losses and updated params agree to fp32
    # tolerance (kernel runs fp32 in these tests).
    np.testing.assert_allclose(float(m_pal["loss"]), float(m_jnp["loss"]),
                               rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(s_pal.params["fine"]["l6"]["w"]),
        np.asarray(s_jnp.params["fine"]["l6"]["w"]), rtol=5e-2, atol=1e-4)
