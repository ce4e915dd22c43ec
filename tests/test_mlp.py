"""Tests for the NeRF MLP (models/nerf_mlp.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from cvnerf_tpu.models.nerf_mlp import (
    NerfMLPConfig,
    apply_nerf,
    init_nerf_params,
    nerf_param_count,
)


def test_param_shapes_and_count():
    cfg = NerfMLPConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    assert params["l1"]["w"].shape == (63, 256)
    assert params["l6"]["w"].shape == (256 + 63, 256)
    assert params["alpha"]["w"].shape == (256, 1)
    assert params["l10"]["w"].shape == (256 + 27, 128)
    assert params["l11"]["w"].shape == (128, 3)
    # Reference network: 11 linear layers + alpha head ≈ 1.19M params
    # (SURVEY.md C10). Exact count, derived from the layer graph:
    expected = 0
    for fan_in, fan_out in [(63, 256), (256, 256), (256, 256), (256, 256),
                            (256, 256), (319, 256), (256, 256), (256, 256),
                            (256, 256), (256, 1), (283, 128), (128, 3)]:
        expected += fan_in * fan_out + fan_out
    assert nerf_param_count(params) == expected


def test_forward_shape_and_dtype():
    cfg = NerfMLPConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (10, 7, 63))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (10, 7, 27))
    out = apply_nerf(params, xyz, dirs, cfg)
    assert out.shape == (10, 7, 4)
    assert out.dtype == jnp.float32


def test_density_independent_of_viewdir():
    # Core NeRF property: sigma must not depend on the viewing direction
    # (density head branches before the viewdir concat, model.py:100-103).
    cfg = NerfMLPConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (5, 63))
    d1 = jax.random.normal(jax.random.PRNGKey(2), (5, 27))
    d2 = jax.random.normal(jax.random.PRNGKey(3), (5, 27))
    o1 = apply_nerf(params, xyz, d1, cfg)
    o2 = apply_nerf(params, xyz, d2, cfg)
    np.testing.assert_array_equal(np.asarray(o1[..., 3]),
                                  np.asarray(o2[..., 3]))
    assert not np.allclose(np.asarray(o1[..., :3]), np.asarray(o2[..., :3]))


def test_rgb_depends_on_viewdir_through_single_relu_layer():
    # Feature layer l9 has no ReLU; verify the graph is sensitive to it by
    # checking rgb changes when dir encoding changes (view dependence).
    cfg = NerfMLPConfig()
    params = init_nerf_params(jax.random.PRNGKey(4), cfg)
    xyz = jnp.zeros((1, 63))
    rgb0 = apply_nerf(params, xyz, jnp.zeros((1, 27)), cfg)[..., :3]
    rgb1 = apply_nerf(params, xyz, jnp.ones((1, 27)), cfg)[..., :3]
    assert not np.allclose(np.asarray(rgb0), np.asarray(rgb1))


def test_bf16_compute_close_to_fp32():
    cfg = NerfMLPConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (64, 63))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (64, 27))
    full = np.asarray(apply_nerf(params, xyz, dirs, cfg))
    half = np.asarray(apply_nerf(params, xyz, dirs, cfg,
                                 compute_dtype=jnp.bfloat16))
    assert half.dtype == np.float32
    # bf16 matmuls with fp32 accumulation: small relative error.
    np.testing.assert_allclose(half, full, rtol=0.15, atol=0.1)


def test_init_distribution_matches_torch_linear():
    # torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    params = init_nerf_params(jax.random.PRNGKey(7))
    w = np.asarray(params["l2"]["w"])
    bound = 1 / np.sqrt(256)
    assert w.min() >= -bound and w.max() <= bound
    assert abs(w.mean()) < 0.002
    # Uniform std = bound/sqrt(3)
    np.testing.assert_allclose(w.std(), bound / np.sqrt(3), rtol=0.05)


def test_grad_flows_everywhere():
    cfg = NerfMLPConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (16, 63))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (16, 27))

    def loss(p):
        return jnp.mean(apply_nerf(p, xyz, dirs, cfg) ** 2)

    g = jax.grad(loss)(params)
    for name, layer in g.items():
        assert np.isfinite(np.asarray(layer["w"])).all(), name
        assert np.abs(np.asarray(layer["w"])).max() > 0, name
