"""Tests for full-frame and pose-sequence rendering (render/frames.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig, init_nerf_params
from cvnerf_tpu.render.frames import render_image, render_poses_to_frames
from cvnerf_tpu.render.renderer import RenderConfig

TINY = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=64, head_width=32)


def _params():
    return {"coarse": init_nerf_params(jax.random.PRNGKey(0), TINY),
            "fine": init_nerf_params(jax.random.PRNGKey(1), TINY)}


def _cfg():
    return RenderConfig(n_coarse=8, n_fine=8, mlp=TINY).eval_mode()


def test_render_image_shape_and_determinism():
    params, cfg = _params(), _cfg()
    c2w = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 4.0]])
    a = render_image(jax.random.PRNGKey(3), params, 12, 16, 14.0, c2w,
                     2.0, 6.0, cfg, chunk=64)
    b = render_image(jax.random.PRNGKey(3), params, 12, 16, 14.0, c2w,
                     2.0, 6.0, cfg, chunk=32)
    assert a["rgb"].shape == (12, 16, 3)
    assert a["acc"].shape == (12, 16)
    # chunk size must not change the image (per-ray RNG).
    np.testing.assert_allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]),
                               rtol=1e-4, atol=1e-5)


def test_render_image_ndc_path():
    params, cfg = _params(), _cfg()
    c2w = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0.0]])
    out = render_image(jax.random.PRNGKey(0), params, 8, 8, 10.0, c2w,
                       0.0, 1.0, cfg, ndc=True, chunk=64)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    out_ref = render_image(jax.random.PRNGKey(0), params, 8, 8, 10.0, c2w,
                           0.0, 1.0, cfg, ndc=True,
                           ndc_variant="reference", chunk=64)
    assert not np.allclose(np.asarray(out["rgb"]), np.asarray(out_ref["rgb"]))


def test_render_poses_to_frames_order_and_callback():
    params, cfg = _params(), _cfg()
    poses = []
    for z in (3.0, 4.0, 5.0, 6.0):
        p = np.eye(4, dtype=np.float32)
        p[2, 3] = z
        poses.append(p)
    seen = []
    frames = render_poses_to_frames(
        jax.random.PRNGKey(0), params, poses, 8, 8, 10.0, 2.0, 6.0, cfg,
        chunk=64, on_frame=lambda i, rgb: seen.append((i, rgb.mean())))
    assert frames.shape == (4, 8, 8, 3)
    # Callbacks fire once per frame, in order.
    assert [i for i, _ in seen] == [0, 1, 2, 3]
    # Frames from different camera distances differ.
    assert not np.allclose(frames[0], frames[3])


def test_render_poses_factor_downscale():
    params, cfg = _params(), _cfg()
    p = np.eye(4, dtype=np.float32)
    p[2, 3] = 4.0
    frames = render_poses_to_frames(
        jax.random.PRNGKey(0), params, [p], 16, 16, 10.0, 2.0, 6.0, cfg,
        chunk=64, factor=2)
    assert frames.shape == (1, 8, 8, 3)


def test_render_poses_frame_keys_extras():
    """frame_keys collects depth/acc alongside rgb (used for disparity
    videos) and matches the rgb-only return bitwise."""
    params, cfg = _params(), _cfg()
    poses = []
    for z in (3.0, 5.0):
        p = np.eye(4, dtype=np.float32)
        p[2, 3] = z
        poses.append(p)
    rgb_only = render_poses_to_frames(
        jax.random.PRNGKey(0), params, poses, 8, 8, 10.0, 2.0, 6.0, cfg,
        chunk=64)
    out = render_poses_to_frames(
        jax.random.PRNGKey(0), params, poses, 8, 8, 10.0, 2.0, 6.0, cfg,
        chunk=64, frame_keys=("rgb", "depth", "acc"))
    assert set(out) == {"rgb", "depth", "acc"}
    np.testing.assert_array_equal(out["rgb"], rgb_only)
    assert out["depth"].shape == (2, 8, 8)
    assert out["acc"].shape == (2, 8, 8)
    assert np.isfinite(out["depth"]).all() and np.isfinite(out["acc"]).all()


def test_render_poses_empty_frame_keys_shapes():
    params, cfg = _params(), _cfg()
    out = render_poses_to_frames(
        jax.random.PRNGKey(0), params, [], 8, 8, 10.0, 2.0, 6.0, cfg,
        chunk=64, frame_keys=("rgb", "depth", "acc"))
    assert out["rgb"].shape == (0, 8, 8, 3)
    assert out["depth"].shape == (0, 8, 8)
    assert out["acc"].shape == (0, 8, 8)
