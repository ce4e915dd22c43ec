"""Cross-image ray batching (--ray_batching).

A flag-gated deviation from the reference trainer: each step samples
n_rays (image, pixel) pairs jointly without replacement over the WHOLE
train split (the original NeRF paper's training mode for real captures),
instead of the reference's one-random-image-per-step (``main.py:347-349``).
These tests pin: the joint draw is distinct and uniform over the pool, the
per-ray camera geometry matches the single-camera generator, the step
trains, scan blocks stay bitwise-equal, and the mesh path matches meshless
to the established tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
from cvnerf_tpu.ops.rays import rays_for_pixels, rays_for_pixels_batched
from cvnerf_tpu.render.renderer import RenderConfig
from cvnerf_tpu.train.loop import TrainConfig, Trainer
from cvnerf_tpu.train.state import create_train_state

TINY_MLP = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=64,
                         head_width=32)


def _scene(n=4, h=16, w=16):
    rng = np.random.RandomState(0)
    images = rng.rand(n, h, w, 3).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)[:3]] * n)
    poses[:, 2, 3] = 4.0
    poses[:, 0, 3] = np.linspace(-1, 1, n)   # distinct cameras
    return images, poses


def _cfg(**kw):
    defaults = dict(
        height=16, width=16, focal=16.0, near=2.0, far=6.0,
        n_rays=128, lr=5e-4, lr_decay=250, ray_batching=True,
        render=RenderConfig(n_coarse=8, n_fine=8, perturb=True,
                            noise_std=0.0, mlp=TINY_MLP),
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def _trainer(cfg, images, poses, train_idx=None, steps_per_call=1,
             mesh=None):
    state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                               lr_decay=cfg.lr_decay, mlp=TINY_MLP)
    idx = list(range(len(images))) if train_idx is None else train_idx
    return Trainer(cfg, state, images, poses, idx, seed=0, mesh=mesh,
                   steps_per_call=steps_per_call)


def test_batched_rays_match_single_camera_generator():
    """Per-ray-camera generation equals looping rays_for_pixels over the
    cameras (same pinhole math, just batched)."""
    images, poses = _scene()
    key = jax.random.PRNGKey(3)
    px = jax.random.randint(jax.random.fold_in(key, 0), (32,), 0, 16)
    py = jax.random.randint(jax.random.fold_in(key, 1), (32,), 0, 16)
    cam = jax.random.randint(jax.random.fold_in(key, 2), (32,), 0, 4)
    c2w = jnp.asarray(poses)[cam]
    o_b, d_b = rays_for_pixels_batched(px, py, 16, 16, 16.0, c2w)
    for i in range(32):
        o_1, d_1 = rays_for_pixels(px[i], py[i], 16, 16, 16.0,
                                   jnp.asarray(poses[int(cam[i])]))
        np.testing.assert_allclose(np.asarray(o_b[i]), np.asarray(o_1),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(d_b[i]), np.asarray(d_1),
                                   rtol=1e-6)


def test_batched_step_trains_and_mixes_images():
    """The batching step runs, the loss is finite, params move, and —
    because each batch spans the split — a one-image dataset and the full
    dataset give DIFFERENT losses at the same key (the draw really spans
    images)."""
    images, poses = _scene()
    tr = _trainer(_cfg(), images, poses)
    m = tr.run(1, 6)
    assert np.isfinite(m["loss"]) and m["grad_norm"] > 0

    tr1 = _trainer(_cfg(), images, poses, train_idx=[0])
    m1 = tr1.run(1, 2)
    tr4 = _trainer(_cfg(), images, poses)
    m4 = tr4.run(1, 2)
    assert m1["loss"] != m4["loss"]


def test_batched_scan_matches_single_step_bitwise():
    images, poses = _scene()
    cfg = _cfg(n_rays=32)

    def run(steps_per_call):
        tr = _trainer(cfg, images, poses, steps_per_call=steps_per_call)
        m = tr.run(1, 9)
        return tr.state, m

    s1, m1 = run(1)
    s4, m4 = run(4)
    assert m1["loss"] == m4["loss"]
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batched_mesh_matches_meshless():
    """shard_map over the ray axis with per-ray cameras matches meshless to
    the allreduce tolerance (reduction order differs; cf.
    tests/test_sharding.py)."""
    from cvnerf_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    if mesh is None or mesh.devices.size < 2:
        pytest.skip("needs the multi-device CPU test mesh")
    images, poses = _scene()
    cfg = _cfg(n_rays=64)

    def run(m):
        tr = _trainer(cfg, images, poses, mesh=m)
        out = tr.run(1, 5)
        return jax.tree.map(np.asarray, tr.state.params), out

    p_mesh, m_mesh = run(mesh)
    p_none, m_none = run(None)
    np.testing.assert_allclose(m_mesh["loss"], m_none["loss"], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_mesh), jax.tree.leaves(p_none)):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_batched_draw_is_distinct_and_spans_pool():
    """The joint (image, pixel) draw is distinct (PRP bijectivity over the
    n_train*H*W domain) and covers multiple images per batch."""
    from cvnerf_tpu.ops.rng import sample_without_replacement
    n, h, w = 4, 16, 16
    flat = np.asarray(sample_without_replacement(jax.random.PRNGKey(7),
                                                 512, n * h * w))
    assert len(np.unique(flat)) == 512
    assert (flat >= 0).all() and (flat < n * h * w).all()
    imgs = np.unique(flat // (h * w))
    assert len(imgs) == n, "a 512-ray batch over 4 images should span all"


def test_batched_precrop_uses_single_image_semantics():
    """Precrop warm-up steps keep the reference's single-image center crop
    even under ray batching (a center crop is per-image by construction):
    a precrop step with batching on equals the same step with batching
    off, bitwise."""
    images, poses = _scene()
    kw = dict(n_rays=16, precrop_iters=5, precrop_frac=0.5)
    tr_b = _trainer(_cfg(**kw), images, poses)
    tr_n = _trainer(_cfg(ray_batching=False, **kw), images, poses)
    m_b = tr_b.run(1, 3)   # steps 1-2 < precrop_iters -> precrop=True
    m_n = tr_n.run(1, 3)
    assert m_b["loss"] == m_n["loss"]
    for a, b in zip(jax.tree.leaves(tr_b.state.params),
                    jax.tree.leaves(tr_n.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batched_pool_validation():
    images, poses = _scene(n=2, h=4, w=4)
    with pytest.raises(ValueError, match="ray-batching pool"):
        _trainer(_cfg(n_rays=64, height=4, width=4), images, poses)


def test_batching_composes_with_occ_train():
    """--ray_batching and --occ_train are orthogonal: the occ step variant
    with cross-image batching trains the fine net and keeps the coarse one
    frozen."""
    from cvnerf_tpu.render.occupancy import bake_scene_occupancy
    images, poses = _scene()
    import dataclasses
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, occupancy_mode="full"))
    tr = _trainer(cfg, images, poses)
    tr.run(1, 3)
    coarse_before = jax.tree.map(np.asarray, tr.state.params["coarse"])
    # Install directly (set_occupancy): the composition under test is the
    # step math; whether this micro-fixture's 2-step bake clears the
    # empty-grid guard is covered by test_occ_train.
    tr.set_occupancy(bake_scene_occupancy(
        tr.state.params, TINY_MLP, ndc=False, bound=1.5, n_fine=8,
        resolution=8))
    m = tr.run(3, 7)
    assert np.isfinite(m["loss"])
    for a, b in zip(jax.tree.leaves(coarse_before),
                    jax.tree.leaves(jax.tree.map(
                        np.asarray, tr.state.params["coarse"]))):
        np.testing.assert_array_equal(a, b)


def test_cli_flag_roundtrip(tmp_path):
    """--ray_batching trains end-to-end through the CLI."""
    import os, sys
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_blender_dataset
    import main as cli

    d = str(tmp_path / "scene")
    make_blender_dataset(d, n_train=3, n_val=1, n_test=1, h=16, w=16)
    logdir = str(tmp_path / "logs_rb")
    cli.main(["--data_dir", d, "--base_dir", logdir, "--save_dir", logdir,
              "--name", "rb", "--no-bf16", "--dtype", "blender",
              "--testskip", "1", "--n_rays", "32",
              "--n_coarse_samples", "4", "--n_fine_samples", "4",
              "--trunk_width", "32", "--head_width", "16",
              "--xyz_freqs", "2", "--dir_freqs", "2", "--chunk", "128",
              "--print_freq", "3", "--vid_freq", "0", "--val_freq", "0",
              "--iters", "6", "--ckpt_freq", "0", "--ray_batching"])
    import json
    cfg_path = os.path.join(logdir, "rb", "config_resolved.json")
    assert json.load(open(cfg_path))["ray_batching"] is True
