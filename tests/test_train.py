"""Tests for the training layer: state, LR schedule, jitted step, overfit."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
from cvnerf_tpu.render.renderer import RenderConfig
from cvnerf_tpu.train.loop import TrainConfig, Trainer, make_train_step
from cvnerf_tpu.train.state import (
    create_train_state,
    make_lr_schedule,
)

TINY_MLP = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=64,
                         head_width=32)


def _tiny_cfg(**kw):
    # noise_std=1.0 matters: with a tiny randomly-initialized net the
    # density can start negative everywhere, and relu then kills every
    # gradient (the reference has the same property; its fern config trains
    # with noise=1. for exactly this reason). The density noise keeps some
    # alphas alive at init.
    defaults = dict(
        height=16, width=16, focal=16.0, near=2.0, far=6.0,
        n_rays=128, lr=5e-3, lr_decay=250,
        render=RenderConfig(n_coarse=8, n_fine=8, perturb=True,
                            noise_std=1.0, mlp=TINY_MLP),
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def _tiny_scene(h=16, w=16):
    """One synthetic view: a smooth color gradient target image and an
    identity-rotation camera at z=4 looking down -z."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack([xx / w, yy / h, 0.5 * np.ones_like(xx)],
                   -1).astype(np.float32)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]],
                    np.float32)
    return img[None], pose[None]


def test_lr_schedule_matches_reference_formula():
    # reference: lr * 0.1 ** (i / (1000 * lr_decay)), main.py:276-277.
    sched = make_lr_schedule(5e-4, 250)
    for step in [0, 1, 100, 50000, 250000]:
        expected = 5e-4 * 0.1 ** (step / (1000 * 250))
        np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-5)


def test_train_state_pytree():
    state = create_train_state(jax.random.PRNGKey(0), mlp=TINY_MLP)
    leaves = jax.tree.leaves(state)
    assert len(leaves) > 10
    assert int(state.step) == 0


def test_single_step_updates_params_and_metrics():
    cfg = _tiny_cfg()
    state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                               lr_decay=cfg.lr_decay, mlp=TINY_MLP)
    images, poses = _tiny_scene()
    step_fn = make_train_step(cfg)
    w_before = np.asarray(state.params["fine"]["l1"]["w"]).copy()
    state2, metrics = step_fn(state, jax.random.PRNGKey(1),
                              jnp.asarray(images),
                              jnp.asarray(poses)[:, :3, :4],
                              jnp.arange(1, dtype=jnp.int32), False)
    assert int(state2.step) == 1
    assert float(metrics["loss"]) > 0
    assert np.isfinite(float(metrics["psnr"]))
    assert not np.allclose(np.asarray(state2.params["fine"]["l1"]["w"]),
                           w_before)


def test_precrop_samples_only_center():
    # With precrop_frac=0.5 on a 16x16 image, sampled pixels must lie in
    # [4, 12) on both axes (reference main.py:354-365).
    from cvnerf_tpu.train.loop import _sample_pixels
    cfg = _tiny_cfg(n_rays=64, precrop_iters=10, precrop_frac=0.5)
    py, px = _sample_pixels(jax.random.PRNGKey(0), cfg, precrop=True)
    py, px = np.asarray(py), np.asarray(px)
    assert py.min() >= 4 and py.max() < 12
    assert px.min() >= 4 and px.max() < 12
    py, px = _sample_pixels(jax.random.PRNGKey(0), cfg, precrop=False)
    py, px = np.asarray(py), np.asarray(px)
    assert py.min() >= 0 and py.max() < 16


def test_pixel_sampling_no_replacement():
    from cvnerf_tpu.train.loop import _sample_pixels
    cfg = _tiny_cfg(n_rays=128)
    py, px = _sample_pixels(jax.random.PRNGKey(3), cfg, precrop=False)
    flat = np.asarray(py) * 16 + np.asarray(px)
    assert len(np.unique(flat)) == 128


def test_precrop_transition_through_trainer():
    # The Trainer switches between the two compiled step variants at
    # precrop_iters (reference main.py:354-365); both must run and the
    # warm-up must restrict sampling without breaking the step.
    # n_rays must fit the crop grid (16x16 * 0.5-crop -> 64 pixels) for
    # no-replacement sampling.
    cfg = _tiny_cfg(precrop_iters=3, precrop_frac=0.5, n_rays=32)
    images, poses = _tiny_scene()
    state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                               lr_decay=cfg.lr_decay, mlp=TINY_MLP)
    tr = Trainer(cfg, state, images, poses, [0], seed=1)
    final = tr.run(1, 7)  # steps 1-2 precrop, 3-6 full grid
    assert np.isfinite(final["loss"])
    assert int(tr.state.step) == 6


def test_oversized_n_rays_rejected_clearly():
    import pytest
    with pytest.raises(ValueError, match="precrop grid"):
        make_train_step(_tiny_cfg(precrop_iters=3, precrop_frac=0.5,
                                  n_rays=128))
    with pytest.raises(ValueError, match="pixel grid"):
        make_train_step(_tiny_cfg(n_rays=1 + 16 * 16))


def test_reproducible_given_seed():
    cfg = _tiny_cfg()
    images, poses = _tiny_scene()

    def run():
        state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                                   lr_decay=cfg.lr_decay, mlp=TINY_MLP)
        tr = Trainer(cfg, state, images, poses, [0], seed=42)
        return tr.run(1, 4)

    m1, m2 = run(), run()
    assert m1["loss"] == m2["loss"]


def test_overfit_micro_scene():
    """The end-to-end gate (SURVEY.md §7-4): a single tiny view must be
    overfit to high PSNR within a few hundred steps."""
    cfg = _tiny_cfg(lr=5e-3)
    images, poses = _tiny_scene()
    state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                               lr_decay=cfg.lr_decay, mlp=TINY_MLP)
    tr = Trainer(cfg, state, images, poses, [0], seed=7)

    psnrs = []
    tr.add_callback(50, lambda i, t, m: psnrs.append(m["psnr"]))
    final = tr.run(1, 301)
    assert np.isfinite(final["loss"])
    # PSNR must improve substantially over the first recorded value and
    # reach a clearly-overfit level on this trivial scene.
    assert final["psnr"] > psnrs[0] + 3.0, (psnrs, final)
    assert final["psnr"] > 18.0, (psnrs, final)


def test_scan_matches_single_step_bitwise():
    """The multi-step scan path (steps_per_call > 1) reproduces the
    single-step path exactly: same per-step fold_in(base_key, i) keys, same
    step core, so params after N steps are bitwise identical — including
    across the precrop transition and a callback boundary mid-run."""
    images, poses = _tiny_scene()
    cfg = _tiny_cfg(n_rays=32, precrop_iters=3)

    def run(steps_per_call):
        state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                                   lr_decay=cfg.lr_decay, mlp=TINY_MLP)
        tr = Trainer(cfg, state, images, poses, [0], seed=0,
                     steps_per_call=steps_per_call)
        fired = []
        tr.add_callback(5, lambda i, t, m: fired.append(i))
        m = tr.run(1, 13)
        return tr.state, m, fired

    s1, m1, f1 = run(1)
    s4, m4, f4 = run(4)
    assert f1 == f4 == [5, 10]
    assert m1["loss"] == m4["loss"]
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shared_fire_step_callbacks_see_identical_metrics():
    """All callbacks firing at one step get THE SAME finalized metrics — a
    slow earlier callback must not deflate a later one's rays_per_sec."""
    import time as _time
    cfg = _tiny_cfg()
    state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                               lr_decay=cfg.lr_decay, mlp=TINY_MLP)
    images, poses = _tiny_scene()
    tr = Trainer(cfg, state, images, poses, [0], seed=0, steps_per_call=4)
    seen = []
    tr.add_callback(4, lambda i, t, m: (seen.append((i, m)),
                                        _time.sleep(0.3)))
    tr.add_callback(4, lambda i, t, m: seen.append((i, m)))
    tr.run(1, 9)
    by_step = {}
    for i, m in seen:
        by_step.setdefault(i, []).append(m)
    assert set(by_step) == {4, 8}
    for i, ms in by_step.items():
        assert len(ms) == 2
        assert ms[0] is ms[1], f"step {i}: callbacks saw different metrics"
        assert ms[0]["rays_per_sec"] > 0
