"""Tests for host utilities: image conversion, PSNR, video, metrics,
checkpointing."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvnerf_tpu.utils.image import psnr, psnr_images, to_byte, write_png, \
    write_video
from cvnerf_tpu.utils.metrics import MetricsLogger


def test_to_byte_clips_and_scales():
    x = np.array([[-0.5, 0.0, 0.5, 1.0, 2.0]])
    out = to_byte(x)
    np.testing.assert_array_equal(out, [[0, 0, 127, 255, 255]])
    assert out.dtype == np.uint8


def test_psnr_golden():
    assert abs(psnr(0.01) - 20.0) < 1e-6
    assert abs(psnr(1.0) - 0.0) < 1e-6
    a = np.zeros((4, 4, 3))
    b = np.full((4, 4, 3), 0.1)
    assert abs(psnr_images(a, b) - 20.0) < 1e-5


def test_write_png(tmp_path):
    p = str(tmp_path / "x" / "img.png")
    write_png(p, np.random.rand(8, 8, 3).astype(np.float32))
    assert os.path.getsize(p) > 0


def test_write_video(tmp_path):
    frames = np.random.rand(5, 16, 16, 3).astype(np.float32)
    out = write_video(str(tmp_path / "v.mp4"), frames, fps=30)
    assert os.path.exists(out)
    if out.endswith(".mp4"):
        assert os.path.getsize(out) > 0
    else:  # PNG-directory fallback
        assert len(os.listdir(out)) == 5


def test_metrics_logger(tmp_path):
    logger = MetricsLogger(str(tmp_path), enable_tensorboard=False)
    logger.log(100, loss=0.5, psnr=20.0)
    logger.log(200, loss=0.25, psnr=23.0, note="x")
    logger.close()
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert recs[0]["step"] == 100 and recs[0]["loss"] == 0.5
    assert recs[1]["note"] == "x"


def test_checkpoint_roundtrip(tmp_path):
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
    from cvnerf_tpu.train.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )
    from cvnerf_tpu.train.state import create_train_state

    mlp = NerfMLPConfig(xyz_freqs=2, dir_freqs=1, trunk_width=16,
                        head_width=8)
    state = create_train_state(jax.random.PRNGKey(0), mlp=mlp)
    state = state.__class__(params=state.params, opt_state=state.opt_state,
                            step=state.step + 7)
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state)
    assert latest_step(d) == 7

    template = create_train_state(jax.random.PRNGKey(99), mlp=mlp)
    restored = restore_checkpoint(d, template)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["fine"]["l1"]["w"]),
        np.asarray(state.params["fine"]["l1"]["w"]))
    # max_to_keep retention
    for s in (8, 9, 10, 11):
        state = state.__class__(params=state.params,
                                opt_state=state.opt_state,
                                step=jax.numpy.asarray(s))
        save_checkpoint(d, state, max_to_keep=2)
    assert latest_step(d) == 11


def test_restore_missing_returns_none(tmp_path):
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
    from cvnerf_tpu.train.checkpoint import restore_checkpoint
    from cvnerf_tpu.train.state import create_train_state
    mlp = NerfMLPConfig(xyz_freqs=2, dir_freqs=1, trunk_width=16,
                        head_width=8)
    template = create_train_state(jax.random.PRNGKey(0), mlp=mlp)
    assert restore_checkpoint(str(tmp_path / "none"), template) is None


def test_async_checkpointer_overlaps_and_resumes(tmp_path):
    """A persistent Checkpointer: async saves don't block further updates,
    a later synchronous save drains cleanly, every retained step restores,
    and the stale-dir guard still raises."""
    import jax
    import numpy as np
    from cvnerf_tpu.train.checkpoint import Checkpointer, restore_checkpoint
    from cvnerf_tpu.train.state import create_train_state
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig

    mlp = NerfMLPConfig(xyz_freqs=2, dir_freqs=1, trunk_width=16,
                        head_width=8)
    template = create_train_state(jax.random.PRNGKey(0), lr=1e-3,
                                  lr_decay=250, mlp=mlp)
    d = str(tmp_path / "ck")
    with Checkpointer(d, max_to_keep=5) as ck:
        state = template
        for step in (5, 10, 15):
            state = dataclasses.replace(
                state, step=jnp.asarray(step, jnp.int32))
            ck.save(state)           # async: returns before the write lands
        ck.save(dataclasses.replace(state,
                                    step=jnp.asarray(20, jnp.int32)),
                wait=True)
        assert ck.latest_step() == 20
        # duplicate-step save is benign
        ck.save(dataclasses.replace(state,
                                    step=jnp.asarray(20, jnp.int32)))
        # stale (lower-step) save must raise, not silently no-op
        with pytest.raises(RuntimeError):
            ck.save(dataclasses.replace(state,
                                        step=jnp.asarray(3, jnp.int32)))
    for step in (5, 10, 15, 20):
        restored = restore_checkpoint(d, template, step=step)
        assert int(restored.step) == step


def test_async_save_safe_against_donation(tmp_path):
    """An async save must capture the state before the caller's next
    donated step reuses the buffers (orbax copies device->host synchronously
    inside save(); only the filesystem write is backgrounded). Mutating the
    state through a donated jit immediately after save() must not corrupt
    the checkpoint."""
    import jax
    from cvnerf_tpu.train.checkpoint import Checkpointer, restore_checkpoint
    from cvnerf_tpu.train.state import create_train_state
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig

    mlp = NerfMLPConfig(xyz_freqs=2, dir_freqs=1, trunk_width=16,
                        head_width=8)
    state = create_train_state(jax.random.PRNGKey(0), lr=1e-3, lr_decay=250,
                               mlp=mlp)
    state = dataclasses.replace(state, step=jnp.asarray(7, jnp.int32))
    expected = jax.tree.map(np.asarray, state.params)

    clobber = jax.jit(lambda p: jax.tree.map(lambda x: x * 0.0 + 123.0, p),
                      donate_argnums=(0,))
    d = str(tmp_path / "ck")
    with Checkpointer(d) as ck:
        ck.save(state)                      # async
        _ = clobber(state.params)           # donates/reuses the buffers NOW
    restored = restore_checkpoint(d, create_train_state(
        jax.random.PRNGKey(1), lr=1e-3, lr_decay=250, mlp=mlp))
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(expected),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ssim_identical_is_one():
    from cvnerf_tpu.utils.image import ssim_images
    rng = np.random.RandomState(0)
    img = rng.rand(32, 32, 3)
    assert abs(ssim_images(img, img) - 1.0) < 1e-12


def test_ssim_constant_images_analytic():
    """For constant images variance and covariance vanish, so SSIM reduces
    to the luminance term (2 m1 m2 + C1)/(m1^2 + m2^2 + C1) exactly."""
    from cvnerf_tpu.utils.image import ssim_images
    m1, m2, c1 = 0.3, 0.7, (0.01) ** 2
    a = np.full((24, 24), m1)
    b = np.full((24, 24), m2)
    expect = (2 * m1 * m2 + c1) / (m1 ** 2 + m2 ** 2 + c1)
    assert abs(ssim_images(a, b) - expect) < 1e-12


def test_ssim_degrades_monotonically_with_noise():
    from cvnerf_tpu.utils.image import ssim_images
    rng = np.random.RandomState(1)
    img = rng.rand(40, 40, 3)
    vals = [ssim_images(img, np.clip(img + rng.randn(40, 40, 3) * s, 0, 1))
            for s in (0.0, 0.02, 0.1, 0.3)]
    assert all(vals[i] > vals[i + 1] for i in range(len(vals) - 1))
    assert vals[0] == 1.0 and vals[-1] < 0.8


def test_ssim_shape_mismatch_raises():
    from cvnerf_tpu.utils.image import ssim_images
    with np.testing.assert_raises(ValueError):
        ssim_images(np.zeros((4, 4)), np.zeros((5, 4)))
