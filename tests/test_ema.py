"""Polyak/EMA weight averaging (``--ema_decay``, TrainConfig.ema_decay).

A flag-gated deviation from the reference (which serves the raw last SGD
iterate, ``/root/reference/main.py:388-394`` has no averaging): after
every optimizer update ``ema = ema*d + params*(1-d)`` inside the donated
step program; the average is the deployable model — val/test/serving/
export read it, training continues on the raw params.

Covers: the recurrence is exact vs a host-side replay; off-by-default
keeps the pre-EMA pytree; scan blocks match single steps; checkpoint
round-trip + bitwise resume; both directions of the structure migration
(old checkpoint -> EMA template warm start, EMA checkpoint -> plain
template drop); template-free consumers prefer the average; serving loads
it; the CLI records/sticks the decay on the run dir.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
from cvnerf_tpu.render.renderer import RenderConfig
from cvnerf_tpu.train.checkpoint import (restore_checkpoint, restore_params,
                                         save_checkpoint)
from cvnerf_tpu.train.loop import TrainConfig, Trainer
from cvnerf_tpu.train.state import create_train_state

TINY = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=32, head_width=16)
DECAY = 0.875  # fp32-exact (binary fraction): the replay check is bitwise


def _setup(**cfg_kw):
    cfg = TrainConfig(
        height=12, width=12, focal=12.0, near=2.0, far=6.0,
        n_rays=32, lr=5e-3, lr_decay=250,
        render=RenderConfig(n_coarse=4, n_fine=4, perturb=True,
                            noise_std=1.0, mlp=TINY), **cfg_kw)
    rng = np.random.RandomState(0)
    images = rng.rand(2, 12, 12, 3).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)[:3]] * 2)
    poses[:, 2, 3] = 4.0
    return cfg, images, poses


def _fresh(cfg, images, poses, ema, **tr_kw):
    state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                               lr_decay=cfg.lr_decay, mlp=TINY, ema=ema)
    return Trainer(cfg, state, images, poses, [0, 1], seed=3, **tr_kw)


def test_off_by_default_keeps_pre_ema_structure():
    cfg, images, poses = _setup()
    tr = _fresh(cfg, images, poses, ema=False)
    assert tr.state.ema_params is None
    tr.run(1, 4)
    assert tr.state.ema_params is None  # the step must not invent the slot


def test_ema_recurrence_is_exact():
    """state.ema_params equals the host-side replay of
    ema_{t} = ema_{t-1}*d + params_t*(1-d) over the raw param trajectory.
    Tolerance is one fp32 ulp per step: XLA contracts the update into an
    FMA (single rounding), the numpy replay rounds twice."""
    cfg, images, poses = _setup(ema_decay=DECAY)
    tr = _fresh(cfg, images, poses, ema=True)
    leaf = lambda p: np.asarray(p["fine"]["l1"]["w"])  # noqa: E731
    expected = leaf(tr.state.params).copy()
    for i in range(1, 6):
        tr.run(i, i + 1)
        expected = expected * np.float32(DECAY) + \
            leaf(tr.state.params) * np.float32(1.0 - DECAY)
    np.testing.assert_allclose(leaf(tr.state.ema_params), expected,
                               rtol=1e-6, atol=1e-9)
    # And the average is not the raw params.
    assert not np.array_equal(leaf(tr.state.ema_params),
                              leaf(tr.state.params))


def test_scan_block_matches_single_steps():
    """steps_per_call > 1 (the production lax.scan block) produces the
    same EMA as single-step dispatch."""
    cfg, images, poses = _setup(ema_decay=DECAY)
    tr1 = _fresh(cfg, images, poses, ema=True)
    tr1.run(1, 9)
    trN = _fresh(cfg, images, poses, ema=True, steps_per_call=4)
    trN.run(1, 9)
    np.testing.assert_array_equal(
        np.asarray(tr1.state.ema_params["fine"]["l1"]["w"]),
        np.asarray(trN.state.ema_params["fine"]["l1"]["w"]))


def test_resume_bitwise_with_ema(tmp_path):
    cfg, images, poses = _setup(ema_decay=DECAY)
    tr_a = _fresh(cfg, images, poses, ema=True)
    tr_a.run(1, 11)

    tr_b = _fresh(cfg, images, poses, ema=True)
    tr_b.run(1, 6)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, tr_b.state)
    template = create_train_state(jax.random.PRNGKey(9), lr=cfg.lr,
                                  lr_decay=cfg.lr_decay, mlp=TINY, ema=True)
    restored = restore_checkpoint(ckpt, template)
    assert int(restored.step) == 5
    tr_c = Trainer(cfg, restored, images, poses, [0, 1], seed=3)
    tr_c.run(6, 11)
    for net in ("coarse", "fine"):
        np.testing.assert_array_equal(
            np.asarray(tr_a.state.ema_params[net]["l1"]["w"]),
            np.asarray(tr_c.state.ema_params[net]["l1"]["w"]))
        np.testing.assert_array_equal(
            np.asarray(tr_a.state.params[net]["l1"]["w"]),
            np.asarray(tr_c.state.params[net]["l1"]["w"]))


def test_old_checkpoint_warm_starts_ema(tmp_path):
    """--ema_decay newly enabled on a pre-EMA run: the average warm-starts
    at the restored params (and is NOT an alias — the donated step must
    not see the same buffer twice)."""
    cfg, images, poses = _setup()
    tr = _fresh(cfg, images, poses, ema=False)
    tr.run(1, 4)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, tr.state)
    template = create_train_state(jax.random.PRNGKey(9), lr=cfg.lr,
                                  lr_decay=cfg.lr_decay, mlp=TINY, ema=True)
    restored = restore_checkpoint(ckpt, template)
    np.testing.assert_array_equal(
        np.asarray(restored.ema_params["fine"]["l1"]["w"]),
        np.asarray(restored.params["fine"]["l1"]["w"]))
    # The warm-started state trains (donation-safe) and diverges from raw.
    cfg_e, _, _ = _setup(ema_decay=DECAY)
    tr2 = Trainer(cfg_e, restored, images, poses, [0, 1], seed=3)
    tr2.run(4, 7)
    assert not np.array_equal(
        np.asarray(tr2.state.ema_params["fine"]["l1"]["w"]),
        np.asarray(tr2.state.params["fine"]["l1"]["w"]))


def test_ema_checkpoint_into_plain_template_drops_average(tmp_path,
                                                          capsys):
    cfg, images, poses = _setup(ema_decay=DECAY)
    tr = _fresh(cfg, images, poses, ema=True)
    tr.run(1, 4)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, tr.state)
    template = create_train_state(jax.random.PRNGKey(9), lr=cfg.lr,
                                  lr_decay=cfg.lr_decay, mlp=TINY)
    restored = restore_checkpoint(ckpt, template)
    assert restored.ema_params is None
    assert "EMA" in capsys.readouterr().out  # loud, not silent
    np.testing.assert_array_equal(
        np.asarray(restored.params["fine"]["l1"]["w"]),
        np.asarray(tr.state.params["fine"]["l1"]["w"]))


def test_restore_params_prefers_the_average(tmp_path):
    """Template-free consumers (torch export, diagnostics) get the
    deployable weights by default."""
    cfg, images, poses = _setup(ema_decay=DECAY)
    tr = _fresh(cfg, images, poses, ema=True)
    tr.run(1, 4)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, tr.state)
    p_ema, step = restore_params(ckpt)
    p_raw, _ = restore_params(ckpt, prefer_ema=False)
    assert step == 3
    np.testing.assert_array_equal(
        np.asarray(p_ema["fine"]["l1"]["w"]),
        np.asarray(tr.state.ema_params["fine"]["l1"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(p_raw["fine"]["l1"]["w"]),
        np.asarray(tr.state.params["fine"]["l1"]["w"]))
    assert not np.array_equal(np.asarray(p_ema["fine"]["l1"]["w"]),
                              np.asarray(p_raw["fine"]["l1"]["w"]))


def test_serving_loads_the_average(tmp_path):
    """NerfRenderer (serve/eval/mesh loader) renders with the EMA weights
    of an EMA checkpoint — and with the raw params of a plain one."""
    from cvnerf_tpu.serve import NerfRenderer
    cfg, images, poses = _setup(ema_decay=DECAY)
    tr = _fresh(cfg, images, poses, ema=True)
    tr.run(1, 4)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, tr.state)
    r = NerfRenderer(ckpt, height=12, width=12, focal=12.0, near=2.0,
                     far=6.0, cfg=RenderConfig(n_coarse=4, n_fine=4,
                                               mlp=TINY), use_mesh=False)
    np.testing.assert_array_equal(
        np.asarray(r.params["fine"]["l1"]["w"]),
        np.asarray(tr.state.ema_params["fine"]["l1"]["w"]))

    cfg_plain, _, _ = _setup()
    tr_plain = _fresh(cfg_plain, images, poses, ema=False)
    tr_plain.run(1, 4)
    ckpt2 = str(tmp_path / "ckpt_plain")
    save_checkpoint(ckpt2, tr_plain.state)
    r2 = NerfRenderer(ckpt2, height=12, width=12, focal=12.0, near=2.0,
                      far=6.0, cfg=RenderConfig(n_coarse=4, n_fine=4,
                                                mlp=TINY), use_mesh=False)
    np.testing.assert_array_equal(
        np.asarray(r2.params["fine"]["l1"]["w"]),
        np.asarray(tr_plain.state.params["fine"]["l1"]["w"]))


def test_trainer_guards():
    cfg, images, poses = _setup(ema_decay=DECAY)
    with pytest.raises(ValueError, match="ema=True"):
        _fresh(cfg, images, poses, ema=False)
    cfg_bad, _, _ = _setup(ema_decay=1.0)
    with pytest.raises(ValueError, match="ema_decay"):
        _fresh(cfg_bad, images, poses, ema=True)
    # The converse mismatch (state CARRIES the average, decay 0) would
    # silently freeze the average — checkpoints persist it and
    # restore_params prefers it, so consumers would serve stale weights
    # forever. Rejected at construction.
    cfg_off, _, _ = _setup()
    with pytest.raises(ValueError, match="freeze"):
        _fresh(cfg_off, images, poses, ema=True)
    # occlusion_frac >= 1 turns the near-window penalty into the
    # empty-scene objective (the measured distortion collapse) — the
    # collapse-proof claim only holds for a proper sub-window.
    cfg_frac, _, _ = _setup(occlusion_loss=0.01, occlusion_frac=1.0)
    with pytest.raises(ValueError, match="occlusion_frac"):
        _fresh(cfg_frac, images, poses, ema=False)


def test_cli_records_and_sticks(tmp_path):
    """scene.json records the decay; a re-invocation without the flag
    keeps averaging (stickiness), and the torch export ships the
    average."""
    from fixtures import make_blender_dataset
    import main as cli

    scene_dir = str(tmp_path / "scene")
    make_blender_dataset(scene_dir, n_train=4, n_val=1, n_test=1,
                         h=24, w=24)
    logdir = str(tmp_path / "logs")
    base = ["--data_dir", scene_dir, "--base_dir", logdir,
            "--save_dir", logdir, "--name", "ema", "--no-bf16",
            "--dtype", "blender", "--white_bkg", "--testskip", "1",
            "--n_rays", "64", "--n_coarse_samples", "8",
            "--n_fine_samples", "8", "--trunk_width", "32",
            "--head_width", "16", "--xyz_freqs", "4", "--dir_freqs", "2",
            "--noise", "1.0"]
    cli.main(base + ["--iters", "11", "--ckpt_freq", "10",
                     "--ema_decay", "0.9"])
    run_dir = os.path.join(logdir, "ema")
    assert json.load(open(os.path.join(run_dir,
                                       "scene.json")))["ema_decay"] == 0.9
    ckpt = os.path.join(run_dir, "checkpoints")
    ema_5, _ = restore_params(ckpt)
    # Resume WITHOUT the flag: the recorded decay sticks and the average
    # keeps moving.
    cli.main(base + ["--iters", "21", "--ckpt_freq", "10"])
    ema_10, step = restore_params(ckpt)
    assert step == 20
    raw_10, _ = restore_params(ckpt, prefer_ema=False)
    assert not np.array_equal(np.asarray(ema_10["fine"]["l1"]["w"]),
                              np.asarray(raw_10["fine"]["l1"]["w"]))
    assert not np.array_equal(np.asarray(ema_10["fine"]["l1"]["w"]),
                              np.asarray(ema_5["fine"]["l1"]["w"]))


def test_cli_no_reload_drops_recorded_decay(tmp_path):
    """--no_reload starts a FRESH run: the dir's recorded EMA decay must
    not leak into it (a plain baseline rerun would otherwise silently
    train with the previous run's averaging)."""
    from fixtures import make_blender_dataset
    import main as cli

    scene_dir = str(tmp_path / "scene")
    make_blender_dataset(scene_dir, n_train=4, n_val=1, n_test=1,
                         h=24, w=24)
    logdir = str(tmp_path / "logs")
    base = ["--data_dir", scene_dir, "--base_dir", logdir,
            "--save_dir", logdir, "--name", "emafresh", "--no-bf16",
            "--dtype", "blender", "--white_bkg", "--testskip", "1",
            "--n_rays", "64", "--n_coarse_samples", "8",
            "--n_fine_samples", "8", "--trunk_width", "32",
            "--head_width", "16", "--xyz_freqs", "4", "--dir_freqs", "2",
            "--noise", "1.0", "--val_freq", "0", "--vid_freq", "0"]
    cli.main(base + ["--iters", "6", "--ckpt_freq", "5",
                     "--ema_decay", "0.9"])
    run_dir = os.path.join(logdir, "emafresh")
    snap = json.load(open(os.path.join(run_dir, "scene.json")))
    assert snap["ema_decay"] == 0.9
    # Fresh plain rerun in the same dir: no recorded-decay stickiness.
    cli.main(base + ["--iters", "6", "--ckpt_freq", "5", "--no_reload"])
    snap = json.load(open(os.path.join(run_dir, "scene.json")))
    assert "ema_decay" not in snap or not snap["ema_decay"]
    raw, step = restore_params(os.path.join(run_dir, "checkpoints"))
    assert step == 5  # the fresh run's checkpoint, no EMA payload
    same, _ = restore_params(os.path.join(run_dir, "checkpoints"),
                             prefer_ema=False)
    np.testing.assert_array_equal(np.asarray(raw["fine"]["l1"]["w"]),
                                  np.asarray(same["fine"]["l1"]["w"]))


def test_cli_rejects_invalid_decay_before_snapshot(tmp_path):
    """An out-of-range --ema_decay must die BEFORE scene.json records it:
    a recorded invalid value would poison every later flagless
    invocation of the run dir (sticky resolution -> crash loop)."""
    from fixtures import make_blender_dataset
    import main as cli

    scene_dir = str(tmp_path / "scene")
    make_blender_dataset(scene_dir, n_train=2, n_val=1, n_test=1,
                         h=16, w=16)
    logdir = str(tmp_path / "logs")
    base = ["--data_dir", scene_dir, "--base_dir", logdir,
            "--save_dir", logdir, "--name", "emabad", "--no-bf16",
            "--dtype", "blender", "--n_rays", "32",
            "--n_coarse_samples", "4", "--n_fine_samples", "4",
            "--trunk_width", "32", "--head_width", "16",
            "--xyz_freqs", "4", "--dir_freqs", "2",
            "--val_freq", "0", "--vid_freq", "0", "--iters", "4"]
    with pytest.raises(SystemExit, match="ema_decay"):
        cli.main(base + ["--ema_decay", "1.0"])
    assert not os.path.exists(
        os.path.join(logdir, "emabad", "scene.json"))
    # Same contract for the occlusion window (frac >= 1 = the measured
    # empty-scene objective).
    with pytest.raises(SystemExit, match="occlusion_frac"):
        cli.main(base + ["--occlusion_loss", "0.01",
                         "--occlusion_frac", "1.0"])
