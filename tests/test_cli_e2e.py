"""End-to-end CLI tests: config parsing, train → checkpoint → resume →
render-only, on a synthetic Blender micro-scene."""

import json
import os
import sys

import numpy as np
import pytest

from cvnerf_tpu.config import parse_args, snapshot_config
from fixtures import make_blender_dataset, make_llff_dataset


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scene"))
    make_blender_dataset(d, n_train=4, n_val=1, n_test=1, h=24, w=24)
    return d


# ---------- config system ----------

def test_parse_reference_config_file(tmp_path):
    cfg = tmp_path / "lego.txt"
    cfg.write_text(
        "name = blender_paper_lego\n"
        "dtype = blender\n\n"
        "white_bkg = True\n"
        "lr_decay = 500\n"
        "n_coarse_samples = 64\n"
        "n_fine_samples = 128\n"
        "n_rays = 1024\n"
        "precrop_iters = 500\n"
        "precrop_frac = 0.5\n"
        "half_res = True\n")
    args = parse_args(["--config", str(cfg)])
    assert args.name == "blender_paper_lego"
    assert args.dtype == "blender"
    assert args.white_bkg is True
    assert args.half_res is True
    assert args.n_fine_samples == 128
    assert args.precrop_frac == 0.5
    # Untouched defaults survive.
    assert args.lr == 5e-4
    # our TPU-tuned render-chunk default (deviation from the reference's
    # 32768, documented in config.py)
    assert args.chunk == 4096


def test_every_bool_flag_is_config_file_settable(tmp_path):
    """Every boolean flag must parse as `key = True/False` in a config
    file. The bool set is derived from the parser (config.py::_bool_flags)
    precisely because its hand-maintained predecessor silently drifted:
    `occ_train = True` was rejected as 'unrecognized arguments'."""
    import argparse
    from cvnerf_tpu.config import build_parser
    parser = build_parser()
    bools = sorted(a.dest for a in parser._actions
                   if isinstance(a, argparse.BooleanOptionalAction))
    assert "occ_train" in bools and "ray_batching" in bools
    cfg = tmp_path / "all_bools.txt"
    cfg.write_text("".join(f"{b} = True\n" for b in bools))
    args = parse_args(["--config", str(cfg)])
    for b in bools:
        assert getattr(args, b) is True, b
    cfg.write_text("".join(f"{b} = False\n" for b in bools))
    args = parse_args(["--config", str(cfg)])
    for b in bools:
        assert getattr(args, b) is False, b


def test_shipped_configs_parse():
    """Every configs/*.txt ships parseable (lego_fast.txt exercises the
    boolean acceleration flags through the file layer)."""
    import glob
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = glob.glob(os.path.join(repo, "configs", "*.txt"))
    assert paths
    for p in paths:
        args = parse_args(["--config", p])
        assert args.name
    fast = parse_args(["--config", os.path.join(repo, "configs",
                                                "lego_fast.txt")])
    # The recipe carries the measured-safe accelerations only:
    # ray_batching was dropped on evidence (-1.2 to -1.9 dB on <=32-view
    # scenes, BASELINE.md) and occ_train pins the quality-safe merge mode.
    assert fast.occ_train and fast.track_best
    assert fast.occ_train_mode == "merge"
    assert not fast.ray_batching


def test_recipe_configs_match_measured_dispositions():
    """Every BASELINE.md recommended-recipe row ships as a config a user
    can reproduce with --config alone (VERDICT r4 #6): merge = the
    quality default (lego_fast), full+floor64 = the dense-scene speed arm
    (lego_turbo), plain+noise_decay+track_best+merge = the sparse-360
    disposition (llff_360_sparse). Each is pinned to the measured recipe
    so a config edit that drifts from the evidence fails here."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def load(name):
        return parse_args(["--config", os.path.join(repo, "configs", name)])

    turbo = load("lego_turbo.txt")
    assert turbo.occ_train and turbo.occ_train_mode == "full"
    assert turbo.occ_floor == 64          # the cliff guard (BASELINE.md)
    assert turbo.track_best
    assert not turbo.ray_batching

    sparse = load("llff_360_sparse.txt")
    assert sparse.spherify and sparse.no_ndc
    assert sparse.noise == 1.0 and sparse.noise_decay == 25000
    assert sparse.track_best and sparse.llffhold == 5
    # The round-5 breakthrough: short-horizon annealing, +1.53 dB @50k
    # (the 22.09 recipe, results/onchip/l360_anneal4k_50k.log) — in the
    # scale-invariant fractional form; at the measured 50k horizon it
    # resolves to the measured 4000 steps.
    from cvnerf_tpu.config import resolve_freq_anneal
    assert sparse.freq_anneal == 0.08
    assert resolve_freq_anneal(sparse.freq_anneal, 50000) == 4000
    # Levers measured to hurt sparse 360 captures stay off; occ_train is
    # absent until its composition with the anneal recipe measures >= it.
    assert not sparse.occ_train
    assert not sparse.ray_batching
    assert sparse.distortion_loss == 0.0
    assert sparse.occlusion_loss == 0.0


def test_cli_overrides_config_file(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text("n_rays = 1024\nlr = 0.001\n")
    args = parse_args(["--config", str(cfg), "--n_rays", "64"])
    assert args.n_rays == 64        # CLI wins
    assert args.lr == 0.001         # file value kept


def test_repo_configs_parse():
    for name in ("lego", "fern", "skull"):
        args = parse_args(["--config", f"configs/{name}.txt"])
        assert args.n_coarse_samples == 64
        assert args.n_fine_samples == 128


def test_bf16_defaults_on():
    """Production default: bf16 matmuls (measured 5.17x over fp32 on v5e
    at <1 dB equal-step cost — BASELINE.md); --no-bf16 restores the
    reference's fp32 numerics."""
    assert parse_args([]).bf16 is True
    assert parse_args(["--no-bf16"]).bf16 is False


def test_sorted_resample_flag():
    """The sorted-resample deviation is CLI-gated (CLAUDE.md: deviations
    behind flags): default on, --no-sorted_resample restores the
    reference-shaped iid-draws-then-sort stream."""
    assert parse_args([]).sorted_resample is True
    assert parse_args(["--no-sorted_resample"]).sorted_resample is False


def test_bad_config_line(tmp_path):
    cfg = tmp_path / "bad.txt"
    cfg.write_text("this is not a kv line\n")
    with pytest.raises(ValueError, match="bad config line"):
        parse_args(["--config", str(cfg)])


def test_snapshot_config(tmp_path):
    args = parse_args(["--name", "snap"])
    path = snapshot_config(args, str(tmp_path))
    with open(path) as fp:
        resolved = json.load(fp)
    assert resolved["name"] == "snap"
    assert resolved["n_rays"] == 4096


# ---------- end-to-end train/resume/render ----------

TINY_FLAGS = [
    # --no-bf16: these micro-runs execute on the CPU test mesh, where
    # bf16 matmuls (the production TPU default) are emulated and slow;
    # the bf16 default itself is covered by test_bf16_defaults_on and the
    # on-chip quality bands.
    "--no-bf16",
    "--dtype", "blender", "--white_bkg", "--testskip", "1",
    "--n_rays", "64", "--n_coarse_samples", "8", "--n_fine_samples", "8",
    "--trunk_width", "32", "--head_width", "16",
    "--xyz_freqs", "4", "--dir_freqs", "2",
    "--noise", "1.0",
    "--chunk", "256", "--print_freq", "5", "--vid_freq", "0",
    "--val_freq", "0", "--lr", "5e-3",
]


def test_train_checkpoint_resume_render(blender_dir, tmp_path):
    import main as cli

    logdir = str(tmp_path / "logs")
    base = ["--data_dir", blender_dir, "--base_dir", logdir,
            "--save_dir", logdir, "--name", "e2e", *TINY_FLAGS]

    # 1. Train 15 steps, checkpoint at 10 and at the end.
    cli.main([*base, "--iters", "16", "--ckpt_freq", "10"])
    run_dir = os.path.join(logdir, "e2e")
    assert os.path.exists(os.path.join(run_dir, "config_resolved.json"))
    metrics_path = os.path.join(run_dir, "metrics.jsonl")
    records = [json.loads(l) for l in open(metrics_path)]
    assert any("loss" in r for r in records)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    assert os.path.isdir(ckpt_dir)

    # 2. Resume: next run starts from step 15, trains to 20.
    cli.main([*base, "--iters", "21", "--ckpt_freq", "0"])
    records = [json.loads(l) for l in open(metrics_path)]
    steps = [r["step"] for r in records if "loss" in r]
    assert max(steps) == 20
    # Resume produced new work beyond the restored step.
    assert [s for s in steps if s > 15]

    # 3. Render-only from the checkpoint, with the disparity-video extra.
    from fixtures import make_blender_dataset  # noqa: F401
    cli.main([*base, "--render_only", "--render_factor", "4",
              "--render_depth", "--iters", "21"])
    names = os.listdir(run_dir)
    assert [f for f in names if "spiral" in f], names
    assert [f for f in names if "_disp" in f], names


def test_no_reload_starts_fresh(blender_dir, tmp_path):
    import main as cli
    logdir = str(tmp_path / "logs2")
    base = ["--data_dir", blender_dir, "--base_dir", logdir,
            "--save_dir", logdir, "--name", "fresh", *TINY_FLAGS]
    cli.main([*base, "--iters", "6", "--ckpt_freq", "5"])
    # With --no_reload the second run must restart from step 1.
    cli.main([*base, "--iters", "6", "--ckpt_freq", "0", "--no_reload"])
    records = [json.loads(l)
               for l in open(os.path.join(logdir, "fresh", "metrics.jsonl"))]
    steps = [r["step"] for r in records if "loss" in r]
    assert steps.count(5) >= 2  # step 5 logged in both runs


def test_profile_dir_writes_trace(blender_dir, tmp_path):
    """--profile_dir runs the bounded profiling window (warmup, 20 traced
    steps, remainder untraced) and leaves a jax.profiler trace on disk."""
    import main as cli

    logdir = str(tmp_path / "logs_prof")
    prof = str(tmp_path / "trace")
    cli.main(["--data_dir", blender_dir, "--base_dir", logdir,
              "--save_dir", logdir, "--name", "prof", *TINY_FLAGS,
              "--iters", "40", "--ckpt_freq", "0",
              "--profile_dir", prof])
    trace_files = [os.path.join(dp, f) for dp, _, fs in os.walk(prof)
                   for f in fs]
    assert trace_files, "no profiler trace written"
    # Training still completed past the traced window.
    records = [json.loads(l)
               for l in open(os.path.join(logdir, "prof", "metrics.jsonl"))]
    assert max(r["step"] for r in records if "loss" in r) >= 39


def test_no_reload_backup_does_not_collide(blender_dir, tmp_path):
    """Repeated --no_reload restarts that end at the same checkpoint step
    must not crash renaming onto an existing backup dir."""
    import main as cli
    logdir = str(tmp_path / "logs_bak")
    base = ["--data_dir", blender_dir, "--base_dir", logdir,
            "--save_dir", logdir, "--name", "bak", *TINY_FLAGS]
    cli.main([*base, "--iters", "6", "--ckpt_freq", "5"])
    cli.main([*base, "--iters", "6", "--ckpt_freq", "5", "--no_reload"])
    cli.main([*base, "--iters", "6", "--ckpt_freq", "5", "--no_reload"])
    run_dir = os.path.join(logdir, "bak")
    baks = [d for d in os.listdir(run_dir) if d.startswith("checkpoints.bak")]
    assert len(baks) == 2, baks


def test_train_then_serve_from_run_dir(blender_dir, tmp_path):
    """The round trip the run snapshot exists for: train a micro-scene,
    then serve it with `--run <dir>` — zero geometry flags — and check the
    HTTP render pixel-matches a direct render_image call (VERDICT r2 #6)."""
    import json as _json
    import threading
    import urllib.request

    import jax
    import jax.numpy as jnp
    import main as cli
    from cvnerf_tpu.render.frames import render_image
    from cvnerf_tpu.serve import NerfRenderer
    from cvnerf_tpu.server import build_parser, make_server, \
        renderer_from_args

    logdir = str(tmp_path / "logs_serve")
    cli.main(["--data_dir", blender_dir, "--base_dir", logdir,
              "--save_dir", logdir, "--name", "srv", *TINY_FLAGS,
              "--iters", "8", "--ckpt_freq", "5", "--val_freq", "0"])
    run_dir = os.path.join(logdir, "srv")
    assert os.path.exists(os.path.join(run_dir, "scene.json"))

    # The serve CLI path, end to end (parser → renderer → HTTP server).
    args = build_parser().parse_args(["--run", run_dir, "--chunk", "256"])
    r = renderer_from_args(args)
    srv = make_server(r, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from cvnerf_tpu.data import load_scene
        scene = load_scene(blender_dir, "blender", half_res=False,
                           testskip=1, white_bkg=True)
        pose = np.asarray(scene.poses[0])[:3, :4]
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_address[1]}/render",
            data=_json.dumps({"c2w": pose.tolist(),
                              "format": "json"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            body = _json.loads(resp.read())
        served = np.asarray(body["rgb"], np.float32)

        # Direct render with the renderer's own (snapshot-loaded) config.
        out = render_image(jax.random.PRNGKey(0), r.params, r.height,
                           r.width, r.focal, jnp.asarray(pose), r.near,
                           r.far, r.cfg, ndc=r.ndc,
                           ndc_variant=r.ndc_variant, chunk=r.chunk)
        direct = np.asarray(out["rgb"])
        assert served.shape == direct.shape == (scene.height, scene.width, 3)
        np.testing.assert_allclose(served, direct, atol=1e-5)
    finally:
        srv.shutdown()
        srv.server_close()


def test_track_best_checkpoint_and_metrics(blender_dir, tmp_path, capsys):
    """--track_best keeps a best-validation checkpoint and reports test
    metrics at it (model selection for runs whose val quality peaks
    mid-run — the spherify long-horizon finding, ROADMAP round 3)."""
    import main as cli
    logdir = str(tmp_path / "logs_best")
    cli.main(["--data_dir", blender_dir, "--base_dir", logdir,
              "--save_dir", logdir, "--name", "tb", *TINY_FLAGS,
              "--iters", "11", "--ckpt_freq", "0", "--val_freq", "5",
              "--track_best"])
    run_dir = os.path.join(logdir, "tb")
    assert os.path.isdir(os.path.join(run_dir, "checkpoints_best"))
    recs = [json.loads(l)
            for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    best = [r for r in recs if "test_psnr_best" in r]
    assert best, recs
    assert best[-1]["best_step"] in (5, 10)
    assert "best_val_psnr" in best[-1] and "test_ssim_best" in best[-1]

    # Serving a --track_best run defaults to the DEPLOYABLE model: the
    # best-validation checkpoint, not the last step (which="auto").
    from cvnerf_tpu.serve import NerfRenderer
    r_auto = NerfRenderer.from_run_dir(run_dir, chunk=128, use_mesh=False)
    assert r_auto.step == best[-1]["best_step"]
    r_best = NerfRenderer.from_run_dir(run_dir, chunk=128, use_mesh=False,
                                       which="best")
    assert r_best.step == r_auto.step
    r_last = NerfRenderer.from_run_dir(run_dir, chunk=128, use_mesh=False,
                                       which="last")
    assert r_last.step == 10  # final save of the 11-iter run
    with pytest.raises(ValueError):
        NerfRenderer.from_run_dir(run_dir, which="latest")

    # --render_only follows the same rule: a --track_best run renders its
    # best-val model (with an explicit note), not the last checkpoint.
    capsys.readouterr()
    cli.main(["--data_dir", blender_dir, "--base_dir", logdir,
              "--save_dir", logdir, "--name", "tb", *TINY_FLAGS,
              "--iters", "11", "--val_freq", "5", "--track_best",
              "--render_only", "--render_factor", "4"])
    out = capsys.readouterr().out
    best_step = int(best[-1]["best_step"])
    if best_step != 10:
        # The note (and the restore) only happen when best differs from
        # the last checkpoint; if this tiny run's val happens to peak at
        # the final step the weights are identical and cli.py stays quiet.
        assert f"rendering the best-val model (step {best_step})" in out


def test_resume_falls_back_to_best_checkpoint(blender_dir, tmp_path, capsys):
    """Crash recovery: a run killed before its first periodic save (sparse
    --ckpt_freq) leaves only the --track_best checkpoint behind; auto-resume
    must restore that full TrainState instead of restarting from step 0."""
    import shutil

    import main as cli
    logdir = str(tmp_path / "logs_bestfb")
    base = ["--data_dir", blender_dir, "--base_dir", logdir,
            "--save_dir", logdir, "--name", "fb", *TINY_FLAGS,
            "--val_freq", "5", "--track_best"]
    cli.main([*base, "--iters", "11", "--ckpt_freq", "5"])
    run_dir = os.path.join(logdir, "fb")

    # Simulate the crash state: periodic checkpoints never landed, but a
    # best-val checkpoint (and best.json) did.
    shutil.rmtree(os.path.join(run_dir, "checkpoints"))
    best_step = json.load(open(os.path.join(run_dir, "best.json")))["step"]
    assert best_step >= 5
    capsys.readouterr()

    cli.main([*base, "--iters", "16", "--ckpt_freq", "0"])
    out = capsys.readouterr().out
    assert "resuming from best" in out
    assert f"Resumed from checkpoint at step {best_step}" in out
    recs = [json.loads(l)
            for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert max(r["step"] for r in recs if "loss" in r) == 15


def test_no_reload_backs_up_orphan_best_checkpoint(blender_dir, tmp_path):
    """A crash before the first periodic save leaves ONLY checkpoints_best
    + best.json behind; --no_reload must move those aside too, or the fresh
    run inherits the abandoned run's best score (its writer then refuses
    every lower-step best-save and test-at-best scores the orphan weights)."""
    import shutil

    import main as cli
    logdir = str(tmp_path / "logs_orphan")
    base = ["--data_dir", blender_dir, "--base_dir", logdir,
            "--save_dir", logdir, "--name", "orph", *TINY_FLAGS,
            "--ckpt_freq", "5", "--val_freq", "5", "--track_best"]
    cli.main([*base, "--iters", "11"])
    run_dir = os.path.join(logdir, "orph")
    shutil.rmtree(os.path.join(run_dir, "checkpoints"))  # the crash state

    cli.main([*base, "--iters", "11", "--no_reload"])
    names = os.listdir(run_dir)
    assert any(n.startswith("checkpoints.bak") and n.endswith("_best")
               for n in names), names
    # The fresh run's best record belongs to THIS run, not the orphan.
    best = json.load(open(os.path.join(run_dir, "best.json")))
    assert best["step"] <= 10
    recs = [json.loads(l)
            for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert [r for r in recs if "test_psnr_best" in r]


def test_track_best_survives_resume_and_no_reload(blender_dir, tmp_path):
    """(a) A resumed run keeps comparing against the persisted all-time
    best (best.json) instead of re-crowning its first val; (b) --no_reload
    moves checkpoints_best aside with the main checkpoints so lower-step
    best-saves don't collide with a stale dir."""
    import main as cli
    logdir = str(tmp_path / "logs_bestr")
    base = ["--data_dir", blender_dir, "--base_dir", logdir,
            "--save_dir", logdir, "--name", "br", *TINY_FLAGS,
            "--ckpt_freq", "5", "--val_freq", "5", "--track_best"]
    cli.main([*base, "--iters", "11"])
    run_dir = os.path.join(logdir, "br")
    best1 = json.load(open(os.path.join(run_dir, "best.json")))

    # (a) resume to 16: best must be monotone (never below the restored one)
    cli.main([*base, "--iters", "16"])
    best2 = json.load(open(os.path.join(run_dir, "best.json")))
    assert best2["psnr"] >= best1["psnr"]

    # (b) fresh restart must not crash on the stale best dir, and must
    # back it up alongside the main checkpoints
    cli.main([*base, "--iters", "11", "--no_reload"])
    names = os.listdir(run_dir)
    assert any(n.startswith("checkpoints.bak") and n.endswith("_best")
               for n in names), names
    recs = [json.loads(l)
            for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert [r for r in recs if "test_psnr_best" in r]


def test_track_best_partitions_heldout_views(tmp_path):
    """With --track_best on an LLFF scene (val split IS the test split),
    selection views and acceptance views must be disjoint — test_views in
    the metrics shrinks to the non-val partition."""
    from fixtures import make_llff_dataset
    import main as cli
    d = str(tmp_path / "llff")
    make_llff_dataset(d, n=8, h=24, w=32, focal=30.0)
    logdir = str(tmp_path / "logs_part")
    base = ["--data_dir", d, "--base_dir", logdir, "--save_dir", logdir,
            "--dtype", "llff", "--factor", "1", "--llffhold", "2",
            "--no-bf16", "--n_rays", "64", "--n_coarse_samples", "8",
            "--n_fine_samples", "8", "--trunk_width", "32",
            "--head_width", "16", "--xyz_freqs", "4", "--dir_freqs", "2",
            "--noise", "1.0", "--chunk", "256", "--print_freq", "5",
            "--vid_freq", "0", "--ckpt_freq", "0", "--lr", "5e-3",
            "--iters", "7", "--val_freq", "5"]
    # llffhold=2 on 8 views -> 4 held-out. track_best: val=2, test=2.
    cli.main([*base, "--name", "tb", "--track_best"])
    recs = [json.loads(l)
            for l in open(os.path.join(logdir, "tb", "metrics.jsonl"))]
    assert [r for r in recs if r.get("val_views") == 2]
    assert [r for r in recs if r.get("test_views") == 2]
    # without selection, val only monitors: the full held-out set tests
    cli.main([*base, "--name", "nt"])
    recs = [json.loads(l)
            for l in open(os.path.join(logdir, "nt", "metrics.jsonl"))]
    assert [r for r in recs if r.get("test_views") == 4]


def test_empty_val_split_skips_val_metric(tmp_path):
    """A scene with zero val views must not log a train view as val_psnr."""
    from fixtures import make_blender_dataset
    import main as cli
    d = str(tmp_path / "noval")
    make_blender_dataset(d, n_train=3, n_val=0, n_test=1, h=24, w=24)
    logdir = str(tmp_path / "logs_noval")
    cli.main(["--data_dir", d, "--base_dir", logdir, "--save_dir", logdir,
              "--name", "nv", *TINY_FLAGS, "--iters", "8", "--ckpt_freq",
              "0", "--val_freq", "5"])
    recs = [json.loads(l)
            for l in open(os.path.join(logdir, "nv", "metrics.jsonl"))]
    # val falls back to the test view (still held-out), so val_psnr may be
    # logged — but only when a held-out view exists; here test exists, so
    # the fallback applies and the run must not crash.
    assert any("loss" in r for r in recs)


def test_lpips_weights_flag(tmp_path):
    """--lpips_weights adds test_lpips to the metrics stream (and degrades
    with a warning, not a crash, below the 32px AlexNet minimum)."""
    from fixtures import make_blender_dataset
    import main as cli
    sys.path.insert(0, os.path.dirname(__file__))
    from test_lpips import _random_bundle
    wpath = str(tmp_path / "lpips.npz")
    _random_bundle(path=wpath)

    d = str(tmp_path / "scene40")
    make_blender_dataset(d, n_train=3, n_val=1, n_test=1, h=40, w=40)
    logdir = str(tmp_path / "logs_lpips")
    base = ["--data_dir", d, "--base_dir", logdir, "--save_dir", logdir,
            "--name", "lp", *TINY_FLAGS, "--iters", "6", "--ckpt_freq", "0",
            "--lpips_weights", wpath]
    cli.main(base)
    recs = [json.loads(l)
            for l in open(os.path.join(logdir, "lp", "metrics.jsonl"))]
    vals = [r["test_lpips"] for r in recs if "test_lpips" in r]
    assert vals and np.isfinite(vals[-1]) and vals[-1] >= 0

    # Below the minimum support (24px): metric skipped, run completes.
    d2 = str(tmp_path / "scene24")
    make_blender_dataset(d2, n_train=3, n_val=1, n_test=1, h=24, w=24)
    cli.main(["--data_dir", d2, "--base_dir", logdir, "--save_dir", logdir,
              "--name", "lp24", *TINY_FLAGS, "--iters", "6",
              "--ckpt_freq", "0", "--lpips_weights", wpath])
    recs = [json.loads(l)
            for l in open(os.path.join(logdir, "lp24", "metrics.jsonl"))]
    assert any("test_psnr" in r for r in recs)
    assert not any("test_lpips" in r for r in recs)

    # A bad path fails fast, before training starts.
    with pytest.raises(FileNotFoundError):
        cli.main(["--data_dir", d, "--base_dir", logdir,
                  "--save_dir", logdir, "--name", "lpbad", *TINY_FLAGS,
                  "--iters", "6", "--ckpt_freq", "0",
                  "--lpips_weights", str(tmp_path / "nope.npz")])


def test_render_only_with_occupancy(blender_dir, tmp_path):
    """--render_only --occupancy full: bakes a grid from the checkpoint and
    renders the spiral through it (under the test mesh)."""
    import main as cli
    logdir = str(tmp_path / "logs_occ")
    base = ["--data_dir", blender_dir, "--base_dir", logdir,
            "--save_dir", logdir, "--name", "occ", *TINY_FLAGS]
    cli.main([*base, "--iters", "6", "--ckpt_freq", "5"])
    cli.main([*base, "--render_only", "--render_factor", "4",
              "--occupancy", "full", "--occupancy_res", "17",
              "--iters", "6"])
    run_dir = os.path.join(logdir, "occ")
    assert [f for f in os.listdir(run_dir) if "spiral" in f]
