"""End-to-end CLI test on a synthetic LLFF scene: NDC training path,
render_test, and the reference-variant NDC flag."""

import json
import os

import pytest

from fixtures import make_llff_dataset

TINY_FLAGS = [
    "--no-bf16",   # CPU test mesh: emulated bf16 is slow (see test_cli_e2e)
    "--dtype", "llff", "--factor", "1", "--llffhold", "4",
    "--n_rays", "64", "--n_coarse_samples", "8", "--n_fine_samples", "8",
    "--trunk_width", "32", "--head_width", "16",
    "--xyz_freqs", "4", "--dir_freqs", "2",
    "--noise", "1.0", "--chunk", "256",
    "--print_freq", "5", "--vid_freq", "0", "--val_freq", "0",
    "--ckpt_freq", "0", "--lr", "5e-3",
]


@pytest.fixture(scope="module")
def llff_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("llff"))
    make_llff_dataset(d, n=8, h=16, w=24)
    return d


def test_llff_ndc_train_and_eval(llff_dir, tmp_path):
    import main as cli
    logdir = str(tmp_path / "logs")
    cli.main(["--data_dir", llff_dir, "--base_dir", logdir,
              "--save_dir", logdir, "--name", "ndc", *TINY_FLAGS,
              "--iters", "12"])
    metrics = os.path.join(logdir, "ndc", "metrics.jsonl")
    records = [json.loads(l) for l in open(metrics)]
    losses = [r["loss"] for r in records if "loss" in r]
    assert losses and all(l > 0 for l in losses)
    # Final held-out eval ran on the ::4 split (2 test views).
    test_recs = [r for r in records if "test_psnr" in r]
    assert test_recs and test_recs[-1]["test_views"] == 2


def test_llff_reference_ndc_variant(llff_dir, tmp_path):
    import main as cli
    logdir = str(tmp_path / "logs2")
    cli.main(["--data_dir", llff_dir, "--base_dir", logdir,
              "--save_dir", logdir, "--name", "refndc", *TINY_FLAGS,
              "--iters", "6", "--ndc_variant", "reference"])
    assert os.path.exists(os.path.join(logdir, "refndc", "metrics.jsonl"))


def test_llff_no_ndc_train(llff_dir, tmp_path):
    import main as cli
    logdir = str(tmp_path / "logs_nondc")
    cli.main(["--data_dir", llff_dir, "--base_dir", logdir,
              "--save_dir", logdir, "--name", "nondc", *TINY_FLAGS,
              "--iters", "8", "--no_ndc"])
    recs = [json.loads(l)
            for l in open(os.path.join(logdir, "nondc", "metrics.jsonl"))]
    assert any("loss" in r for r in recs)


def test_ft_path_restores_into_new_run(llff_dir, tmp_path):
    import main as cli
    logdir = str(tmp_path / "logs_ft")
    base = ["--data_dir", llff_dir, "--base_dir", logdir,
            "--save_dir", logdir, *TINY_FLAGS]
    cli.main([*base, "--name", "src", "--iters", "7", "--ckpt_freq", "6"])
    src_ckpt = os.path.join(logdir, "src", "checkpoints")
    cli.main([*base, "--name", "dst", "--iters", "10",
              "--ft_path", src_ckpt])
    recs = [json.loads(l)
            for l in open(os.path.join(logdir, "dst", "metrics.jsonl"))]
    steps = [r["step"] for r in recs if "loss" in r]
    # Fine-tune resumed past the source checkpoint's step 6.
    assert steps and min(steps) > 6


def test_llff_render_test_poses(llff_dir, tmp_path, capsys):
    import main as cli
    logdir = str(tmp_path / "logs3")
    cli.main(["--data_dir", llff_dir, "--base_dir", logdir,
              "--save_dir", logdir, "--name", "rt", *TINY_FLAGS,
              "--iters", "3", "--render_only", "--render_test"])
    run_dir = os.path.join(logdir, "rt")
    frame_dirs = [d for d in os.listdir(run_dir) if d.startswith("spiral_")]
    assert frame_dirs
    # render_test renders the held-out poses (2 of 8), not the 120 spiral.
    frames = os.listdir(os.path.join(run_dir, frame_dirs[0]))
    assert len(frames) == 2
    # Full-res held-out renders double as the evaluation: metrics printed.
    printed = capsys.readouterr().out
    assert "test_psnr=" in printed and "test_ssim=" in printed
    assert "(2 views)" in printed


def test_ft_path_with_newer_stale_checkpoints(llff_dir, tmp_path):
    """--ft_path from an older checkpoint into a run dir holding NEWER
    checkpoints must back the stale ones up at startup instead of crashing
    at the first periodic save."""
    import main as cli
    logdir = str(tmp_path / "logs_ft2")
    base = ["--data_dir", llff_dir, "--base_dir", logdir,
            "--save_dir", logdir, *TINY_FLAGS]
    cli.main([*base, "--name", "old", "--iters", "5", "--ckpt_freq", "4"])
    # dst trains further than old's checkpoint...
    cli.main([*base, "--name", "dst", "--iters", "11", "--ckpt_freq", "10"])
    # ...then fine-tunes FROM old (step 4) while dst holds step 10: the
    # periodic save at step 8 would previously crash the run.
    cli.main([*base, "--name", "dst", "--iters", "9", "--ckpt_freq", "4",
              "--ft_path", os.path.join(logdir, "old", "checkpoints")])
    run_dir = os.path.join(logdir, "dst")
    baks = [d for d in os.listdir(run_dir) if d.startswith("checkpoints.bak")]
    assert baks, os.listdir(run_dir)
    recs = [json.loads(l)
            for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert max(r["step"] for r in recs if "loss" in r) >= 8
