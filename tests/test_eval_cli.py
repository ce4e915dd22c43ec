"""cvnerf-eval: standalone checkpoint scoring over a dataset split.

Round trip: train a micro-scene via the CLI, then score the run dir with
cvnerf_tpu.eval — the report must match scoring the same views by hand
through NerfRenderer, and the geometry cross-check must catch a
mismatched dataset.
"""

import json
import os
import sys

import numpy as np
import pytest


def _train_micro_run(tmp_path):
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_blender_dataset
    import main as cli

    d = str(tmp_path / "scene")
    make_blender_dataset(d, n_train=3, n_val=1, n_test=2, h=24, w=24)
    logdir = str(tmp_path / "logs")
    cli.main(["--data_dir", d, "--base_dir", logdir, "--save_dir", logdir,
              "--name", "ev", "--no-bf16", "--dtype", "blender",
              "--white_bkg", "--testskip", "1", "--n_rays", "64",
              "--n_coarse_samples", "4", "--n_fine_samples", "4",
              "--trunk_width", "32", "--head_width", "16",
              "--xyz_freqs", "2", "--dir_freqs", "2", "--chunk", "512",
              "--print_freq", "5", "--vid_freq", "0", "--val_freq", "0",
              "--lr", "5e-4", "--iters", "5", "--ckpt_freq", "0"])
    return d, os.path.join(logdir, "ev")


def test_eval_cli_scores_split(tmp_path, capsys):
    from cvnerf_tpu.eval import main as eval_main

    data_dir, run_dir = _train_micro_run(tmp_path)
    out_path = str(tmp_path / "eval.json")
    # No loader flags on purpose: white_bkg/testskip must default from the
    # run's config_resolved.json (a hand-typed mismatch would silently
    # score ground truth composited over the wrong background).
    eval_main(["--run", run_dir, "--data_dir", data_dir,
               "--dtype", "blender",
               "--split", "test", "--chunk", "512", "--out", out_path])
    report = json.load(open(out_path))
    assert report["split"] == "test" and report["n_views"] == 2
    assert np.isfinite(report["psnr"]) and 0.0 <= report["ssim"] <= 1.0
    assert len(report["per_view"]) == 2
    # The report records the RESOLVED model, not the requested mode: this
    # run tracked no best checkpoint, so "auto" resolved to the last one.
    assert report["which"] == "last"
    assert report["which_requested"] == "auto"

    # Cross-check one view against a by-hand render through the renderer.
    from cvnerf_tpu.data import load_scene
    from cvnerf_tpu.serve import NerfRenderer
    from cvnerf_tpu.utils.image import psnr_images
    scene = load_scene(data_dir, "blender", half_res=False, testskip=1,
                       white_bkg=True)
    r = NerfRenderer.from_run_dir(run_dir, chunk=512)
    i = report["per_view"][0]["view"]
    rgb = r.render_pose(np.asarray(scene.poses[i], np.float32))
    psnr = float(psnr_images(rgb, np.asarray(scene.images[i])[..., :3]))
    assert abs(psnr - report["per_view"][0]["psnr"]) < 1e-3


def test_eval_cli_geometry_mismatch(tmp_path):
    from cvnerf_tpu.eval import main as eval_main
    from fixtures import make_blender_dataset

    data_dir, run_dir = _train_micro_run(tmp_path)
    other = str(tmp_path / "other_scene")
    make_blender_dataset(other, n_train=2, n_val=1, n_test=1, h=32, w=32)
    with pytest.raises(SystemExit, match="geometry mismatch"):
        eval_main(["--run", run_dir, "--data_dir", other,
                   "--dtype", "blender", "--white_bkg", "--testskip", "1"])
