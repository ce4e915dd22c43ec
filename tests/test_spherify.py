"""Tests for spherify (360° inward-facing LLFF captures — a working
extension; the reference parses --spherify but ignores it)."""

import numpy as np

from cvnerf_tpu.data.poses import spherify_poses, view_matrix


def _ring_poses(n=12, radius=3.0, height=1.0, offset=np.zeros(3)):
    """Inward-facing camera ring around ``offset``."""
    poses = []
    for theta in np.linspace(0, 2 * np.pi, n + 1)[:-1]:
        pos = offset + np.array([radius * np.cos(theta),
                                 radius * np.sin(theta), height])
        z = pos - offset       # backward axis points away from the center
        m = view_matrix(z, np.array([0, 0, 1.0]), pos)
        poses.append(np.concatenate([m, np.full((3, 1), 10.0)], 1))
    return np.stack(poses).astype(np.float32)


def test_spherify_centers_and_scales():
    poses = _ring_poses(offset=np.array([5.0, -2.0, 3.0]))
    bounds = np.full((12, 2), [2.0, 8.0], np.float32)
    out, render, new_bounds = spherify_poses(poses, bounds)
    dists = np.linalg.norm(out[:, :3, 3], axis=-1)
    # Cameras end up on (approximately) the unit sphere around the origin.
    np.testing.assert_allclose(dists.mean(), 1.0, rtol=1e-5)
    assert dists.std() < 0.05
    # Bounds scale together with the scene.
    ratio = new_bounds[0, 1] / new_bounds[0, 0]
    np.testing.assert_allclose(ratio, 4.0, rtol=1e-5)
    # Render path: 120 finite poses looking at the origin.
    assert render.shape == (120, 3, 5)
    for p in render[::17]:
        to_center = -p[:3, 3]
        cos = to_center @ (-p[:3, 2]) / np.linalg.norm(to_center)
        assert cos > 0.99
    assert np.isfinite(render).all()


def test_spherify_through_load_scene(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from fixtures import make_llff_dataset
    from cvnerf_tpu.data.datasets import load_scene
    d = str(tmp_path / "s")
    make_llff_dataset(d, n=8, h=16, w=24)
    scene = load_scene(d, "llff", factor=None, spherify=True)
    # Spherify implies non-NDC bounds.
    assert scene.ndc is False
    assert scene.near > 0
    assert scene.render_poses.shape[0] == 120
    assert np.isfinite(scene.render_poses).all()


def test_spherify_cli_train_e2e(tmp_path):
    """Train a few steps on a real 360-degree inward-facing capture through
    the full CLI (--spherify --no_ndc), the reference's dead-flag workload
    made real at the pipeline level."""
    import json
    import os
    import sys
    sys.path.insert(0, "tests")
    from fixtures import make_llff_360_dataset
    import main as cli
    d = str(tmp_path / "s360")
    make_llff_360_dataset(d, n=8, h=16, w=24)
    logdir = str(tmp_path / "logs")
    cli.main(["--data_dir", d, "--base_dir", logdir, "--save_dir", logdir,
              "--name", "s360", "--dtype", "llff", "--factor", "1",
              "--llffhold", "4", "--spherify", "--no_ndc",
              "--n_rays", "64", "--n_coarse_samples", "8",
              "--n_fine_samples", "8", "--trunk_width", "32",
              "--head_width", "16", "--xyz_freqs", "4", "--dir_freqs", "2",
              "--chunk", "256", "--print_freq", "5", "--vid_freq", "0",
              "--val_freq", "0", "--ckpt_freq", "0", "--iters", "8"])
    recs = [json.loads(l)
            for l in open(os.path.join(logdir, "s360", "metrics.jsonl"))]
    losses = [r["loss"] for r in recs if "loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)
    assert any("test_psnr" in r for r in recs)
