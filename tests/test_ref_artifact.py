"""The reference-artifact-derived lego dataset: frames from the committed
95k spiral render paired with the derivable spherical poses must load as a
valid Blender-format scene (scripts/ref_artifact_dataset.py)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from ref_artifact_dataset import (REF_MP4, REF_SHIP_MP4,  # noqa: E402
                                  make_ref_lego_dataset)

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_MP4),
    reason="reference render artifact not present on this machine")


def test_ref_lego_dataset_builds_and_loads(tmp_path):
    out = str(tmp_path / "ref_lego")
    info = make_ref_lego_dataset(out)
    assert (info["train"], info["val"], info["test"]) == (32, 4, 4)

    from cvnerf_tpu.data import load_blender_data
    imgs, poses, render_poses, hwf, i_split, near_far = load_blender_data(
        out, half_res=False, testskip=1, bkg=True)
    h, w, focal = hwf
    assert imgs.shape == (40, 400, 400, 3)
    assert (h, w) == (400, 400)
    # Derived intrinsics: 0.5*400/tan(0.5*camera_angle_x) at the canonical
    # nerf_synthetic camera_angle_x.
    assert abs(focal - 555.555) < 0.01
    # Alpha=1 everywhere -> white-bkg composite passes pixels through:
    # white background stays white.
    assert imgs.max() > 0.99
    # Frame i must carry spiral pose i (order preserved through the splits).
    from cvnerf_tpu.data.poses import spherical_render_poses
    expected = spherical_render_poses(40, phi_deg=-30.0, radius=4.0)
    train_idx = i_split[0]
    assert len(train_idx) == 32
    # The splits re-order frames [train|val|test]; reconstruct which
    # original ring index each loaded pose corresponds to and check it
    # matches one of the 40 spiral poses exactly.
    for k in range(imgs.shape[0]):
        dists = np.abs(expected[:, :3, :4] - poses[k, :3, :4]).max((1, 2))
        assert dists.min() < 1e-5


def test_ref_ship_dataset_builds(tmp_path):
    if not os.path.exists(REF_SHIP_MP4):
        pytest.skip("ship artifact not present")
    out = str(tmp_path / "ref_ship")
    info = make_ref_lego_dataset(out, mp4_path=REF_SHIP_MP4)
    assert info["n_frames"] == 40 and info["train"] == 32

    from cvnerf_tpu.data import load_blender_data
    imgs, *_ = load_blender_data(out, half_res=True, testskip=1, bkg=True)
    assert imgs.shape == (40, 200, 200, 3)


def test_ref_lego_multiview_consistency(tmp_path):
    """Geometry self-check without training: rays from two different views
    that hit the same world point near the object center should see similar
    colors only if poses+focal are consistent. We check a weaker invariant
    that still catches a wrong pose recipe: the object (non-white content)
    is centered in every frame, as the spiral orbits the origin."""
    out = str(tmp_path / "ref_lego_c")
    make_ref_lego_dataset(out)
    import imageio.v2 as imageio
    import glob
    centers = []
    for p in sorted(glob.glob(os.path.join(out, "train", "*.png"))):
        im = imageio.imread(p).astype(np.float32) / 255.0
        mask = im[..., :3].min(-1) < 0.85          # non-white = object
        ys, xs = np.nonzero(mask)
        assert len(ys) > 1000, "object missing from a frame"
        centers.append((ys.mean(), xs.mean()))
    centers = np.asarray(centers)
    # Orbiting camera at fixed elevation + centered object: the content
    # centroid stays near the image center across all frames.
    assert np.abs(centers - 200.0).max() < 60.0
