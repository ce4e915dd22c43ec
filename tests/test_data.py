"""Tests for dataset ingest: Blender, LLFF, pose pipeline, scene dispatch."""

import os

import numpy as np
import pytest

from cvnerf_tpu.data.blender import load_blender_data
from cvnerf_tpu.data.llff import load_llff_data
from cvnerf_tpu.data.datasets import load_scene
from cvnerf_tpu.data.poses import (
    average_pose,
    pose_spherical,
    recenter_poses,
    spherical_render_poses,
    spiral_render_path,
    view_matrix,
)
from fixtures import make_blender_dataset, make_llff_dataset

REFERENCE_SKULL = "/root/reference/skull"


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("blender_scene"))
    make_blender_dataset(d, n_train=6, n_val=2, n_test=4, h=40, w=40)
    return d


@pytest.fixture(scope="module")
def llff_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("llff_scene"))
    make_llff_dataset(d, n=9, h=32, w=40)
    return d


# ---------- pose utilities ----------

def test_pose_spherical_radius_and_origin_look():
    c2w = pose_spherical(37.0, -30.0, 4.0)
    # Camera center is at distance 4 from the origin.
    np.testing.assert_allclose(np.linalg.norm(c2w[:3, 3]), 4.0, rtol=1e-5)
    # The camera backward axis (+z col) points from origin to camera —
    # i.e. the camera looks at the origin.
    z = c2w[:3, 2] / np.linalg.norm(c2w[:3, 2])
    center = c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
    np.testing.assert_allclose(z, center, atol=1e-5)


def test_spherical_render_poses_count_and_spread():
    poses = spherical_render_poses(40)
    assert poses.shape == (40, 4, 4)
    # Distinct azimuths → distinct camera positions.
    centers = poses[:, :3, 3]
    assert np.unique(np.round(centers, 4), axis=0).shape[0] == 40


def test_view_matrix_orthonormal():
    m = view_matrix(np.array([0.2, 0.3, 0.9]), np.array([0.0, 1.0, 0.0]),
                    np.array([1.0, 2.0, 3.0]))
    r = m[:, :3]
    np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(m[:, 3], [1.0, 2.0, 3.0])


def test_recenter_makes_average_identity():
    rng = np.random.RandomState(0)
    poses = []
    for _ in range(7):
        z = rng.randn(3)
        m = view_matrix(z, np.array([0, 1.0, 0]), rng.randn(3))
        poses.append(np.concatenate([m, np.ones((3, 1))], 1))
    poses = np.stack(poses).astype(np.float32)
    rec = recenter_poses(poses)
    avg = average_pose(rec)
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-4)
    np.testing.assert_allclose(avg[:3, 3], 0.0, atol=1e-4)


def test_spiral_path_shape_and_focus():
    c2w = np.concatenate([np.eye(3), np.zeros((3, 1)), np.ones((3, 1))], 1)
    path = spiral_render_path(c2w, np.array([0, 1.0, 0]),
                              np.array([0.5, 0.5, 0.2]), focus_depth=2.0,
                              n=120)
    assert path.shape == (120, 3, 5)
    # All spiral cameras look roughly toward the focus point (0,0,-2).
    for p in path[::17]:
        to_focus = np.array([0, 0, -2.0]) - p[:3, 3]
        cosang = -to_focus @ p[:3, 2] / np.linalg.norm(to_focus)
        assert cosang > 0.9


# ---------- Blender loader ----------

def test_blender_loader_shapes(blender_dir):
    imgs, poses, rposes, hwf, i_split, (near, far) = load_blender_data(
        blender_dir, half_res=False, testskip=1, bkg=True)
    assert imgs.shape == (12, 40, 40, 3)
    assert poses.shape == (12, 4, 4)
    assert rposes.shape == (40, 4, 4)
    assert (near, far) == (2.0, 6.0)
    np.testing.assert_array_equal(i_split[0], np.arange(6))
    np.testing.assert_array_equal(i_split[1], np.arange(6, 8))
    np.testing.assert_array_equal(i_split[2], np.arange(8, 12))
    assert imgs.min() >= 0 and imgs.max() <= 1


def test_blender_testskip(blender_dir):
    imgs, _, _, _, i_split, _ = load_blender_data(blender_dir, testskip=2)
    # train 6 + val 1 (of 2, stride 2) + test 2 (of 4, stride 2)
    assert imgs.shape[0] == 6 + 1 + 2


def test_blender_white_background(blender_dir):
    w_imgs, *_ = load_blender_data(blender_dir, bkg=True)
    b_imgs, *_ = load_blender_data(blender_dir, bkg=False)
    # The sphere fixture has alpha=0 background: white-composited images are
    # white there, alpha-dropped images keep the raw (black) RGB.
    assert w_imgs[0].max() > 0.99
    assert b_imgs[0].mean() < w_imgs[0].mean()


def test_blender_half_res(blender_dir):
    imgs, _, _, (h, w, focal), _, _ = load_blender_data(
        blender_dir, half_res=True, bkg=True)
    assert (h, w) == (20, 20)
    assert imgs.shape[1:3] == (20, 20)
    full = load_blender_data(blender_dir, half_res=False, bkg=True)
    assert abs(focal - full[3][2] / 2) < 1e-6


def test_blender_focal_formula(blender_dir):
    _, _, _, (h, w, focal), _, _ = load_blender_data(blender_dir)
    assert abs(focal - 0.5 * 40 / np.tan(0.4)) < 1e-4


# ---------- LLFF loader ----------

def test_llff_loader_shapes(llff_dir):
    images, poses, rposes, hwf, i_test, bounds = load_llff_data(
        llff_dir, factor=None)
    assert images.shape == (9, 32, 40, 3)
    assert poses.shape == (9, 3, 4)
    assert rposes.shape == (120, 3, 5)
    assert bounds.shape == (9, 2)
    assert 0 <= i_test < 9
    np.testing.assert_allclose(hwf, [32, 40, 40.0], atol=1e-4)


def test_llff_factor_downsample(llff_dir):
    images, poses, _, hwf, _, _ = load_llff_data(llff_dir, factor=2)
    assert images.shape[1:3] == (16, 20)
    np.testing.assert_allclose(hwf, [16, 20, 20.0], atol=1e-4)


def test_llff_rescale_and_recenter(llff_dir):
    _, poses, _, _, _, bounds = load_llff_data(llff_dir, factor=None)
    # Scene rescale: min bound * scale = 1/0.75 (reference
    # data_helpers.py:276-278 with raw min bound 1.5).
    np.testing.assert_allclose(bounds.min(), 1.0 / 0.75, rtol=1e-5)
    # Recentered: average pose ≈ identity.
    ext = np.concatenate(
        [poses, np.broadcast_to(np.ones((3, 1)), (9, 3, 1))], -1)
    avg = average_pose(ext.astype(np.float32))
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-4)


def test_llff_axis_fixup_roundtrip(llff_dir):
    # The fixture encodes identity-rotation cameras in LLFF layout; after
    # the loader's [y,-x,z] fixup and recentering they must be near-identity
    # rotations again (all cameras share the same orientation).
    _, poses, _, _, _, _ = load_llff_data(llff_dir, factor=None)
    for p in poses:
        np.testing.assert_allclose(p[:3, :3], np.eye(3), atol=1e-4)


def test_llff_mismatched_counts_raises(tmp_path):
    d = str(tmp_path / "bad")
    make_llff_dataset(d, n=5, h=16, w=16)
    os.remove(os.path.join(d, "images", "img_004.png"))
    with pytest.raises(ValueError, match="4 images but 5 poses"):
        load_llff_data(d, factor=None)


@pytest.mark.skipif(not os.path.exists(REFERENCE_SKULL),
                    reason="reference skull capture not present")
def test_skull_pose_pipeline_on_real_capture():
    # The full LLFF pose pipeline (axis fixup, rescale, recenter, spiral,
    # holdout) on the real 21-view iPhone COLMAP capture.
    from cvnerf_tpu.data.llff import _read_poses_bounds, process_llff_poses
    from cvnerf_tpu.data.poses import average_pose
    raw_poses, raw_bounds = _read_poses_bounds(REFERENCE_SKULL)
    poses, render_poses, bounds, i_test = process_llff_poses(
        raw_poses, raw_bounds)
    assert poses.shape == (21, 3, 5)
    assert render_poses.shape == (120, 3, 5)
    assert 0 <= i_test < 21
    # Rescale invariant: nearest bound at 1/0.75.
    np.testing.assert_allclose(bounds.min(), 1.0 / 0.75, rtol=1e-5)
    # Recenter invariant: average pose is the identity.
    avg = average_pose(poses)
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=2e-4)
    np.testing.assert_allclose(avg[:3, 3], 0.0, atol=2e-4)
    # All rotations stay orthonormal through the pipeline.
    for p in poses:
        np.testing.assert_allclose(p[:3, :3].T @ p[:3, :3], np.eye(3),
                                   atol=1e-4)
    assert np.isfinite(render_poses).all()


@pytest.mark.skipif(not os.path.exists(REFERENCE_SKULL),
                    reason="reference skull capture not present")
def test_skull_poses_bounds_parse():
    # The bundled real COLMAP capture: 21 iPhone photos (images absent, so
    # only the pose block is checked) — skull/poses_bounds.npy.
    from cvnerf_tpu.data.llff import _read_poses_bounds
    poses, bounds = _read_poses_bounds(REFERENCE_SKULL)
    assert poses.shape == (21, 3, 5)
    assert bounds.shape == (21, 2)
    assert (bounds > 0).all()
    # hwf column: 4032x3024 iPhone portrait (H=4032, W=3024), focal ≈3237.8
    # px as written by imgs2poses (COLMAP's own report lists 4838.40 under a
    # different parameterization, skull/colmap_output.txt).
    np.testing.assert_allclose(poses[0, :2, 4], [4032, 3024], atol=1)
    np.testing.assert_allclose(poses[0, 2, 4], 3237.81, atol=0.1)


# ---------- unified dispatch ----------

def test_load_scene_blender(blender_dir):
    scene = load_scene(blender_dir, "blender", half_res=False, testskip=1,
                       white_bkg=True)
    assert scene.dtype == "blender"
    assert scene.ndc is False
    assert (scene.near, scene.far) == (2.0, 6.0)
    assert scene.images.shape[0] == 12
    assert scene.train_idx.shape == (6,)


def test_load_scene_llff_ndc(llff_dir):
    scene = load_scene(llff_dir, "llff", factor=None, no_ndc=False)
    assert scene.ndc is True
    assert (scene.near, scene.far) == (0.0, 1.0)
    # ::8 holdout of 9 images → test {0, 8}, train the other 7.
    np.testing.assert_array_equal(scene.test_idx, [0, 8])
    assert scene.train_idx.shape == (7,)


def test_load_scene_llffhold_zero_uses_closest_holdout(llff_dir):
    # llffhold <= 0 falls back to the loader's closest-to-average view
    # (the NeRF-lineage semantics the reference computes then discards).
    scene = load_scene(llff_dir, "llff", factor=None, llffhold=0)
    assert scene.test_idx.shape == (1,)
    assert 0 <= int(scene.test_idx[0]) < 9
    assert scene.train_idx.shape == (8,)


def test_load_scene_llff_no_ndc(llff_dir):
    scene = load_scene(llff_dir, "llff", factor=None, no_ndc=True)
    assert scene.ndc is False
    np.testing.assert_allclose(scene.near, (1 / 0.75) * 0.9, rtol=1e-5)


def test_load_scene_bad_dtype():
    with pytest.raises(ValueError, match="invalid dtype"):
        load_scene("/nonexistent", "exr")
