"""Tests for the serving API (checkpoint → on-demand rendering)."""

import jax
import numpy as np
import pytest

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
from cvnerf_tpu.render.renderer import RenderConfig
from cvnerf_tpu.serve import NerfRenderer
from cvnerf_tpu.train.checkpoint import save_checkpoint
from cvnerf_tpu.train.state import TrainState, create_train_state

TINY = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=32, head_width=16)


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("serve") / "ckpt")
    state = create_train_state(jax.random.PRNGKey(0), mlp=TINY)
    state = TrainState(params=state.params, opt_state=state.opt_state,
                       step=state.step + 42)
    save_checkpoint(d, state)
    return d


def test_render_pose_and_video(ckpt_dir):
    r = NerfRenderer(ckpt_dir, height=12, width=16, focal=14.0,
                     near=2.0, far=6.0, mlp=TINY,
                     cfg=RenderConfig(n_coarse=4, n_fine=4, mlp=TINY),
                     chunk=128, use_mesh=False)
    assert r.step == 42
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0
    rgb = r.render_pose(pose)
    assert rgb.shape == (12, 16, 3)
    assert np.isfinite(rgb).all()
    rgb_half = r.render_pose(pose, factor=2)
    assert rgb_half.shape == (6, 8, 3)

    frames = r.render_video([pose, pose])
    assert frames.shape == (2, 12, 16, 3)
    np.testing.assert_array_equal(frames[0], frames[1])


def test_renderer_on_mesh_matches_single(ckpt_dir):
    common = dict(height=8, width=16, focal=10.0, near=2.0, far=6.0,
                  mlp=TINY, cfg=RenderConfig(n_coarse=4, n_fine=4, mlp=TINY),
                  chunk=128)
    single = NerfRenderer(ckpt_dir, use_mesh=False, **common)
    meshed = NerfRenderer(ckpt_dir, use_mesh=True, **common)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0
    np.testing.assert_allclose(single.render_pose(pose),
                               meshed.render_pose(pose), rtol=1e-4,
                               atol=1e-5)


def test_missing_checkpoint_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        NerfRenderer(str(tmp_path / "none"), height=8, width=8, focal=8.0,
                     near=2.0, far=6.0, mlp=TINY, use_mesh=False)
