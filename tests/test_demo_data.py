"""cvnerf-demo-data: the packaged synthetic-scene generator must write
datasets the real loaders ingest (the zero-download quickstart path)."""

import os

import numpy as np
import pytest

from cvnerf_tpu.data.synthetic import main as demo_main
from cvnerf_tpu.data import load_blender_data, load_llff_data


def test_demo_blender_scene_loads(tmp_path):
    out = str(tmp_path / "sphere")
    demo_main(["--scene", "sphere", "--out", out,
               "--views", "3", "--size", "24", "24"])
    imgs, poses, render_poses, hwf, i_split, near_far = \
        load_blender_data(out, half_res=False, testskip=1, bkg=True)
    assert imgs.shape == (3 + 2 + 4, 24, 24, 3)  # --views train + defaults
    assert len(i_split[0]) == 3
    assert np.isfinite(imgs).all() and 0.0 <= imgs.min() <= imgs.max() <= 1.0
    assert tuple(near_far) == (2.0, 6.0)


@pytest.mark.parametrize("scene", ["llff_plane", "llff_360"])
def test_demo_llff_scenes_load(tmp_path, scene):
    out = str(tmp_path / scene)
    demo_main(["--scene", scene, "--out", out,
               "--views", "6", "--size", "24", "32"])
    images, poses, render_poses, hwf, i_test, bounds = load_llff_data(
        out, factor=1, spherify=(scene == "llff_360"))
    assert images.shape == (6, 24, 32, 3)
    assert poses.shape == (6, 3, 4) and np.isfinite(poses).all()
    assert np.asarray(bounds).shape == (6, 2)
    assert (np.asarray(bounds)[:, 0] < np.asarray(bounds)[:, 1]).all()


def test_demo_cli_validates_args(tmp_path):
    with pytest.raises(SystemExit):
        demo_main(["--scene", "sphere", "--out", str(tmp_path / "x"),
                   "--views", "0"])
    with pytest.raises(SystemExit):
        demo_main(["--scene", "sphere", "--out", str(tmp_path / "x"),
                   "--size", "4", "24"])


def test_console_script_registered():
    import tomllib
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "pyproject.toml"), "rb") as fp:
        scripts = tomllib.load(fp)["project"]["scripts"]
    assert scripts["cvnerf-demo-data"] == "cvnerf_tpu.data.synthetic:main"
