"""Dataset ingest: Blender-synthetic and LLFF/COLMAP real captures."""

from cvnerf_tpu.data.blender import load_blender_data
from cvnerf_tpu.data.llff import load_llff_data
from cvnerf_tpu.data.poses import (
    pose_spherical,
    spherical_render_poses,
    view_matrix,
    average_pose,
    recenter_poses,
    spiral_render_path,
)
from cvnerf_tpu.data.datasets import SceneData, load_scene
from cvnerf_tpu.data.synthetic import (
    make_blender_dataset,
    make_llff_dataset,
    make_llff_360_dataset,
)

__all__ = [
    "make_blender_dataset",
    "make_llff_dataset",
    "make_llff_360_dataset",
    "load_blender_data",
    "load_llff_data",
    "pose_spherical",
    "spherical_render_poses",
    "view_matrix",
    "average_pose",
    "recenter_poses",
    "spiral_render_path",
    "SceneData",
    "load_scene",
]
