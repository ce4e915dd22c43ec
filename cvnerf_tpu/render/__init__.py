"""Rendering: the coarse/fine volume renderer and full-frame orchestration."""

from cvnerf_tpu.render.renderer import RenderConfig, render_rays, render_rays_chunked
from cvnerf_tpu.render.frames import render, render_image, render_poses_to_frames

__all__ = [
    "RenderConfig",
    "render",
    "render_rays",
    "render_rays_chunked",
    "render_image",
    "render_poses_to_frames",
]
