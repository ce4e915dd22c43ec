"""Pure, jit-able compute ops: rays, encoding, sampling, compositing."""

from cvnerf_tpu.ops.encoding import freq_encode, encoding_dim
from cvnerf_tpu.ops.rays import (
    camera_ray_directions,
    compute_rays,
    ray_grid,
    rays_for_pixels,
    ndc_rays,
)
from cvnerf_tpu.ops.sampling import stratified_samples, sample_pdf
from cvnerf_tpu.ops.compositing import volume_render

__all__ = [
    "freq_encode",
    "encoding_dim",
    "camera_ray_directions",
    "compute_rays",
    "ray_grid",
    "rays_for_pixels",
    "ndc_rays",
    "stratified_samples",
    "sample_pdf",
    "volume_render",
]
