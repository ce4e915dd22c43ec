"""Device-mesh creation and sharding helpers (data-parallel over rays)."""

from cvnerf_tpu.parallel.mesh import (
    RAY_AXIS,
    make_mesh,
    ray_sharding,
    replicated_sharding,
)

__all__ = [
    "RAY_AXIS",
    "make_mesh",
    "ray_sharding",
    "replicated_sharding",
]
