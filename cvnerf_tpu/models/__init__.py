"""Model families: the coarse/fine NeRF MLP (functional pytree params)."""

from cvnerf_tpu.models.nerf_mlp import (
    NerfMLPConfig,
    init_nerf_params,
    apply_nerf,
    nerf_param_count,
)

__all__ = [
    "NerfMLPConfig",
    "init_nerf_params",
    "apply_nerf",
    "nerf_param_count",
]
