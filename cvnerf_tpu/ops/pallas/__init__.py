"""Pallas TPU kernels: the fused positional-encode → NeRF-MLP pipeline."""

from cvnerf_tpu.ops.pallas.fused_mlp import (
    fused_nerf_apply,
    pallas_supported,
)
from cvnerf_tpu.ops.pallas.fused_mlp_bwd import fused_nerf_train_apply

__all__ = ["fused_nerf_apply", "fused_nerf_train_apply", "pallas_supported"]
