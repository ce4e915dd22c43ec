"""Pallas TPU kernels: the fused positional-encode → NeRF-MLP pipeline."""

from cvnerf_tpu.ops.pallas.fused_mlp import (
    fused_nerf_apply,
    pallas_supported,
)

__all__ = ["fused_nerf_apply", "pallas_supported"]
