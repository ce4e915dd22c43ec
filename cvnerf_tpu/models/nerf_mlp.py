"""The NeRF MLP as a functional pytree model.

Architecture parity with the reference ``Model`` (reference
``model.py:51-107``): 5 ReLU trunk layers → xyz-encoding skip concat → 3 more
ReLU layers → a density head off the 8th activation, a *non-ReLU* feature
layer, viewdir-encoding concat, one 128-wide ReLU layer, and a linear RGB head
(sigmoid applied later, in compositing). Coarse and fine networks are two
independent parameter trees (reference ``main.py:133-136``).

TPU-first choices:
  * Raw pytree params + a pure ``apply`` function — trivially jittable,
    vmappable, and shardable; no framework indirection.
  * Optional bfloat16 matmuls with float32 accumulation
    (``preferred_element_type``) — the MXU's native mode; params stay fp32
    master copies.
  * Trunk widths 256/128 are already MXU-lane aligned; the encoded inputs
    (63/27) are zero-padded to the next lane multiple at the call site by the
    Pallas kernel (the jnp path lets XLA handle layout).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from cvnerf_tpu.ops.encoding import encoding_dim


@dataclasses.dataclass(frozen=True)
class NerfMLPConfig:
    """Static architecture hyperparameters (hashable, jit-static)."""
    xyz_freqs: int = 10     # positional-encoding L for xyz (reference main.py:129)
    dir_freqs: int = 4      # L for view directions (reference main.py:130)
    trunk_width: int = 256
    head_width: int = 128

    @property
    def xyz_dim(self) -> int:
        return encoding_dim(3, self.xyz_freqs)   # 63

    @property
    def dir_dim(self) -> int:
        return encoding_dim(3, self.dir_freqs)   # 27


# Layer graph (name, fan_in builder, fan_out). Mirrors reference
# model.py:57-71 exactly, including the skip at l6 and the 1-wide alpha head.
def _layer_dims(cfg: NerfMLPConfig) -> list[tuple[str, int, int]]:
    w, h = cfg.trunk_width, cfg.head_width
    return [
        ("l1", cfg.xyz_dim, w),
        ("l2", w, w),
        ("l3", w, w),
        ("l4", w, w),
        ("l5", w, w),
        ("l6", w + cfg.xyz_dim, w),   # skip: xyz encoding concat (model.py:94)
        ("l7", w, w),
        ("l8", w, w),
        ("l9", w, w),                 # feature layer — NO ReLU (model.py:101)
        ("alpha", w, 1),              # density head off l8 act (model.py:100)
        ("l10", w + cfg.dir_dim, h),  # viewdir concat (model.py:103)
        ("l11", h, 3),                # RGB head, no sigmoid (model.py:105)
    ]


def init_nerf_params(key: jax.Array, cfg: NerfMLPConfig = NerfMLPConfig()) -> dict:
    """Initialize one network's parameter pytree.

    Uses the same distribution torch's ``nn.Linear`` default resolves to —
    ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` for both weight and bias — so
    training dynamics match the reference at init.
    """
    params: dict[str, dict[str, jnp.ndarray]] = {}
    dims = _layer_dims(cfg)
    keys = jax.random.split(key, 2 * len(dims))
    for i, (name, fan_in, fan_out) in enumerate(dims):
        bound = 1.0 / jnp.sqrt(jnp.float32(fan_in))
        w = jax.random.uniform(keys[2 * i], (fan_in, fan_out),
                               jnp.float32, -bound, bound)
        b = jax.random.uniform(keys[2 * i + 1], (fan_out,),
                               jnp.float32, -bound, bound)
        params[name] = {"w": w, "b": b}
    return params


def nerf_param_count(params: dict) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def _dense(params: dict, name: str, x: jnp.ndarray,
           compute_dtype: Any) -> jnp.ndarray:
    w = params[name]["w"].astype(compute_dtype)
    b = params[name]["b"]
    # fp32 accumulation on the MXU regardless of compute dtype. For fp32
    # compute, demand HIGHEST precision: the TPU otherwise runs fp32 dots as
    # single-pass bf16 (the same pitfall the Pallas kernel guards against),
    # which would silently degrade the oracle below its own kernel.
    prec = (jax.lax.Precision.DEFAULT if compute_dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    y = jnp.dot(x.astype(compute_dtype), w,
                preferred_element_type=jnp.float32, precision=prec)
    return y + b


def apply_nerf(params: dict, xyz_enc: jnp.ndarray, dir_enc: jnp.ndarray,
               cfg: NerfMLPConfig = NerfMLPConfig(),
               compute_dtype: Any = jnp.float32) -> jnp.ndarray:
    """Evaluate the MLP on pre-encoded inputs.

    Args:
        xyz_enc: ``[..., 63]`` frequency-encoded positions.
        dir_enc: ``[..., 27]`` frequency-encoded view directions.
        compute_dtype: matmul input dtype (``jnp.bfloat16`` for MXU-native
            throughput); accumulation and outputs are always float32.
    Returns:
        ``[..., 4]`` raw ``(rgb, sigma)`` — activations applied downstream in
        compositing, matching the reference split (``model.py:105-107`` vs
        ``main.py:183,191``).
    """
    relu = jax.nn.relu
    h = relu(_dense(params, "l1", xyz_enc, compute_dtype))
    h = relu(_dense(params, "l2", h, compute_dtype))
    h = relu(_dense(params, "l3", h, compute_dtype))
    h = relu(_dense(params, "l4", h, compute_dtype))
    h = relu(_dense(params, "l5", h, compute_dtype))
    h = jnp.concatenate([xyz_enc, h], axis=-1)  # skip (model.py:94)
    h = relu(_dense(params, "l6", h, compute_dtype))
    h = relu(_dense(params, "l7", h, compute_dtype))
    h = relu(_dense(params, "l8", h, compute_dtype))

    sigma = _dense(params, "alpha", h, compute_dtype)        # (model.py:100)
    feat = _dense(params, "l9", h, compute_dtype)            # no ReLU (model.py:101)

    h = jnp.concatenate([feat, dir_enc], axis=-1)
    h = relu(_dense(params, "l10", h, compute_dtype))
    rgb = _dense(params, "l11", h, compute_dtype)

    return jnp.concatenate([rgb, sigma], axis=-1)
