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


def freq_window(n_freqs: int, alpha: jnp.ndarray) -> jnp.ndarray:
    """Per-band linear anneal window ``[n_freqs]``: band ``k`` weighs
    ``clip(alpha - k, 0, 1)`` (FreeNeRF eq. 3 — arXiv:2303.07418). At
    ``alpha >= n_freqs`` every band is exactly 1.0."""
    k = jnp.arange(n_freqs, dtype=jnp.float32)
    return jnp.clip(alpha - k, 0.0, 1.0)


def encoding_mask(dim: int, n_freqs: int, alpha: jnp.ndarray) -> jnp.ndarray:
    """Feature-space anneal mask matching ``freq_encode``'s layout
    ``[identity(dim) | sin_0(dim) cos_0(dim) | sin_1 cos_1 | ...]``:
    identity features always pass, band ``k``'s 2*dim sin/cos features are
    scaled by ``freq_window(n_freqs, alpha)[k]``."""
    band = jnp.repeat(freq_window(n_freqs, alpha), 2 * dim)
    return jnp.concatenate([jnp.ones((dim,), jnp.float32), band])


def anneal_nerf_params(params: dict, cfg: NerfMLPConfig,
                       progress: jnp.ndarray | float) -> dict:
    """Coarse-to-fine frequency annealing as a parameter transform.

    Scaling the encoding-facing *weight rows* of the three layers that
    consume encoded inputs — ``l1`` (xyz), the ``l6`` skip-concat rows
    (xyz again, ``apply_nerf`` concatenates ``[xyz_enc, h]``) and the
    ``l10`` viewdir rows (``[feat, dir_enc]``) — is mathematically
    identical to masking the encoded features themselves (the mask
    commutes into the matmul), but needs no change to the encoding path:
    the fused Pallas kernel packs whatever weights it is given, so the
    oracle and the kernel anneal identically (equivalence pinned in
    ``tests/test_anneal.py``).

    ``progress`` in [0, 1] maps to ``alpha = progress * L`` per encoding
    (xyz and dir anneal on the same normalized schedule, as in FreeNeRF).
    At ``progress >= 1`` the transform multiplies by exactly 1.0
    (bitwise identity on IEEE floats). Gradients flow through the scale,
    so masked bands receive exactly-zero gradient until their window
    opens — the FreeNeRF training dynamic.
    """
    progress = jnp.asarray(progress, jnp.float32)
    mx = encoding_mask(3, cfg.xyz_freqs, progress * cfg.xyz_freqs)
    md = encoding_mask(3, cfg.dir_freqs, progress * cfg.dir_freqs)
    out = dict(params)
    out["l1"] = {**params["l1"], "w": params["l1"]["w"] * mx[:, None]}
    w6 = params["l6"]["w"]
    out["l6"] = {**params["l6"],
                 "w": jnp.concatenate([w6[: mx.shape[0]] * mx[:, None],
                                       w6[mx.shape[0]:]], axis=0)}
    w10 = params["l10"]["w"]
    n_feat = w10.shape[0] - md.shape[0]
    out["l10"] = {**params["l10"],
                  "w": jnp.concatenate([w10[:n_feat],
                                        w10[n_feat:] * md[:, None]], axis=0)}
    return out


def anneal_model_params(params: dict, cfg: NerfMLPConfig,
                        progress: jnp.ndarray | float) -> dict:
    """``anneal_nerf_params`` over a ``{"coarse": ..., "fine": ...}`` tree."""
    return {name: anneal_nerf_params(net, cfg, progress)
            for name, net in params.items()}


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
