"""Backward pass of the fused NeRF MLP as a Pallas kernel, plus the
``custom_vjp`` wrapper that makes the fused pipeline differentiable.

Strategy (flash-attention-style recompute): the forward kernel saves *no*
activations — the backward kernel re-runs the forward for each tile entirely
in VMEM, then backpropagates through the 12 layers, accumulating weight/bias
gradients into VMEM-resident fp32 accumulators that persist across the whole
grid (constant-index output blocks). Total FLOPs are 3× forward (recompute +
dgrad + wgrad) — one recompute more than XLA's stored-activation backward,
but with ~1000× less HBM traffic, which is what actually bounds this model
on v5e.

Gradients flow to **parameters only**. Point positions enter the loss only
through sample coordinates the renderer already ``stop_gradient``s
(reference detaches resampled depths, main.py:250), and ray origins/
directions are data — so d(points)/d(viewdirs) are returned as zeros. This
matches what the training graph needs; anyone adding pose optimization must
extend the VJP (documented at the wrapper).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
from cvnerf_tpu.ops.pallas.fused_mlp import (
    _enc_layout,
    _encode_inputs,
    _encoding_constants,
    _forward_body,
    _forward_flops,
    _layer_precision,
    _pack_params,
    _round_up,
    fused_nerf_apply,
)

# Gradient output order (transposed/padded kernel layout).
_GRAD_NAMES = (
    "w1", "b1", "w2", "b2", "w3", "b3", "w4", "b4", "w5", "b5",
    "w6a", "w6b", "b6", "w7", "b7", "w8", "b8", "w9", "b9",
    "wa", "ba", "w10a", "w10b", "b10", "w11", "b11",
)


def _bwd_kernel(px, pd,
                x_ref, d_ref, g_ref,
                w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
                w6a, w6b, b6, w7, b7, w8, b8, w9, b9,
                wa, ba, w10a, w10b, b10, w11, b11,
                *out_refs, compute_dtype, sx, sd):
    f32 = jnp.float32
    cdt = compute_dtype
    prec = _layer_precision(cdt)

    def mm_ct(a, b):
        """Contract the leading (out) dims: W[o,i] x d[o,T] -> [i,T]."""
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec)

    def mm_tt(a, b):
        """Contract the trailing (T) dims: d[o,T] x h[i,T] -> [o,i]."""
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=prec)

    # ---- forward recompute via the SAME body as the forward kernel, so
    # relu masks and cast points match bit-for-bit by construction ----
    enc_x, enc_d_f32 = _encode_inputs(x_ref, d_ref, px, pd, sx, sd)
    enc_xc = enc_x.astype(cdt)
    enc_d = enc_d_f32.astype(cdt)
    (h1, h2, h3, h4, h5, h6, h7, h8, feat, h10, _sigma, _rgb) = \
        _forward_body(enc_xc, enc_d,
                      w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
                      w6a, w6b, b6, w7, b7, w8, b8, w9, b9,
                      wa, ba, w10a, w10b, b10, w11, b11, cdt)

    # ---- backward ----
    g = g_ref[:]                                   # [8, T] f32
    d_rgb = jnp.concatenate(
        [g[0:3, :], jnp.zeros((5, g.shape[1]), f32)], axis=0)   # [8, T]
    d_sig = jnp.concatenate(
        [g[3:4, :], jnp.zeros((7, g.shape[1]), f32)], axis=0)   # [8, T]

    d_rgb_c = d_rgb.astype(cdt)
    d_w11 = mm_tt(d_rgb_c, h10)
    d_b11 = jnp.sum(d_rgb, axis=1, keepdims=True)
    d_h10 = mm_ct(w11[:], d_rgb_c) * (h10.astype(f32) > 0)

    d_h10c = d_h10.astype(cdt)
    d_w10a = mm_tt(d_h10c, feat)
    d_w10b = mm_tt(d_h10c, enc_d)
    d_b10 = jnp.sum(d_h10, axis=1, keepdims=True)
    d_feat = mm_ct(w10a[:], d_h10c)                # l9 has no ReLU

    d_featc = d_feat.astype(cdt)
    d_w9 = mm_tt(d_featc, h8)
    d_b9 = jnp.sum(d_feat, axis=1, keepdims=True)

    d_sig_c = d_sig.astype(cdt)
    d_wa = mm_tt(d_sig_c, h8)
    d_ba = jnp.sum(d_sig, axis=1, keepdims=True)

    d_h8 = ((mm_ct(w9[:], d_featc) + mm_ct(wa[:], d_sig_c))
           * (h8.astype(f32) > 0))

    def trunk_back(dh, w_ref, h_prev, h_prev_mask):
        dhc = dh.astype(cdt)
        dw = mm_tt(dhc, h_prev)
        db = jnp.sum(dh, axis=1, keepdims=True)
        dh_prev = mm_ct(w_ref[:], dhc) * h_prev_mask
        return dw, db, dh_prev

    d_w8, d_b8, d_h7 = trunk_back(d_h8, w8, h7, h7.astype(f32) > 0)
    d_w7, d_b7, d_h6 = trunk_back(d_h7, w7, h6, h6.astype(f32) > 0)

    d_h6c = d_h6.astype(cdt)
    d_w6a = mm_tt(d_h6c, h5)
    d_w6b = mm_tt(d_h6c, enc_xc)
    d_b6 = jnp.sum(d_h6, axis=1, keepdims=True)
    d_h5 = mm_ct(w6a[:], d_h6c) * (h5.astype(f32) > 0)

    d_w5, d_b5, d_h4 = trunk_back(d_h5, w5, h4, h4.astype(f32) > 0)
    d_w4, d_b4, d_h3 = trunk_back(d_h4, w4, h3, h3.astype(f32) > 0)
    d_w3, d_b3, d_h2 = trunk_back(d_h3, w3, h2, h2.astype(f32) > 0)
    d_w2, d_b2, d_h1 = trunk_back(d_h2, w2, h1, h1.astype(f32) > 0)

    d_h1c = d_h1.astype(cdt)
    d_w1 = mm_tt(d_h1c, enc_xc)
    d_b1 = jnp.sum(d_h1, axis=1, keepdims=True)

    grads = (d_w1, d_b1, d_w2, d_b2, d_w3, d_b3, d_w4, d_b4, d_w5, d_b5,
             d_w6a, d_w6b, d_b6, d_w7, d_b7, d_w8, d_b8, d_w9, d_b9,
             d_wa, d_ba, d_w10a, d_w10b, d_b10, d_w11, d_b11)

    first = pl.program_id(0) == 0
    for ref, val in zip(out_refs, grads):
        @pl.when(first)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, val=val):
            ref[:] = ref[:] + val


def _bwd_pallas(params, points, viewdirs, g, cfg: NerfMLPConfig,
                compute_dtype: Any, tile: int, interpret: bool):
    """Run the backward kernel; returns grads in kernel (packed) layout."""
    # The backward working set (weights + all recomputed activations + two
    # dgrad buffers + fp32 grad accumulators) is ~3x the forward's; cap the
    # tile to fit the 16 MB scoped-VMEM limit. fp32 caps are measured on a
    # real v5e (the CPU interpreter enforces no VMEM limit): tile 512
    # allocates 26.11 MB scoped VMEM (OOM), 256 fits.
    if compute_dtype == jnp.float32:
        tile = min(tile, 256)
    else:
        tile = min(tile, 1024)
    n = points.shape[0]
    n_pad = _round_up(max(n, tile), tile)

    ex, sx, _ = _enc_layout(cfg.xyz_freqs)
    ed, sd, _ = _enc_layout(cfg.dir_freqs)

    def prep(a, width):
        a = a.astype(jnp.float32)
        a = jnp.pad(a, ((0, n_pad - n), (0, width - a.shape[1])))
        return a.T

    from cvnerf_tpu.ops.pallas.fused_mlp import _split_rows
    x_t = _split_rows(prep(points, 4))   # [16, N] bf16 mantissa slices
    d_t = _split_rows(prep(viewdirs, 4))
    g_t = prep(g, 8)   # upstream [n, 4] → [8, N] (pad tail rows zero)

    px = _encoding_constants(cfg.xyz_freqs)
    pd = _encoding_constants(cfg.dir_freqs)
    consts = [px, pd]
    wops = _pack_params(params, cfg, compute_dtype)

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    grid = (n_pad // tile,)
    in_specs = (
        [const_spec(a) for a in consts]
        + [pl.BlockSpec((16, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((8, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)]
        + [const_spec(a) for a in wops]
    )

    # Gradient accumulators: fp32, same (padded, transposed) shapes as the
    # packed weights, constant-index blocks resident across the grid.
    out_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wops]
    out_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM) for w in wops]

    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, compute_dtype=compute_dtype,
                          sx=sx, sd=sd),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * _forward_flops(cfg) * n_pad,  # recompute+dgrad+wgrad
            bytes_accessed=n_pad * 64,
            transcendentals=2 * n_pad * (sx + sd),
        ),
    )(*consts, x_t, d_t, g_t, *wops)
    return dict(zip(_GRAD_NAMES, grads))


def _unpack_grads(g: dict, cfg: NerfMLPConfig) -> dict:
    """Kernel-layout grads → standard params-pytree grads."""
    w = cfg.trunk_width
    _, _, perm_x = _enc_layout(cfg.xyz_freqs)
    _, _, perm_d = _enc_layout(cfg.dir_freqs)

    def unw(mat, fan_in):  # [out, in_pad] → [fan_in, out]
        return mat[:, :fan_in].T

    def unb(vec, fan_out):  # [out_pad, 1] → [fan_out]
        return vec[:fan_out, 0]

    out = {}
    # Encoding-consuming weights are packed in _enc_layout block order;
    # gather the oracle columns back out (pad-row grads are discarded —
    # those columns never exist in the pytree).
    out["l1"] = {"w": g["w1"][:, perm_x].T, "b": unb(g["b1"], w)}
    for i in range(2, 6):
        out[f"l{i}"] = {"w": unw(g[f"w{i}"], w), "b": unb(g[f"b{i}"], w)}
    # l6 weight rows: [xyz_enc | hidden] (reference model.py:94).
    w6 = jnp.concatenate([g["w6b"][:, perm_x], g["w6a"]], axis=1)
    out["l6"] = {"w": w6.T, "b": unb(g["b6"], w)}
    for i in (7, 8, 9):
        out[f"l{i}"] = {"w": unw(g[f"w{i}"], w), "b": unb(g[f"b{i}"], w)}
    out["alpha"] = {"w": g["wa"][:1, :].T, "b": unb(g["ba"], 1)}
    w10 = jnp.concatenate([g["w10a"], g["w10b"][:, perm_d]], axis=1)
    out["l10"] = {"w": w10.T, "b": unb(g["b10"], cfg.head_width)}
    out["l11"] = {"w": g["w11"][:3, :].T, "b": unb(g["b11"], 3)}
    return out


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(3, 4, 5, 6))
def fused_nerf_train_apply(params: dict,
                           points: jnp.ndarray,
                           viewdirs: jnp.ndarray,
                           cfg: NerfMLPConfig = NerfMLPConfig(),
                           compute_dtype: Any = jnp.bfloat16,
                           tile: int = 2048,
                           interpret: bool = False) -> jnp.ndarray:
    """Differentiable fused encode→MLP (parameters-only gradients).

    NOTE: d(points)/d(viewdirs) are defined as zero — correct for the
    training graph (samples are detached / rays are data) but NOT for pose
    or ray optimization; see module docstring.
    """
    return fused_nerf_apply(params, points, viewdirs, cfg,
                            compute_dtype=compute_dtype, tile=tile,
                            interpret=interpret)


def _fwd(params, points, viewdirs, cfg, compute_dtype, tile, interpret):
    out = fused_nerf_apply(params, points, viewdirs, cfg,
                           compute_dtype=compute_dtype, tile=tile,
                           interpret=interpret)
    return out, (params, points, viewdirs)


def _bwd(cfg, compute_dtype, tile, interpret, residuals, g):
    params, points, viewdirs = residuals
    packed = _bwd_pallas(params, points, viewdirs, g, cfg, compute_dtype,
                         tile, interpret)
    dparams = _unpack_grads(packed, cfg)
    return dparams, jnp.zeros_like(points), jnp.zeros_like(viewdirs)


fused_nerf_train_apply.defvjp(_fwd, _bwd)
