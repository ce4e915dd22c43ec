"""Fused int8 encode→NeRF-MLP Pallas kernel (serving-only forward).

The int8 sibling of ``fused_mlp.py``: same transposed ``[channels, T]``
layout, same bit-exact mantissa-split frequency encoding, but every dense
layer runs as an int8×int8→int32 MXU dot.

**Measured verdict (real v5e): int8 does NOT beat bf16 end-to-end.** The
isolated dependent 12×[256,256] int8 chain hits 151-166 TOPS (≈2× the
134-136 TF/s bf16 chain ceiling), but the *full* kernel measures
**93-95 TOPS = 0.76-0.78×** the bf16 kernel's 118-121 TF/s
(`scripts/int8_kernel_ab.py`, interleaved in-process). Two causes, both
pinned by on-chip probes: (a) Mosaic only fast-paths int8 dots with the
activation as the left row-major operand — ``x[T,in] @ W[in,out]`` runs
151 TOPS vs 97.8 for this kernel's transposed ``W[out,in] @ x[in,T]`` —
and (b) the per-layer requantization epilogue (f32 ``acc*s+b`` → round →
clip → int8 cast) costs ~40% even in the fast orientation (a synthetic
row-major chain *with* epilogues sustains only 92.8-98 TOPS, pad-shape
insensitive). A complete row-major redesign (encoding hoisted out of the
kernel, pure int8 GEMM pipeline, weights consumed ``[in, out]`` as
stored) was built and measured WORSE end-to-end — 52 TF/s = 0.44× — so
this transposed variant is the one kept. Best case with a free epilogue
would be ~1.25×, and the measured epilogue alone erases that: int8 here
is a quality/memory trade (−0.85 dB, near the per-channel PTQ floor per
the error-attribution probe), not a speed play. ``--int8`` stays opt-in
and its help text says so.

Weights/scales arrive pre-quantized as
:class:`~cvnerf_tpu.ops.quantize.QuantizedNerfParams` (calibrated
post-training quantization; see that module for the scheme); this kernel
reproduces every int8 activation and head accumulator of
``ops.quantize.apply_nerf_quant`` **bitwise** — integer dots are exact and
the f32 epilogue (``acc*s + b`` → ``round`` → ``clip``) is ordered
identically on both paths; only the two heads' final f32 dequant can
differ by one FMA-contraction rounding (≤1e-7), since the compiler may
fuse the multiply-add on either path.

Design notes beyond the float kernel's:
  * **32-aligned int8 rows.** Mosaic tiles int8 as (32, 128); the encoding
    layouts (72 rows xyz, 40 rows dir) are padded to 96/64 by extending the
    phase matrix ``P`` with zero rows — the MXU produces the pad rows for
    free, no in-kernel copies. Pad rows quantize to 0 and hit zero weight
    columns, so they are exact no-ops.
  * **Requantization is pre-folded.** Each layer's dequant scale/bias
    already contain the next activation's ``127/max`` multiplier
    (``quantize_nerf_params``), so the whole inter-layer epilogue is
    ``clip(round(acc_f32 * s + b), lo, 127)`` — relu is the ``lo=0`` clamp.
  * Forward/serving only: training keeps full bf16/fp32 gradients
    (``fused_mlp_bwd.py``); quantization is a deployment transform, so
    there is no int8 backward.

There is nothing to cite in the reference for this file: the reference has
no inference path at all (SURVEY.md §2) — this is deployment-side
acceleration the TPU rebuild adds, opt-in via ``NerfRenderer.enable_int8``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
from cvnerf_tpu.ops.pallas.fused_mlp import (_enc_layout,
                                             _encoding_constants,
                                             _round_up, _split_rows)
from cvnerf_tpu.ops.quantize import QuantizedNerfParams


def _enc_rows_i8(n_freqs: int) -> int:
    """Encoding row count padded to the int8 sublane tile (32)."""
    rows, _, _ = _enc_layout(n_freqs)
    return _round_up(rows, 32)


def _pad_rows(a: jnp.ndarray, rows: int) -> jnp.ndarray:
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, 0)))


def _pack_qparams(qp: QuantizedNerfParams, cfg: NerfMLPConfig) -> list:
    """QuantizedNerfParams -> kernel operand list.

    Mirrors ``fused_mlp._pack_params``: weights transposed to [out, in]
    with encoding-consuming columns permuted into ``_enc_layout`` block
    order (scattered into the 32-padded row count); scale/bias as [out, 1]
    f32 rows; the encoding quantization multipliers as [rows, 1] f32 in
    kernel row order (zero at pad rows).
    """
    _, _, perm_x = _enc_layout(cfg.xyz_freqs)
    _, _, perm_d = _enc_layout(cfg.dir_freqs)
    ex32 = _enc_rows_i8(cfg.xyz_freqs)
    ed32 = _enc_rows_i8(cfg.dir_freqs)
    w = cfg.trunk_width
    L = qp.layers

    def qwt(name):                       # [out, in] int8
        return L[name]["qw"].T

    def s(name, pad=None):               # [out, 1] f32 (pad scale = 1)
        v = L[name]["s"][:, None]
        return (v if pad is None
                else jnp.pad(v, ((0, pad - v.shape[0]), (0, 0)),
                             constant_values=1.0))

    def b(name, pad=None):               # [out, 1] f32 (pad bias = 0)
        v = L[name]["b"][:, None]
        return v if pad is None else _pad_rows(v, pad)

    def scatter_in(mat, perm, rows):
        out = jnp.zeros((mat.shape[0], rows), mat.dtype)
        return out.at[:, perm].set(mat)

    def inv_rows(vec, perm, rows):
        out = jnp.zeros((rows, 1), jnp.float32)
        return out.at[perm, 0].set(vec)

    xd = cfg.xyz_dim
    return [
        inv_rows(qp.inv_act["enc_x"], perm_x, ex32),
        inv_rows(qp.inv_act["enc_d"], perm_d, ed32),
        scatter_in(qwt("l1"), perm_x, ex32), s("l1"), b("l1"),
        qwt("l2"), s("l2"), b("l2"),
        qwt("l3"), s("l3"), b("l3"),
        qwt("l4"), s("l4"), b("l4"),
        qwt("l5"), s("l5"), b("l5"),
        # l6 input order is [xyz_enc | hidden] (reference model.py:94):
        qwt("l6")[:, xd:],                          # w6a: hidden part
        scatter_in(qwt("l6")[:, :xd], perm_x, ex32),  # w6b: encoding part
        s("l6"), b("l6"),
        qwt("l7"), s("l7"), b("l7"),
        qwt("l8"), s("l8"), b("l8"),
        qwt("l9"), s("l9"), b("l9"),
        _pad_rows(qwt("alpha"), 8), s("alpha", 8), b("alpha", 8),
        # l10 input order is [feat | dir_enc] (reference model.py:103):
        qwt("l10")[:, :w],                            # w10a: feature part
        scatter_in(qwt("l10")[:, w:], perm_d, ed32),  # w10b: dir-enc part
        s("l10"), b("l10"),
        _pad_rows(qwt("l11"), 8), s("l11", 8), b("l11", 8),
    ]


def _kernel(px, pd, invx, invd,
            x_ref, d_ref,
            w1, s1, b1, w2, s2, b2, w3, s3, b3, w4, s4, b4, w5, s5, b5,
            w6a, w6b, s6, b6, w7, s7, b7, w8, s8, b8, w9, s9, b9,
            wa, sa, ba, w10a, w10b, s10, b10, w11, s11, b11,
            o_ref, *, sx, sd):
    f32, i32 = jnp.float32, jnp.int32

    def idot(w_ref, q):
        return jnp.dot(w_ref[:], q, preferred_element_type=i32)

    def quant_enc(enc, inv_ref):
        q = jnp.round(enc * inv_ref[:])
        return jnp.clip(q, -127, 127).astype(jnp.int8)

    def epilogue(acc, s_ref, b_ref, lo):
        f = acc.astype(f32) * s_ref[:] + b_ref[:]
        return jnp.clip(jnp.round(f), lo, 127).astype(jnp.int8)

    # Encoding: same bit-exact mantissa-split dot + block trig as the float
    # kernel, with P extended by zero rows to the 32-aligned int8 row
    # counts (the pad rows cost one extra MXU row each, not a copy).
    def mm(a, v):
        return jnp.dot(a, v, preferred_element_type=f32,
                       precision=jax.lax.Precision.DEFAULT)

    def blocks(sv, k):
        return jnp.concatenate(
            [sv[0:8], jnp.sin(sv[8:8 + k]), jnp.cos(sv[8 + k:8 + 2 * k]),
             sv[8 + 2 * k:]],
            axis=0)

    enc_x = blocks(mm(px[:], x_ref[:]), sx)       # [ex32, T] f32
    enc_d = blocks(mm(pd[:], d_ref[:]), sd)       # [ed32, T] f32
    q_ex = quant_enc(enc_x, invx)
    q_ed = quant_enc(enc_d, invd)

    q = epilogue(idot(w1, q_ex), s1, b1, 0)
    q = epilogue(idot(w2, q), s2, b2, 0)
    q = epilogue(idot(w3, q), s3, b3, 0)
    q = epilogue(idot(w4, q), s4, b4, 0)
    q = epilogue(idot(w5, q), s5, b5, 0)
    q = epilogue(idot(w6a, q) + idot(w6b, q_ex), s6, b6, 0)
    q = epilogue(idot(w7, q), s7, b7, 0)
    q = epilogue(idot(w8, q), s8, b8, 0)

    sigma = idot(wa, q).astype(f32) * sa[:] + ba[:]      # [8, T] f32, row 0
    q = epilogue(idot(w9, q), s9, b9, -127)              # feat (no ReLU)
    q = epilogue(idot(w10a, q) + idot(w10b, q_ed), s10, b10, 0)
    rgb = idot(w11, q).astype(f32) * s11[:] + b11[:]     # [8, T], rows 0:3

    row = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 0)
    o_ref[:] = jnp.where(row == 3, pltpu.roll(sigma, 3, 0), rgb)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tile", "interpret"))
def fused_nerf_apply_int8(qp: QuantizedNerfParams,
                          points: jnp.ndarray,
                          viewdirs: jnp.ndarray,
                          cfg: NerfMLPConfig = NerfMLPConfig(),
                          tile: int = 2048,
                          interpret: bool = False) -> jnp.ndarray:
    """Evaluate the quantized encode→MLP pipeline at flat points.

    Drop-in int8 equivalent of ``fused_nerf_apply`` for serving: bitwise
    equal to the jnp oracle ``ops.quantize.apply_nerf_quant`` composed with
    ``ops.encoding.freq_encode``.

    Args:
        points: ``[n, 3]`` sample positions (encoded fp32 in-kernel).
        viewdirs: ``[n, 3]`` per-point unit view directions.
        tile: points per grid step. int8 activations halve the VMEM
            working set vs bf16, but the per-layer int32 accumulator and
            f32 epilogue are full width — 2048 is validated by an on-chip
            compile; larger tiles measured no faster.
    Returns:
        ``[n, 4]`` raw (rgb, sigma), float32.
    """
    if tile % 128 != 0:
        raise ValueError(f"tile={tile} must be a multiple of 128 (lanes)")
    for name, width in (("trunk_width", cfg.trunk_width),
                        ("head_width", cfg.head_width)):
        if width % 32 != 0:
            raise ValueError(
                f"{name}={width} must be a multiple of 32 for the int8 "
                "kernel (int8 sublane tile); use the jnp int8 oracle for "
                "odd widths")
    n = points.shape[0]
    n_pad = _round_up(max(n, tile), tile)

    _, sx, _ = _enc_layout(cfg.xyz_freqs)
    _, sd, _ = _enc_layout(cfg.dir_freqs)
    ex32 = _enc_rows_i8(cfg.xyz_freqs)
    ed32 = _enc_rows_i8(cfg.dir_freqs)

    def prep(a):
        a = a.astype(jnp.float32)
        a = jnp.pad(a, ((0, n_pad - n), (0, 1)))
        return _split_rows(a.T)

    x_t = prep(points)
    d_t = prep(viewdirs)

    px = _pad_rows(_encoding_constants(cfg.xyz_freqs), ex32)
    pd = _pad_rows(_encoding_constants(cfg.dir_freqs), ed32)
    wops = _pack_qparams(qp, cfg)

    consts = [px, pd]

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    grid = (n_pad // tile,)
    in_specs = (
        [const_spec(a) for a in consts]
        + [const_spec(a) for a in wops[:2]]       # invx, invd
        + [pl.BlockSpec((16, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)] * 2
        + [const_spec(a) for a in wops[2:]]
    )

    out = pl.pallas_call(
        functools.partial(_kernel, sx=sx, sd=sd),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * (ex32 * cfg.trunk_width
                               + 7 * cfg.trunk_width ** 2
                               + (cfg.trunk_width + ex32) * cfg.trunk_width
                               + cfg.trunk_width * 8
                               + (cfg.trunk_width + ed32) * cfg.head_width
                               + cfg.head_width * 8),
            bytes_accessed=n_pad * 96,
            transcendentals=2 * n_pad * (sx + sd),
        ),
    )(*consts, *wops[:2], x_t, d_t, *wops[2:])

    return out.T[:n, :4]
