"""Fused positional-encode → NeRF-MLP Pallas kernel.

This is the north-star kernel (SURVEY.md §7, BASELINE.json): the reference
pushes every sample through host-chunked ``embed → cat → Linear×11`` with all
intermediates round-tripping HBM (reference ``model.py:110-131``); XLA's
fusion of the equivalent jnp chain tops out at ~73 TFLOP/s on v5e because
each 256-wide layer's [N, 256] activations spill to HBM. This kernel keeps
**everything** — both frequency encodings, all 12 weight matrices, and every
activation — resident in VMEM for a tile of points, so HBM traffic per point
is 16 B in (xyz+dir) and 16 B out (rgbσ) instead of ~10 KB.

Design notes:
  * **Transposed layout.** Tiles are ``[channels, T]`` with ``T`` (points) on
    the lane axis, channels on sublanes. Every matmul is then
    ``W^T[out,in] @ h[in,T]`` — both operands MXU-aligned for any trunk width
    that is a multiple of 8. Inputs arrive as ``[16, N]`` bf16 mantissa
    slices (a full bf16 tile), outputs leave as ``[4, N]`` (rgb, sigma).
  * **Encoding as an exact bf16 matmul + block trig.** The frequency
    encoding ``[x, sin(2^k x), cos(2^k x)]`` is computed as ``S = P @
    x_split`` followed by per-block trig: rows live in 8-aligned ``[id |
    sin | cos]`` blocks (``_enc_layout``), so ``sin``/``cos`` each run
    over exactly one contiguous block instead of both over every row with
    masks (the masked form cost ~15% of round-2 kernel time; this halves
    the transcendentals and deletes the 5-op combine). Consumer weights'
    columns are permuted into block order at pack time. ``x_split`` holds
    three exact bf16 mantissa slices of each fp32 coordinate and every
    ``P`` entry is a power of two, so a single DEFAULT-precision bf16 MXU
    pass reproduces the fp32 phases ``2^k·x`` bit-exactly (see
    ``_split_rows``) — replacing round 1's 6-pass fp32-HIGHEST dot (~13%
    of kernel time). The trig stays in fp32 (bf16 mantissas are useless at
    ``2^9·x`` phase magnitudes).
  * **Skip/concat as split matmuls.** The xyz skip at layer 6 and the
    viewdir concat at layer 10 (reference model.py:94,103) are algebraically
    ``W6a@h + W6b@enc`` — avoiding in-kernel concatenation on the sublane
    axis for the wide operand.
  * Weight blocks use constant index maps, so Pallas loads them into VMEM
    once and reuses them across the whole grid.

Weights are packed from the standard pytree (``models.nerf_mlp``) on device
per call — a handful of 256×256 transposes, fused by XLA and negligible next
to the MLP evaluation itself.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig


def pallas_supported() -> bool:
    """True when the default backend can run Mosaic TPU kernels."""
    return jax.default_backend() in ("tpu", "axon")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _forward_flops(cfg: NerfMLPConfig) -> int:
    """Exact per-point MAC-pair count of the forward pipeline (all 12
    layers: trunk, skip, density head, feature, viewdir head, rgb)."""
    w, h = cfg.trunk_width, cfg.head_width
    macs = (cfg.xyz_dim * w          # l1
            + 6 * w * w              # l2-l5, l7, l8
            + (w + cfg.xyz_dim) * w  # l6 (split matmuls, same MACs)
            + w * w                  # l9 feature
            + w                      # alpha head
            + (w + cfg.dir_dim) * h  # l10 (split matmuls)
            + 3 * h)                 # l11 rgb
    return 2 * macs


def _enc_layout(n_freqs: int) -> tuple[int, int, np.ndarray]:
    """Kernel-internal row layout of one frequency encoding.

    Rows are three 8-aligned blocks: ``[id(3, pad to 8) | sin(3·L, pad to
    multiple of 8) | cos(3·L, pad to multiple of 8)]`` — so the kernel
    applies ``sin``/``cos`` to exactly one contiguous sublane-aligned block
    each, instead of evaluating BOTH trig functions over every row and
    masking (which cost ~15% of round-2's kernel time; the trig itself and
    the 5-op masked combine halve/vanish here).

    The layout is invisible outside the kernel: ``_pack_params`` permutes
    the columns of the consuming weights (l1, l6's encoding part, l10's
    dir part) into this order, and ``_unpack_grads`` inverts it.

    Returns ``(rows, sin_rows, perm)`` where ``rows`` is the total padded
    row count, ``sin_rows`` the (padded) size of each trig block, and
    ``perm[d]`` the kernel row holding oracle dimension ``d`` of
    ``ops.encoding.freq_encode``'s layout ``[x | sin(2^0 x) cos(2^0 x) |
    sin(2^1 x) ...]``.
    """
    dim = 3
    sin_rows = _round_up(dim * n_freqs, 8)
    rows = 8 + 2 * sin_rows
    perm = np.zeros(dim + 2 * dim * n_freqs, np.int32)
    for i in range(dim):
        perm[i] = i
    for k in range(n_freqs):
        for i in range(dim):
            perm[dim + 6 * k + i] = 8 + 3 * k + i                  # sin
            perm[dim + 6 * k + dim + i] = 8 + sin_rows + 3 * k + i  # cos
    return rows, sin_rows, perm


def _encoding_constants(n_freqs: int):
    """The phase matrix ``P`` realizing freq_encode's phases as one bf16
    MXU pass over the split input layout of ``_split_rows``.

    ``P`` is ``[rows, 16]`` **bfloat16** (rows per ``_enc_layout``):
    ``P[row, 4j+i] = 2^k`` for every mantissa slice ``j`` of coordinate
    ``i``. All entries are powers of two — exactly representable in bf16 —
    and each product ``2^k · slice`` is exact in the MXU's fp32
    accumulator, so ONE DEFAULT-precision bf16 pass reproduces the fp32
    ``2^k · x`` phases bit-exactly (the round-1 kernel burned ~13% of its
    time running this dot at fp32 HIGHEST, i.e. 6 MXU passes).
    """
    dim = 3
    rows, sin_rows, perm = _enc_layout(n_freqs)

    def put(p, row, i, scale):
        for j in range(3):          # identical coefficient for each slice
            p[row, 4 * j + i] = scale

    p = np.zeros((rows, 16), np.float32)
    for i in range(dim):
        put(p, i, i, 1.0)
    col = dim
    for k in range(n_freqs):
        for _trig in range(2):
            for i in range(dim):
                put(p, int(perm[col]), i, 2.0 ** k)
                col += 1
    assert col == dim + 2 * dim * n_freqs
    return jnp.asarray(p, jnp.bfloat16)


def _split_rows(a_t: jnp.ndarray) -> jnp.ndarray:
    """``[4, N]`` fp32 → ``[16, N]`` bf16 of exact mantissa slices.

    Truncation split: ``p1`` keeps the top 8 significant bits (bf16 IS fp32
    truncated to 16 bits), ``p2`` the next 8, ``p3`` the remaining 8 —
    ``p1 + p2 + p3 == x`` exactly, every piece exactly bf16-representable
    (bf16 shares fp32's exponent range, so no underflow). Rows are three
    4-row groups ``[p1 | p2 | p3 | zeros]`` matching ``_encoding_constants``.
    """
    u = jax.lax.bitcast_convert_type(a_t, jnp.uint32)
    p1 = jax.lax.bitcast_convert_type(u & np.uint32(0xFFFF0000), jnp.float32)
    r1 = a_t - p1
    u1 = jax.lax.bitcast_convert_type(r1, jnp.uint32)
    p2 = jax.lax.bitcast_convert_type(u1 & np.uint32(0xFFFF0000), jnp.float32)
    p3 = r1 - p2
    pad = jnp.zeros_like(p1[:4])
    return jnp.concatenate(
        [p1, p2, p3, pad], axis=0).astype(jnp.bfloat16)


def _pack_params(params: dict, cfg: NerfMLPConfig, compute_dtype: Any):
    """Pytree params → kernel operand list (transposed, padded, cast).

    Weights that consume an encoding (l1, l6's xyz part, l10's dir part)
    have their input columns permuted into ``_enc_layout``'s block order.
    """
    ex, _, perm_x = _enc_layout(cfg.xyz_freqs)
    ed, _, perm_d = _enc_layout(cfg.dir_freqs)
    w = cfg.trunk_width
    h = cfg.head_width
    cdt = compute_dtype

    def wt(name):  # transposed weight [out, in]
        return params[name]["w"].T

    def b(name):   # bias as [out, 1] fp32
        return params[name]["b"][:, None].astype(jnp.float32)

    def scatter_in(mat, perm, rows):
        """Place input(=second-dim) columns at ``perm``; zeros elsewhere."""
        out = jnp.zeros((mat.shape[0], rows), mat.dtype)
        return out.at[:, perm].set(mat)

    def pad_out(mat, rows):  # pad output(=first) dim
        return jnp.pad(mat, ((0, rows - mat.shape[0]), (0, 0)))

    xd, dd = cfg.xyz_dim, cfg.dir_dim
    ops = [
        scatter_in(wt("l1"), perm_x, ex).astype(cdt), b("l1"),
        wt("l2").astype(cdt), b("l2"),
        wt("l3").astype(cdt), b("l3"),
        wt("l4").astype(cdt), b("l4"),
        wt("l5").astype(cdt), b("l5"),
        # l6 input order is [xyz_enc | hidden] (reference model.py:94):
        wt("l6")[:, xd:].astype(cdt),                          # w6a: hidden
        scatter_in(wt("l6")[:, :xd], perm_x, ex).astype(cdt),  # w6b: encoding
        b("l6"),
        wt("l7").astype(cdt), b("l7"),
        wt("l8").astype(cdt), b("l8"),
        wt("l9").astype(cdt), b("l9"),
        pad_out(wt("alpha"), 8).astype(cdt),
        pad_out(b("alpha"), 8),
        # l10 input order is [feat | dir_enc] (reference model.py:103):
        wt("l10")[:, :w].astype(cdt),                          # w10a: feature
        scatter_in(wt("l10")[:, w:], perm_d, ed).astype(cdt),  # w10b: dir enc
        b("l10"),
        pad_out(wt("l11"), 8).astype(cdt),
        pad_out(b("l11"), 8),
    ]
    return ops


def _layer_precision(compute_dtype):
    """Mosaic executes fp32 dots as single-pass bf16 under DEFAULT
    precision; demand full fp32 when the compute dtype is fp32."""
    return (jax.lax.Precision.DEFAULT if compute_dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _encode_inputs(x_ref, d_ref, px, pd, sx, sd):
    """In-kernel frequency encodings (fp32 trig, exact phase scaling).

    Inputs are the ``[16, T]`` bf16 mantissa-slice layout of ``_split_rows``;
    the phase ``2^k·x`` is recovered bit-exactly by ONE DEFAULT-precision
    bf16 dot (see ``_encoding_constants``): every ``2^k · slice`` product is
    exact in the fp32 accumulator and the partial sums are mantissa prefixes
    of the fp32 result, so no rounding occurs anywhere.

    Rows follow ``_enc_layout``'s ``[id | sin | cos]`` blocks (``sx``/``sd``
    are the trig-block sizes), so each trig function runs over exactly one
    8-aligned block. Zero pad rows are harmless: ``sin(0)=0`` and the
    ``cos(0)=1`` rows multiply zero weight columns.

    Returns (enc_x, enc_d), both fp32 ``[rows_x/rows_d, T]``.
    """
    f32 = jnp.float32

    def mm(a, b):
        return jnp.dot(a[:], b, preferred_element_type=f32,
                       precision=jax.lax.Precision.DEFAULT)

    def blocks(s, k):
        return jnp.concatenate(
            [s[0:8], jnp.sin(s[8:8 + k]), jnp.cos(s[8 + k:8 + 2 * k])],
            axis=0)

    enc_x = blocks(mm(px, x_ref[:]), sx)           # [rows_x, T]
    enc_d = blocks(mm(pd, d_ref[:]), sd)           # [rows_d, T]
    return enc_x, enc_d


def _forward_body(enc_xc, enc_d_c,
                  w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
                  w6a, w6b, b6, w7, b7, w8, b8, w9, b9,
                  wa, ba, w10a, w10b, b10, w11, b11,
                  compute_dtype, want_intermediates=True):
    """The full 12-layer MLP on pre-cast encodings — shared by the forward
    kernel and the backward kernel's recompute, so their relu masks and
    cast points agree *structurally* (gradient correctness depends on the
    recompute being bit-identical to the forward).

    Args are weight/bias *refs* (indexed here) plus compute-dtype
    encodings. With ``want_intermediates`` (the backward recompute) every
    intermediate is returned; without it only ``(sigma, rgb)`` — returning
    dead intermediates from the forward kernel extended their buffer
    lifetimes in Mosaic and cost ~30% kernel time.
    """
    f32 = jnp.float32
    cdt = compute_dtype
    prec = _layer_precision(cdt)
    relu = jax.nn.relu

    def mm(a, b):
        # Mosaic requires 32-bit matmul accumulators; results are cast back
        # to the compute dtype after the bias+relu.
        return jnp.dot(a[:], b, preferred_element_type=f32, precision=prec)

    h1 = relu(mm(w1, enc_xc) + b1[:]).astype(cdt)
    h2 = relu(mm(w2, h1) + b2[:]).astype(cdt)
    h3 = relu(mm(w3, h2) + b3[:]).astype(cdt)
    h4 = relu(mm(w4, h3) + b4[:]).astype(cdt)
    h5 = relu(mm(w5, h4) + b5[:]).astype(cdt)
    h6 = relu(mm(w6a, h5) + mm(w6b, enc_xc) + b6[:]).astype(cdt)
    h7 = relu(mm(w7, h6) + b7[:]).astype(cdt)
    h8 = relu(mm(w8, h7) + b8[:]).astype(cdt)

    sigma = mm(wa, h8) + ba[:]                    # [8, T] f32, row 0 real
    feat = (mm(w9, h8) + b9[:]).astype(cdt)       # no ReLU (model.py:101)

    h10 = relu(mm(w10a, feat) + mm(w10b, enc_d_c) + b10[:]).astype(cdt)
    rgb = mm(w11, h10) + b11[:]                   # [8, T] f32, rows 0:3 real

    if want_intermediates:
        return h1, h2, h3, h4, h5, h6, h7, h8, feat, h10, sigma, rgb
    return sigma, rgb


def _kernel(px, pd,
            x_ref, d_ref,
            w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
            w6a, w6b, b6, w7, b7, w8, b8, w9, b9,
            wa, ba, w10a, w10b, b10, w11, b11,
            o_ref, *, compute_dtype, sx, sd):
    cdt = compute_dtype
    enc_x, enc_d = _encode_inputs(x_ref, d_ref, px, pd, sx, sd)
    sigma, rgb = _forward_body(
        enc_x.astype(cdt), enc_d.astype(cdt),
        w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
        w6a, w6b, b6, w7, b7, w8, b8, w9, b9,
        wa, ba, w10a, w10b, b10, w11, b11, cdt,
        want_intermediates=False)
    # Full-tile [8, T] output (rgb rows 0-2, sigma row 3): a [4, T] fp32
    # block is below the 8-sublane tile minimum and forces a relayout.
    row = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 0)
    o_ref[:] = jnp.where(row == 3, pltpu.roll(sigma, 3, 0), rgb)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "compute_dtype", "tile",
                                    "interpret"))
def fused_nerf_apply(params: dict,
                     points: jnp.ndarray,
                     viewdirs: jnp.ndarray,
                     cfg: NerfMLPConfig = NerfMLPConfig(),
                     compute_dtype: Any = jnp.bfloat16,
                     tile: int = 1024,
                     interpret: bool = False) -> jnp.ndarray:
    """Evaluate the full encode→MLP pipeline at flat points.

    Drop-in fused equivalent of ``freq_encode + apply_nerf`` (the jnp oracle
    it is equivalence-tested against).

    Args:
        points: ``[n, 3]`` sample positions (any float dtype; encoded fp32).
        viewdirs: ``[n, 3]`` per-point unit view directions (pre-broadcast
            from per-ray dirs by the caller).
        tile: points per grid step (lane-axis size; multiple of 128).
        interpret: run in the Pallas interpreter (CPU testing).
    Returns:
        ``[n, 4]`` raw (rgb, sigma), float32.
    """
    # Cap the tile so the full-size model stays under the 16 MB scoped-VMEM
    # limit (fp32 activations double the working set). The fp32 cap is
    # measured on a real v5e: tile 2048 allocates 20.45 MB scoped VMEM
    # (OOM), 1536 fits at ~15.3 MB (too close for config headroom), 1024
    # fits comfortably — the CPU interpreter enforces no VMEM limit, so
    # only an on-chip compile validates these.
    tile = min(tile, 1024 if compute_dtype == jnp.float32 else 4096)
    if tile % 128 != 0:
        raise ValueError(f"tile={tile} must be a multiple of 128 (lanes)")
    for name, width in (("trunk_width", cfg.trunk_width),
                        ("head_width", cfg.head_width)):
        if width % 8 != 0:
            raise ValueError(
                f"{name}={width} must be a multiple of 8 for the fused "
                "kernel (sublane alignment); use pallas='off' for odd "
                "widths")
    n = points.shape[0]
    n_pad = _round_up(max(n, tile), tile)

    ex, sx, _ = _enc_layout(cfg.xyz_freqs)
    ed, sd, _ = _enc_layout(cfg.dir_freqs)

    # [16, N] bf16 mantissa-slice inputs (exact; see _split_rows), zero tail
    # padding. The split costs a few VPU ops outside the kernel, fused by
    # XLA into the transpose/pad.
    def prep(a):
        a = a.astype(jnp.float32)
        a = jnp.pad(a, ((0, n_pad - n), (0, 1)))
        return _split_rows(a.T)

    x_t = prep(points)
    d_t = prep(viewdirs)

    px = _encoding_constants(cfg.xyz_freqs)
    pd = _encoding_constants(cfg.dir_freqs)
    wops = _pack_params(params, cfg, compute_dtype)

    consts = [px, pd]

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    grid = (n_pad // tile,)
    in_specs = (
        [const_spec(a) for a in consts]
        + [pl.BlockSpec((16, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)] * 2
        + [const_spec(a) for a in wops]
    )

    out = pl.pallas_call(
        functools.partial(_kernel, compute_dtype=compute_dtype, sx=sx,
                          sd=sd),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=_forward_flops(cfg) * n_pad,
            bytes_accessed=n_pad * 80,
            transcendentals=2 * n_pad * (sx + sd),  # one trig per block row
        ),
    )(*consts, x_t, d_t, *wops)

    return out.T[:n, :4]
