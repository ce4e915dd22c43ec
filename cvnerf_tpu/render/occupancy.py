"""Occupancy-grid accelerated serving: probe a baked density grid instead
of running the coarse MLP.

The hierarchical renderer's coarse pass exists only to place the fine
samples (reference ``main.py:221-250``); at serving time the density field
is frozen, so its shape can be *baked once* into a voxel grid and probed
per sample for the cost of a gather instead of a 12-layer MLP evaluation.
This removes the coarse network from the render entirely — 64 of the 256
MLP evaluations per ray (25% of the FLOPs) — an acceleration the
reference has no counterpart for (its coarse net runs on every render,
every frame, forever).

TPU shape: the bake is the mesh extractor's jitted grid query
(``render.mesh.query_density_grid``) plus a host max-pool dilation; the
per-sample probe is one ``jnp.take`` gather from an ``[R³]`` table —
a few MB resident in HBM, negligible next to the fused-MLP kernel it
replaces. (CLAUDE.md's no-gathers rule targets per-sample *sorting/search*
structures; a single table probe that eliminates an MLP pass is the
trade the rule exists to protect.)

Semantics: flag-gated, serving-only (training keeps the reference's
learned coarse net, which the fine resample is trained against). The fine
pass is bitwise-unchanged in *structure* — same stratified probe depths,
same inverse-CDF resample RNG stream — only the weights driving the
resample come from the grid instead of the coarse net, so expect
sub-0.1 dB deltas at adequate grid resolution (measured numbers in
BASELINE.md).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig


class OccupancyGrid(NamedTuple):
    """A baked density probe table (a jax pytree; jit/shard_map friendly).

    ``values``: ``[rx, ry, rz]`` ReLU'd (optionally dilated) sigma at the
    lattice vertices of ``linspace(bbox_min, bbox_max, res)`` per axis —
    kept 3-D so the lattice shape stays *static* under tracing (every
    field of a NamedTuple pytree is a traced leaf; shapes are not).
    """
    values: jnp.ndarray        # [rx, ry, rz] float32
    bbox_min: jnp.ndarray      # [3]
    inv_spacing: jnp.ndarray   # [3] — (res-1) / (bbox_max - bbox_min)


@functools.lru_cache(maxsize=16)
def _bake_fn(mlp: NerfMLPConfig, compute_dtype, res: tuple,
             dilate: int, chunk: int, use_pallas: bool, interpret: bool):
    """One jitted whole-bake program per (architecture, dtype, lattice).

    Everything stays on device: the lattice is generated from iota (no
    [res³, 3] host build + upload), the density query runs the fused
    Pallas kernel on TPU (the jnp oracle elsewhere), and the dilation is
    a ``reduce_window`` max-pool — so a rebake moves only the ~MB of
    weights, not 3×res³ floats through the (slow) host link. The first
    all-host implementation measured 9.0 s per 192³ bake on the tunneled
    v5e — almost all lattice upload + sigma download + scipy — which
    inverted --occ_train's 1.64× step win into a 0.61× net loss at the
    default 1000-step rebake cadence.
    """
    import jax
    from jax import lax

    from cvnerf_tpu.models.nerf_mlp import apply_nerf
    from cvnerf_tpu.ops.encoding import freq_encode

    rx, ry, rz = res
    n = rx * ry * rz
    n_blocks = -(-n // chunk)

    def _sigma(params, pts):
        if use_pallas:
            from cvnerf_tpu.ops.pallas import fused_nerf_train_apply
            raw = fused_nerf_train_apply(params, pts, jnp.zeros_like(pts),
                                         mlp, compute_dtype, 4096, interpret)
            return raw[:, 3]
        enc = freq_encode(pts, mlp.xyz_freqs)
        dir_enc = jnp.zeros(pts.shape[:-1] + (mlp.dir_dim,), pts.dtype)
        raw = apply_nerf(params, enc, dir_enc, mlp,
                         compute_dtype=compute_dtype)
        return raw[..., 3]

    @jax.jit
    def run(params, lo, hi):
        step = (hi - lo) / jnp.asarray([rx - 1, ry - 1, rz - 1], jnp.float32)

        def one(b):
            flat = b * chunk + lax.iota(jnp.int32, chunk)
            i, j, k = flat // (ry * rz), (flat // rz) % ry, flat % rz
            # np.linspace semantics exactly: lo + i*step with the endpoint
            # pinned to hi (the bake-vs-direct-apply equivalence tests and
            # the mesh path's host linspace agree bit-for-bit this way).
            ijk = jnp.stack([i, j, k], -1)
            pts = jnp.where(
                ijk == jnp.asarray([rx - 1, ry - 1, rz - 1]), hi,
                lo + ijk.astype(jnp.float32) * step)
            return _sigma(params, pts)

        sig = lax.map(one, lax.iota(jnp.int32, n_blocks))
        occ = jnp.maximum(sig.reshape(-1)[:n].reshape(rx, ry, rz), 0.0)
        if dilate > 0:
            w = 2 * dilate + 1
            # Max-pool with -inf SAME padding == scipy maximum_filter
            # mode="nearest" (the window always contains its own center,
            # and a replicated edge value is a duplicate of an in-window
            # value, so both reduce to the valid-window max).
            occ = lax.reduce_window(occ, -jnp.inf, lax.max,
                                    (w, w, w), (1, 1, 1), "SAME")
        return occ.astype(jnp.float32)

    return run


def bake_occupancy(net_params: dict, mlp: NerfMLPConfig,
                   bbox_min, bbox_max, resolution: int = 128,
                   dilate: int = 1, chunk: int = 65536,
                   compute_dtype=jnp.float32,
                   pallas: str = "auto") -> OccupancyGrid:
    """Sample ``relu(sigma)`` on a lattice and dilate it conservatively.

    ``dilate``: radius of a max-pool over the lattice (size ``2*dilate+1``).
    Dilation guards thin structures that would otherwise fall between
    lattice vertices: a surface missed by the probe gets zero resample
    weight and vanishes from the render, so over-including (a slightly
    fatter occupied region costs a few wasted fine samples) is strictly
    safer than under-including.

    Runs as ONE device program (lattice gen → MLP → ReLU → max-pool); only
    the weights cross the host link. ``pallas`` follows the same dispatch
    rule as ``RenderConfig.resolve_pallas``: ``"auto"`` picks the fused
    kernel on TPU and the jnp oracle elsewhere, ``"on"``/``"off"`` force it,
    ``"interpret"`` runs the kernel in the Pallas interpreter (how the CPU
    test suite covers this glue).
    """
    res = tuple(int(r) for r in
                np.broadcast_to(np.asarray(resolution, np.int32), (3,)))
    lo = np.asarray(bbox_min, np.float32)
    hi = np.asarray(bbox_max, np.float32)
    if not (hi > lo).all() or min(res) < 2:
        raise ValueError(f"bad grid spec: bbox {lo}..{hi}, res {res}")
    if pallas == "auto":
        from cvnerf_tpu.ops.pallas.fused_mlp import pallas_supported
        use_pallas = pallas_supported()
    elif pallas in ("on", "off", "interpret"):
        use_pallas = pallas != "off"
    else:
        raise ValueError(f"bad pallas mode: {pallas!r}")
    run = _bake_fn(mlp, compute_dtype, res, int(dilate),
                   int(chunk), use_pallas, pallas == "interpret")
    values = run(net_params, jnp.asarray(lo), jnp.asarray(hi))
    inv_spacing = (np.asarray(res, np.float32) - 1) / (hi - lo)
    return OccupancyGrid(values=values,
                         bbox_min=jnp.asarray(lo),
                         inv_spacing=jnp.asarray(inv_spacing))


def scene_bbox(ndc: bool, bound: float) -> tuple[tuple, tuple]:
    """The region the model was trained in: the NDC frustum box for NDC
    scenes (x, y ∈ [-1, 1], z ∈ [0, 1]), a ``±bound`` cube otherwise."""
    if ndc:
        return (-1.0, -1.0, 0.0), (1.0, 1.0, 1.0)
    return (-bound,) * 3, (bound,) * 3


def bake_scene_occupancy(params: dict, mlp: NerfMLPConfig, *,
                         ndc: bool, bound: float, n_fine: int,
                         resolution: int = 192, dilate: int = 1,
                         compute_dtype=jnp.float32,
                         pallas: str = "auto",
                         mesh=None) -> OccupancyGrid:
    """Box choice + net choice + bake (+ mesh replication) in one place.

    The one entry point shared by ``serve.NerfRenderer.enable_occupancy``
    and the train CLI's ``--render_only --occupancy`` path, so the two
    can't drift (they once did: the CLI copy forgot the mesh replication).
    ``params`` is the full two-net dict; the net the fine resample is
    driven by is picked the same way the renderer picks it.
    """
    import jax
    bb_min, bb_max = scene_bbox(ndc, bound)
    net = "fine" if n_fine > 0 else "coarse"
    occ = bake_occupancy(jax.tree.map(np.asarray, params[net]), mlp,
                         bb_min, bb_max, resolution=resolution,
                         dilate=dilate, compute_dtype=compute_dtype,
                         pallas=pallas)
    if mesh is not None:
        from cvnerf_tpu.parallel.mesh import replicate_to_mesh
        occ = replicate_to_mesh(occ, mesh)
    return occ


def occupied_fraction(grid: OccupancyGrid) -> float:
    """Fraction of lattice vertices with positive baked density.

    Zero means the bake found no surface anywhere in the bbox. Resampling
    through an all-empty grid gives every ray ``sample_pdf``'s ε-uniform
    fallback CDF, and on a near-collapsed density field those uniform
    samples can land exclusively in ``relu' = 0`` territory — the training
    gradient becomes exactly zero and never recovers (observed on
    micro-fixtures). ``--occ_train`` therefore refuses to install an empty
    grid (``train.loop.maybe_set_occupancy``).

    Computed device-side: only the scalar crosses to host (a res-192 table
    is ~28 MB — never ``np.asarray`` a big array on the tunneled TPU,
    CLAUDE.md).
    """
    return float(jnp.mean((grid.values > 0).astype(jnp.float32)))


def probe_sigma(grid: OccupancyGrid, points: jnp.ndarray,
                interp: str = "nearest") -> jnp.ndarray:
    """Probe dispatcher: ``"nearest"`` (production default) or
    ``"trilinear"``.

    Trilinear was built to fix the nearest probe's piecewise-constant CDF
    (ROADMAP item 25: full-mode occ-train's real-content quality cliff —
    sample placement snaps to lattice cells). MEASURED round 4
    (occupancy_ab.py, ref_lego@3k, res 192): the 4-z-row gather traffic
    costs ~7x the nearest probe and inverts every occupancy speedup
    (merge 1.13x -> 0.50x, full 1.64x -> 0.58x) for +0.001 dB (merge) /
    +0.06 dB (full) — so interpolation stays OPT-IN and ``"nearest"``
    (the round-3 pinned behavior) is the default everywhere.
    """
    if interp == "trilinear":
        return occupancy_sigma_trilinear(grid, points)
    if interp == "nearest":
        return occupancy_sigma(grid, points)
    raise ValueError(f"bad occupancy interp: {interp!r}")


def occupancy_sigma_trilinear(grid: OccupancyGrid,
                              points: jnp.ndarray) -> jnp.ndarray:
    """Trilinearly interpolated sigma at ``points [..., 3]`` → ``[...]``.

    Same clamp-to-boundary semantics as the nearest probe (outside the
    bbox the probe saturates at the boundary value), and exactly equal to
    it at lattice vertices.

    Lowering follows the measured gather discipline (see
    ``occupancy_sigma``): per-point scalar gathers are the slow path on
    TPU, so fetch the four (x, y) z-ROWS of the cell's corners with one
    wide ``jnp.take`` and do the z-lerp as a single one-hot VPU
    contraction — the contraction weight vector IS the z interpolation
    ``(1-fz)·[z==z0] + fz·[z==z0+1]`` — then finish with a 4-value
    bilinear lerp in (x, y).
    """
    rx, ry, rz = grid.values.shape
    pts = points.astype(jnp.float32)
    c = (pts - grid.bbox_min) * grid.inv_spacing
    c = jnp.clip(c, 0.0, jnp.asarray([rx - 1, ry - 1, rz - 1], jnp.float32))
    i0 = jnp.clip(jnp.floor(c), 0.0,
                  jnp.asarray([rx - 2, ry - 2, rz - 2], jnp.float32))
    f = c - i0                                   # [.., 3] in [0, 1]
    i0 = i0.astype(jnp.int32)

    flat_shape = points.shape[:-1]
    x0 = i0[..., 0].reshape(-1)
    y0 = i0[..., 1].reshape(-1)
    z0 = i0[..., 2].reshape(-1)
    fx = f[..., 0].reshape(-1)
    fy = f[..., 1].reshape(-1)
    fz = f[..., 2].reshape(-1)

    table = grid.values.reshape(rx * ry, rz)
    r00 = x0 * ry + y0
    rows = jnp.take(table,
                    jnp.stack([r00, r00 + 1, r00 + ry, r00 + ry + 1], -1),
                    axis=0)                      # [n, 4, rz]
    zr = jnp.arange(rz, dtype=jnp.int32)[None, :]
    wz = ((zr == z0[:, None]).astype(jnp.float32) * (1.0 - fz)[:, None]
          + (zr == z0[:, None] + 1).astype(jnp.float32) * fz[:, None])
    v = jnp.einsum("nkz,nz->nk", rows, wz)       # [n, 4] = v00 v01 v10 v11
    vx0 = v[:, 0] * (1.0 - fy) + v[:, 1] * fy
    vx1 = v[:, 2] * (1.0 - fy) + v[:, 3] * fy
    return (vx0 * (1.0 - fx) + vx1 * fx).reshape(flat_shape)


def occupancy_sigma(grid: OccupancyGrid, points: jnp.ndarray) -> jnp.ndarray:
    """Probe the grid at ``points [..., 3]`` → nearest-vertex sigma ``[...]``.

    Points outside the bbox clamp to the boundary vertices; a bake bbox
    chosen to enclose the scene leaves those near-zero, which correctly
    assigns (almost) no resample weight to empty space outside the box
    (``sample_pdf``'s ε=1e-5 keeps the CDF well-defined even for rays that
    miss the box entirely — they fall back to near-uniform placement).

    Lowering (measured on v5e, 262k points, 64³ table): per-point scalar
    gathers cost 2.7 ms — per-gather overhead, flat in table size — which
    eats most of the coarse-MLP savings this grid exists to win. Instead,
    gather a whole z-ROW per point (wide gathers amortize the overhead
    across a vector: 1.7 ms) and select the z cell with a one-hot
    contraction on the VPU (the same gather→compare-count substitution the
    renderer's sampling ops use; CLAUDE.md "TPU-hostile patterns").
    """
    rx, ry, rz = grid.values.shape
    idx = jnp.round((points - grid.bbox_min) * grid.inv_spacing)
    idx = jnp.clip(idx, 0, jnp.asarray([rx - 1, ry - 1, rz - 1],
                                       points.dtype)).astype(jnp.int32)
    flat_shape = points.shape[:-1]
    row_ids = (idx[..., 0] * ry + idx[..., 1]).reshape(-1)
    rows = jnp.take(grid.values.reshape(rx * ry, rz), row_ids,
                    axis=0)                               # [n, rz]
    z_onehot = (idx[..., 2].reshape(-1)[:, None]
                == jnp.arange(rz, dtype=jnp.int32)[None, :])
    return jnp.sum(rows * z_onehot.astype(rows.dtype),
                   axis=-1).reshape(flat_shape)


def occupancy_ray_bounds(grid: OccupancyGrid,
                         rays_o: jnp.ndarray,
                         rays_d: jnp.ndarray,
                         near: jnp.ndarray,
                         far: jnp.ndarray,
                         eps: float = 1e-3,
                         n_probe: int = 128,
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tighten per-ray [near, far] from the baked grid: empty-space skip
    at the front, transmittance termination at the back.

    The compositor always evaluates every sample (ops/compositing.py), so
    once transmittance along a ray is ~0 the remaining fine-MLP work is
    wasted — and before the first occupied voxel it was never useful.
    Point-level compaction is TPU-hostile (dynamic shapes, or per-sample
    gathers that cost more than they save — the lowering measurements in
    ``occupancy_sigma``); tightening the RAY INTERVAL instead keeps every
    shape static and every op vectorized: all n_coarse stratified samples
    (and therefore the resampled fine samples) land inside the region that
    actually contributes. Equal sample counts then oversample the visible
    region (quality up), so REDUCED counts hold quality at higher speed —
    the measured trade lives in BASELINE.md.

    Method (gather-free beyond the probe itself): march ``n_probe``
    uniform probes over [near, far]; probe sigma; alpha/transmittance with
    the compositor's exact math;
      new near = one probe step before the first occupied probe,
      new far  = one probe step after transmittance first drops below
                 ``eps``
    (the step margins + the bake's dilation keep the clamp conservative).
    Rays whose probes never see density, or whose transmittance never
    saturates, keep their original bound(s). Probe indices come from
    compare-count reductions (no searchsorted/gather; CLAUDE.md).

    Reference parity: none — the reference has no acceleration structure
    at all (its coarse net runs on every render forever, main.py:221-244);
    this is a serving-only, flag-gated addition (``--occ_term``).
    """
    n = rays_o.shape[0]
    near = jnp.broadcast_to(jnp.asarray(near, jnp.float32), (n,))
    far = jnp.broadcast_to(jnp.asarray(far, jnp.float32), (n,))
    step = (far - near) / (n_probe - 1)                      # [n]
    t = near[:, None] + step[:, None] * jnp.arange(
        n_probe, dtype=jnp.float32)[None, :]                 # [n, K]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
    # Always the NEAREST probe: the march is a conservative occupied/
    # transmittance test whose margin is the bake's dilation + one probe
    # step; the trilinear probe's measured ~7x gather cost would exceed
    # the MLP work the tightening saves (BASELINE.md round-4 matrix).
    sigma = probe_sigma(grid, pts, "nearest")                # [n, K]

    # Compositor math at the probe resolution (uniform deltas; the last
    # probe's terminal delta is irrelevant to the indices we extract).
    delta = step[:, None] * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-jnp.maximum(sigma, 0.0) * delta)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    # exclusive: T_i = prod_{j<i}; roll and pin T_0 = 1
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)

    occupied = sigma > 0.0                                   # [n, K]
    any_occ = jnp.any(occupied, axis=-1)
    # index of first occupied probe = count of the leading unoccupied run
    first_occ = jnp.sum((jnp.cumsum(occupied.astype(jnp.int32), axis=-1)
                         == 0).astype(jnp.int32), axis=-1)   # [n]
    terminated = trans < eps
    any_term = jnp.any(terminated, axis=-1)
    first_term = jnp.sum((jnp.cumsum(terminated.astype(jnp.int32), axis=-1)
                          == 0).astype(jnp.int32), axis=-1)  # [n]

    # t is an affine function of the index — closed form, no gather.
    t_first = near + first_occ.astype(jnp.float32) * step
    t_term = near + first_term.astype(jnp.float32) * step
    new_near = jnp.where(any_occ, jnp.maximum(t_first - step, near), near)
    new_far = jnp.where(any_term, jnp.minimum(t_term + step, far), far)
    # Degenerate guard (can only trigger on pathological eps): keep a
    # minimal positive interval so stratified sampling stays well-formed.
    new_far = jnp.maximum(new_far, new_near + 1e-4 * (far - near))
    return new_near, new_far
