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


def bake_occupancy(net_params: dict, mlp: NerfMLPConfig,
                   bbox_min, bbox_max, resolution: int = 128,
                   dilate: int = 1, chunk: int = 65536,
                   compute_dtype=jnp.float32) -> OccupancyGrid:
    """Sample ``relu(sigma)`` on a lattice and dilate it conservatively.

    ``dilate``: radius of a max-pool over the lattice (``scipy``'s
    maximum_filter, size ``2*dilate+1``). Dilation guards thin structures
    that would otherwise fall between lattice vertices: a surface missed by
    the probe gets zero resample weight and vanishes from the render, so
    over-including (a slightly fatter occupied region costs a few wasted
    fine samples) is strictly safer than under-including.
    """
    from cvnerf_tpu.render.mesh import query_density_grid
    sigma = query_density_grid(net_params, mlp, bbox_min, bbox_max,
                               resolution, chunk=chunk,
                               compute_dtype=compute_dtype)
    occ = np.maximum(sigma, 0.0)
    if dilate > 0:
        from scipy.ndimage import maximum_filter
        occ = maximum_filter(occ, size=2 * dilate + 1, mode="nearest")
    res = occ.shape
    lo = np.asarray(bbox_min, np.float32)
    hi = np.asarray(bbox_max, np.float32)
    inv_spacing = (np.asarray(res, np.float32) - 1) / (hi - lo)
    return OccupancyGrid(values=jnp.asarray(occ, jnp.float32),
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
                         dilate=dilate, compute_dtype=compute_dtype)
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
