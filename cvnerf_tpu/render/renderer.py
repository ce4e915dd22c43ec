"""The coarse/fine hierarchical volume renderer.

Parity target: reference ``render_rays`` (``main.py:207-261``) — stratified
coarse sampling, coarse MLP query, compositing, inverse-CDF importance
resampling on detached weights, sort-merge with the coarse depths, fine MLP
query, final composite, returning both the fine and coarse RGB maps.

TPU-first restructure (SURVEY.md §7): there is **no host chunk loop** — the
whole ray batch is one traced computation. Memory for large (full-image) ray
counts is bounded by ``render_rays_chunked``, which is a ``lax.map`` over
static-shape chunks *inside* jit, so XLA pipelines chunk i+1's compute with
chunk i's writes instead of relaunching from Python (replacing reference
``batch_rays``, ``main.py:90-99``). The sample axis stays chip-local; the ray
axis is the sharding axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig, apply_nerf
from cvnerf_tpu.ops.compositing import volume_render
from cvnerf_tpu.ops.encoding import freq_encode
from cvnerf_tpu.ops.sampling import sample_pdf, stratified_samples


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render-time configuration (hashable, jit-static).

    Mirrors the reference's ``render_kwargs_train/test`` dicts
    (``main.py:148-166``) as a typed, hashable object.
    """
    n_coarse: int = 64
    n_fine: int = 128
    perturb: bool = True            # stratified jitter (main.py:227)
    noise_std: float = 0.0          # density noise (main.py:186-191)
    white_bkg: bool = False
    deterministic_resample: bool = False  # original-NeRF det path (not in ref)
    # Draw the inverse-CDF uniforms pre-sorted per ray (exponential-spacings
    # order statistics — the same DISTRIBUTION as sorting iid draws, see
    # ops/rng.ray_sorted_uniform), so the coarse/fine depth union needs a
    # log2-stage bitonic merge instead of a 192-wide sort. False restores
    # the reference-shaped iid-draws-then-sort stream (main.py:251).
    sorted_resample: bool = True
    # Occupancy-grid serving (render.occupancy; active only when a baked
    # grid is passed to the render call): "merge" keeps the reference fine
    # pass (probe depths merged with the resample — n_coarse + n_fine MLP
    # evals), "full" draws ALL fine samples from the probe CDF and skips
    # the merge (n_fine evals only — half the MLP work of the reference
    # pipeline at n_coarse=64/n_fine=128).
    occupancy_mode: str = "merge"
    # Occupancy probe interpolation: "nearest" (production default) or
    # "trilinear" (continuous-in-depth probe CDF). Trilinear was built to
    # fix full-mode's piecewise-constant-CDF quality cliff (ROADMAP item
    # 25) but MEASURED as a serving regression on real content (round 4,
    # scripts/occupancy_ab.py on ref_lego@3k): the 4-z-row gather traffic
    # costs ~7x the nearest probe — merge mode 1.13x -> 0.50x, full mode
    # 1.64x -> 0.58x — for +0.001 dB (merge) / +0.06 dB (full). Opt-in
    # only. Only active when a grid is passed.
    occupancy_interp: str = "nearest"
    # Full-mode stratified coverage floor: k of the n_fine resamples are
    # drawn stratified over the whole [near, far] instead of the probe
    # CDF (same fine-eval count — n_fine - k CDF draws + k coverage).
    # Addresses full-mode occ-train's measured real-content cliff
    # (ROADMAP item 25: the stale/quantized grid CDF starves geometry
    # that still needs to move of samples). 0 = pure probe-CDF sampling
    # (round-3 behavior). Only active in occupancy_mode="full".
    occ_floor: int = 0
    # Early ray termination / empty-space skip (serving-only, needs a
    # grid): tighten each ray's [near, far] by probe-marching the grid —
    # near moves to the first occupied probe, far to where probe
    # transmittance drops below this epsilon (0 = off). Static shapes
    # throughout (occupancy.occupancy_ray_bounds); all samples then land
    # where they contribute, so REDUCED sample counts hold quality at
    # higher speed (measured trade in BASELINE.md).
    occupancy_termination: float = 0.0
    termination_probes: int = 128
    # Also return the fine pass's compositing weights and depths
    # (``"weights"``/``"t"`` keys). Training-only plumbing for weight-space
    # regularizers (``TrainConfig.distortion_loss``); off by default so the
    # eval/chunked path never stacks [n_rays, n_samples] extras.
    return_weights: bool = False
    mlp: NerfMLPConfig = NerfMLPConfig()
    compute_dtype: Any = jnp.float32
    # MLP execution path: "auto" uses the fused Pallas kernel on TPU and the
    # jnp oracle elsewhere; "on"/"off" force it; "interpret" runs the kernel
    # in the Pallas interpreter (CPU equivalence testing).
    pallas: str = "auto"

    def eval_mode(self) -> "RenderConfig":
        """Test-time variant: no jitter, no density noise (main.py:163-165)."""
        return dataclasses.replace(self, perturb=False, noise_std=0.0)

    def resolve_pallas(self) -> bool:
        if self.pallas == "auto":
            from cvnerf_tpu.ops.pallas.fused_mlp import pallas_supported
            return pallas_supported()
        if self.pallas in ("on", "interpret"):
            return True
        if self.pallas == "off":
            return False
        raise ValueError(f"bad pallas mode: {self.pallas!r}")


def _query_mlp(params: dict, points: jnp.ndarray, viewdirs: jnp.ndarray,
               cfg: RenderConfig) -> jnp.ndarray:
    """Encode and evaluate the MLP at ``points`` ``[n_rays, n_samples, 3]``.

    Replaces reference ``net_forward`` + ``combine`` (``model.py:110-131``):
    no flatten/chunk round-trips. On TPU this runs the fused Pallas
    encode→MLP kernel (ops/pallas) with its custom VJP; elsewhere the jnp
    oracle, whose encoding XLA fuses into the first matmul's operand.

    Passing :class:`~cvnerf_tpu.ops.quantize.QuantizedNerfParams` instead
    of a float pytree routes through the int8 serving path (the Pallas
    int8 kernel on TPU, the jnp int8 oracle elsewhere) — quantization is a
    param transform, dispatched by type like the occupancy grid.
    """
    from cvnerf_tpu.ops.quantize import QuantizedNerfParams
    if isinstance(params, QuantizedNerfParams):
        # The int8 kernel tiles int8 as (32, 128): odd architectures fall
        # back to the jnp oracle instead of raising mid-render.
        kernel_ok = (cfg.mlp.trunk_width % 32 == 0
                     and cfg.mlp.head_width % 32 == 0)
        if cfg.resolve_pallas() and kernel_ok:
            from cvnerf_tpu.ops.pallas.fused_mlp_int8 import (
                fused_nerf_apply_int8)
            n_rays, n_samples = points.shape[:2]
            pts_flat = points.reshape(-1, 3)
            dirs_flat = jnp.broadcast_to(
                viewdirs[:, None, :], (n_rays, n_samples, 3)).reshape(-1, 3)
            raw = fused_nerf_apply_int8(params, pts_flat, dirs_flat, cfg.mlp,
                                        interpret=cfg.pallas == "interpret")
            return raw.reshape(n_rays, n_samples, 4)
        from cvnerf_tpu.ops.quantize import apply_nerf_quant
        xyz_enc = freq_encode(points, cfg.mlp.xyz_freqs)
        dir_enc = freq_encode(viewdirs, cfg.mlp.dir_freqs)
        dir_enc = jnp.broadcast_to(dir_enc[..., None, :],
                                   (*points.shape[:-1], dir_enc.shape[-1]))
        return apply_nerf_quant(params, xyz_enc, dir_enc, cfg.mlp)

    if cfg.resolve_pallas():
        from cvnerf_tpu.ops.pallas import fused_nerf_train_apply
        n_rays, n_samples = points.shape[:2]
        pts_flat = points.reshape(-1, 3)
        dirs_flat = jnp.broadcast_to(
            viewdirs[:, None, :], (n_rays, n_samples, 3)).reshape(-1, 3)
        # tile=4096: the fwd kernel's bf16 cap (measured ~2% faster than
        # 2048; fp32 is capped to 2048 and the bwd kernel to 1024/512
        # internally, so this only widens the bf16 forward).
        raw = fused_nerf_train_apply(params, pts_flat, dirs_flat, cfg.mlp,
                                     cfg.compute_dtype, 4096,
                                     cfg.pallas == "interpret")
        return raw.reshape(n_rays, n_samples, 4)

    xyz_enc = freq_encode(points, cfg.mlp.xyz_freqs)
    # Per-sample viewdirs: broadcast the per-ray unit dir over samples
    # (reference model.py:114-117).
    dir_enc = freq_encode(viewdirs, cfg.mlp.dir_freqs)
    dir_enc = jnp.broadcast_to(dir_enc[..., None, :],
                               (*points.shape[:-1], dir_enc.shape[-1]))
    return apply_nerf(params, xyz_enc, dir_enc, cfg.mlp,
                      compute_dtype=cfg.compute_dtype)


def _per_ray_uniform(key: jax.Array, tag: int, ray_ids: jnp.ndarray,
                     n: int) -> jnp.ndarray:
    """[len(ray_ids), n] uniforms keyed by (key, tag, global ray id).

    Keying randomness to the *global* ray id makes every render bitwise
    invariant to sharding and chunk size: a ray draws the same jitter /
    resample / noise stream whether it runs on 1 chip or 256, in one chunk
    or many. (The reference's torch RNG is a single global stream, so its
    results change with chunk size; SURVEY.md §7 "RNG semantics".)

    Derivation is a single bulk counter-based threefry pass (ops/rng.py),
    not a vmapped per-ray fold_in — same invariance contract, ~2 ms less
    per 8192-ray chunk.
    """
    from cvnerf_tpu.ops.rng import ray_uniform
    return ray_uniform(key, tag, ray_ids, n)


def _per_ray_normal(key: jax.Array, tag: int, ray_ids: jnp.ndarray,
                    n: int) -> jnp.ndarray:
    from cvnerf_tpu.ops.rng import ray_normal
    return ray_normal(key, tag, ray_ids, n)


def render_rays(key: jax.Array,
                params: dict,
                rays_o: jnp.ndarray,
                rays_d: jnp.ndarray,
                viewdirs: jnp.ndarray,
                near: jnp.ndarray,
                far: jnp.ndarray,
                cfg: RenderConfig,
                ray_ids: jnp.ndarray | None = None,
                noise_scale: jnp.ndarray | float = 1.0,
                occupancy=None) -> dict:
    """Hierarchical volume render of a ray batch.

    Args:
        key: PRNG key (consumed for jitter / resampling / density noise).
        params: ``{"coarse": pytree, "fine": pytree}``. ``fine`` may equal
            ``coarse`` (weight sharing) but is a separate net by default,
            matching reference ``main.py:133-136``.
        rays_o, rays_d: ``[n_rays, 3]`` (possibly NDC-transformed) rays.
        viewdirs: ``[n_rays, 3]`` unit view directions — computed from the
            *pre-NDC* directions, the reference's convention
            (``main.py:61-63``).
        near, far: ``[n_rays]`` or scalar bounds.
        ray_ids: ``[n_rays]`` global ray indices for RNG keying (defaults to
            ``arange``); pass the *global* position when calling from a
            shard or chunk so randomness is partition-invariant.
        noise_scale: traced multiplier on the density-noise std (the
            trainer's ``--noise_decay`` annealing; 1.0 = the reference's
            constant-noise behavior, main.py:186-191). Only meaningful when
            ``cfg.noise_std > 0``.
        occupancy: optional baked ``OccupancyGrid`` (serving-only,
            ``render.occupancy``): the coarse MLP pass is replaced by a
            grid probe at the same stratified depths — identical fine-pass
            structure and RNG stream, 25% fewer MLP evaluations. The
            returned ``rgb_coarse`` aliases the fine map (no coarse image
            exists on this path).
    Returns:
        dict with ``rgb`` (fine map), ``rgb_coarse``, plus the fine pass's
        ``acc`` (accumulated opacity) and ``depth`` (expected termination
        depth) extras.
    """
    n_rays = rays_o.shape[0]
    if ray_ids is None:
        ray_ids = jnp.arange(n_rays, dtype=jnp.int32)

    if occupancy is not None and cfg.occupancy_termination > 0.0:
        # Early termination / empty-space skip: probe-march the grid and
        # tighten the per-ray sampling interval before any MLP work.
        from cvnerf_tpu.render.occupancy import occupancy_ray_bounds
        near, far = occupancy_ray_bounds(
            occupancy, rays_o, rays_d, near, far,
            eps=cfg.occupancy_termination, n_probe=cfg.termination_probes)

    # --- Coarse pass (reference main.py:221-244) ---
    u_strat = (_per_ray_uniform(key, 1, ray_ids, cfg.n_coarse)
               if cfg.perturb else None)
    t_coarse = stratified_samples(None, near, far, cfg.n_coarse, n_rays,
                                  cfg.perturb, u=u_strat)
    points = rays_o[..., None, :] + rays_d[..., None, :] * t_coarse[..., :, None]
    if occupancy is not None:
        # Probe the baked grid for resample weights: one gather per
        # sample point, no coarse MLP, no coarse image.
        from cvnerf_tpu.render.occupancy import probe_sigma
        sigma = probe_sigma(occupancy, points, cfg.occupancy_interp)
        raw = jnp.concatenate(
            [jnp.zeros((*sigma.shape, 3), sigma.dtype), sigma[..., None]],
            axis=-1)
        coarse = volume_render(raw, t_coarse, rays_d, noise_std=0.0,
                               white_bkg=cfg.white_bkg, noise=None)
    else:
        raw = _query_mlp(params["coarse"], points, viewdirs, cfg)
        noise_c = (_per_ray_normal(key, 3, ray_ids, cfg.n_coarse)
                   * noise_scale if cfg.noise_std > 0 else None)
        coarse = volume_render(raw, t_coarse, rays_d,
                               noise_std=cfg.noise_std,
                               white_bkg=cfg.white_bkg, noise=noise_c)

    # --- Fine pass (reference main.py:247-257; runs unconditionally even at
    # n_fine == 0, where it re-evaluates the fine net on the coarse depths —
    # SURVEY.md §2.3-4) ---
    occ_full = (occupancy is not None and cfg.occupancy_mode == "full"
                and cfg.n_fine > 0)
    if occ_full and not 0 <= cfg.occ_floor < cfg.n_fine:
        raise ValueError(
            f"occ_floor={cfg.occ_floor} must be in [0, n_fine="
            f"{cfg.n_fine}) — the floor replaces part of the fine "
            "budget, it does not extend it")
    if cfg.n_fine > 0:
        mids = 0.5 * (t_coarse[..., 1:] + t_coarse[..., :-1])
        presorted = cfg.sorted_resample or cfg.deterministic_resample
        # Full-mode stratified floor (see below): k of the n_fine budget
        # come from a coverage draw, so only n_fine - k are CDF resamples
        # — the fine eval count stays exactly n_fine.
        n_pdf = (cfg.n_fine - cfg.occ_floor
                 if (occ_full and cfg.occ_floor > 0) else cfg.n_fine)
        if cfg.deterministic_resample:
            u_pdf = None
        elif cfg.sorted_resample:
            from cvnerf_tpu.ops.rng import ray_sorted_uniform
            u_pdf = ray_sorted_uniform(key, 2, ray_ids, n_pdf)
        else:
            u_pdf = _per_ray_uniform(key, 2, ray_ids, n_pdf)
        t_new = sample_pdf(None, mids, coarse["weights"][..., 1:-1],
                           n_pdf,
                           deterministic=cfg.deterministic_resample,
                           u=u_pdf)
        t_new = jax.lax.stop_gradient(t_new)  # reference detaches (main.py:250)
        if occ_full:
            # Full occupancy sampling: every fine sample comes from the
            # probe CDF; the probe depths are NOT merged into the fine
            # MLP pass (they carried no learned color/density to reuse),
            # so the network runs on n_fine points instead of
            # n_coarse + n_fine — half the evals at the reference shape.
            t_fine = (t_new if presorted
                      else jnp.sort(t_new, axis=-1))
            if cfg.occ_floor > 0:
                # Stratified coverage floor (round 4): k of the n_fine
                # samples come from a stratified draw over the FULL
                # [near, far] instead of the probe CDF — same eval count,
                # different placement. Root cause this addresses
                # (ROADMAP item 25, measured): the baked grid's CDF is
                # stale/dilated/quantized, so geometry that still needs
                # to move can receive no samples at all under pure
                # full-mode sampling and training degrades on complex
                # scenes; the floor guarantees gradient coverage
                # everywhere on the ray. RNG tag 5 (per-ray, partition-
                # invariant like every other draw).
                u_floor = (_per_ray_uniform(key, 5, ray_ids,
                                            cfg.occ_floor)
                           if cfg.perturb else None)
                t_floor = stratified_samples(None, near, far,
                                             cfg.occ_floor, n_rays,
                                             cfg.perturb, u=u_floor)
                from cvnerf_tpu.ops.sampling import merge_sorted
                t_fine = merge_sorted(t_floor, t_fine)
        elif presorted:
            # u ascending → inverse-CDF output ascending → merge, not sort
            # (reference main.py:251 sort-merge semantics, same result).
            from cvnerf_tpu.ops.sampling import merge_sorted
            t_fine = merge_sorted(t_coarse, t_new)
        else:
            t_fine = jnp.sort(jnp.concatenate([t_coarse, t_new], axis=-1),
                              axis=-1)
    else:
        t_fine = t_coarse

    points = rays_o[..., None, :] + rays_d[..., None, :] * t_fine[..., :, None]
    raw = _query_mlp(params["fine"], points, viewdirs, cfg)
    noise_f = (_per_ray_normal(key, 4, ray_ids, t_fine.shape[-1]) * noise_scale
               if cfg.noise_std > 0 else None)
    fine = volume_render(raw, t_fine, rays_d,
                         noise_std=cfg.noise_std,
                         white_bkg=cfg.white_bkg, noise=noise_f)

    out = {
        "rgb": fine["rgb"],
        "rgb_coarse": (fine["rgb"] if occupancy is not None
                       else coarse["rgb"]),
        "acc": fine["acc"],
        "depth": fine["depth"],
    }
    if cfg.return_weights:
        out["weights"] = fine["weights"]
        out["t"] = t_fine
    return out


def render_rays_chunked(key: jax.Array,
                        params: dict,
                        rays_o: jnp.ndarray,
                        rays_d: jnp.ndarray,
                        viewdirs: jnp.ndarray,
                        near: float,
                        far: float,
                        cfg: RenderConfig,
                        chunk: int = 4096,
                        mesh=None,
                        occupancy=None) -> dict:
    """Memory-bounded render of a large flat ray batch, inside jit.

    ``lax.map`` over ``[n_chunks, chunk, ...]`` reshaped rays: one compiled
    program regardless of ray count, with intermediate ``[chunk, n_samples,
    width]`` activations bounded to a constant working set. Rays are padded
    to a chunk multiple and the padding is dropped on return. Per-ray RNG is
    keyed by global ray index, so results are bitwise independent of the
    chunk size — and of the mesh size when ``mesh`` is given, in which case
    each chunk's rays are split across the mesh under ``shard_map`` (frame
    rendering scales with chips; rays are embarrassingly parallel).
    """
    n = rays_o.shape[0]
    if mesh is not None and chunk % mesh.devices.size != 0:
        raise ValueError(
            f"chunk={chunk} must be divisible by mesh size "
            f"{mesh.devices.size}")
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def pad0(x):
        return jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)])

    ro, rd, vd = pad0(rays_o), pad0(rays_d), pad0(viewdirs)
    ro = ro.reshape(n_chunks, chunk, 3)
    rd = rd.reshape(n_chunks, chunk, 3)
    vd = vd.reshape(n_chunks, chunk, 3)
    ids = jnp.arange(n_chunks * chunk, dtype=jnp.int32).reshape(
        n_chunks, chunk)

    def chunk_render(p, occ, o, d, v, i):
        m = o.shape[0]
        return render_rays(key, p, o, d, v,
                           jnp.full((m,), near, jnp.float32),
                           jnp.full((m,), far, jnp.float32), cfg,
                           ray_ids=i, occupancy=occ)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from cvnerf_tpu.parallel.mesh import RAY_AXIS
        # params and the occupancy table are replicated; rays shard.
        sharded = jax.shard_map(
            chunk_render, mesh=mesh,
            in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS),
                      P(RAY_AXIS)),
            out_specs=P(RAY_AXIS), check_vma=False)

        def one(args):
            return sharded(params, occupancy, *args)
    else:
        def one(args):
            return chunk_render(params, occupancy, *args)

    out = jax.lax.map(one, (ro, rd, vd, ids))
    return jax.tree.map(lambda x: x.reshape(n_chunks * chunk, *x.shape[2:])[:n],
                        out)
