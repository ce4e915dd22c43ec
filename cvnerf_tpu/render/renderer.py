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
    mlp: NerfMLPConfig = NerfMLPConfig()
    compute_dtype: Any = jnp.float32

    def eval_mode(self) -> "RenderConfig":
        """Test-time variant: no jitter, no density noise (main.py:163-165)."""
        return dataclasses.replace(self, perturb=False, noise_std=0.0)


def _query_mlp(params: dict, points: jnp.ndarray, viewdirs: jnp.ndarray,
               cfg: RenderConfig) -> jnp.ndarray:
    """Encode and evaluate the MLP at ``points`` ``[n_rays, n_samples, 3]``.

    Replaces reference ``net_forward`` + ``combine`` (``model.py:110-131``):
    no flatten/chunk round-trips — encoding broadcasts in place and XLA fuses
    it into the first matmul's operand.
    """
    xyz_enc = freq_encode(points, cfg.mlp.xyz_freqs)
    # Per-sample viewdirs: broadcast the per-ray unit dir over samples
    # (reference model.py:114-117).
    dir_enc = freq_encode(viewdirs, cfg.mlp.dir_freqs)
    dir_enc = jnp.broadcast_to(dir_enc[..., None, :],
                               (*points.shape[:-1], dir_enc.shape[-1]))
    return apply_nerf(params, xyz_enc, dir_enc, cfg.mlp,
                      compute_dtype=cfg.compute_dtype)


def render_rays(key: jax.Array,
                params: dict,
                rays_o: jnp.ndarray,
                rays_d: jnp.ndarray,
                viewdirs: jnp.ndarray,
                near: jnp.ndarray,
                far: jnp.ndarray,
                cfg: RenderConfig) -> dict:
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
    Returns:
        dict with ``rgb`` (fine map), ``rgb_coarse``, plus ``acc``/``depth``/
        ``weights`` extras of the fine pass.
    """
    n_rays = rays_o.shape[0]
    k_strat, k_resample, k_noise_c, k_noise_f = jax.random.split(key, 4)

    # --- Coarse pass (reference main.py:221-244) ---
    t_coarse = stratified_samples(k_strat, near, far, cfg.n_coarse, n_rays,
                                  cfg.perturb)
    points = rays_o[..., None, :] + rays_d[..., None, :] * t_coarse[..., :, None]
    raw = _query_mlp(params["coarse"], points, viewdirs, cfg)
    coarse = volume_render(raw, t_coarse, rays_d,
                           key=k_noise_c, noise_std=cfg.noise_std,
                           white_bkg=cfg.white_bkg)

    # --- Fine pass (reference main.py:247-257; runs unconditionally even at
    # n_fine == 0, where it re-evaluates the fine net on the coarse depths —
    # SURVEY.md §2.3-4) ---
    if cfg.n_fine > 0:
        mids = 0.5 * (t_coarse[..., 1:] + t_coarse[..., :-1])
        t_new = sample_pdf(k_resample, mids, coarse["weights"][..., 1:-1],
                           cfg.n_fine,
                           deterministic=cfg.deterministic_resample)
        t_new = jax.lax.stop_gradient(t_new)  # reference detaches (main.py:250)
        t_fine = jnp.sort(jnp.concatenate([t_coarse, t_new], axis=-1), axis=-1)
    else:
        t_fine = t_coarse

    points = rays_o[..., None, :] + rays_d[..., None, :] * t_fine[..., :, None]
    raw = _query_mlp(params["fine"], points, viewdirs, cfg)
    fine = volume_render(raw, t_fine, rays_d,
                         key=k_noise_f, noise_std=cfg.noise_std,
                         white_bkg=cfg.white_bkg)

    return {
        "rgb": fine["rgb"],
        "rgb_coarse": coarse["rgb"],
        "acc": fine["acc"],
        "depth": fine["depth"],
    }


def render_rays_chunked(key: jax.Array,
                        params: dict,
                        rays_o: jnp.ndarray,
                        rays_d: jnp.ndarray,
                        viewdirs: jnp.ndarray,
                        near: float,
                        far: float,
                        cfg: RenderConfig,
                        chunk: int = 32768) -> dict:
    """Memory-bounded render of a large flat ray batch, inside jit.

    ``lax.map`` over ``[n_chunks, chunk, ...]`` reshaped rays: one compiled
    program regardless of ray count, with intermediate ``[chunk, n_samples,
    width]`` activations bounded to a constant working set. Rays are padded
    to a chunk multiple and the padding is dropped on return.
    """
    n = rays_o.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def pad0(x):
        return jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)])

    ro, rd, vd = pad0(rays_o), pad0(rays_d), pad0(viewdirs)
    ro = ro.reshape(n_chunks, chunk, 3)
    rd = rd.reshape(n_chunks, chunk, 3)
    vd = vd.reshape(n_chunks, chunk, 3)
    keys = jax.random.split(key, n_chunks)

    def one(args):
        k, o, d, v = args
        return render_rays(k, params, o, d, v,
                           jnp.full((chunk,), near, jnp.float32),
                           jnp.full((chunk,), far, jnp.float32), cfg)

    out = jax.lax.map(one, (keys, ro, rd, vd))
    return jax.tree.map(lambda x: x.reshape(n_chunks * chunk, *x.shape[2:])[:n],
                        out)
