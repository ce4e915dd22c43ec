"""The jitted train step and the host-side training loop.

Parity target: the reference hot loop (``main.py:344-394``) — pick one random
training image, sample ``n_rays`` pixels without replacement (center-crop
grid during warm-up), render, ``MSE(fine) + MSE(coarse)``, Adam step,
exponential LR decay.

TPU-first restructure (SURVEY.md §7):
  * The *entire* step — image choice, pixel sampling, ray generation, both
    render passes, loss, backward, optimizer update — is one jitted program
    with donated state. The host does nothing per-step but advance a Python
    loop counter.
  * Rays are generated only for the sampled pixels (O(n_rays), fixing the
    reference's full H×W grid per step, SURVEY.md §2.3-7).
  * RNG is an explicit key folded with the step number — bitwise reproducible
    runs (the reference's torch RNG is unseeded).
  * Under a multi-chip mesh, the render+backward runs per-device on its ray
    shard via ``shard_map`` (the Pallas kernels execute locally) with a
    ``pmean`` gradient allreduce over ICI.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec

from cvnerf_tpu.ops.rays import ndc_rays, rays_for_pixels
from cvnerf_tpu.parallel.mesh import RAY_AXIS
from cvnerf_tpu.render.renderer import RenderConfig, render_rays
from cvnerf_tpu.train.state import TrainState, make_optimizer


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static training configuration (hashable; changes trigger recompile)."""
    height: int
    width: int
    focal: float
    near: float
    far: float
    n_rays: int = 1024
    lr: float = 5e-4
    lr_decay: int = 250
    precrop_iters: int = 0
    precrop_frac: float = 0.5
    ndc: bool = False
    ndc_variant: str = "canonical"
    # Per-step pixel sampling strategy. All three draw n_rays pixels
    # uniformly; the reference samples without replacement (main.py:368).
    #   "prp"     — without replacement via a keyed Feistel permutation
    #               evaluated at n_rays points (O(n_rays); default).
    #   "parity"  — without replacement via jax.random.choice, i.e. a true
    #               uniform random permutation (O(H·W) on-device sort,
    #               ~0.4 ms/step at 400x400).
    #   "replace" — with replacement (O(n_rays); expected duplicate pixels
    #               ~n_rays²/2HW, e.g. ~3 of 1024 at 400x400).
    pixel_sampling: str = "prp"
    # Linear density-noise annealing: the effective noise std is
    # noise_std * max(0, 1 - step/noise_decay), reaching zero at step
    # `noise_decay`. 0 disables (the reference's constant noise,
    # main.py:186-191). Rationale: on sparse 360° captures the constant
    # regularizer keeps perturbing converged geometry late in training
    # (VERDICT r2 weak #1 — the spherify band regressed from 3k to 50k).
    noise_decay: int = 0
    # Coarse-to-fine frequency annealing (FreeNeRF, arXiv:2303.07418):
    # encoding band k of both nets carries weight clip(step/N * L - k, 0, 1)
    # until step N, after which the transform is exactly identity. 0
    # disables (the reference's always-full spectrum). Implemented as a
    # parameter transform inside the loss (models.nerf_mlp.
    # anneal_nerf_params) so the Pallas kernel and the jnp oracle anneal
    # identically. Rationale: on sparse captures the full spectrum lets
    # the model fit per-view high-frequency detail before multi-view
    # geometry settles (the llff_360 overfit documented in ROADMAP
    # round-3 item 8); opening the spectrum gradually regularizes early
    # geometry without touching converged training (anneal done).
    freq_anneal: int = 0
    # Weight of the mip-NeRF 360 distortion regularizer on the fine pass
    # (ops.compositing.distortion_loss); 0 disables (reference loss).
    # Targets floaters / fog on sparse 360-degree captures.
    # MEASURED (BASELINE.md "Sparse-capture regularizers"): at constant
    # weight from step 0 the regularizer's empty-ray global minimum wins
    # before geometry forms and training collapses to the empty-scene
    # basin (llff_360 @0.01: 9.01 dB vs the 20.56 plain band). Ship it
    # with the ramp below.
    distortion_loss: float = 0.0
    # Delay + linear warmup for the distortion weight: the effective
    # weight is distortion_loss * clip((step - start) / max(ramp, 1),
    # 0, 1). start=ramp=0 reproduces the (measured-collapsing)
    # constant-from-0 setting; the shipped recipe delays past the
    # early-geometry phase (e.g. start 1000, ramp 4000).
    distortion_start: int = 0
    distortion_ramp: int = 0
    # Weight of the FreeNeRF occlusion regularizer on the fine pass
    # (ops.compositing.occlusion_loss): penalizes compositing-weight mass
    # in the first occlusion_frac of each ray's [near, far] range —
    # near-camera floaters on sparse captures. 0 disables.
    occlusion_loss: float = 0.0
    occlusion_frac: float = 0.2
    # Polyak/EMA weight averaging (flag-gated deviation; the reference
    # serves the raw last iterate): after every optimizer update,
    # ema = ema * decay + params * (1 - decay), one fused elementwise
    # tree-map inside the donated step program (~1.2M params x 2 nets —
    # negligible next to the 262k-point render+backward). The deployable
    # model of an EMA run is state.ema_params: eval/val/serving read it
    # (cli.deploy_params, checkpoint.restore_params), while training
    # continues on the raw params. 0 disables; requires
    # create_train_state(ema=True) so the state carries the slot.
    ema_decay: float = 0.0
    # Cross-image ray batching (flag-gated deviation): each batch samples
    # n_rays (image, pixel) pairs jointly without replacement over the
    # ENTIRE train split, instead of the reference's one-random-image-
    # per-step (main.py:347-349). This is the original NeRF paper's
    # training mode for real captures (use_batching): per-step gradients
    # see every camera, which de-correlates the batch on multi-view
    # scenes. Precrop warm-up steps keep single-image center-crop
    # semantics (a center crop is per-image by construction).
    ray_batching: bool = False
    # Fuse the per-leaf gradient pmean into ONE collective over the
    # ravelled gradient vector (+2 packed scalars for loss/mse). Same
    # math — pmean is elementwise, flattening only changes layout — but
    # NOT bitwise: the ravelled layout moves XLA's backward fusion
    # boundaries (reassociated fp32 sums, ~1 ulp/step measured even on a
    # 1-device mesh; multi-device adds all-reduce association order —
    # tests/test_sharding.py pins the tolerance). Measured on the real
    # chip (scripts/scan_overhead_probe.py, round 4): the per-leaf pmean
    # costs NOTHING on the full program — XLA hides the ~50 async
    # collective launches under the 8.7 ms of kernel compute — while the
    # ravel/concat adds real copies (8.70 → 9.41 ms/step). Default OFF;
    # the flag exists for multi-chip tuning, where one large all-reduce
    # can beat 50 small ones on ICI once collectives are no longer free.
    fused_allreduce: bool = False
    render: RenderConfig = RenderConfig()


def _sample_pixels(key: jax.Array, cfg: TrainConfig,
                   precrop: bool) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``n_rays`` (py, px) integer pixel coords without replacement.

    Reference parity: the warm-up center-crop grid (``main.py:354-365``) and
    ``np.random.choice(..., replace=False)`` (``main.py:368``), both moved
    on-device. See ``TrainConfig.pixel_sampling`` for the three strategies
    (the default keeps the without-replacement semantics at O(n_rays) cost
    via a keyed Feistel permutation, ``ops/rng.py``).
    """
    h, w = cfg.height, cfg.width
    if precrop:
        dh = int(h // 2 * cfg.precrop_frac)
        dw = int(w // 2 * cfg.precrop_frac)
        y0, x0 = h // 2 - dh, w // 2 - dw
        gh, gw = 2 * dh, 2 * dw
    else:
        y0 = x0 = 0
        gh, gw = h, w
    if cfg.pixel_sampling == "prp":
        from cvnerf_tpu.ops.rng import sample_without_replacement
        flat = sample_without_replacement(key, cfg.n_rays, gh * gw)
    elif cfg.pixel_sampling == "replace":
        flat = jax.random.randint(key, (cfg.n_rays,), 0, gh * gw)
    elif cfg.pixel_sampling == "parity":
        flat = jax.random.choice(key, gh * gw, (cfg.n_rays,), replace=False)
    else:
        raise ValueError(f"bad pixel_sampling: {cfg.pixel_sampling!r}")
    py = y0 + flat // gw
    px = x0 + flat % gw
    return py, px


def _build_step_core(cfg: TrainConfig,
                     mesh: Mesh | None = None,
                     with_occupancy: bool = False) -> Callable:
    """The *uncompiled* train step; see ``make_train_step``.

    ``with_occupancy=True`` builds the occupancy-accelerated variant
    (``--occ_train``): the step takes a baked ``OccupancyGrid`` as an extra
    leading argument, the coarse MLP is replaced by the grid probe
    (``render_rays``'s occupancy path) and the loss is ``MSE(fine)`` only —
    there is no coarse image to score, and ``rgb_coarse`` aliases the fine
    map on this path (scoring it too would silently double the gradient).
    This is a deliberate, flag-gated deviation from the reference loss
    (``main.py:380-383``); the coarse params receive zero gradients and
    stay at their checkpointed values.
    """
    if mesh is not None and cfg.n_rays % mesh.devices.size != 0:
        raise ValueError(
            f"n_rays={cfg.n_rays} must be divisible by the mesh size "
            f"{mesh.devices.size}")
    if cfg.n_rays > cfg.height * cfg.width and not cfg.ray_batching:
        raise ValueError(
            f"n_rays={cfg.n_rays} exceeds the {cfg.height}x{cfg.width} "
            "pixel grid (sampling is without replacement; --ray_batching "
            "samples over the whole train split instead)")
    if cfg.ray_batching and cfg.pixel_sampling != "prp":
        raise ValueError(
            "ray_batching draws the joint (image, pixel) sample with the "
            "Feistel PRP only — pixel_sampling="
            f"{cfg.pixel_sampling!r} is not implemented over the "
            "cross-image pool (precrop warm-up steps would honor it while "
            "steady-state steps ignored it, which is worse than refusing)")
    if cfg.precrop_iters > 0:
        crop = (2 * int(cfg.height // 2 * cfg.precrop_frac)
                * 2 * int(cfg.width // 2 * cfg.precrop_frac))
        if cfg.n_rays > crop:
            raise ValueError(
                f"n_rays={cfg.n_rays} exceeds the precrop grid of {crop} "
                f"pixels (precrop_frac={cfg.precrop_frac})")
    opt = make_optimizer(cfg.lr, cfg.lr_decay)
    rcfg = cfg.render
    if cfg.distortion_loss > 0.0 or cfg.occlusion_loss > 0.0:
        # The regularizers need the fine pass's weights/depths out of the
        # renderer; the flags are train-step-local so eval configs derived
        # from cfg.render stay lean.
        rcfg = dataclasses.replace(rcfg, return_weights=True)

    def loss_fn(params, occupancy, key, rays_o, rays_d, viewdirs, target,
                ray_ids, noise_scale, anneal, dist_scale):
        if cfg.freq_anneal > 0:
            # Frequency annealing as a param transform INSIDE the loss:
            # autodiff then yields grad(raw) = window * grad(masked), so
            # closed bands receive exactly-zero gradient (FreeNeRF
            # dynamics) — transforming outside the grad would train them.
            from cvnerf_tpu.models.nerf_mlp import anneal_model_params
            params = anneal_model_params(params, rcfg.mlp, anneal)
        n = rays_o.shape[0]
        near = jnp.full((n,), cfg.near, jnp.float32)
        far = jnp.full((n,), cfg.far, jnp.float32)
        out = render_rays(key, params, rays_o, rays_d, viewdirs, near, far,
                          rcfg, ray_ids=ray_ids, noise_scale=noise_scale,
                          occupancy=occupancy)
        mse_fine = jnp.mean((out["rgb"] - target) ** 2)
        if occupancy is not None:
            # No coarse image exists on the occupancy path (rgb_coarse
            # aliases rgb); see _build_step_core's docstring.
            loss = mse_fine
        else:
            mse_coarse = jnp.mean((out["rgb_coarse"] - target) ** 2)
            # Reference loss: MSE(fine) + MSE(coarse) (main.py:380-383).
            loss = mse_fine + mse_coarse
        if cfg.distortion_loss > 0.0:
            from cvnerf_tpu.ops.compositing import distortion_loss
            # dist_scale is the delay+warmup schedule (distortion_start /
            # distortion_ramp) — constant 1.0 when both are 0.
            loss = loss + cfg.distortion_loss * dist_scale * jnp.mean(
                distortion_loss(out["weights"], out["t"], near, far))
        if cfg.occlusion_loss > 0.0:
            from cvnerf_tpu.ops.compositing import occlusion_loss
            loss = loss + cfg.occlusion_loss * jnp.mean(
                occlusion_loss(out["weights"], out["t"], near, far,
                               cfg.occlusion_frac))
        return loss, mse_fine

    def local_grad(params, occupancy, key, rays_o, rays_d, viewdirs, target,
                   ray_ids, noise_scale, anneal, dist_scale):
        """Per-shard loss/grad, allreduced over the ray axis.

        Runs inside shard_map so the Pallas MLP kernel executes per-device
        on its ray shard; pmean over equal shards equals the global mean.
        Per-ray RNG (global ray_ids) makes the result independent of the
        device count.
        """
        (loss, mse_fine), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, occupancy, key, rays_o, rays_d,
                                   viewdirs, target, ray_ids, noise_scale,
                                   anneal, dist_scale)
        if cfg.fused_allreduce:
            # One collective for everything: ravel the grad tree and pack
            # the two scalars onto the end — ~50 all_reduce launches
            # become 1 (numerics note: TrainConfig.fused_allreduce).
            from jax.flatten_util import ravel_pytree
            flat, unravel = ravel_pytree(grads)
            packed = jax.lax.pmean(
                jnp.concatenate([flat, jnp.stack([loss, mse_fine])]),
                RAY_AXIS)
            grads = unravel(packed[:-2])
            loss, mse_fine = packed[-2], packed[-1]
        else:
            loss = jax.lax.pmean(loss, RAY_AXIS)
            mse_fine = jax.lax.pmean(mse_fine, RAY_AXIS)
            grads = jax.lax.pmean(grads, RAY_AXIS)
        return loss, mse_fine, grads

    def step_fn(state: TrainState, occupancy, key: jax.Array,
                images: jnp.ndarray, poses: jnp.ndarray,
                train_idx: jnp.ndarray, precrop: bool):
        k_img, k_pix, k_render = jax.random.split(key, 3)

        if cfg.ray_batching and not precrop:
            # Cross-image batching: n_rays (image, pixel) pairs drawn
            # jointly without replacement over the whole train split via
            # the same Feistel PRP, domain n_train·H·W. Three O(n_rays)
            # gathers (target pixels, per-ray poses) replace the
            # single-image slice — a once-per-step cost, not per-sample
            # (CLAUDE.md's no-gather rule targets per-sample hot loops).
            from cvnerf_tpu.ops.rays import rays_for_pixels_batched
            from cvnerf_tpu.ops.rng import sample_without_replacement
            h, w = cfg.height, cfg.width
            n_train = train_idx.shape[0]
            flat = sample_without_replacement(k_pix, cfg.n_rays,
                                              n_train * h * w)
            im_idx = train_idx[flat // (h * w)]      # [n_rays]
            pix = flat % (h * w)
            py, px = pix // w, pix % w
            target = images[im_idx, py, px]          # [n_rays, 3]
            rays_o, rays_d = rays_for_pixels_batched(
                px, py, w, h, cfg.focal, poses[im_idx])
        else:
            # One random training image per step (reference
            # main.py:347-349).
            im_idx = train_idx[
                jax.random.randint(k_img, (), 0, train_idx.shape[0])]
            image = images[im_idx]
            pose = poses[im_idx]

            py, px = _sample_pixels(k_pix, cfg, precrop)
            target = image[py, px]  # [n_rays, 3]

            rays_o, rays_d = rays_for_pixels(px, py, cfg.width, cfg.height,
                                             cfg.focal, pose)
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        if cfg.ndc:
            rays_o, rays_d = ndc_rays(cfg.height, cfg.width, cfg.focal, 1.0,
                                      rays_o, rays_d,
                                      variant=cfg.ndc_variant)
        ray_ids = jnp.arange(cfg.n_rays, dtype=jnp.int32)
        if cfg.noise_decay > 0:
            noise_scale = jnp.clip(
                1.0 - state.step.astype(jnp.float32) / cfg.noise_decay,
                0.0, 1.0)
        else:
            noise_scale = jnp.float32(1.0)
        if cfg.freq_anneal > 0:
            anneal = jnp.clip(
                state.step.astype(jnp.float32) / cfg.freq_anneal, 0.0, 1.0)
        else:
            anneal = jnp.float32(1.0)
        if cfg.distortion_start > 0 or cfg.distortion_ramp > 0:
            # Delay + linear warmup of the distortion weight; see the
            # TrainConfig field note (the constant-from-0 setting is a
            # measured training collapse on sparse captures).
            dist_scale = jnp.clip(
                (state.step.astype(jnp.float32) - cfg.distortion_start)
                / max(cfg.distortion_ramp, 1), 0.0, 1.0)
        else:
            dist_scale = jnp.float32(1.0)

        if mesh is not None:
            p = PartitionSpec
            sharded = jax.shard_map(
                local_grad, mesh=mesh,
                in_specs=(p(), p(), p(), p(RAY_AXIS), p(RAY_AXIS),
                          p(RAY_AXIS), p(RAY_AXIS), p(RAY_AXIS), p(), p(),
                          p()),
                out_specs=(p(), p(), p()),
                check_vma=False)
            loss, mse_fine, grads = sharded(
                state.params, occupancy, k_render, rays_o, rays_d, viewdirs,
                target, ray_ids, noise_scale, anneal, dist_scale)
        else:
            (loss, mse_fine), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, occupancy, k_render,
                                       rays_o, rays_d, viewdirs, target,
                                       ray_ids, noise_scale, anneal,
                                       dist_scale)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        if with_occupancy:
            # The coarse net is off the compute path: its gradients are
            # zero, but Adam momentum carried over from the warmup steps
            # would keep drifting its params — zero the updates so the
            # warmup-trained coarse net stays bitwise frozen (it remains a
            # sane fallback for grid-less rendering of the checkpoint).
            updates = {**updates,
                       "coarse": jax.tree.map(jnp.zeros_like,
                                              updates["coarse"])}
        params = optax.apply_updates(state.params, updates)

        if cfg.ema_decay > 0.0:
            # Polyak average of the raw iterates; initialized at the
            # step-0 params (create_train_state(ema=True)) so no debias
            # correction is needed.
            d = jnp.float32(cfg.ema_decay)
            ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                               state.ema_params, params)
        else:
            ema = state.ema_params

        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, ema_params=ema)
        metrics = {
            "loss": loss,
            "mse_fine": mse_fine,
            "psnr": -10.0 * jnp.log10(mse_fine),
            # Post-allreduce global gradient norm: the drift/instability
            # diagnostic for long-horizon runs (a converged model whose
            # grad norm stops decaying is being driven by a stationary
            # perturbation — e.g. constant density noise).
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    if with_occupancy:
        return step_fn

    def step_no_occ(state: TrainState, key: jax.Array,
                    images: jnp.ndarray, poses: jnp.ndarray,
                    train_idx: jnp.ndarray, precrop: bool):
        return step_fn(state, None, key, images, poses, train_idx, precrop)

    return step_no_occ


def make_train_step(cfg: TrainConfig,
                    mesh: Mesh | None = None,
                    with_occupancy: bool = False) -> Callable:
    """Build the jitted train step.

    Returns ``step_fn(state, key, images, poses, train_idx, precrop) ->
    (new_state, metrics)`` where ``precrop`` is a static bool (two compiled
    variants: warm-up and steady-state). With ``with_occupancy=True`` the
    signature gains a baked grid: ``step_fn(state, occupancy, key, ...)``
    (see ``_build_step_core``; ``Trainer`` drives both variants).

    With a mesh, the render+backward runs under ``shard_map`` over the ray
    axis (required for the Pallas MLP kernel to execute per-device) with a
    ``pmean`` gradient allreduce over ICI.
    """
    return jax.jit(_build_step_core(cfg, mesh, with_occupancy),
                   static_argnames=("precrop",), donate_argnums=(0,))


def make_train_scan(cfg: TrainConfig, block: int,
                    mesh: Mesh | None = None,
                    with_occupancy: bool = False) -> Callable:
    """Build a jitted ``block``-step train program.

    ``scan_fn(state, base_key, images, poses, train_idx, start, precrop) ->
    (new_state, last_metrics)`` runs ``block`` consecutive steps
    ``start .. start+block-1`` inside one ``lax.scan`` — ONE program
    dispatch instead of ``block`` (each dispatch costs ~0.5-1 ms through
    the tunneled-TPU runtime, ~5-10% of a lego-workload step). Numerics are
    identical to ``block`` single steps: the per-step key is the same
    ``fold_in(base_key, i)`` derivation the host loop uses, and the body is
    the same step core (``tests/test_train.py::test_scan_matches_single``).
    """
    core = _build_step_core(cfg, mesh, with_occupancy)

    def scan_body(state, base_key, images, poses, train_idx, start, precrop,
                  occupancy=None):
        def body(st, i):
            key = jax.random.fold_in(base_key, i)
            if with_occupancy:
                return core(st, occupancy, key, images, poses, train_idx,
                            precrop)
            return core(st, key, images, poses, train_idx, precrop)

        steps = start + jnp.arange(block, dtype=jnp.int32)
        state, stacked = jax.lax.scan(body, state, steps)
        return state, jax.tree.map(lambda m: m[-1], stacked)

    if with_occupancy:
        def scan_fn(state: TrainState, occupancy, base_key: jax.Array,
                    images: jnp.ndarray, poses: jnp.ndarray,
                    train_idx: jnp.ndarray, start: jnp.ndarray,
                    precrop: bool):
            return scan_body(state, base_key, images, poses, train_idx,
                             start, precrop, occupancy)
    else:
        def scan_fn(state: TrainState, base_key: jax.Array,
                    images: jnp.ndarray, poses: jnp.ndarray,
                    train_idx: jnp.ndarray, start: jnp.ndarray,
                    precrop: bool):
            return scan_body(state, base_key, images, poses, train_idx,
                             start, precrop)

    return jax.jit(scan_fn, static_argnames=("precrop",),
                   donate_argnums=(0,))


class Trainer:
    """Host-side training driver.

    Owns the compiled step, RNG threading, periodic callbacks (logging,
    checkpointing, eval renders). Mirrors the responsibilities of reference
    ``main()``'s loop body (``main.py:344-407``) with the per-step work all
    on device.
    """

    def __init__(self, cfg: TrainConfig, state: TrainState,
                 images, poses, train_idx,
                 seed: int = 0, mesh: Mesh | None = None,
                 steps_per_call: int = 1):
        self.cfg = cfg
        self.mesh = mesh
        if not 0.0 <= cfg.ema_decay < 1.0:
            raise ValueError(f"ema_decay must be in [0, 1), got "
                             f"{cfg.ema_decay}")
        if cfg.ema_decay > 0.0 and state.ema_params is None:
            # Failing here beats a tree-map structure error inside jit:
            # the EMA slot is allocated at state creation so resumes and
            # checkpoints agree on the pytree shape.
            raise ValueError("ema_decay > 0 needs a state with the EMA "
                             "slot — create_train_state(ema=True)")
        if cfg.ema_decay == 0.0 and state.ema_params is not None:
            # The converse mismatch is worse because it is SILENT: the
            # step would pass the stale average through unchanged,
            # checkpoints would persist it, and restore_params prefers it
            # — every downstream consumer (serving, eval, export) would
            # serve frozen step-N-old weights with no warning. Restore
            # with an EMA-free template (create_train_state(ema=False))
            # to deliberately drop the average, or set
            # TrainConfig.ema_decay to keep updating it.
            raise ValueError("state carries an EMA average but "
                             "TrainConfig.ema_decay is 0 — the average "
                             "would freeze silently")
        if cfg.occlusion_loss > 0.0 and not 0.0 < cfg.occlusion_frac < 1.0:
            # At frac >= 1 the near-window penalty covers the whole ray:
            # exactly the empty-scene objective constant-from-0 distortion
            # was measured to collapse into (BASELINE.md "Sparse-capture
            # regularizers") — the collapse-proof-by-construction claim
            # only holds for a proper sub-window.
            raise ValueError(f"occlusion_frac must be in (0, 1), got "
                             f"{cfg.occlusion_frac}")
        self.base_key = jax.random.PRNGKey(seed)
        self.step_fn = make_train_step(cfg, mesh)
        self.steps_per_call = max(1, steps_per_call)
        self.scan_fn = (make_train_scan(cfg, self.steps_per_call, mesh)
                        if self.steps_per_call > 1 else None)
        # Occupancy-accelerated training (--occ_train): set_occupancy()
        # installs a baked grid and the occ-variant step programs; rebakes
        # at the same resolution reuse the compiled programs (shapes are
        # static, only the table values change).
        self.occupancy = None
        self._step_fn_occ: Callable | None = None
        self._scan_fn_occ: Callable | None = None
        self.state = state
        self.images = jnp.asarray(images, jnp.float32)
        self.poses = jnp.asarray(poses, jnp.float32)[:, :3, :4]
        self.train_idx = jnp.asarray(np.asarray(train_idx), jnp.int32)
        if cfg.ray_batching:
            pool = len(np.asarray(train_idx)) * cfg.height * cfg.width
            if cfg.n_rays > pool:
                raise ValueError(
                    f"n_rays={cfg.n_rays} exceeds the ray-batching pool of "
                    f"{pool} pixels across the train split")
        if mesh is not None:
            # Replicate state and the device-resident dataset across the
            # mesh (a freshly-restored checkpoint otherwise sits on one
            # device and conflicts with the in-step sharding constraints).
            # replicate_to_mesh also handles multi-process meshes, where
            # each host holds the same data (deterministic loaders + shared
            # seed) and the global array is assembled host-locally.
            from cvnerf_tpu.parallel.mesh import replicate_to_mesh
            self.state = replicate_to_mesh(self.state, mesh)
            self.images = replicate_to_mesh(self.images, mesh)
            self.poses = replicate_to_mesh(self.poses, mesh)
            self.train_idx = replicate_to_mesh(self.train_idx, mesh)
        self.callbacks: list[tuple[int, Callable[[int, "Trainer", dict], None]]] = []
        self._last_metrics: dict[str, Any] = {}

    def set_occupancy(self, grid) -> None:
        """Install (or refresh) a baked ``OccupancyGrid`` for training.

        Subsequent steps run the occupancy-accelerated variant: the grid
        probe replaces the coarse MLP and, with ``occupancy_mode="full"``,
        the fine net runs on ``n_fine`` points instead of
        ``n_coarse + n_fine`` — at the reference shape (64+192 vs 128
        evaluations per ray) half the MLP work per step. Callers rebake
        periodically from the live params so the sampling distribution
        tracks the trained density (``cli.py``'s ``--occ_train_every``
        callback).
        """
        if self.mesh is not None:
            from cvnerf_tpu.parallel.mesh import replicate_to_mesh
            grid = replicate_to_mesh(grid, self.mesh)
        self.occupancy = grid
        if self._step_fn_occ is None:
            self._step_fn_occ = make_train_step(self.cfg, self.mesh,
                                                with_occupancy=True)
            if self.steps_per_call > 1:
                self._scan_fn_occ = make_train_scan(
                    self.cfg, self.steps_per_call, self.mesh,
                    with_occupancy=True)

    def maybe_set_occupancy(self, grid, occupied_frac: float | None = None
                            ) -> str:
        """``set_occupancy`` behind the empty-grid guard (``--occ_train``).

        Returns what happened: ``"switched"`` (first install), ``"rebaked"``
        (refresh), ``"postponed"`` (grid empty, not yet in occ mode — stay
        on reference semantics and let the caller retry at the next
        cadence), or ``"kept"`` (grid empty mid-occ-mode — keep the last
        non-empty grid rather than installing a sampler with no support).

        Why guard: an all-empty grid gives every ray the ε-uniform fallback
        CDF; on a weak density field those samples can land exclusively in
        ``relu' = 0`` territory, zeroing the gradient *permanently* —
        measured on a micro-fixture (grad_norm 0.18 → exactly 0.0 at the
        switch step, never recovering). An empty bake means the warmup
        hasn't produced a surface yet; training through the learned coarse
        net is the only sampler with a gradient path out of that state.

        ``occupied_frac``: pass the precomputed fraction when the caller
        already has it (one grid reduction + host sync per rebake, not
        two — each sync crosses the tunneled-TPU dispatch path).
        """
        if occupied_frac is None:
            from cvnerf_tpu.render.occupancy import occupied_fraction
            occupied_frac = occupied_fraction(grid)
        if occupied_frac <= 0.0:
            return "postponed" if self.occupancy is None else "kept"
        switched = self.occupancy is None
        self.set_occupancy(grid)
        return "switched" if switched else "rebaked"

    def add_callback(self, every: int, fn: Callable) -> None:
        """Register ``fn(step, trainer, metrics)`` to run every N steps.

        ``every <= 0`` disables the callback (the CLI's 0-disables
        convention for ``--print_freq``/``--vid_freq``/etc.).
        """
        if every > 0:
            self.callbacks.append((every, fn))

    def _finalize_metrics(self, metrics: dict, rays_done: int,
                          t0: float) -> dict:
        m = {k: float(v) for k, v in metrics.items()}
        if rays_done > 0:
            m["rays_per_sec"] = rays_done / max(time.time() - t0, 1e-9)
        else:  # run ended on a callback step; keep the last window's rate
            m["rays_per_sec"] = self._last_metrics.get("rays_per_sec", 0.0)
        self._last_metrics = m
        return m

    def _block_len(self, i: int, iters: int) -> int:
        """Steps to run in one dispatch starting at ``i``: the scan block
        size, shortened so the precrop flag stays constant and no callback
        would fire before the block's last step (fires after step j where
        j % every == 0 and j > 0; a fire exactly at the last step is fine —
        the block returns that step's metrics)."""
        n = min(self.steps_per_call, iters - i)
        if i < self.cfg.precrop_iters:
            n = min(n, self.cfg.precrop_iters - i)
        for every, _ in self.callbacks:
            j = i if (i % every == 0 and i > 0) else i + every - i % every
            if j < i + n - 1:
                n = j - i + 1
        return max(1, n)

    def run(self, start: int, iters: int) -> dict:
        """Train from ``start`` (exclusive of 0, matching the reference's
        1-based loop, ``main.py:343-344``) up to ``iters - 1``."""
        if start >= iters:
            return dict(self._last_metrics)
        t0 = time.time()
        rays_done = 0
        i = start
        while i < iters:
            precrop = i < self.cfg.precrop_iters
            n = self._block_len(i, iters)
            occ = self.occupancy
            if n > 1 and n == self.steps_per_call:
                if occ is not None:
                    self.state, metrics = self._scan_fn_occ(
                        self.state, occ, self.base_key, self.images,
                        self.poses, self.train_idx, jnp.int32(i), precrop)
                else:
                    self.state, metrics = self.scan_fn(
                        self.state, self.base_key, self.images, self.poses,
                        self.train_idx, jnp.int32(i), precrop)
            else:
                n = 1
                key = jax.random.fold_in(self.base_key, i)
                if occ is not None:
                    self.state, metrics = self._step_fn_occ(
                        self.state, occ, key, self.images, self.poses,
                        self.train_idx, precrop)
                else:
                    self.state, metrics = self.step_fn(
                        self.state, key, self.images, self.poses,
                        self.train_idx, precrop)
            last = i + n - 1
            i += n
            rays_done += n * self.cfg.n_rays
            fired = False
            final_m = None
            for every, fn in self.callbacks:
                if last % every == 0 and last > 0:
                    if final_m is None:
                        # Sync point: pull metrics once per fire step — a
                        # later callback must not see a rays_per_sec window
                        # deflated by an earlier callback's wall time (e.g.
                        # a spiral-video render).
                        final_m = self._finalize_metrics(metrics, rays_done,
                                                         t0)
                    fn(last, self, final_m)
                    fired = True
            if fired:
                # Restart the throughput window so slow callbacks (video
                # renders, checkpoint writes) don't pollute rays_per_sec
                # for the rest of the run.
                t0 = time.time()
                rays_done = 0
        return self._finalize_metrics(metrics, rays_done, t0)
