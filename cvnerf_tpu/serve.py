"""Serving: load a trained checkpoint once, render views on demand.

The reference has no inference story beyond re-running its training script
(SURVEY.md §2); this module is the deployment-facing API: one object owns the
restored parameters (replicated over the device mesh when present) and the
compiled render programs, so repeated pose requests hit cached executables.

Example::

    r = NerfRenderer("logs/lego/checkpoints", height=400, width=400,
                     focal=555.0, near=2.0, far=6.0,
                     cfg=RenderConfig(white_bkg=True))
    rgb = r.render_pose(c2w)                  # [H, W, 3] float32 in [0, 1]
    frames = r.render_video(spiral_poses)     # [N, H, W, 3]

Serving is deterministic by default: the inverse-CDF importance resampling
uses the evenly-spaced eval path (``deterministic=True``), so a pose always
renders the same image. Pass ``deterministic=False`` for the reference's
stochastic eval resampling (main.py:163-165 keeps it stochastic).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
from cvnerf_tpu.parallel.mesh import make_mesh, replicate_to_mesh
from cvnerf_tpu.render.frames import render_image, render_poses_to_frames
from cvnerf_tpu.render.renderer import RenderConfig
from cvnerf_tpu.train.checkpoint import restore_checkpoint
from cvnerf_tpu.train.state import create_train_state

# Per-run snapshot of the *derived* scene geometry + architecture, written
# by the trainer (cli.py) so serving never needs hand-typed geometry — a
# mistyped --focal silently renders garbage; this file is the antidote.
SCENE_SNAPSHOT = "scene.json"


def write_scene_snapshot(run_dir: str, *, height: int, width: int,
                         focal: float, near: float, far: float, ndc: bool,
                         ndc_variant: str, white_bkg: bool,
                         n_coarse: int, n_fine: int, bf16: bool,
                         mlp: NerfMLPConfig,
                         sorted_resample: bool = True,
                         pallas: str = "auto",
                         calib_poses=None,
                         occ_train: bool = False,
                         occ_res: int = 192,
                         occ_bound: float = 1.5,
                         occ_mode: str | None = None,
                         occ_interp: str = "nearest",
                         occ_floor: int = 0,
                         freq_anneal: int = 0,
                         ema_decay: float = 0.0) -> str:
    """Persist everything a renderer needs to serve this run's checkpoints.

    ``config_resolved.json`` records the raw flags; this records the
    *derived* values (near/far/H/W/focal come out of the data loader, not
    the flags — e.g. LLFF NDC runs train with near=0, far=1 regardless of
    ``poses_bounds.npy``).

    ``calib_poses``: optional ``[P, 3+, 4]`` camera set (the scene's
    poses). Up to 64 are stored (evenly subsampled) so post-training
    transforms that need the query distribution — int8 calibration — can
    sample real rays instead of guessing a bounding cube.
    """
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, SCENE_SNAPSHOT)
    payload = {
        "height": int(height), "width": int(width), "focal": float(focal),
        "near": float(near), "far": float(far), "ndc": bool(ndc),
        "ndc_variant": ndc_variant, "white_bkg": bool(white_bkg),
        "n_coarse": int(n_coarse), "n_fine": int(n_fine), "bf16": bool(bf16),
        "sorted_resample": bool(sorted_resample), "pallas": pallas,
        "mlp": dataclasses.asdict(mlp),
    }
    if ema_decay > 0:
        # Polyak-averaged training (--ema_decay): recorded for resume
        # stickiness (cli.py). Consumers need no special handling — the
        # checkpoints store the average under 'ema_params' and
        # restore_params serves it by default.
        payload["ema_decay"] = float(ema_decay)
    if freq_anneal > 0:
        # Frequency-annealed training (--freq_anneal): a checkpoint saved
        # BEFORE the anneal horizon has untrained high-frequency bands that
        # the loss masked — consumers must render it through the same
        # window (from_run_dir applies the step-dependent transform).
        payload["freq_anneal"] = int(freq_anneal)
    if calib_poses is not None:
        cp = np.asarray(calib_poses, np.float32)[:, :3, :4]
        if len(cp) > 64:
            cp = cp[np.linspace(0, len(cp) - 1, 64).round().astype(int)]
        payload["calib_poses"] = cp.tolist()
    if occ_train:
        # Occupancy-trained checkpoints (--occ_train) carry an UNTRAINED
        # coarse net: any consumer must resample through a baked grid, so
        # record the bake parameters and let from_run_dir auto-enable it.
        # The mode has no default on purpose: the trainer's flag default
        # and this function once disagreed ('merge' vs 'full'), which would
        # have served checkpoints through sampling they weren't trained
        # with — every writer must say which mode actually ran.
        if occ_mode not in ("full", "merge"):
            raise ValueError(f"occ_train snapshots must record the sampling "
                             f"mode ('full' or 'merge'), got {occ_mode!r}")
        if occ_interp not in ("trilinear", "nearest"):
            raise ValueError(f"occ_train snapshots must record the probe "
                             f"interp ('trilinear' or 'nearest'), got "
                             f"{occ_interp!r}")
        payload["occ_train"] = {"resolution": int(occ_res),
                                "bound": float(occ_bound),
                                "mode": occ_mode,
                                "interp": occ_interp,
                                "floor": int(occ_floor)}
    with open(path, "w") as fp:
        json.dump(payload, fp, indent=2, sort_keys=True)
    return path


class NerfRenderer:
    """A checkpoint loaded for repeated novel-view rendering."""

    # Which model a run-dir load resolved to: "best" (the best-val
    # checkpoint) or "last" (the periodic one). Direct --ckpt construction
    # always loads from the given dir, i.e. "last" semantics.
    which: str = "last"

    def __init__(self, ckpt_dir: str, *,
                 height: int, width: int, focal: float,
                 near: float, far: float,
                 ndc: bool = False,
                 ndc_variant: str = "canonical",
                 cfg: RenderConfig | None = None,
                 mlp: NerfMLPConfig | None = None,
                 chunk: int = 8192,
                 seed: int = 0,
                 step: int | None = None,
                 deterministic: bool = True,
                 use_mesh: bool = True):
        # One source of truth for the architecture: an explicit cfg's mlp
        # wins; the mlp kwarg is only a shorthand when no cfg is given.
        if cfg is None:
            cfg = RenderConfig(mlp=mlp if mlp is not None
                               else NerfMLPConfig())
        elif mlp is not None and cfg.mlp != mlp:
            raise ValueError(
                "conflicting architectures: cfg.mlp != mlp — pass the "
                "architecture through cfg, or omit the mlp kwarg")
        mlp = cfg.mlp
        # Rendering always runs in eval mode (no jitter/noise), matching the
        # reference's test kwargs (main.py:163-165).
        self.cfg = cfg.eval_mode()
        if deterministic:
            self.cfg = dataclasses.replace(self.cfg,
                                           deterministic_resample=True)
        # Pristine sample budget: enable_occupancy's n_coarse/n_fine
        # overrides reset to THESE when omitted, so a re-enable without
        # overrides restores the checkpoint's full budget instead of
        # silently keeping a previous call's reduced one (while term/
        # interp/mode reset to their parameter defaults — asymmetric
        # stickiness would pair a reduced budget with termination off,
        # a silent multi-dB quality loss).
        self._base_samples = (self.cfg.n_coarse, self.cfg.n_fine)
        self.height, self.width, self.focal = int(height), int(width), focal
        self.near, self.far = float(near), float(far)
        self.ndc, self.ndc_variant = ndc, ndc_variant
        self.chunk = chunk
        self._key = jax.random.PRNGKey(seed)

        # Template WITH the EMA slot: on a Polyak-averaged run
        # (--ema_decay) the deployable model is the stored average; on a
        # plain checkpoint restore_checkpoint warm-starts the slot at the
        # raw params, so ema_params is the right weights either way.
        template = create_train_state(jax.random.PRNGKey(0), mlp=mlp,
                                      ema=True)
        restored = restore_checkpoint(ckpt_dir, template, step=step)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
        self.step = int(restored.step)
        self.params = restored.ema_params

        mesh = make_mesh() if use_mesh else None
        self.mesh = mesh if (mesh is not None
                             and mesh.devices.size > 1) else None
        if self.mesh is not None:
            # multihost-safe replication (host-local assembly under
            # multi-process JAX; plain device_put otherwise)
            self.params = replicate_to_mesh(self.params, self.mesh)
        self.occupancy = None
        # Known camera set for calibration-style transforms (enable_int8):
        # populated by from_run_dir when the run snapshot carries poses.
        self.calib_poses = None
        # Float master copy: enable_int8 swaps self.params for quantized
        # ones, but the occupancy bake and mesh extraction query the float
        # net — they read from here (always set, so ordering of enable_*
        # calls never matters).
        self._float_params = self.params

    @classmethod
    def from_run_dir(cls, run_dir: str, *,
                     chunk: int = 8192,
                     seed: int = 0,
                     step: int | None = None,
                     deterministic: bool = True,
                     use_mesh: bool = True,
                     which: str = "auto") -> "NerfRenderer":
        """Load a renderer from a training run directory.

        Reads the ``scene.json`` snapshot the trainer writes (geometry,
        NDC mode, architecture, sample counts, compute dtype) and the
        run's ``checkpoints/`` — zero hand-typed geometry, so serving
        can't silently diverge from what the checkpoint was trained on.

        ``which`` selects the model: ``"auto"`` (default) serves the
        best-validation checkpoint when the run tracked one
        (``--track_best``) and the last periodic checkpoint otherwise —
        on sparse captures validation quality peaks mid-run, so the
        deployable model is the best-val checkpoint, not the last step
        (the spherify long-horizon finding, ROADMAP round 3). ``"best"``
        requires the best-val checkpoint; ``"last"`` forces the periodic
        one. An explicit ``step`` under ``"auto"`` refers to the periodic
        directory (training steps users know about).
        """
        path = os.path.join(run_dir, SCENE_SNAPSHOT)
        try:
            with open(path) as fp:
                geo = json.load(fp)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"{path} not found — {run_dir!r} is not a cvnerf_tpu run "
                "directory (runs trained before scene snapshots were added "
                "can be served with explicit geometry flags instead)")
        import jax.numpy as jnp
        cfg = RenderConfig(
            n_coarse=geo["n_coarse"], n_fine=geo["n_fine"],
            white_bkg=geo["white_bkg"], mlp=NerfMLPConfig(**geo["mlp"]),
            compute_dtype=jnp.bfloat16 if geo.get("bf16") else jnp.float32,
            sorted_resample=geo.get("sorted_resample", True),
            pallas=geo.get("pallas", "auto"))
        if which not in ("auto", "best", "last"):
            raise ValueError(f"which must be auto|best|last, got {which!r}")
        ckpt = os.path.join(run_dir, "checkpoints")
        if which != "last":
            from cvnerf_tpu.train.checkpoint import latest_step
            has_best = latest_step(ckpt + "_best") is not None
            if which == "best" and not has_best:
                raise FileNotFoundError(
                    f"no best-val checkpoint in {run_dir} — train with "
                    "--track_best, or load which='last'")
            if has_best and (which == "best" or step is None):
                ckpt += "_best"
        r = cls(ckpt,
                height=geo["height"], width=geo["width"],
                focal=geo["focal"], near=geo["near"], far=geo["far"],
                ndc=geo["ndc"], ndc_variant=geo["ndc_variant"],
                cfg=cfg, chunk=chunk, seed=seed, step=step,
                deterministic=deterministic, use_mesh=use_mesh)
        # Record what "auto" resolved to so consumers (cvnerf-eval reports,
        # serving logs) can state which model was actually loaded.
        r.which = "best" if ckpt.endswith("_best") else "last"
        if geo.get("calib_poses"):
            r.calib_poses = np.asarray(geo["calib_poses"], np.float32)
        fa = int(geo.get("freq_anneal", 0) or 0)
        if fa > 0 and r.step < fa:
            # Mid-anneal checkpoint (e.g. a --track_best best-val model
            # whose peak fell inside the anneal horizon): the loss only
            # ever trained it through the step's frequency window, so the
            # raw high-band weights are untrained init noise — apply the
            # same window before any rendering or baking.
            from cvnerf_tpu.models.nerf_mlp import anneal_model_params
            r.params = anneal_model_params(r.params, r.cfg.mlp, r.step / fa)
            r._float_params = r.params
            print(f"serving a mid-anneal checkpoint (step {r.step} < "
                  f"freq_anneal {fa}): applying the training-time "
                  f"frequency window")
        if geo.get("occ_train"):
            # The checkpoint was trained with --occ_train: past the warmup
            # switch its coarse net is frozen at warmup quality, so render
            # the way it was trained — through a baked grid (full mode).
            # A checkpoint from a run that never actually switched (too
            # short, or every bake came up empty) carries a fully-trained
            # coarse net; serving it through a non-empty grid is then just
            # standard occupancy serving (measured −0.05 dB, BASELINE.md),
            # and require_occupied makes an EMPTY bake fall back to
            # grid-less rendering instead of a no-support sampler.
            ot = geo["occ_train"]
            r.enable_occupancy(resolution=int(ot["resolution"]),
                               bound=float(ot["bound"]),
                               mode=ot.get("mode", "full"),
                               # Legacy (pre-round-4) occ_train runs were
                               # trained with the nearest-vertex probe and
                               # no coverage floor; keep their sampling
                               # semantics.
                               interp=ot.get("interp", "nearest"),
                               floor=int(ot.get("floor", 0)),
                               require_occupied=True)
        return r

    def render_pose(self, c2w, factor: int = 0) -> np.ndarray:
        """Render one ``[H, W, 3]`` view from a ``[3+,4]`` c2w pose."""
        return self.render_pose_extras(c2w, factor, keys=("rgb",))["rgb"]

    def render_pose_extras(self, c2w, factor: int = 0,
                           keys: tuple[str, ...] = ("rgb", "depth", "acc"),
                           ) -> dict:
        """Like :meth:`render_pose` but returns a dict of the requested
        render outputs (``rgb`` plus ``depth``/``acc``/``rgb_coarse``
        extras the renderer computes anyway; reference discards them —
        SURVEY.md §2.1 C6 returns only the rgb maps). Only the requested
        ``keys`` are transferred device→host — the rest stay on device."""
        import jax.numpy as jnp
        h, w, f = self.height, self.width, self.focal
        if factor:
            h, w, f = h // factor, w // factor, f / factor
        out = render_image(self._key, self.params, h, w, f,
                           jnp.asarray(c2w)[:3, :4], self.near, self.far,
                           self.cfg, ndc=self.ndc,
                           ndc_variant=self.ndc_variant, chunk=self.chunk,
                           mesh=self.mesh, occupancy=self.occupancy)
        return {k: np.asarray(out[k]) for k in keys}

    def enable_occupancy(self, *, resolution: int = 192, dilate: int = 1,
                         bound: float = 1.5, mode: str = "merge",
                         interp: str = "nearest",
                         term: float = 0.0,
                         floor: int = 0,
                         n_coarse: int | None = None,
                         n_fine: int | None = None,
                         require_occupied: bool = False) -> "NerfRenderer":
        """Bake an occupancy grid and serve all renders through it.

        Replaces the coarse MLP pass with a density-grid probe
        (``render.occupancy``). ``mode="merge"`` keeps the reference fine
        pass (25% fewer MLP evals); ``mode="full"`` additionally draws all
        fine samples from the probe CDF without merging the probe depths
        (half the MLP evals). Measured deltas in BASELINE.md. The bake
        itself is one grid query (~seconds); it reflects the *current*
        checkpoint — re-enable after loading different weights.

        ``require_occupied=True`` (the ``from_run_dir`` auto path): if the
        bake finds no positive density anywhere, fall back to grid-less
        rendering with a warning instead of installing a sampler with no
        support (every ray would get the ε-uniform fallback CDF). Returns
        self for chaining.

        ``term`` > 0 additionally enables early ray termination /
        empty-space skip (``occupancy.occupancy_ray_bounds``): each ray's
        sampling interval is probe-marched down to the region that
        contributes (transmittance ≥ term past the first occupied voxel).
        Samples then concentrate where they matter, so ``n_coarse`` /
        ``n_fine`` can be REDUCED below the training counts at preserved
        quality — that pair of overrides is the speed dial (serving-only;
        the checkpoint is untouched).
        """
        if mode not in ("merge", "full"):
            raise ValueError(f"mode must be 'merge' or 'full', got {mode!r}")
        if interp not in ("trilinear", "nearest"):
            raise ValueError(f"interp must be 'trilinear' or 'nearest', "
                             f"got {interp!r}")
        from cvnerf_tpu.render.occupancy import (bake_scene_occupancy,
                                                 occupied_fraction)
        # Bake from the host view of the float master copy (works
        # replicated or not, and composes with enable_int8 in any order).
        grid = bake_scene_occupancy(
            self._float_params, self.cfg.mlp, ndc=self.ndc, bound=bound,
            n_fine=self.cfg.n_fine, resolution=resolution, dilate=dilate,
            compute_dtype=self.cfg.compute_dtype, pallas=self.cfg.pallas,
            mesh=self.mesh)
        if require_occupied and occupied_fraction(grid) <= 0.0:
            print("[WARN] occupancy bake found no positive density — "
                  "serving grid-less (the checkpoint's coarse net drives "
                  "the resample)", flush=True)
            return self
        base_c, base_f = self._base_samples
        self.cfg = dataclasses.replace(
            self.cfg, occupancy_mode=mode, occupancy_interp=interp,
            occupancy_termination=float(term), occ_floor=int(floor),
            n_coarse=base_c if n_coarse is None else int(n_coarse),
            n_fine=base_f if n_fine is None else int(n_fine))
        self.occupancy = grid
        return self

    def enable_int8(self, *, poses=None, n_calib: int = 1 << 17,
                    bound: float | None = None,
                    seed: int = 0) -> "NerfRenderer":
        """Quantize the loaded nets to int8 and serve all renders with them.

        Post-training symmetric quantization (``ops.quantize``): weights
        AND activations carry per-channel scales, calibrated max-abs over
        ``n_calib`` samples. On TPU renders then run the fused int8 Pallas
        kernel (``ops/pallas/fused_mlp_int8.py``) — the v5e's int8 MXU rate
        is 2× bf16 (measured deltas in BASELINE.md); elsewhere the jnp int8
        oracle. Composes with :meth:`enable_occupancy` in either order (the
        bake always reads the float master copy). Opt-in per deployment,
        like the occupancy grid: checkpoints are untouched, and reloading
        weights requires re-enabling. Returns self for chaining.

        Args:
            poses: optional ``[P, 3+, 4]`` c2w poses (e.g. the pose set you
                will serve) — calibration then samples REAL rays through
                this camera set, the exact query distribution. Defaults to
                the run snapshot's stored camera set
                (``self.calib_poses``, present for ``from_run_dir``
                renderers of snapshots that recorded poses). With no poses
                anywhere, falls back to uniform samples in a ``±bound``
                cube (``bound=None`` → ``far``). NOTE: the cube fallback is
                a heuristic, not a guarantee — rays reach
                ``|p| ≤ |origin| + far``, which exceeds ``±far`` whenever
                cameras sit away from the origin, and under-sized bounds
                clip the position encoding and cost dB (measured −12 dB;
                ``ops.quantize``). Prefer poses. NDC scenes always
                calibrate in the NDC box, which IS exact.
        """
        from cvnerf_tpu.ops.quantize import (calibration_samples,
                                             quantize_nerf_params,
                                             calibrate_nerf_quant,
                                             ray_calibration_samples)
        key = jax.random.PRNGKey(seed)
        if poses is None:
            poses = self.calib_poses
        if poses is not None:
            pts, dirs = ray_calibration_samples(
                key, n_calib, poses, self.height, self.width, self.focal,
                self.near, self.far, ndc=self.ndc,
                ndc_variant=self.ndc_variant)
        elif self.ndc:
            pts, dirs = calibration_samples(
                key, n_calib, (-1.0, -1.0, 0.0), (1.0, 1.0, 1.0))
        else:
            b = self.far if bound is None else bound
            pts, dirs = calibration_samples(key, n_calib, (-b,) * 3,
                                            (b,) * 3)
        host = jax.tree.map(np.asarray, self._float_params)
        qs = {k: quantize_nerf_params(
                  host[k], self.cfg.mlp,
                  calibrate_nerf_quant(host[k], self.cfg.mlp, pts, dirs))
              for k in host}
        self.params = (replicate_to_mesh(qs, self.mesh)
                       if self.mesh is not None else jax.device_put(qs))
        return self

    def extract_mesh(self, *, net: str = "fine", resolution: int = 256,
                     iso: float = 50.0, bound: float = 1.5,
                     chunk: int = 65536,
                     keep: str = "all") -> tuple[np.ndarray, np.ndarray]:
        """Mesh this checkpoint's density field (see ``render.mesh``).

        For NDC-trained runs the sampling box is the NDC frustum box
        (x, y ∈ [-1, 1], z ∈ [0, 1]) — the only region the model was ever
        queried in; otherwise a ``±bound`` cube around the origin.
        """
        from cvnerf_tpu.render.mesh import extract_mesh
        if self.ndc:
            bbox_min, bbox_max = (-1.0, -1.0, 0.0), (1.0, 1.0, 1.0)
        else:
            bbox_min = (-bound,) * 3
            bbox_max = (bound,) * 3
        if net == "fine" and self.cfg.n_fine == 0:
            net = "coarse"
        # Serving params may be mesh-replicated jax arrays; extraction only
        # reads them, which works for either placement.
        return extract_mesh(self._float_params, self.cfg.mlp, net=net,
                            bbox_min=bbox_min, bbox_max=bbox_max,
                            resolution=resolution, iso=iso, chunk=chunk,
                            compute_dtype=self.cfg.compute_dtype, keep=keep)

    def render_video(self, poses, factor: int = 0,
                     on_frame=None, collect: bool = True) -> np.ndarray:
        """Render a pose sequence to ``[N, H, W, 3]``, pipelined.

        ``collect=False`` (requires ``on_frame``) streams: each frame is
        dropped once the callback consumed it and None is returned —
        constant host memory for long/high-res sequences."""
        return render_poses_to_frames(
            self._key, self.params, poses, self.height, self.width,
            self.focal, self.near, self.far, self.cfg, ndc=self.ndc,
            ndc_variant=self.ndc_variant, chunk=self.chunk, factor=factor,
            on_frame=on_frame, mesh=self.mesh, occupancy=self.occupancy,
            collect=collect)

    def render_poses_extras(self, poses, factor: int = 0,
                            keys: tuple[str, ...] = ("rgb",)) -> dict:
        """Batched :meth:`render_pose_extras`: a dict of stacked arrays
        (``keys`` → ``[N, H, W, ...]``), frames pipelined on device.

        Used by the HTTP server's device queue to micro-batch concurrent
        single-pose requests into one pipelined program. In the default
        deterministic serving mode results are identical to N separate
        ``render_pose_extras`` calls; in ``--stochastic`` mode the batched
        path derives per-frame keys (``render_poses_to_frames``) while the
        single-pose path reuses one key, so resample streams differ.
        """
        out = render_poses_to_frames(
            self._key, self.params, poses, self.height, self.width,
            self.focal, self.near, self.far, self.cfg, ndc=self.ndc,
            ndc_variant=self.ndc_variant, chunk=self.chunk, factor=factor,
            mesh=self.mesh, occupancy=self.occupancy,
            frame_keys=tuple(keys))
        return {"rgb": out} if tuple(keys) == ("rgb",) else out
