"""cvnerf_tpu experiment driver: config-driven NeRF training and rendering.

Entry-point parity with the reference (``python main.py --config
configs/<scene>.txt``, reference main.py:280-462), rebuilt TPU-native: the
whole per-step pipeline is one jitted program, spiral videos render
pipelined, checkpoints/metrics/validation are first-class (the reference has
none of the three — SURVEY.md §4, §5).

Lives inside the package (installed as the ``cvnerf-train`` console script);
the repo-root ``main.py`` shim keeps the reference-shaped invocation.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def main(argv=None):
    # Parse before importing jax so --debug_nans can set flags pre-init.
    from cvnerf_tpu.config import parse_args, snapshot_config
    args = parse_args(argv)

    import jax
    # Multi-host (opt-in): must run before any other JAX API so the
    # coordination service wires DCN across hosts (SURVEY.md §2.4).
    from cvnerf_tpu.parallel.mesh import initialize_distributed
    if initialize_distributed(args.coordinator, args.num_processes,
                              args.process_id):
        print(f"Distributed: process {jax.process_index()} of "
              f"{jax.process_count()}")
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    from cvnerf_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp
    from cvnerf_tpu.data import load_scene
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
    from cvnerf_tpu.parallel.mesh import make_mesh
    from cvnerf_tpu.render.frames import render_poses_to_frames
    from cvnerf_tpu.render.renderer import RenderConfig
    from cvnerf_tpu.train.checkpoint import (
        Checkpointer,
        latest_step,
        restore_checkpoint,
    )
    from cvnerf_tpu.train.loop import TrainConfig, Trainer
    from cvnerf_tpu.train.state import create_train_state
    from cvnerf_tpu.utils.image import (psnr_images, ssim_images, write_png,
                                        write_video)
    from cvnerf_tpu.utils.metrics import MetricsLogger

    # --- data ---
    scene = load_scene(
        args.data_dir, args.dtype, half_res=args.half_res,
        testskip=args.testskip, white_bkg=args.white_bkg,
        factor=args.factor, no_ndc=args.no_ndc, llffhold=args.llffhold,
        spherify=args.spherify)
    print(f"Loaded {args.dtype} scene: {scene.images.shape[0]} images "
          f"{scene.height}x{scene.width} focal={scene.focal:.2f} "
          f"near={scene.near:.3f} far={scene.far:.3f} ndc={scene.ndc}")

    render_poses = scene.render_poses
    if args.render_test:
        render_poses = scene.poses[scene.test_idx]

    # --- run dirs & config snapshot ---
    run_dir = os.path.join(args.base_dir, args.name)
    save_dir = os.path.join(args.save_dir, args.name)
    os.makedirs(run_dir, exist_ok=True)
    os.makedirs(save_dir, exist_ok=True)
    # The run dir's existing occ_train serving metadata, if any. Read it
    # defensively: a corrupt/foreign scene.json (non-dict top level, non-dict
    # occ_train) must fall back like a missing one, not crash at startup.
    recorded_occ = None
    recorded_fa = None
    recorded_ema = None
    try:
        with open(os.path.join(run_dir, "scene.json")) as fp:
            _snap = json.load(fp)
        _ot = _snap.get("occ_train") if isinstance(_snap, dict) else None
        if isinstance(_ot, dict):
            recorded_occ = dict(_ot)
        def _num(v):
            # JSON true/false pass isinstance(..., int) — a corrupt
            # boolean must fall back like a missing key, not flow into
            # numeric paths (the defensive-read contract above).
            return isinstance(v, (int, float)) and not isinstance(v, bool)
        if isinstance(_snap, dict) and _num(_snap.get("freq_anneal")):
            recorded_fa = int(_snap["freq_anneal"])
        if isinstance(_snap, dict) and _num(_snap.get("ema_decay")):
            recorded_ema = float(_snap["ema_decay"])
    except (OSError, ValueError):
        pass
    # --no_reload starts a FRESH run (existing checkpoints are backed up):
    # the dir's recorded training metadata must not leak into it. Without
    # this, a trial run's record silently reshapes the fresh run — e.g. a
    # 240-step anneal horizon recorded at --iters 3000 would override the
    # 0.08 fraction's 4000-step resolution on a fresh 50k run, or a plain
    # baseline rerun would train with the previous run's EMA decay. The
    # occ record is still read below for the drop/preserve messaging; only
    # STICKINESS is disabled.
    sticky_occ = recorded_occ
    if args.no_reload:
        if recorded_fa:
            print(f"freq_anneal: ignoring the run dir's recorded horizon "
                  f"{recorded_fa} for this fresh (--no_reload) run")
        if recorded_ema:
            print(f"ema: ignoring the run dir's recorded decay "
                  f"{recorded_ema} for this fresh (--no_reload) run")
        recorded_fa = None
        recorded_ema = None
        sticky_occ = None
    if args.occ_train_mode is None:
        # Unset on the CLI/config: honor the mode this run dir was actually
        # trained with before falling back to the shipped default — a
        # checkpoint's sampling semantics must never flip because a later
        # version changed the default. Legacy --occ_train runs predate the
        # mode flag and were implicitly "full" (the same rule
        # serve.NerfRenderer.from_run_dir applies).
        recorded = (sticky_occ.get("mode", "full")
                    if sticky_occ is not None else None)
        args.occ_train_mode = recorded or "merge"
        if recorded and args.occ_train:
            print(f"occ_train: using the run dir's recorded sampling mode "
                  f"{recorded!r} (pass --occ_train_mode to override)")
    if args.occ_interp is None:
        # Same stickiness rule as the mode: a checkpoint keeps the probe it
        # was trained/recorded with. Legacy occ payloads predate the interp
        # field and were nearest-vertex.
        args.occ_interp = (sticky_occ.get("interp", "nearest")
                           if sticky_occ is not None else "nearest")
    if args.occ_floor is None:
        # Stickiness again: a checkpoint keeps the coverage floor it was
        # trained with (legacy payloads predate the field: floor 0).
        args.occ_floor = (sticky_occ.get("floor", 0)
                          if sticky_occ is not None else 0)
    if args.freq_anneal is not None:
        from cvnerf_tpu.config import resolve_freq_anneal
        fa_given = args.freq_anneal
        args.freq_anneal = resolve_freq_anneal(fa_given, args.iters)
        if 0 < fa_given < 1:
            if recorded_fa and args.freq_anneal != recorded_fa:
                # A fraction re-resolved against a DIFFERENT --iters on a
                # run dir with a recorded horizon (e.g. the same config
                # re-invoked with --iters raised, or --render_only at the
                # default iters): the user stated the rule, not a new
                # horizon — rewriting scene.json would mis-window every
                # existing checkpoint (a best-val model past the old
                # horizon would render through a partial window, masking
                # trained high bands). The recorded horizon sticks.
                print(f"freq_anneal: fractional horizon {fa_given} would "
                      f"resolve to {args.freq_anneal} at --iters "
                      f"{args.iters}, but this run dir recorded "
                      f"{recorded_fa} — keeping the recorded horizon "
                      f"(pass an explicit step count to re-window)")
                args.freq_anneal = recorded_fa
            else:
                print(f"freq_anneal: fractional horizon {fa_given} "
                      f"resolved to {args.freq_anneal} steps "
                      f"({args.iters} iters)")
    if args.freq_anneal is None:
        # Stickiness (same rule as the occ fields): checkpoints trained
        # under --freq_anneal were only ever optimized through the step's
        # frequency window — a re-invocation that omits the flag (resume,
        # --render_only) must keep rendering them through it AND keep the
        # horizon recorded in scene.json, or mid-anneal checkpoints would
        # be read with untrained high-band weights at full magnitude.
        args.freq_anneal = recorded_fa or 0
        if recorded_fa:
            print(f"freq_anneal: using the run dir's recorded anneal "
                  f"horizon {recorded_fa} (pass --freq_anneal 0 to "
                  f"override)")
    elif args.freq_anneal == 0 and recorded_fa:
        # Explicit 0 on a run dir with a recorded horizon: honored, but
        # it REWRITES scene.json with the horizon dropped — every later
        # invocation will then serve mid-anneal checkpoints with
        # untrained high-band weights at full magnitude, with no record
        # left that they were anneal-trained. Be loud (ADVICE r4).
        print(f"WARNING: --freq_anneal 0 drops this run dir's recorded "
              f"anneal horizon ({recorded_fa}) from scene.json; "
              f"checkpoints trained mid-anneal will render un-windowed "
              f"from now on. Re-pass --freq_anneal {recorded_fa} to "
              f"restore the record.")
    if args.ema_decay is None:
        # Stickiness (same rule as freq_anneal/occ fields): a resumed EMA
        # run must keep updating the same running average; an unset flag
        # means "whatever this run dir was doing", never "silently stop".
        args.ema_decay = recorded_ema or 0.0
        if recorded_ema:
            print(f"ema: using the run dir's recorded decay "
                  f"{recorded_ema} (pass --ema_decay 0 to override)")
    elif args.ema_decay == 0 and recorded_ema:
        print(f"WARNING: --ema_decay 0 on a run dir that recorded decay "
              f"{recorded_ema}: the stored running average is dropped and "
              f"later checkpoints serve the raw params. Re-pass "
              f"--ema_decay {recorded_ema} to keep averaging.")
    # Validate BEFORE write_scene_snapshot below: an invalid value that is
    # first recorded sticky and only rejected later (by the Trainer — or
    # never, under --render_only) would poison every subsequent flagless
    # invocation of the run dir.
    if not 0.0 <= args.ema_decay < 1.0:
        raise SystemExit(f"--ema_decay must be in [0, 1), got "
                         f"{args.ema_decay}")
    if args.occlusion_loss > 0 and not 0.0 < args.occlusion_frac < 1.0:
        raise SystemExit(
            f"--occlusion_frac must be in (0, 1), got "
            f"{args.occlusion_frac}: at frac >= 1 the near-window penalty "
            f"covers the whole ray and becomes the empty-scene objective "
            f"the distortion regularizer was measured to collapse into "
            f"(BASELINE.md 'Sparse-capture regularizers')")
    # A re-invocation that omits --occ_train on a run dir whose checkpoints
    # WERE occ-trained (untrained coarse net) must not silently downgrade
    # the serving metadata: the rewritten scene.json would serve those
    # checkpoints grid-less. Preserve the recorded payload unless the user
    # explicitly starts a fresh run (--no_reload backs the checkpoints up,
    # so the new run's checkpoints really are plain).
    preserve_occ = None
    if recorded_occ is not None and not args.occ_train:
        if args.no_reload:
            print("[WARN] run dir recorded --occ_train but this fresh "
                  "(--no_reload) run is plain: dropping the occupancy "
                  "serving metadata from scene.json")
        else:
            preserve_occ = recorded_occ
            print("[WARN] run dir recorded --occ_train but this invocation "
                  "omits it: preserving the occupancy serving metadata in "
                  "scene.json (the existing checkpoints carry an untrained "
                  "coarse net). Pass --no_reload for a fresh plain run.")
    snapshot_config(args, run_dir)
    ckpt_dir = os.path.join(run_dir, "checkpoints")

    # --- model / state ---
    mlp = NerfMLPConfig(xyz_freqs=args.xyz_freqs, dir_freqs=args.dir_freqs,
                        trunk_width=args.trunk_width,
                        head_width=args.head_width)
    if args.occ_train and args.n_fine_samples <= 0:
        sys.exit("--occ_train requires n_fine_samples > 0 (occupancy "
                 "sampling resamples n_fine points from the grid probe "
                 "CDF)")
    if args.occ_train and args.occ_train_every <= 0:
        sys.exit("--occ_train_every must be > 0: the switch to occupancy "
                 "training happens inside the rebake callback, so a "
                 "non-positive cadence would silently never switch")
    rcfg_train = RenderConfig(
        n_coarse=args.n_coarse_samples, n_fine=args.n_fine_samples,
        perturb=args.perturb > 0, noise_std=args.noise,
        white_bkg=args.white_bkg, mlp=mlp,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        pallas=args.pallas, sorted_resample=args.sorted_resample,
        occupancy_mode=args.occ_train_mode if args.occ_train else "merge",
        occupancy_interp=args.occ_interp,
        occ_floor=args.occ_floor if args.occ_train else 0)
    rcfg_test = rcfg_train.eval_mode()
    if args.deterministic_resample:
        import dataclasses
        rcfg_test = dataclasses.replace(rcfg_test,
                                        deterministic_resample=True)

    # Persist the derived scene geometry + architecture so `cvnerf-serve
    # --run <dir>` (and NerfRenderer.from_run_dir) need zero hand-typed
    # geometry flags.
    from cvnerf_tpu.serve import write_scene_snapshot
    write_scene_snapshot(
        run_dir, height=scene.height, width=scene.width, focal=scene.focal,
        near=scene.near, far=scene.far, ndc=scene.ndc,
        ndc_variant=args.ndc_variant, white_bkg=args.white_bkg,
        n_coarse=args.n_coarse_samples, n_fine=args.n_fine_samples,
        bf16=args.bf16, mlp=mlp, sorted_resample=args.sorted_resample,
        pallas=args.pallas, calib_poses=scene.poses,
        occ_train=args.occ_train or preserve_occ is not None,
        occ_res=(preserve_occ or {}).get("resolution", args.occupancy_res),
        occ_bound=(preserve_occ or {}).get("bound", args.occupancy_bound),
        occ_mode=(preserve_occ or {}).get("mode", args.occ_train_mode),
        occ_interp=(preserve_occ or {}).get("interp", args.occ_interp),
        occ_floor=(preserve_occ or {}).get("floor", args.occ_floor),
        freq_anneal=args.freq_anneal, ema_decay=args.ema_decay)

    state = create_train_state(jax.random.PRNGKey(args.seed), lr=args.lr,
                               lr_decay=args.lr_decay, mlp=mlp,
                               ema=args.ema_decay > 0)

    def deploy_params(st):
        """The deployable weights of a state: the Polyak average when
        --ema_decay is on (the raw params are the noisy last SGD
        iterate), else the raw params. Every human-facing render — val,
        video, test eval, --render_only — reads through this; training
        internals (the occupancy bake that steers the LIVE sampler) stay
        on the raw params."""
        return st.ema_params if st.ema_params is not None else st.params

    def render_params(params, step: int):
        """Params as the optimizer sees them at ``step``: with
        ``--freq_anneal`` a mid-anneal model was only ever trained through
        the step's frequency window — eval/video renders must apply the
        same window or they read untrained high-band weights at full
        magnitude. Identity once the anneal horizon has passed (and when
        the flag is off)."""
        if args.freq_anneal > 0 and step < args.freq_anneal:
            from cvnerf_tpu.models.nerf_mlp import anneal_model_params
            return anneal_model_params(params, mlp,
                                       step / args.freq_anneal)
        return params

    best_meta_path = os.path.join(run_dir, "best.json")

    def backup_stale_ckpts(reason: str) -> None:
        # Move the run dir's existing checkpoints aside so this run's
        # (lower-step) saves aren't shadowed at resume time — and don't
        # crash mid-run when the async writer refuses a lower step. The
        # best-val checkpoint dir and its metadata move together with the
        # main dir: a stale checkpoints_best would likewise refuse
        # lower-step saves, and its score belongs to the backed-up run.
        best_dir = ckpt_dir + "_best"
        have_main = os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)
        # A crash before the first periodic save can leave ONLY the
        # best-val checkpoint + best.json behind; those must move aside
        # too, or the fresh run inherits the abandoned run's best score
        # (its writer then refuses every lower-step save and the final
        # test-at-best scores the abandoned run's weights).
        have_best = ((os.path.isdir(best_dir) and os.listdir(best_dir))
                     or os.path.exists(best_meta_path))
        if not (have_main or have_best):
            return
        step = latest_step(ckpt_dir if have_main else best_dir) or 0
        base = f"{ckpt_dir}.bak-{step}"
        backup, k = base, 1
        while any(os.path.exists(p) for p in
                  (backup, backup + "_best", backup + ".best.json")):
            backup = f"{base}.{k}"   # repeated restarts at the same step
            k += 1
        if have_main:
            os.rename(ckpt_dir, backup)
        for extra, dst in ((best_dir, backup + "_best"),
                           (best_meta_path, backup + ".best.json")):
            if os.path.exists(extra):
                os.rename(extra, dst)
        print(f"{reason}: moved existing checkpoints to {backup}")

    start = 0
    if args.ft_path:
        restored = restore_checkpoint(args.ft_path, state)
        if restored is None:
            sys.exit(f"--ft_path {args.ft_path}: no checkpoint found")
        state, start = restored, int(restored.step)
        print(f"Restored fine-tune checkpoint at step {start}")
        newest_here = max(latest_step(ckpt_dir) or -1,
                          latest_step(ckpt_dir + "_best") or -1)
        if os.path.abspath(args.ft_path) != os.path.abspath(ckpt_dir) and \
                newest_here > start:
            # The run dir holds checkpoints newer than the fine-tune start;
            # saving step start+k onto them would fail at the first
            # periodic save — catch it here instead of mid-run.
            backup_stale_ckpts("--ft_path behind existing checkpoints")
    elif not args.no_reload:
        restored = restore_checkpoint(ckpt_dir, state)
        # Crash-recovery fallback: with a sparse --ckpt_freq a run can die
        # before its first periodic save while --track_best has already
        # checkpointed a full TrainState at a validation step. Resume from
        # whichever checkpoint is newest rather than restarting from zero.
        best_step = latest_step(ckpt_dir + "_best")
        if best_step is not None and best_step > (
                int(restored.step) if restored is not None else -1):
            best_restored = restore_checkpoint(ckpt_dir + "_best", state,
                                               step=best_step)
            if best_restored is not None:
                restored = best_restored
                print(f"Periodic checkpoints are behind the best-val "
                      f"checkpoint (step {best_step}) — resuming from best")
        if restored is not None:
            state, start = restored, int(restored.step)
            print(f"Resumed from checkpoint at step {start}")
    else:
        backup_stale_ckpts("--no_reload")

    mesh = make_mesh()
    n_dev = mesh.devices.size
    print(f"Device mesh: {n_dev} x {mesh.devices.flat[0].platform}")

    render_chunk = args.chunk

    def spiral_video(step: int, params, occupancy=None) -> np.ndarray:
        frame_dir = os.path.join(save_dir, f"spiral_{step:06d}")

        def on_frame(i, rgb):
            write_png(os.path.join(frame_dir, f"{i:03d}.png"), rgb)

        keys = ("rgb", "depth", "acc") if args.render_depth else ("rgb",)
        out_frames = render_poses_to_frames(
            jax.random.PRNGKey(args.seed + 1), params, render_poses,
            scene.height, scene.width, scene.focal, scene.near, scene.far,
            rcfg_test, ndc=scene.ndc, ndc_variant=args.ndc_variant,
            chunk=render_chunk, factor=args.render_factor,
            on_frame=on_frame, mesh=mesh if n_dev > 1 else None,
            frame_keys=keys, occupancy=occupancy)
        frames = out_frames if not args.render_depth else out_frames["rgb"]
        out = write_video(
            os.path.join(save_dir, f"{args.name}_spiral_{step:06d}_rgb.mp4"),
            frames, fps=30)
        print(f"Wrote video: {out} ({frames.shape[0]} frames)")
        if args.render_depth:
            # Normalized disparity (1 / expected termination depth, opacity-
            # corrected), grayscale → 3-channel for the mp4 writer. The
            # reference computes depth nowhere; this is the standard NeRF
            # disp_map visualization.
            depth, acc = out_frames["depth"], out_frames["acc"]
            disp = 1.0 / np.maximum(depth / np.maximum(acc, 1e-6), 1e-6)
            disp = disp * (acc > 1e-3)           # background → 0
            disp = disp / max(disp.max(), 1e-6)
            disp_path = os.path.join(
                save_dir, f"{args.name}_spiral_{step:06d}_disp.mp4")
            write_video(disp_path, np.repeat(disp[..., None], 3, -1), fps=30)
            print(f"Wrote video: {disp_path}")
        return frames

    def _split_heldout_views() -> tuple[np.ndarray, np.ndarray]:
        """(val_views, test_views): ≤4 validation and ≤8 test views.

        When the dataset has no separate val split (LLFF: val_idx IS
        test_idx, datasets.py): with ``--track_best`` the held-out set is
        PARTITIONED — odd-position views validate, the rest test — so the
        model-SELECTION signal and the acceptance number never share an
        image (selecting the checkpoint on views test_eval also scores
        would inflate test_psnr_best). Without selection, val is only a
        monitoring signal, so it just skips test view 0 and the full
        held-out set still tests. A single held-out view is the
        unavoidable-overlap degenerate case.
        """
        empty = np.zeros((0,), np.int64)
        vi = np.asarray(scene.val_idx)
        ti = np.asarray(scene.test_idx)
        if len(vi) and (len(ti) == 0 or not np.array_equal(vi, ti)):
            return vi[:4], ti[:8]          # genuinely separate splits
        held = ti if len(ti) else vi
        if len(held) == 0:
            # No held-out view at all: scoring a TRAIN view as val would
            # be silently optimistic — skip validation instead.
            return empty, empty
        if len(held) == 1:
            return held.copy(), held.copy()
        if args.track_best:
            val = held[1::2][:4]
            test = np.asarray(
                [t for t in held if t not in set(val.tolist())])
            return val, test[:8]
        return held[1:5], held[:8]

    val_views, test_views = _split_heldout_views()

    # LPIPS (optional, weights-pluggable): fail fast on a bad path instead
    # of at the end-of-run eval, and degrade to PSNR/SSIM-only with a
    # warning when the frames are below the AlexNet minimum support.
    lpips_bundle = None
    if args.lpips_weights:
        from cvnerf_tpu.utils.lpips import load_weights
        lpips_bundle = load_weights(args.lpips_weights)
        if min(scene.height, scene.width) < 32:
            print(f"[WARN] --lpips_weights ignored: {scene.height}x"
                  f"{scene.width} frames are below the 32px AlexNet-LPIPS "
                  "minimum")
            lpips_bundle = None

    def _lpips(rgb, gt) -> float | None:
        if lpips_bundle is None:
            return None
        from cvnerf_tpu.utils.lpips import lpips_images
        return lpips_images(rgb, np.asarray(gt)[..., :3], lpips_bundle)

    def val_metrics(params, occupancy=None):
        """Mean PSNR/SSIM over the val views; returns (psnr, ssim, rgb0)."""
        from cvnerf_tpu.render.frames import render_image
        if not len(val_views):
            return None, None, None
        psnrs, ssims, rgb0 = [], [], None
        for i in val_views:
            out = render_image(
                jax.random.PRNGKey(123), params, scene.height, scene.width,
                scene.focal, jnp.asarray(scene.poses[int(i)]), scene.near,
                scene.far, rcfg_test, ndc=scene.ndc,
                ndc_variant=args.ndc_variant, chunk=render_chunk,
                mesh=mesh if n_dev > 1 else None, occupancy=occupancy)
            rgb = np.asarray(out["rgb"])
            rgb0 = rgb if rgb0 is None else rgb0
            psnrs.append(psnr_images(rgb, scene.images[int(i)]))
            ssims.append(ssim_images(rgb, scene.images[int(i)]))
        return float(np.mean(psnrs)), float(np.mean(ssims)), rgb0

    # --- render-only mode (the reference parses this flag but ignores it,
    # main.py:436; honored here) ---
    if args.render_only:
        if args.track_best and not args.ft_path:
            # The deployable model of a --track_best run is the best-val
            # checkpoint (spherify long-horizon finding) — render that,
            # like serve/eval/mesh do; --no-track_best restores the
            # reference behavior (latest checkpoint). An explicit
            # --ft_path names the exact weights to render — never
            # second-guess it.
            best_restored = restore_checkpoint(ckpt_dir + "_best", state)
            if best_restored is not None and \
                    int(best_restored.step) != int(state.step):
                state, start = best_restored, int(best_restored.step)
                print(f"--render_only on a --track_best run: rendering "
                      f"the best-val model (step {start}); pass "
                      f"--no-track_best for the last checkpoint")
        params = render_params(deploy_params(state), start)
        if n_dev > 1:
            from cvnerf_tpu.parallel.mesh import replicated_sharding
            params = jax.device_put(params, replicated_sharding(mesh))
        occ = None
        if (args.occ_train or preserve_occ is not None) and not args.occupancy:
            # An --occ_train run's checkpoints carry an untrained coarse
            # net — render them the way they were trained (also when the
            # re-invocation omitted --occ_train and we preserved the run
            # dir's recorded metadata above).
            args.occupancy = ((preserve_occ or {}).get("mode")
                              or args.occ_train_mode)
            if preserve_occ is not None:
                args.occupancy_res = preserve_occ.get(
                    "resolution", args.occupancy_res)
                args.occupancy_bound = preserve_occ.get(
                    "bound", args.occupancy_bound)
                print(f"--render_only: rendering through the run dir's "
                      f"recorded occupancy mode {args.occupancy!r}")
        if args.occupancy:
            import dataclasses
            from cvnerf_tpu.render.occupancy import (bake_scene_occupancy,
                                                     occupied_fraction)
            occ = bake_scene_occupancy(
                render_params(deploy_params(state), start), mlp, ndc=scene.ndc,
                bound=args.occupancy_bound, n_fine=args.n_fine_samples,
                resolution=args.occupancy_res,
                compute_dtype=rcfg_test.compute_dtype, pallas=args.pallas,
                mesh=mesh if n_dev > 1 else None)
            if occupied_fraction(occ) <= 0.0:
                # A grid with no support would give every ray the
                # ε-uniform fallback CDF; grid-less rendering is always
                # well-defined.
                print("[WARN] occupancy bake found no positive density — "
                      "rendering grid-less", flush=True)
                occ = None
            else:
                rcfg_test = dataclasses.replace(
                    rcfg_test, occupancy_mode=args.occupancy)
                print(f"occupancy grid active: mode={args.occupancy} "
                      f"res={args.occupancy_res}")
        if args.int8:
            from cvnerf_tpu.ops.quantize import (quantize_nerf,
                                                 ray_calibration_samples)
            # Calibrate on real rays through every pose the run knows
            # about — the exact distribution the renders will query.
            pts, dirs = ray_calibration_samples(
                jax.random.PRNGKey(0), args.int8_calib, scene.poses,
                scene.height, scene.width, scene.focal, scene.near,
                scene.far, ndc=scene.ndc, ndc_variant=args.ndc_variant)
            host = jax.tree.map(np.asarray,
                                render_params(deploy_params(state), start))
            params = {k: quantize_nerf(host[k], mlp, pts, dirs)
                      for k in host}
            if n_dev > 1:
                from cvnerf_tpu.parallel.mesh import replicated_sharding
                params = jax.device_put(params, replicated_sharding(mesh))
            print(f"int8 quantized rendering active "
                  f"(calibrated on {args.int8_calib} ray samples)")
        frames = spiral_video(start, params, occupancy=occ)
        if args.render_test and not args.render_factor:
            # Rendering the held-out poses at full resolution: report the
            # test metrics too (the render IS the evaluation).
            psnrs = [psnr_images(frames[k], scene.images[int(i)])
                     for k, i in enumerate(np.asarray(scene.test_idx))]
            ssims = [ssim_images(frames[k], scene.images[int(i)])
                     for k, i in enumerate(np.asarray(scene.test_idx))]
            lps = [_lpips(frames[k], scene.images[int(i)])
                   for k, i in enumerate(np.asarray(scene.test_idx))]
            lp_txt = ("" if lps[0] is None else
                      f" test_lpips={float(np.mean(lps)):.4f}")
            print(f"render_test @ step {start}: test_psnr="
                  f"{float(np.mean(psnrs)):.3f} "
                  f"test_ssim={float(np.mean(ssims)):.4f}{lp_txt} "
                  f"({len(psnrs)} views)")
        return

    # --- training ---
    tcfg = TrainConfig(
        height=scene.height, width=scene.width, focal=scene.focal,
        near=scene.near, far=scene.far, n_rays=args.n_rays, lr=args.lr,
        lr_decay=args.lr_decay, precrop_iters=args.precrop_iters,
        precrop_frac=args.precrop_frac, ndc=scene.ndc,
        ndc_variant=args.ndc_variant, pixel_sampling=args.pixel_sampling,
        noise_decay=args.noise_decay, ray_batching=args.ray_batching,
        freq_anneal=args.freq_anneal, distortion_loss=args.distortion_loss,
        distortion_start=args.distortion_start,
        distortion_ramp=args.distortion_ramp,
        occlusion_loss=args.occlusion_loss,
        occlusion_frac=args.occlusion_frac,
        ema_decay=args.ema_decay,
        render=rcfg_train)
    trainer = Trainer(tcfg, state, scene.images, scene.poses,
                      scene.train_idx, seed=args.seed, mesh=mesh,
                      steps_per_call=args.steps_per_call)
    logger = MetricsLogger(run_dir)

    occ_bake = None
    if args.occ_train:
        from cvnerf_tpu.render.occupancy import bake_scene_occupancy

        def occ_bake(params):
            # Trainer.set_occupancy / the eval renders handle mesh
            # replication themselves; bake host-side once.
            return bake_scene_occupancy(
                params, mlp, ndc=scene.ndc, bound=args.occupancy_bound,
                n_fine=args.n_fine_samples, resolution=args.occupancy_res,
                compute_dtype=rcfg_train.compute_dtype, pallas=args.pallas,
                mesh=None)

        if start >= args.occ_train_warmup:
            # Resumed past the warmup boundary: re-enter accelerated mode
            # immediately (the grid is rebaked from the restored params;
            # resume is therefore step-aligned, not bitwise, in occ mode —
            # see docs/DESIGN.md).
            verdict = trainer.maybe_set_occupancy(
                occ_bake(render_params(trainer.state.params, start)))
            if verdict == "postponed":
                print("occ_train: baked grid is empty at resume — staying "
                      "on reference-semantics training until a rebake "
                      "finds a surface")
            else:
                print(f"occ_train: occupancy training active from step "
                      f"{start} (res={args.occupancy_res})")

    from cvnerf_tpu.train.state import make_lr_schedule
    lr_sched = make_lr_schedule(args.lr, args.lr_decay)

    dead_warned = [False]

    def log_cb(i, tr, m):
        extra = {k: m[k] for k in ("grad_norm",) if m.get(k) is not None}
        logger.log(i, loss=m["loss"], psnr=m["psnr"],
                   rays_per_sec=m["rays_per_sec"],
                   lr=float(lr_sched(i)), **extra)
        if (not dead_warned[0] and m.get("grad_norm") == 0.0
                and m.get("loss", 0.0) > 0.0):
            # Exactly-zero gradient with nonzero loss is the dead-ReLU
            # collapse signature: the density field went non-positive on
            # every sampled point, the render equals the background
            # constant, and no gradient path remains to recover. Observed
            # on small scenes at aggressive lr (docs/DESIGN.md).
            dead_warned[0] = True
            print(f"[WARN] zero gradient with nonzero loss at step {i}: "
                  f"the density field has likely collapsed (dead-ReLU "
                  f"regime) — try a lower --lr, --noise > 0, or more "
                  f"training views", flush=True)

    # One persistent manager for the whole run; saves are asynchronous so
    # checkpoint I/O overlaps the following train steps.
    if args.ckpt_keep < 1:
        sys.exit("--ckpt_keep must be >= 1 (retention of zero checkpoints "
                 "would make every save a no-op)")
    ckpt_writer = Checkpointer(ckpt_dir, max_to_keep=args.ckpt_keep)

    # Best-validation model selection (--track_best): on sparse captures
    # the held-out quality can peak mid-run (measured on the 360° band:
    # val peaks by ~5-15k of a 50k run while train PSNR keeps climbing) —
    # the deployable model is the best-val checkpoint, not the last step.
    # The best score persists in best.json so a RESUMED run keeps
    # comparing against the all-time best instead of re-crowning the
    # first (possibly post-peak) val it sees; stale-run leftovers are
    # moved aside by backup_stale_ckpts above.
    best = {"psnr": float("-inf"), "step": None}
    best_writer = (Checkpointer(ckpt_dir + "_best",
                                max_to_keep=args.ckpt_keep)
                   if args.track_best and args.val_freq > 0 else None)
    if best_writer is not None and os.path.exists(best_meta_path) and \
            (latest_step(ckpt_dir + "_best") is not None):
        import json as _json
        with open(best_meta_path) as fp:
            best = _json.load(fp)
        print(f"Resuming best-val tracking: {best['psnr']:.3f} dB at "
              f"step {best['step']}")

    def ckpt_cb(i, tr, m):
        ckpt_writer.save(tr.state)
        print(f"Checkpoint save enqueued at step {i}")

    def _non_fatal(fn):
        # Eval/render failures must not kill training (SURVEY.md §5 —
        # the reference would lose the whole uncheckpointed run).
        def wrapped(i, tr, m):
            try:
                fn(i, tr, m)
            except Exception as e:  # noqa: BLE001
                print(f"[WARN] callback {fn.__name__} failed at step {i}: "
                      f"{e!r}", flush=True)
        return wrapped

    @_non_fatal
    def occ_cb(i, tr, m):
        if i < args.occ_train_warmup:
            return
        from cvnerf_tpu.render.occupancy import occupied_fraction
        grid = occ_bake(render_params(tr.state.params, i))
        frac = occupied_fraction(grid)
        verdict = tr.maybe_set_occupancy(grid, occupied_frac=frac)
        logger.log(i, occ_verdict=verdict,
                   occ_occupied_frac=round(frac, 5))
        if verdict == "switched":
            print(f"occ_train: switched to occupancy training at step {i} "
                  f"(res={args.occupancy_res}, rebake every "
                  f"{args.occ_train_every})")
        elif verdict == "postponed":
            print(f"occ_train: baked grid still empty at step {i} — "
                  f"postponing the occupancy switch (retrying every "
                  f"{args.occ_train_every} steps)")
        elif verdict == "kept":
            print(f"[WARN] occ_train: rebake at step {i} produced an "
                  f"empty grid; keeping the previous one", flush=True)

    @_non_fatal
    def vid_cb(i, tr, m):
        frames = spiral_video(i, render_params(deploy_params(tr.state), i),
                              occupancy=tr.occupancy)
        logger.log_image(i, "spiral_frame0", frames[0])

    @_non_fatal
    def val_cb(i, tr, m):
        v, s, rgb = val_metrics(render_params(deploy_params(tr.state), i),
                                occupancy=tr.occupancy)
        if v is None:
            return
        logger.log(i, val_psnr=v, val_ssim=s, val_views=len(val_views))
        logger.log_image(i, "val_render", rgb)
        if best_writer is not None and v > best["psnr"]:
            # Save FIRST: if the writer refuses (e.g. a stale dir slipped
            # past the backups), best must not advance past the
            # checkpoint that actually exists on disk.
            best_writer.save(tr.state)
            best.update(psnr=v, step=i)
            import json as _json
            with open(best_meta_path, "w") as fp:
                _json.dump(best, fp)
            print(f"New best val PSNR {v:.3f} at step {i} "
                  f"(checkpointed to {ckpt_dir}_best)")

    if args.occ_train:
        # Registered first: at a shared fire step the rebake runs before
        # val/video callbacks, so they render through the fresh grid.
        trainer.add_callback(args.occ_train_every, occ_cb)
    trainer.add_callback(args.print_freq, log_cb)
    if args.ckpt_freq > 0:
        trainer.add_callback(args.ckpt_freq, ckpt_cb)
    if args.vid_freq > 0:
        trainer.add_callback(args.vid_freq, vid_cb)
    if args.val_freq > 0:
        trainer.add_callback(args.val_freq, val_cb)

    if args.profile_dir:
        # Bounded profiling window: compile + warm up, then trace 20 steps.
        warm = min(start + 10, args.iters - 1)
        trainer.run(start + 1, warm + 1)
        jax.profiler.start_trace(args.profile_dir)
        trainer.run(warm + 1, min(warm + 21, args.iters))
        jax.profiler.stop_trace()
        print(f"Profiler trace written to {args.profile_dir}")
        final = trainer.run(min(warm + 21, args.iters), args.iters)
    else:
        final = trainer.run(start + 1, args.iters)

    ckpt_writer.save(trainer.state, wait=True)   # final save is durable
    ckpt_writer.close()
    logger.log(int(trainer.state.step), **final)

    def test_eval(params, occupancy=None):
        """Held-out test PSNR/SSIM (the reference computes no quantitative
        eval at all — SURVEY.md §4; this is the PSNR-parity evidence).
        Scores ``test_views`` — disjoint from the validation views when
        the dataset allows it (see ``_split_heldout_views``)."""
        from cvnerf_tpu.render.frames import render_image as _ri
        psnrs, ssims, lpips_vals = [], [], []
        for i in test_views:
            out = _ri(jax.random.PRNGKey(7), params,
                      scene.height, scene.width, scene.focal,
                      jnp.asarray(scene.poses[int(i)]), scene.near,
                      scene.far, rcfg_test, ndc=scene.ndc,
                      ndc_variant=args.ndc_variant, chunk=render_chunk,
                      mesh=mesh if n_dev > 1 else None, occupancy=occupancy)
            rgb = np.asarray(out["rgb"])
            psnrs.append(psnr_images(rgb, scene.images[int(i)]))
            ssims.append(ssim_images(rgb, scene.images[int(i)]))
            lp = _lpips(rgb, scene.images[int(i)])
            if lp is not None:
                lpips_vals.append(lp)
        lp_mean = float(np.mean(lpips_vals)) if lpips_vals else None
        return float(np.mean(psnrs)), float(np.mean(ssims)), len(psnrs), \
            lp_mean

    if best_writer is not None:
        best_writer.close()          # waits for in-flight async saves;
        # closed unconditionally — a run too short to ever fire val_cb
        # must not leak the manager's background threads.
    if len(test_views):
        p, s, n, lp = test_eval(
            render_params(deploy_params(trainer.state),
                          int(trainer.state.step)),
            occupancy=trainer.occupancy)
        extra = {} if lp is None else {"test_lpips": lp}
        logger.log(int(trainer.state.step), test_psnr=p, test_ssim=s,
                   test_views=n, **extra)
        if best_writer is not None and best["step"] is not None:
            # Score the deployable (best-val) model too.
            restored = restore_checkpoint(ckpt_dir + "_best", state)
            if restored is not None:
                params_best = render_params(deploy_params(restored),
                                            int(restored.step))
                if n_dev > 1:
                    from cvnerf_tpu.parallel.mesh import replicate_to_mesh
                    params_best = replicate_to_mesh(params_best, mesh)
                # The grid must match the params it resamples for: rebake
                # from the best-val weights (a final-step grid would skew
                # the best model's sampling). Empty-bake guard: a best
                # checkpoint from the warmup phase may carry a density
                # field the grid can't represent — score it grid-less
                # (well-defined; its coarse net was still training then)
                # rather than through a no-support sampler.
                occ_best = (occ_bake(params_best)
                            if occ_bake is not None and
                            trainer.occupancy is not None else None)
                if occ_best is not None:
                    from cvnerf_tpu.render.occupancy import occupied_fraction
                    if occupied_fraction(occ_best) <= 0.0:
                        print("[WARN] best-val occupancy bake is empty — "
                              "scoring the best model grid-less", flush=True)
                        occ_best = None
                if occ_best is not None and n_dev > 1:
                    from cvnerf_tpu.parallel.mesh import replicate_to_mesh
                    occ_best = replicate_to_mesh(occ_best, mesh)
                pb, sb, nb, lpb = test_eval(params_best,
                                            occupancy=occ_best)
                extra = {} if lpb is None else {"test_lpips_best": lpb}
                logger.log(int(trainer.state.step), test_psnr_best=pb,
                           test_ssim_best=sb,
                           best_step=int(best["step"]),
                           best_val_psnr=best["psnr"], **extra)
                print(f"Best-val model (step {best['step']}): "
                      f"test_psnr={pb:.3f} test_ssim={sb:.4f} "
                      f"(final-step model: {p:.3f}/{s:.4f})")
    logger.close()
    print("Training complete:", final)


if __name__ == "__main__":
    main()
