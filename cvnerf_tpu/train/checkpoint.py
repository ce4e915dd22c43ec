"""Checkpoint save/restore via orbax.

The reference has no checkpointing in code — ``start=0`` is hardwired and the
``no_reload``/``ft_path`` flags are dead (reference main.py:146,428-429);
historical artifacts show an intended every-2,500-step cadence (SURVEY.md
§5). Here checkpointing is first-class: params + optimizer state + step are
saved periodically and restored on startup, making those reference flags
real.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from cvnerf_tpu.train.state import TrainState


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


class Checkpointer:
    """A persistent, asynchronous checkpoint writer for a training run.

    Holds ONE orbax ``CheckpointManager`` for the run (round 1 opened and
    closed a fresh manager per save) and saves asynchronously: ``save``
    enqueues the write and returns, so checkpoint I/O overlaps the next
    train steps instead of stalling the step loop. The previous save is
    awaited before a new one starts (orbax requirement), and ``close``
    drains any in-flight write.

    The silent-skip guard from round 1 is kept: orbax quietly skips saves
    at steps <= the directory's latest step, which would make a fresh run
    pointed at a stale dir lose every save while appearing to succeed.
    """

    def __init__(self, ckpt_dir: str, max_to_keep: int = 3):
        self.ckpt_dir = ckpt_dir
        self._mgr = _manager(ckpt_dir, max_to_keep)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def save(self, state: TrainState, wait: bool = False) -> None:
        """Enqueue an async save of ``state`` at its current step.

        With ``wait`` the call blocks until the checkpoint is durable (use
        for the final save of a run).
        """
        step = int(state.step)
        self._mgr.wait_until_finished()   # at most one save in flight
        existing = self._mgr.latest_step()
        if existing is not None:
            if step == existing:
                return  # already saved (e.g. final save landing on the
                        # last periodic one) — benign
            if step < existing:
                raise RuntimeError(
                    f"refusing to save step {step} into {self.ckpt_dir} "
                    f"whose latest step is {existing}: the newer checkpoint "
                    "would shadow this one at resume time; remove or move "
                    "the stale checkpoint directory")
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": np.asarray(step, np.int32)}
        if state.ema_params is not None:
            # EMA runs persist the Polyak average alongside the raw
            # params: it is the deployable model (restore_params prefers
            # it) and resume must continue the same running average.
            payload["ema_params"] = state.ema_params
        saved = self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if not saved:
            raise RuntimeError(
                f"orbax skipped the checkpoint save at step {step} in "
                f"{self.ckpt_dir}")
        if wait:
            self._mgr.wait_until_finished()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self) -> "Checkpointer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def save_checkpoint(ckpt_dir: str, state: TrainState,
                    max_to_keep: int = 3) -> None:
    """One-shot synchronous save (opens and closes a manager).

    For periodic in-run saves prefer a run-owned ``Checkpointer`` — it keeps
    one manager alive and overlaps the write with training.
    """
    with Checkpointer(ckpt_dir, max_to_keep) as ckpt:
        ckpt.save(state, wait=True)


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_params(ckpt_dir: str,
                   step: int | None = None,
                   prefer_ema: bool = True) -> tuple[dict, int]:
    """Template-free restore of just the params pytree (plus its step).

    For consumers that cannot know the architecture up front (e.g. the
    torch exporter): orbax restores the stored structure as plain arrays.
    Raises FileNotFoundError when the directory holds no checkpoint.

    EMA runs (``--ema_decay``) store the Polyak average under
    ``ema_params``; it is the deployable model, so every template-free
    consumer (serving, eval, mesh export, torch export) gets it by
    default. ``prefer_ema=False`` reads the raw last iterate.
    """
    mgr = _manager(ckpt_dir)
    try:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
        restored = mgr.restore(step, args=ocp.args.StandardRestore())
        params = restored["params"]
        if prefer_ema and restored.get("ema_params") is not None:
            params = restored["ema_params"]
        return params, int(np.asarray(restored["step"]))
    finally:
        mgr.close()


def restore_checkpoint(ckpt_dir: str, template: TrainState,
                       step: int | None = None) -> TrainState | None:
    """Restore the latest (or given) step; None if no checkpoint exists.

    ``template`` provides the pytree structure/dtypes (an initialized
    ``TrainState``), so restoration works across processes and meshes.
    """
    mgr = _manager(ckpt_dir)
    try:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            return None
        base = {"params": template.params, "opt_state": template.opt_state,
                "step": np.asarray(0, np.int32)}
        # The stored structure and the template may disagree on the EMA
        # slot (orbax refuses both directions of the mismatch): a run
        # resumed with --ema_decay newly ON has pre-EMA checkpoints, and
        # an explicit --ema_decay 0 resume of an EMA run has the opposite.
        # A fresh manager exposes no item metadata (handler registry is
        # restore-time), so probe with the template-shaped target first
        # and fall back to the other structure on the mismatch error.
        want_ema = template.ema_params is not None
        with_ema = dict(base)
        # Restore through the params template (same tree) even when the
        # caller is dropping EMA — orbax needs the full stored structure.
        with_ema["ema_params"] = (template.ema_params if want_ema
                                  else template.params)
        first, second = ((with_ema, base) if want_ema else (base, with_ema))
        try:
            restored = mgr.restore(step,
                                   args=ocp.args.StandardRestore(first))
            stored_has_ema = want_ema
        except ValueError as e:
            if "ema_params" not in str(e):
                # Some OTHER structure mismatch (wrong architecture,
                # foreign checkpoint): retrying with the alternate EMA
                # structure would fail again with a message misdiagnosing
                # it as an EMA migration — surface the real error.
                raise
            restored = mgr.restore(step,
                                   args=ocp.args.StandardRestore(second))
            stored_has_ema = not want_ema
        ema = restored.get("ema_params") if want_ema else None
        if want_ema and not stored_has_ema:
            # Warm-start the average at the restored params — the same
            # bias-free init a fresh EMA state uses. Deep copy: aliased
            # buffers break the donated step program (donate(a), donate(a)).
            ema = jax.tree.map(jax.numpy.copy, restored["params"])
        if stored_has_ema and not want_ema:
            print(f"[WARN] checkpoint at step {step} carries an EMA "
                  f"average but this invocation disables --ema_decay: "
                  f"dropping it — later checkpoints will serve the raw "
                  f"params", flush=True)
        return TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"], jax.numpy.int32),
            ema_params=ema)
    finally:
        mgr.close()
