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


def save_checkpoint(ckpt_dir: str, state: TrainState,
                    max_to_keep: int = 3) -> None:
    """Save the train state at its current step.

    Raises if orbax refuses the save (its manager silently skips steps that
    are <= the directory's latest step — e.g. a fresh ``--no_reload`` run
    pointed at a dir holding an older run's later checkpoints would
    otherwise lose every save while appearing to succeed).
    """
    mgr = _manager(ckpt_dir, max_to_keep)
    step = int(state.step)
    try:
        existing = mgr.latest_step()
        if existing is not None:
            if step == existing:
                return  # this step is already saved (e.g. the final save
                        # landing on the last periodic save) — benign
            if step < existing:
                raise RuntimeError(
                    f"refusing to save step {step} into {ckpt_dir} whose "
                    f"latest step is {existing}: the newer checkpoint "
                    "would shadow this one at resume time; remove or move "
                    "the stale checkpoint directory")
        saved = mgr.save(step, args=ocp.args.StandardSave(
            {"params": state.params, "opt_state": state.opt_state,
             "step": np.asarray(step, np.int32)}))
        mgr.wait_until_finished()
        if not saved:
            raise RuntimeError(
                f"orbax skipped the checkpoint save at step {step} in "
                f"{ckpt_dir}")
    finally:
        mgr.close()


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


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
        target = {"params": template.params, "opt_state": template.opt_state,
                  "step": np.asarray(0, np.int32)}
        restored = mgr.restore(step,
                               args=ocp.args.StandardRestore(target))
        return TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"], jax.numpy.int32))
    finally:
        mgr.close()
