"""Micro-convergence guards for every flag-gated training deviation.

VERDICT r4 weak #3: the repo pinned each training flag's *math*
(equivalence tests, zero-grad bands) but nothing asked "does a scene
still converge with this flag on?" — so ``--distortion_loss`` at constant
weight from step 0 shipped untested and a 2x50k on-chip budget was spent
discovering that it collapses training (BASELINE.md "Sparse-capture
regularizers", results/onchip/l360_dist_*.log: llff_360 -> the 9.01 dB
empty-scene basin, best-val frozen at step 300).

This module is the cheap CPU version of that discovery: a micro analog
of the sparse 360-degree capture (a ring of inward-facing views of a
sphere over a white surround — the same geometry class as the llff_360
fixture, data/synthetic.py::make_llff_360_dataset) is trained ~300 steps
under each training deviation, asserting the final train PSNR clears a
loose floor. The collapse reproduces here: constant-from-0 distortion at
weight >= 0.05 lands in the dead-density basin (~9.3 dB, grad_norm
exactly 0 — measured in this fixture's probe sweep), while the SAME
weight under the shipped delay+ramp recipe (--distortion_start /
--distortion_ramp) converges above the plain arm.

Every future training flag must add an arm here (the guard the reference
never had; its training loop is untested, SURVEY.md §4).
"""

import functools

import numpy as np
import pytest

import jax

from cvnerf_tpu.data.synthetic import _look_at, render_sphere_scene
from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
from cvnerf_tpu.render.occupancy import bake_scene_occupancy
from cvnerf_tpu.render.renderer import RenderConfig
from cvnerf_tpu.train.loop import TrainConfig, Trainer
from cvnerf_tpu.train.state import create_train_state

TINY_MLP = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=64,
                         head_width=32)
STEPS = 300
# Loose floors around the measured landscape (probe sweep, seed 7,
# 300-400 steps): plain ~15-16 dB train PSNR, the collapse basin ~9.3.
CONVERGE_FLOOR = 12.0
COLLAPSE_CEIL = 11.0


@functools.lru_cache(maxsize=1)
def _ring_scene(n=8, h=24, w=24, focal=30.0, radius=4.0):
    """Micro sparse-360 capture: n inward-facing cameras on a 3-elevation
    ring around a checkered sphere composited over white (the geometry of
    make_llff_360_dataset at 1/16 the pixel count)."""
    imgs, poses = [], []
    elevs = (0.4, 1.2, 2.2)
    for i in range(n):
        th = 2 * np.pi * i / n
        campos = np.array([radius * np.cos(th), radius * np.sin(th),
                           elevs[i % 3]])
        c2w = _look_at(campos).astype(np.float32)
        rgba = render_sphere_scene(h, w, focal, c2w, texture="checker")
        imgs.append(rgba[..., :3] + (1.0 - rgba[..., 3:]))
        poses.append(c2w[:3, :4])
    return (np.stack(imgs).astype(np.float32),
            np.stack(poses).astype(np.float32))


def _train(steps=STEPS, render_kw=None, occ_warmup=0, **cfg_kw):
    images, poses = _ring_scene()
    rkw = dict(n_coarse=16, n_fine=16, perturb=True, noise_std=1.0,
               white_bkg=False, mlp=TINY_MLP)
    rkw.update(render_kw or {})
    cfg = TrainConfig(height=24, width=24, focal=30.0, near=2.5, far=5.5,
                      n_rays=128, lr=5e-3, lr_decay=250,
                      render=RenderConfig(**rkw), **cfg_kw)
    state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                               lr_decay=cfg.lr_decay, mlp=TINY_MLP,
                               ema=cfg.ema_decay > 0)
    tr = Trainer(cfg, state, images, poses, list(range(len(images))),
                 seed=7)
    if occ_warmup:
        tr.run(1, occ_warmup + 1)
        tr.set_occupancy(bake_scene_occupancy(
            tr.state.params, TINY_MLP, ndc=False, bound=1.5,
            n_fine=rkw["n_fine"], resolution=8))
        final = tr.run(occ_warmup + 1, steps + 1)
    else:
        final = tr.run(1, steps + 1)
    return float(final["psnr"]), float(final["grad_norm"])


ARMS = {
    "plain": dict(),
    # The shipped distortion recipe — and the rescue proof: weight 0.05
    # COLLAPSES when constant-from-0 (see the collapse test below); the
    # same weight behind the delay+ramp converges.
    "distortion_ramped_0.05": dict(distortion_loss=0.05,
                                   distortion_start=100,
                                   distortion_ramp=150),
    "distortion_ramped_0.01": dict(distortion_loss=0.01,
                                   distortion_start=100,
                                   distortion_ramp=150),
    "occlusion_0.01": dict(occlusion_loss=0.01, occlusion_frac=0.2),
    # EMA trains on the RAW params — its convergence arm asserts the raw
    # trajectory is untouched by carrying the average; the average's own
    # quality is measured on-chip (BASELINE.md).
    "ema": dict(ema_decay=0.99),
    "freq_anneal": dict(freq_anneal=150),
    "noise_decay": dict(noise_decay=150),
    "ray_batching": dict(ray_batching=True),
}


@pytest.mark.parametrize("arm", sorted(ARMS))
def test_training_deviation_converges(arm):
    psnr, grad = _train(**ARMS[arm])
    assert psnr >= CONVERGE_FLOOR, (arm, psnr, grad)


@pytest.mark.parametrize("mode,floor", [("merge", 0), ("full", 0),
                                        ("full", 4)])
def test_occ_train_converges(mode, floor):
    psnr, grad = _train(render_kw=dict(occupancy_mode=mode,
                                       occ_floor=floor),
                        occ_warmup=100)
    assert psnr >= CONVERGE_FLOOR, (mode, floor, psnr, grad)


@functools.lru_cache(maxsize=1)
def _collapsed_arm():
    """The constant-from-0 distortion run, trained once per session: two
    tests assert against it (the collapse itself, and the ramp rescue
    delta) and a ~40 s CPU training run should not execute twice."""
    return _train(distortion_loss=0.05)


def test_constant_from_zero_distortion_collapses():
    """The failure mode that cost two 50k on-chip runs to discover,
    reproduced in ~40 s of CPU: constant distortion weight from step 0
    drives training into the dead-density basin (the regularizer's
    empty-ray global minimum wins before geometry forms; gradients then
    vanish and nothing recovers). This is an assertion ABOUT the defect:
    if this test ever fails, constant-from-0 distortion has become safe
    and the --distortion_start/--distortion_ramp warnings in config.py /
    MIGRATION.md should be revisited."""
    psnr, grad = _collapsed_arm()
    assert psnr <= COLLAPSE_CEIL, (psnr, grad)
    # The basin is dead, not slow: gradients have vanished.
    assert grad < 1e-3, (psnr, grad)


def test_ramp_rescues_the_collapsing_weight():
    """Same weight, shipped recipe: delay+ramp converges where constant
    collapses — the round-5 rescue measured end-to-end."""
    collapsed, _ = _collapsed_arm()
    rescued, _ = _train(distortion_loss=0.05, distortion_start=100,
                        distortion_ramp=150)
    assert collapsed <= COLLAPSE_CEIL
    assert rescued >= CONVERGE_FLOOR
    assert rescued - collapsed > 3.0, (collapsed, rescued)
