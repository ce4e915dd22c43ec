"""Frequency annealing (--freq_anneal) and the distortion regularizer
(--distortion_loss): math pins and train-step integration.

Both are flag-gated deviations from the reference training recipe (the
reference trains with the full encoding spectrum and plain MSE from step 0);
defaults-off must stay bitwise reference-shaped.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cvnerf_tpu.models.nerf_mlp import (
    NerfMLPConfig,
    anneal_model_params,
    anneal_nerf_params,
    apply_nerf,
    encoding_mask,
    freq_window,
    init_nerf_params,
)
from cvnerf_tpu.ops.compositing import distortion_loss
from cvnerf_tpu.ops.encoding import freq_encode
from cvnerf_tpu.render.renderer import RenderConfig, render_rays
from cvnerf_tpu.train.loop import TrainConfig, make_train_step
from cvnerf_tpu.train.state import create_train_state

TINY_MLP = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=64,
                         head_width=32)


# --- freq_window / encoding_mask -------------------------------------------

def test_freq_window_schedule():
    w = freq_window(4, jnp.float32(2.5))
    np.testing.assert_allclose(np.asarray(w), [1.0, 1.0, 0.5, 0.0])
    # Fully open at alpha >= L, fully closed at alpha 0.
    assert np.all(np.asarray(freq_window(4, jnp.float32(4.0))) == 1.0)
    assert np.all(np.asarray(freq_window(4, jnp.float32(0.0))) == 0.0)


def test_encoding_mask_layout_matches_freq_encode():
    """Masking the ENCODED features and scaling by encoding_mask must agree:
    the mask's [identity | sin_k cos_k ...] layout mirrors freq_encode."""
    x = jax.random.normal(jax.random.PRNGKey(0), (7, 3))
    enc = freq_encode(x, 4)
    mask = encoding_mask(3, 4, jnp.float32(1.75))
    assert mask.shape == (enc.shape[-1],)
    # Identity block passes untouched.
    np.testing.assert_array_equal(np.asarray(mask[:3]), 1.0)
    # Band 1 (rows 9..14) carries weight clip(1.75 - 1, 0, 1) = 0.75.
    np.testing.assert_allclose(np.asarray(mask[3 + 6:3 + 12]), 0.75)


def test_anneal_params_equals_masked_encoding():
    """The param transform is mathematically identical to masking the
    encoded features (the whole point: no encoding-path change, so the
    Pallas kernel anneals for free)."""
    key = jax.random.PRNGKey(1)
    params = init_nerf_params(key, TINY_MLP)
    xyz = jax.random.normal(jax.random.PRNGKey(2), (33, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(3), (33, 3))
    xyz_enc = freq_encode(xyz, TINY_MLP.xyz_freqs)
    dir_enc = freq_encode(dirs, TINY_MLP.dir_freqs)

    progress = jnp.float32(0.4)
    out_transform = apply_nerf(
        anneal_nerf_params(params, TINY_MLP, progress), xyz_enc, dir_enc,
        TINY_MLP)
    mx = encoding_mask(3, TINY_MLP.xyz_freqs,
                       progress * TINY_MLP.xyz_freqs)
    md = encoding_mask(3, TINY_MLP.dir_freqs,
                       progress * TINY_MLP.dir_freqs)
    out_masked = apply_nerf(params, xyz_enc * mx, dir_enc * md, TINY_MLP)
    np.testing.assert_allclose(np.asarray(out_transform),
                               np.asarray(out_masked), rtol=2e-5, atol=2e-5)


def test_anneal_identity_at_progress_one():
    params = init_nerf_params(jax.random.PRNGKey(4), TINY_MLP)
    annealed = anneal_nerf_params(params, TINY_MLP, jnp.float32(1.0))
    for name in params:
        np.testing.assert_array_equal(np.asarray(annealed[name]["w"]),
                                      np.asarray(params[name]["w"]))


def test_anneal_closed_bands_get_zero_gradient():
    """FreeNeRF dynamic: bands whose window is closed receive exactly-zero
    gradient through the transform."""
    params = init_nerf_params(jax.random.PRNGKey(5), TINY_MLP)
    xyz_enc = freq_encode(jax.random.normal(jax.random.PRNGKey(6), (9, 3)),
                          TINY_MLP.xyz_freqs)
    dir_enc = freq_encode(jax.random.normal(jax.random.PRNGKey(7), (9, 3)),
                          TINY_MLP.dir_freqs)

    def loss(p):
        out = apply_nerf(anneal_nerf_params(p, TINY_MLP, jnp.float32(0.25)),
                         xyz_enc, dir_enc, TINY_MLP)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    # progress 0.25 * L=4 -> alpha=1: band 0 open, bands 1..3 closed.
    g1 = np.asarray(g["l1"]["w"])
    assert np.any(g1[:3 + 6] != 0.0)        # identity + band 0 train
    np.testing.assert_array_equal(g1[3 + 6:], 0.0)  # bands 1..3 frozen
    # The dir-facing rows of l10 behave the same (alpha_dir = 0.5: band 0
    # half-open, band 1 closed -> last 6 rows frozen).
    g10 = np.asarray(g["l10"]["w"])
    np.testing.assert_array_equal(g10[-6:], 0.0)
    assert np.any(g10[: TINY_MLP.trunk_width] != 0.0)


def test_anneal_model_params_covers_both_nets():
    params = {"coarse": init_nerf_params(jax.random.PRNGKey(8), TINY_MLP),
              "fine": init_nerf_params(jax.random.PRNGKey(9), TINY_MLP)}
    out = anneal_model_params(params, TINY_MLP, jnp.float32(0.0))
    for net in ("coarse", "fine"):
        w1 = np.asarray(out[net]["l1"]["w"])
        np.testing.assert_array_equal(w1[3:], 0.0)   # all bands closed
        assert np.any(w1[:3] != 0.0)                  # identity rows stay


# --- distortion loss ---------------------------------------------------------

def test_distortion_loss_matches_bruteforce():
    key = jax.random.PRNGKey(10)
    n_rays, n_samples = 5, 17
    w = jax.random.uniform(key, (n_rays, n_samples))
    t = jnp.sort(jax.random.uniform(jax.random.PRNGKey(11),
                                    (n_rays, n_samples), minval=2.0,
                                    maxval=6.0), axis=-1)
    near = jnp.full((n_rays,), 2.0)
    far = jnp.full((n_rays,), 6.0)
    got = np.asarray(distortion_loss(w, t, near, far))

    s = np.asarray((t - near[:, None]) / (far - near)[:, None])
    wn = np.asarray(w)
    pairwise = np.einsum("ri,rj,rij->r", wn, wn,
                         np.abs(s[:, :, None] - s[:, None, :]))
    delta = s[:, 1:] - s[:, :-1]
    self_term = np.sum(wn[:, :-1] ** 2 * delta, axis=-1) / 3.0
    np.testing.assert_allclose(got, pairwise + self_term, rtol=1e-5,
                               atol=1e-6)


def test_distortion_loss_prefers_compact_weights():
    """A single concentrated spike must score lower than spread-out mass —
    the property the regularizer exists for."""
    n = 32
    t = jnp.linspace(2.0, 6.0, n)[None, :]
    near, far = jnp.array([2.0]), jnp.array([6.0])
    spike = jnp.zeros((1, n)).at[0, 16].set(1.0)
    spread = jnp.full((1, n), 1.0 / n)
    l_spike = float(distortion_loss(spike, t, near, far)[0])
    l_spread = float(distortion_loss(spread, t, near, far)[0])
    assert l_spike < l_spread
    # Two separated spikes are worse than one (floaters are exactly this).
    two = jnp.zeros((1, n)).at[0, 2].set(0.5).at[0, 29].set(0.5)
    assert l_spike < float(distortion_loss(two, t, near, far)[0])


# --- train-step integration --------------------------------------------------

def _scene(h=16, w=16):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack([xx / w, yy / h, 0.5 * np.ones_like(xx)],
                   -1).astype(np.float32)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]],
                    np.float32)
    return jnp.asarray(img[None]), jnp.asarray(pose[None])


def _cfg(**kw):
    defaults = dict(
        height=16, width=16, focal=16.0, near=2.0, far=6.0,
        n_rays=64, lr=5e-3, lr_decay=250,
        render=RenderConfig(n_coarse=8, n_fine=8, perturb=True,
                            noise_std=1.0, mlp=TINY_MLP),
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def _run_steps(cfg, n=3):
    state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                               lr_decay=cfg.lr_decay, mlp=TINY_MLP)
    step = make_train_step(cfg)
    images, poses = _scene()
    idx = jnp.array([0])
    for i in range(n):
        key = jax.random.fold_in(jax.random.PRNGKey(1), i)
        state, metrics = step(state, key, images, poses, idx, False)
    return state, metrics


def test_freq_anneal_step_trains_and_freezes_closed_bands():
    cfg = _cfg(freq_anneal=1000)
    state, metrics = _run_steps(cfg)
    assert np.isfinite(metrics["loss"])
    # After 3 steps of a 1000-step anneal, alpha ~ 0: every non-identity
    # xyz band is still closed, so those rows must be bitwise at init.
    init = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                              lr_decay=cfg.lr_decay, mlp=TINY_MLP)
    for net in ("coarse", "fine"):
        got = np.asarray(state.params[net]["l1"]["w"])
        ref = np.asarray(init.params[net]["l1"]["w"])
        np.testing.assert_array_equal(got[3 + 6:], ref[3 + 6:])
        assert np.any(got[:3] != ref[:3])   # identity rows did train


def test_freq_anneal_past_horizon_matches_plain_step():
    """Once state.step >= freq_anneal the transform multiplies by exactly
    1.0 — the step must produce the same numbers as the plain config."""
    images, poses = _scene()
    idx = jnp.array([0])

    def one(cfg, step0=10):
        state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                                   lr_decay=cfg.lr_decay, mlp=TINY_MLP)
        state = dataclasses.replace(state, step=jnp.int32(step0))
        fn = make_train_step(cfg)
        return fn(state, jax.random.PRNGKey(2), images, poses, idx, False)

    _, m_plain = one(_cfg())
    _, m_anneal = one(_cfg(freq_anneal=5))   # horizon already passed
    np.testing.assert_allclose(float(m_plain["loss"]),
                               float(m_anneal["loss"]), rtol=1e-6)


def test_freq_anneal_scan_matches_single_steps():
    """The anneal schedule reads state.step INSIDE the scan body — a block
    must replay the same per-step windows as single-step dispatch (the
    production steps_per_call path).

    Tolerance, not bitwise: the in-loss param transform moves XLA's fusion
    boundaries between the scan and single-step programs (~1 ulp of fp32
    reassociation on the loss — measured 7.5e-9, the same class of drift
    TrainConfig.fused_allreduce documents; the plain config IS bitwise,
    tests/test_train.py::test_scan_matches_single_step_bitwise). A
    schedule bug (e.g. the scan body reading a stale step) would show up
    orders of magnitude above this: closed-vs-open band masks change the
    loss in the 3rd decimal on this fixture."""
    from cvnerf_tpu.train.loop import make_train_scan
    images, poses = _scene()
    idx = jnp.array([0])
    cfg = _cfg(freq_anneal=100, distortion_loss=0.005)

    def init():
        return create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                                  lr_decay=cfg.lr_decay, mlp=TINY_MLP)

    base = jax.random.PRNGKey(3)
    single = make_train_step(cfg)
    s1 = init()
    for i in range(4):
        s1, m1 = single(s1, jax.random.fold_in(base, i), images, poses,
                        idx, False)
    scan = make_train_scan(cfg, 4)
    s2, m2 = scan(init(), base, images, poses, idx, jnp.int32(0), False)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-7)


def test_distortion_loss_step_runs_and_changes_objective():
    _, m_plain = _run_steps(_cfg())
    _, m_dist = _run_steps(_cfg(distortion_loss=0.01))
    assert np.isfinite(m_dist["loss"])
    # The logged loss includes the regularizer; same data/keys, so any
    # difference comes from the distortion term (and its gradients).
    assert float(m_dist["loss"]) != float(m_plain["loss"])
    # mse_fine stays a pure image metric on both paths.
    assert float(m_dist["mse_fine"]) > 0.0


import pytest


@pytest.mark.parametrize("mode,floor", [("merge", 0), ("full", 4)])
def test_regularizers_compose_with_occ_train(mode, floor):
    """--freq_anneal + --distortion_loss on the occupancy-accelerated step:
    the distortion term reads the occ path's (probe-sampled) weights/depths
    and the anneal transform applies to the frozen-coarse tree too."""
    from cvnerf_tpu.render.occupancy import OccupancyGrid

    images, poses = _scene()
    idx = jnp.array([0])
    grid = OccupancyGrid(values=jnp.ones((8, 8, 8), jnp.float32),
                         bbox_min=jnp.full((3,), -1.5),
                         inv_spacing=jnp.full((3,), 7 / 3.0))
    cfg = _cfg(freq_anneal=1000, distortion_loss=0.01,
               render=RenderConfig(n_coarse=8, n_fine=8, perturb=True,
                                   noise_std=1.0, mlp=TINY_MLP,
                                   occupancy_mode=mode, occ_floor=floor))
    state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                               lr_decay=cfg.lr_decay, mlp=TINY_MLP)
    step = make_train_step(cfg, with_occupancy=True)
    state, metrics = step(state, grid, jax.random.PRNGKey(1), images,
                          poses, idx, False)
    assert np.isfinite(float(metrics["loss"]))


def test_freq_anneal_recorded_sticky_and_served(tmp_path):
    """--freq_anneal reaches scene.json; from_run_dir applies the window to
    mid-anneal checkpoints; a re-invocation without the flag (--render_only)
    keeps the recorded horizon instead of silently rendering/serving the
    checkpoint with untrained high-band weights at full magnitude."""
    import json

    from cvnerf_tpu import cli
    from cvnerf_tpu.serve import NerfRenderer
    from fixtures import make_blender_dataset

    d = str(tmp_path / "scene")
    make_blender_dataset(d, n_train=2, n_val=1, n_test=1, h=16, w=16)
    argv = ["--name", "fa", "--base_dir", str(tmp_path / "logs"),
            "--save_dir", str(tmp_path / "logs"), "--data_dir", d,
            "--dtype", "blender", "--n_rays", "32",
            "--n_coarse_samples", "8", "--n_fine_samples", "8",
            "--trunk_width", "32", "--head_width", "16",
            "--xyz_freqs", "4", "--dir_freqs", "2", "--no-bf16",
            "--precrop_iters", "0", "--vid_freq", "0", "--val_freq", "0",
            "--seed", "1", "--iters", "6", "--ckpt_freq", "4",
            "--freq_anneal", "100"]
    cli.main(argv)
    run_dir = str(tmp_path / "logs" / "fa")
    with open(run_dir + "/scene.json") as fp:
        geo = json.load(fp)
    assert geo["freq_anneal"] == 100
    # Mid-anneal checkpoint (step <= 6 of 100, L=4 -> alpha <= 0.24):
    # xyz bands 1..3 are closed, so the served l1 rows 9.. must be zero.
    r = NerfRenderer.from_run_dir(run_dir)
    assert r.step < 100
    w1 = np.asarray(r.params["fine"]["l1"]["w"])
    np.testing.assert_array_equal(w1[9:], 0.0)
    assert np.any(w1[:3] != 0.0)
    # Torch export ships the windowed weights too (the raw high-band rows
    # are untrained init noise a torch consumer could not correct).
    # importorskip, not import: on a torch-free environment the main
    # assertions above must still run as a pass, not an ERROR (repo
    # convention, tests/test_convert.py).
    torch = pytest.importorskip("torch")

    from cvnerf_tpu.utils.convert import export_torch_checkpoint
    pt = str(tmp_path / "export.pt")
    export_torch_checkpoint(run_dir + "/checkpoints", pt)
    sd = torch.load(pt, weights_only=True)["fine"]
    assert (sd["l1.weight"][:, 9:] == 0).all()   # torch is [out, in]
    # Stickiness: --render_only without --freq_anneal keeps the horizon.
    cli.main(argv[:-2] + ["--render_only"])
    with open(run_dir + "/scene.json") as fp:
        geo2 = json.load(fp)
    assert geo2["freq_anneal"] == 100
    # An explicit 0 overrides (the escape hatch the help text promises).
    cli.main(argv[:-2] + ["--render_only", "--freq_anneal", "0"])
    with open(run_dir + "/scene.json") as fp:
        geo3 = json.load(fp)
    assert "freq_anneal" not in geo3


def test_return_weights_exposes_fine_pass():
    cfg = RenderConfig(n_coarse=8, n_fine=8, perturb=False, mlp=TINY_MLP,
                       return_weights=True)
    params = {"coarse": init_nerf_params(jax.random.PRNGKey(0), TINY_MLP),
              "fine": init_nerf_params(jax.random.PRNGKey(1), TINY_MLP)}
    n = 4
    rays_o = jnp.zeros((n, 3))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    out = render_rays(jax.random.PRNGKey(2), params, rays_o, rays_d,
                      rays_d, jnp.full((n,), 2.0), jnp.full((n,), 6.0), cfg)
    assert out["weights"].shape == (n, 16)
    assert out["t"].shape == (n, 16)
    # Depths ascend (the distortion loss's O(n) form requires it).
    assert np.all(np.diff(np.asarray(out["t"]), axis=-1) >= 0)


def test_resolve_freq_anneal_fractional():
    """The fractional --freq_anneal form (the scale-invariant horizon
    rule): (0,1) = fraction of --iters, >=1 = literal steps, None passes
    through for run-dir stickiness resolution."""
    from cvnerf_tpu.config import resolve_freq_anneal
    assert resolve_freq_anneal(None, 50000) is None
    assert resolve_freq_anneal(0, 50000) == 0
    assert resolve_freq_anneal(0.08, 50000) == 4000
    assert resolve_freq_anneal(0.08, 3000) == 240
    assert resolve_freq_anneal(0.5, 3000) == 1500
    assert resolve_freq_anneal(4000, 50000) == 4000
    assert resolve_freq_anneal(4000.0, 50000) == 4000
    assert isinstance(resolve_freq_anneal(4000.0, 50000), int)
    # Tiny fractions still open the spectrum over at least one step.
    assert resolve_freq_anneal(1e-9, 3000) == 1


def test_fractional_horizon_resolves_through_cli(tmp_path):
    """`--freq_anneal 0.5` at --iters 6 records a concrete 3-step horizon
    in scene.json (consumers never see a fraction), and the config
    snapshot records the resolved value for reproducibility."""
    import json

    from cvnerf_tpu import cli
    from fixtures import make_blender_dataset

    d = str(tmp_path / "scene")
    make_blender_dataset(d, n_train=2, n_val=1, n_test=1, h=16, w=16)
    cli.main(["--name", "fafrac", "--base_dir", str(tmp_path / "logs"),
              "--save_dir", str(tmp_path / "logs"), "--data_dir", d,
              "--dtype", "blender", "--n_rays", "32",
              "--n_coarse_samples", "8", "--n_fine_samples", "8",
              "--trunk_width", "32", "--head_width", "16",
              "--xyz_freqs", "4", "--dir_freqs", "2", "--no-bf16",
              "--precrop_iters", "0", "--vid_freq", "0", "--val_freq", "0",
              "--seed", "1", "--iters", "6", "--ckpt_freq", "0",
              "--freq_anneal", "0.5"])
    run_dir = str(tmp_path / "logs" / "fafrac")
    with open(run_dir + "/scene.json") as fp:
        assert json.load(fp)["freq_anneal"] == 3
    with open(run_dir + "/config_resolved.json") as fp:
        assert json.load(fp)["freq_anneal"] == 3
    # Re-invoking the same fractional config at a different --iters must
    # NOT re-window the run dir: 0.5*10 would be 5, but the recorded
    # 3-step horizon sticks (checkpoints past the old horizon were
    # trained full-spectrum; a longer window would mask trained bands).
    cli.main(["--name", "fafrac", "--base_dir", str(tmp_path / "logs"),
              "--save_dir", str(tmp_path / "logs"), "--data_dir", d,
              "--dtype", "blender", "--n_rays", "32",
              "--n_coarse_samples", "8", "--n_fine_samples", "8",
              "--trunk_width", "32", "--head_width", "16",
              "--xyz_freqs", "4", "--dir_freqs", "2", "--no-bf16",
              "--precrop_iters", "0", "--vid_freq", "0", "--val_freq", "0",
              "--seed", "1", "--iters", "10", "--ckpt_freq", "0",
              "--freq_anneal", "0.5"])
    with open(run_dir + "/scene.json") as fp:
        assert json.load(fp)["freq_anneal"] == 3
    # --no_reload starts a FRESH run: the recorded 3-step horizon must
    # NOT override the fraction's resolution against the new --iters
    # (without this, a trial run's short horizon would silently replace
    # the measured recipe's window on the real run — e.g. 240 instead of
    # 4000 on a 50k run, configs/llff_360_sparse.txt).
    cli.main(["--name", "fafrac", "--base_dir", str(tmp_path / "logs"),
              "--save_dir", str(tmp_path / "logs"), "--data_dir", d,
              "--dtype", "blender", "--n_rays", "32",
              "--n_coarse_samples", "8", "--n_fine_samples", "8",
              "--trunk_width", "32", "--head_width", "16",
              "--xyz_freqs", "4", "--dir_freqs", "2", "--no-bf16",
              "--precrop_iters", "0", "--vid_freq", "0", "--val_freq", "0",
              "--seed", "1", "--iters", "10", "--ckpt_freq", "0",
              "--no_reload", "--freq_anneal", "0.5"])
    with open(run_dir + "/scene.json") as fp:
        assert json.load(fp)["freq_anneal"] == 5
