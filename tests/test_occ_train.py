"""Occupancy-accelerated training (--occ_train).

A flag-gated deviation from the reference trainer (``main.py:380-383``):
after a reference-semantics warmup, the coarse MLP is replaced by a baked
occupancy-grid probe (full-mode sampling: the fine net runs on ``n_fine``
points instead of ``n_coarse + n_fine``) and the loss drops to MSE(fine).
These tests pin the contract: the occ step trains the fine net and freezes
the coarse one, the scan and mesh paths are bitwise-consistent with the
single-step meshless path, and the CLI round trip (train → scene.json →
from_run_dir auto-occupancy) serves without hand-typed flags.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
from cvnerf_tpu.render.occupancy import bake_scene_occupancy
from cvnerf_tpu.render.renderer import RenderConfig
from cvnerf_tpu.train.loop import TrainConfig, Trainer
from cvnerf_tpu.train.state import create_train_state

TINY_MLP = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=64,
                         head_width=32)


def _cfg(**kw):
    defaults = dict(
        height=16, width=16, focal=16.0, near=2.0, far=6.0,
        n_rays=128, lr=5e-3, lr_decay=250,
        render=RenderConfig(n_coarse=8, n_fine=8, perturb=True,
                            noise_std=1.0, mlp=TINY_MLP,
                            occupancy_mode="full"),
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def _scene(h=16, w=16):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack([xx / w, yy / h, 0.5 * np.ones_like(xx)],
                   -1).astype(np.float32)
    pose = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]],
                    np.float32)
    return img[None], pose[None]


def _bake(params, n_fine=8):
    return bake_scene_occupancy(params, TINY_MLP, ndc=False, bound=1.5,
                                n_fine=n_fine, resolution=8)


def _trainer(cfg, images, poses, steps_per_call=1, mesh=None):
    state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                               lr_decay=cfg.lr_decay, mlp=TINY_MLP)
    return Trainer(cfg, state, images, poses, [0], seed=0, mesh=mesh,
                   steps_per_call=steps_per_call)


def test_occ_step_trains_fine_and_freezes_coarse():
    """After set_occupancy, steps update the fine net (finite loss, moving
    params) while the coarse net — off the compute path, zero gradients —
    stays bitwise frozen at its switch-time values."""
    images, poses = _scene()
    cfg = _cfg()
    tr = _trainer(cfg, images, poses)
    tr.run(1, 4)                     # 3 reference-semantics warmup steps
    coarse_before = jax.tree.map(np.asarray, tr.state.params["coarse"])
    fine_before = jax.tree.map(np.asarray, tr.state.params["fine"])
    tr.set_occupancy(_bake(tr.state.params))
    m = tr.run(4, 10)
    assert np.isfinite(m["loss"])
    assert np.isfinite(m["grad_norm"])
    for a, b in zip(jax.tree.leaves(coarse_before),
                    jax.tree.leaves(jax.tree.map(
                        np.asarray, tr.state.params["coarse"]))):
        np.testing.assert_array_equal(a, b)
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(fine_before),
                        jax.tree.leaves(tr.state.params["fine"])))
    assert moved, "fine params did not update under occupancy training"


def test_occ_loss_is_fine_only():
    """On the occupancy path loss == mse_fine (no coarse image exists;
    scoring the aliased rgb_coarse would double the gradient)."""
    images, poses = _scene()
    cfg = _cfg()
    tr = _trainer(cfg, images, poses)
    tr.run(1, 3)
    tr.set_occupancy(_bake(tr.state.params))
    m = tr.run(3, 5)
    np.testing.assert_allclose(m["loss"], m["mse_fine"], rtol=1e-6)


def test_occ_scan_matches_single_step_bitwise():
    """steps_per_call > 1 with a grid reproduces the single-step occ path
    exactly (same fold_in keys, same core)."""
    images, poses = _scene()
    cfg = _cfg(n_rays=32)

    def run(steps_per_call):
        tr = _trainer(cfg, images, poses, steps_per_call=steps_per_call)
        tr.run(1, 3)
        tr.set_occupancy(_bake(tr.state.params))
        m = tr.run(3, 11)
        return tr.state, m

    s1, m1 = run(1)
    s4, m4 = run(4)
    assert m1["loss"] == m4["loss"]
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_occ_mesh_matches_meshless():
    """The sharded occ step (shard_map over rays, replicated grid, pmean
    grads) matches the meshless step to float tolerance. Renders are
    bitwise device-count-invariant (per-ray RNG contract), but the
    gradient ALLREDUCE reduction order differs between pmean-over-8 and a
    meshless mean, so params are compared at 1e-6 — the same tolerance the
    normal step's mesh-vs-meshless test uses (tests/test_sharding.py)."""
    from cvnerf_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    if mesh is None or mesh.devices.size < 2:
        pytest.skip("needs the multi-device CPU test mesh")
    images, poses = _scene()
    cfg = _cfg(n_rays=64)

    def run(m):
        tr = _trainer(cfg, images, poses, mesh=m)
        tr.run(1, 3)
        tr.set_occupancy(_bake(tr.state.params))
        out = tr.run(3, 7)
        return jax.tree.map(np.asarray, tr.state.params), out

    p_mesh, m_mesh = run(mesh)
    p_none, m_none = run(None)
    np.testing.assert_allclose(m_mesh["loss"], m_none["loss"], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_mesh), jax.tree.leaves(p_none)):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_occ_rebake_reuses_compiled_step():
    """Rebaking at the same resolution must not recompile (static shapes;
    only the table values change) — the cadence this enables would be
    unusable at a multi-minute recompile per rebake."""
    images, poses = _scene()
    cfg = _cfg()
    tr = _trainer(cfg, images, poses)
    tr.run(1, 3)
    tr.set_occupancy(_bake(tr.state.params))
    tr.run(3, 5)
    fn_before = tr._step_fn_occ
    tr.set_occupancy(_bake(tr.state.params))   # rebake, same resolution
    tr.run(5, 7)
    assert tr._step_fn_occ is fn_before


def test_full_mode_samples_concentrate_in_occupied_space():
    """With a grid occupied only in a thin world-space slab, full-mode
    sampling must place (nearly all of) the fine-net query points inside
    that slab — the semantic contract of probe-CDF sampling, tested
    end-to-end through render_rays by capturing the fine pass's points."""
    import cvnerf_tpu.render.renderer as renderer_mod
    from cvnerf_tpu.render.occupancy import OccupancyGrid
    from cvnerf_tpu.render.renderer import render_rays

    # Grid over the cube [-1.5, 1.5]^3, occupied only where z is within
    # one lattice cell of 0.5 (rays below travel -z from z=4, so depths
    # t in [3.3, 3.7] hit the slab).
    res = 16
    zs = np.linspace(-1.5, 1.5, res, dtype=np.float32)
    values = np.zeros((res, res, res), np.float32)
    values[:, :, np.abs(zs - 0.5) < (3.0 / (res - 1))] = 1.0
    grid = OccupancyGrid(values=jnp.asarray(values),
                         bbox_min=jnp.full((3,), -1.5),
                         inv_spacing=jnp.full((3,), (res - 1) / 3.0))

    captured = []
    orig = renderer_mod._query_mlp

    def capture(params, points, viewdirs, cfg):
        captured.append(np.asarray(points))
        return orig(params, points, viewdirs, cfg)

    # 32 probe samples: the resample can only localize to its bracketing
    # probe bin, so the CDF granularity (t-range 4 / n_coarse) must be
    # finer than the slab tolerance below.
    cfg = RenderConfig(n_coarse=32, n_fine=16, perturb=True,
                       noise_std=0.0, mlp=TINY_MLP,
                       occupancy_mode="full")
    state = create_train_state(jax.random.PRNGKey(0), lr=1e-3,
                               lr_decay=250, mlp=TINY_MLP)
    n = 64
    rays_o = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (n, 1))
    rays_d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (n, 1))
    renderer_mod._query_mlp = capture
    try:
        render_rays(jax.random.PRNGKey(5), state.params, rays_o, rays_d,
                    rays_d, jnp.full((n,), 2.0), jnp.full((n,), 6.0),
                    cfg, occupancy=grid)
    finally:
        renderer_mod._query_mlp = orig

    # Full mode: exactly ONE MLP pass (the fine net on n_fine points).
    assert len(captured) == 1
    pts = captured[0]
    assert pts.shape == (n, cfg.n_fine, 3)
    in_slab = np.abs(pts[..., 2] - 0.5) < 0.35
    frac = in_slab.mean()
    assert frac > 0.9, f"only {frac:.2%} of fine samples hit the slab"


def test_empty_grid_guard():
    """An all-empty bake must never install (postponed before the switch,
    previous grid kept after it): resampling through an empty grid can
    zero the training gradient permanently (measured on a micro-fixture:
    grad_norm 0.18 -> exactly 0.0 at the switch step)."""
    from cvnerf_tpu.render.occupancy import (OccupancyGrid,
                                             occupied_fraction)
    images, poses = _scene()
    tr = _trainer(_cfg(), images, poses)
    empty = OccupancyGrid(values=jnp.zeros((4, 4, 4), jnp.float32),
                          bbox_min=jnp.zeros(3),
                          inv_spacing=jnp.ones(3))
    assert occupied_fraction(empty) == 0.0
    assert tr.maybe_set_occupancy(empty) == "postponed"
    assert tr.occupancy is None

    tr.run(1, 3)
    real = _bake(tr.state.params)
    assert occupied_fraction(real) > 0.0
    assert tr.maybe_set_occupancy(real) == "switched"
    assert tr.occupancy is not None

    kept = tr.occupancy
    assert tr.maybe_set_occupancy(empty) == "kept"
    assert tr.occupancy is kept
    assert tr.maybe_set_occupancy(real) == "rebaked"


@pytest.mark.parametrize("mode", ["full", "merge"])
def test_occ_train_cli_e2e(tmp_path, mode):
    """Train with --occ_train past the warmup switch, then serve from the
    run dir: scene.json records the bake (incl. the sampling mode),
    from_run_dir auto-enables the grid in that mode (the coarse net is
    untrained — rendering without it would be wrong), and the render is
    finite and full-shape. 'merge' keeps the stratified probe depths
    (reference-shaped coverage); 'full' draws all fine samples from the
    probe CDF."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_blender_dataset
    import main as cli
    from cvnerf_tpu.serve import NerfRenderer

    d = str(tmp_path / "scene")
    make_blender_dataset(d, n_train=3, n_val=1, n_test=1, h=24, w=24)
    logdir = str(tmp_path / "logs_occ")
    cli.main(["--data_dir", d, "--base_dir", logdir, "--save_dir", logdir,
              "--name", "occ", "--no-bf16", "--dtype", "blender",
              "--white_bkg", "--testskip", "1",
              "--n_rays", "64", "--n_coarse_samples", "8",
              "--n_fine_samples", "8", "--trunk_width", "32",
              "--head_width", "16", "--xyz_freqs", "4", "--dir_freqs", "2",
              "--noise", "1.0", "--chunk", "256", "--print_freq", "5",
              # seed 1 + tiny lr: this seed's fine-net INIT bakes non-empty
              # (seed 0's is negative everywhere in the cube) and the tiny
              # lr keeps it that way for the whole micro-run, so the switch
              # actually happens and the test exercises the full
              # auto-enable round trip (at real lr the 6-step fixture
              # collapses to an all-empty field and the guard correctly
              # postpones forever).
              "--vid_freq", "0", "--val_freq", "0", "--lr", "1e-5",
              "--seed", "1",
              "--iters", "6", "--ckpt_freq", "4",
              "--occ_train", "--occ_train_warmup", "2",
              "--occ_train_every", "3", "--occupancy_res", "8",
              "--occ_train_mode", mode])
    run_dir = os.path.join(logdir, "occ")

    import json
    with open(os.path.join(run_dir, "scene.json")) as fp:
        geo = json.load(fp)
    assert geo["occ_train"] == {"resolution": 8, "bound": 1.5,
                                "mode": mode, "interp": "nearest",
                                "floor": 0}

    r = NerfRenderer.from_run_dir(run_dir, chunk=256)
    assert r.occupancy is not None
    assert r.cfg.occupancy_mode == mode
    rgb = r.render_pose(np.asarray(geo["calib_poses"][0], np.float32))
    assert rgb.shape == (24, 24, 3)
    assert np.isfinite(rgb).all()


def test_occ_train_resume_reenters_occ_mode(tmp_path, capsys):
    """Resuming an --occ_train run past the warmup boundary rebakes from
    the restored params and re-enters occupancy mode immediately (the
    grid itself is not checkpointed; resume is step-aligned — see
    docs/DESIGN.md). The restored coarse net must stay frozen across the
    resumed segment."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_blender_dataset
    import main as cli
    from cvnerf_tpu.train.checkpoint import latest_step, restore_params

    d = str(tmp_path / "scene")
    make_blender_dataset(d, n_train=3, n_val=1, n_test=1, h=24, w=24)
    logdir = str(tmp_path / "logs_resume")
    base = ["--data_dir", d, "--base_dir", logdir, "--save_dir", logdir,
            "--name", "occ", "--no-bf16", "--dtype", "blender",
            "--white_bkg", "--testskip", "1",
            "--n_rays", "64", "--n_coarse_samples", "8",
            "--n_fine_samples", "8", "--trunk_width", "32",
            "--head_width", "16", "--xyz_freqs", "4", "--dir_freqs", "2",
            "--noise", "1.0", "--chunk", "256", "--print_freq", "4",
            "--vid_freq", "0", "--val_freq", "0", "--lr", "5e-3",
            "--ckpt_freq", "8",
            "--occ_train", "--occ_train_warmup", "2",
            "--occ_train_every", "3", "--occupancy_res", "8"]
    cli.main(base + ["--iters", "10"])
    ckpt_dir = os.path.join(logdir, "occ", "checkpoints")
    resume_step = latest_step(ckpt_dir)   # final-step save (step 9)
    assert resume_step == 9
    params_9, _ = restore_params(ckpt_dir, resume_step)
    coarse_at_resume = jax.tree.map(np.asarray, params_9["coarse"])
    capsys.readouterr()

    cli.main(base + ["--iters", "16"])
    out = capsys.readouterr().out
    assert f"Resumed from checkpoint at step {resume_step}" in out
    assert (f"occupancy training active from step {resume_step}" in out
            or "baked grid is empty at resume" in out)
    reentered = f"occupancy training active from step {resume_step}" in out
    params_final, step_final = restore_params(ckpt_dir)
    assert step_final == 15
    if reentered:
        # Occ mode active across the resumed segment: coarse stays frozen.
        for a, b in zip(jax.tree.leaves(coarse_at_resume),
                        jax.tree.leaves(jax.tree.map(
                            np.asarray, params_final["coarse"]))):
            np.testing.assert_array_equal(a, b)


def test_occ_train_requires_fine_samples(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_blender_dataset
    import main as cli

    d = str(tmp_path / "scene0")
    make_blender_dataset(d, n_train=2, n_val=1, n_test=1, h=16, w=16)
    with pytest.raises(SystemExit):
        cli.main(["--data_dir", d, "--base_dir", str(tmp_path / "lg"),
                  "--save_dir", str(tmp_path / "lg"), "--name", "x",
                  "--dtype", "blender", "--n_fine_samples", "0",
                  "--occ_train", "--iters", "2"])


def test_occ_train_mode_sticks_to_run_dir(tmp_path):
    """An unset --occ_train_mode resolves to the run dir's RECORDED mode,
    not the shipped default: a checkpoint trained full-mode must keep full
    sampling when a later CLI invocation (resume, --render_only) omits the
    flag — the default changed once (full -> merge) and silently flipping
    legacy runs would change their pinned eval numbers."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_blender_dataset
    import main as cli

    d = str(tmp_path / "scene")
    make_blender_dataset(d, n_train=3, n_val=1, n_test=1, h=24, w=24)
    logdir = str(tmp_path / "logs_mode")
    base = ["--data_dir", d, "--base_dir", logdir, "--save_dir", logdir,
            "--name", "occ", "--no-bf16", "--dtype", "blender",
            "--white_bkg", "--testskip", "1",
            "--n_rays", "64", "--n_coarse_samples", "8",
            "--n_fine_samples", "8", "--trunk_width", "32",
            "--head_width", "16", "--xyz_freqs", "4", "--dir_freqs", "2",
            "--noise", "1.0", "--chunk", "256", "--print_freq", "5",
            "--vid_freq", "0", "--val_freq", "0", "--lr", "1e-5",
            "--seed", "1", "--iters", "6", "--ckpt_freq", "4",
            "--occ_train", "--occ_train_warmup", "2",
            "--occ_train_every", "3", "--occupancy_res", "8"]
    cli.main(base + ["--occ_train_mode", "full"])
    scene_json = os.path.join(logdir, "occ", "scene.json")

    import json
    # Re-invoke WITHOUT the mode flag: render_only rewrites scene.json at
    # startup, and it must preserve the trained mode.
    cli.main(base + ["--render_only", "--render_factor", "4"])
    with open(scene_json) as fp:
        assert json.load(fp)["occ_train"]["mode"] == "full"

    # An explicit flag still wins (the user asked for the change).
    cli.main(base + ["--render_only", "--render_factor", "4",
                     "--occ_train_mode", "merge"])
    with open(scene_json) as fp:
        assert json.load(fp)["occ_train"]["mode"] == "merge"


def test_snapshot_requires_occ_mode(tmp_path):
    """write_scene_snapshot refuses an occ_train payload without an
    explicit sampling mode (a silent default once disagreed with the
    trainer's flag default — serving semantics must come from the writer)."""
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
    from cvnerf_tpu.serve import write_scene_snapshot
    with pytest.raises(ValueError, match="mode"):
        write_scene_snapshot(
            str(tmp_path), height=8, width=8, focal=10.0, near=2.0,
            far=6.0, ndc=False, ndc_variant="canonical", white_bkg=True,
            n_coarse=4, n_fine=4, bf16=False,
            mlp=NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=32,
                              head_width=16),
            occ_train=True)


def test_occ_metadata_survives_plain_reinvocation(tmp_path, capsys):
    """ADVICE r3 #2: re-running an --occ_train run dir WITHOUT --occ_train
    (e.g. a plain --render_only) must not silently drop the recorded
    occ_train payload from scene.json — those checkpoints carry an
    untrained coarse net and would otherwise serve grid-less. A fresh
    --no_reload run IS allowed to drop it (its checkpoints are plain)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_blender_dataset
    import main as cli

    d = str(tmp_path / "scene")
    make_blender_dataset(d, n_train=3, n_val=1, n_test=1, h=24, w=24)
    logdir = str(tmp_path / "logs_keep")
    base = ["--data_dir", d, "--base_dir", logdir, "--save_dir", logdir,
            "--name", "occ", "--no-bf16", "--dtype", "blender",
            "--white_bkg", "--testskip", "1",
            "--n_rays", "64", "--n_coarse_samples", "8",
            "--n_fine_samples", "8", "--trunk_width", "32",
            "--head_width", "16", "--xyz_freqs", "4", "--dir_freqs", "2",
            "--noise", "1.0", "--chunk", "256", "--print_freq", "5",
            "--vid_freq", "0", "--val_freq", "0", "--lr", "1e-5",
            "--seed", "1", "--iters", "6", "--ckpt_freq", "4"]
    occ = ["--occ_train", "--occ_train_warmup", "2",
           "--occ_train_every", "3", "--occupancy_res", "8",
           "--occ_train_mode", "full"]
    cli.main(base + occ)
    scene_json = os.path.join(logdir, "occ", "scene.json")

    import json
    # Plain --render_only (no --occ_train): payload preserved verbatim,
    # and the render goes through the recorded occupancy mode.
    cli.main(base + ["--render_only", "--render_factor", "4"])
    out = capsys.readouterr().out
    assert "preserving the occupancy serving metadata" in out
    assert "recorded occupancy mode 'full'" in out
    with open(scene_json) as fp:
        ot = json.load(fp)["occ_train"]
    assert ot["mode"] == "full" and ot["resolution"] == 8

    # Fresh plain run (--no_reload): metadata legitimately dropped.
    cli.main(base + ["--no_reload"])
    out = capsys.readouterr().out
    assert "dropping the occupancy serving metadata" in out
    with open(scene_json) as fp:
        assert "occ_train" not in json.load(fp)


def test_corrupt_scene_json_tolerated(tmp_path):
    """ADVICE r3 #1: a scene.json whose top level is valid JSON but not an
    object (or whose occ_train isn't a dict) must fall back like a missing
    file, not crash the CLI at startup."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_blender_dataset
    import main as cli

    d = str(tmp_path / "scene")
    make_blender_dataset(d, n_train=3, n_val=1, n_test=1, h=24, w=24)
    logdir = str(tmp_path / "logs_corrupt")
    run_dir = os.path.join(logdir, "occ")
    os.makedirs(run_dir)
    with open(os.path.join(run_dir, "scene.json"), "w") as fp:
        fp.write("[1, 2, 3]")
    cli.main(["--data_dir", d, "--base_dir", logdir, "--save_dir", logdir,
              "--name", "occ", "--no-bf16", "--dtype", "blender",
              "--white_bkg", "--testskip", "1",
              "--n_rays", "64", "--n_coarse_samples", "8",
              "--n_fine_samples", "8", "--trunk_width", "32",
              "--head_width", "16", "--xyz_freqs", "4", "--dir_freqs", "2",
              "--chunk", "256", "--print_freq", "5",
              "--vid_freq", "0", "--val_freq", "0",
              "--seed", "1", "--iters", "2", "--ckpt_freq", "0"])


def test_occ_floor_mixes_coverage_into_full_mode():
    """occ_floor=k in full mode: total fine evals stay n_fine, and the
    captured fine points now include samples OUTSIDE the occupied slab
    (the coverage contract — pure probe-CDF sampling places essentially
    all of them inside it)."""
    import cvnerf_tpu.render.renderer as renderer_mod
    from cvnerf_tpu.render.occupancy import OccupancyGrid
    from cvnerf_tpu.render.renderer import render_rays

    res = 16
    zs = np.linspace(-1.5, 1.5, res, dtype=np.float32)
    values = np.zeros((res, res, res), np.float32)
    values[:, :, np.abs(zs - 0.5) < (3.0 / (res - 1))] = 1.0
    grid = OccupancyGrid(values=jnp.asarray(values),
                         bbox_min=jnp.full((3,), -1.5),
                         inv_spacing=jnp.full((3,), (res - 1) / 3.0))
    state = create_train_state(jax.random.PRNGKey(0), lr=1e-3,
                               lr_decay=250, mlp=TINY_MLP)
    n = 64
    rays_o = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (n, 1))
    rays_d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (n, 1))

    def run(floor):
        captured = []
        orig = renderer_mod._query_mlp

        def capture(params, points, viewdirs, cfg):
            captured.append(np.asarray(points))
            return orig(params, points, viewdirs, cfg)

        cfg = RenderConfig(n_coarse=32, n_fine=16, perturb=True,
                           noise_std=0.0, mlp=TINY_MLP,
                           occupancy_mode="full", occ_floor=floor)
        renderer_mod._query_mlp = capture
        try:
            render_rays(jax.random.PRNGKey(5), state.params, rays_o,
                        rays_d, rays_d, jnp.full((n,), 2.0),
                        jnp.full((n,), 6.0), cfg, occupancy=grid)
        finally:
            renderer_mod._query_mlp = orig
        pts = captured[-1]          # the fine pass (full mode: only pass)
        assert pts.shape == (n, 16, 3), pts.shape   # eval count unchanged
        # fraction of fine samples whose depth is outside the slab's
        # generous envelope (z in [0.5 ± 2 cells] ⇒ t in [3.1, 3.9])
        t = 4.0 - pts[..., 2]
        return float(np.mean((t < 3.1) | (t > 3.9)))

    outside_pure = run(0)
    outside_floor = run(8)
    assert outside_pure < 0.1, outside_pure      # CDF concentrates
    # 8 of 16 samples are stratified over t in [2, 6]; the slab envelope
    # covers 0.8 of 4.0, so ~40% of all samples should fall outside.
    assert outside_floor > 0.25, outside_floor


def test_occ_floor_chunk_invariant_and_validated():
    from cvnerf_tpu.render.renderer import (RenderConfig as RC,
                                            render_rays,
                                            render_rays_chunked)
    grid = _bake(create_train_state(jax.random.PRNGKey(0), lr=1e-3,
                                    lr_decay=250, mlp=TINY_MLP).params)
    state = create_train_state(jax.random.PRNGKey(1), lr=1e-3,
                               lr_decay=250, mlp=TINY_MLP)
    n = 16
    rng = np.random.RandomState(3)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    rays_o = jnp.zeros((n, 3))
    cfg = RC(n_coarse=8, n_fine=8, perturb=True, noise_std=0.0,
             mlp=TINY_MLP, occupancy_mode="full", occ_floor=4)
    key = jax.random.PRNGKey(9)
    full = render_rays(key, state.params, rays_o, rays_d, rays_d,
                       jnp.full((n,), 0.5), jnp.full((n,), 4.0), cfg,
                       occupancy=grid)
    assert np.isfinite(np.asarray(full["rgb"])).all()
    chunked = render_rays_chunked(key, state.params, rays_o, rays_d,
                                  rays_d, 0.5, 4.0, cfg, chunk=4,
                                  occupancy=grid)
    # Full-mode chunked-vs-unchunked differs by 1 ulp on this fixture
    # WITH OR WITHOUT the floor (measured: floor=0 gives the same
    # 5.96e-8 max diff — an XLA fusion-boundary reassociation, not a
    # per-ray RNG violation), so the floor is held to the same
    # tolerance as the path it extends.
    np.testing.assert_allclose(np.asarray(full["rgb"]),
                               np.asarray(chunked["rgb"]), atol=1e-6)
    with pytest.raises(ValueError, match="occ_floor"):
        render_rays(key, state.params, rays_o, rays_d, rays_d,
                    jnp.full((n,), 0.5), jnp.full((n,), 4.0),
                    RC(n_coarse=8, n_fine=8, mlp=TINY_MLP,
                       occupancy_mode="full", occ_floor=8),
                    occupancy=grid)


def test_occ_floor_recorded_and_served(tmp_path):
    """--occ_floor reaches scene.json and from_run_dir re-applies it;
    a re-invocation without the flag keeps the recorded floor."""
    import json
    from cvnerf_tpu import cli
    from cvnerf_tpu.serve import NerfRenderer
    from fixtures import make_blender_dataset
    d = str(tmp_path / "scene")
    make_blender_dataset(d, n_train=2, n_val=1, n_test=1, h=16, w=16)
    argv = ["--name", "occ", "--base_dir", str(tmp_path / "logs"),
            "--save_dir", str(tmp_path / "logs"), "--data_dir", d,
            "--dtype", "blender", "--n_rays", "32",
            "--n_coarse_samples", "8", "--n_fine_samples", "8",
            "--trunk_width", "32", "--head_width", "16",
            "--xyz_freqs", "4", "--dir_freqs", "2", "--no-bf16",
            "--precrop_iters", "0", "--vid_freq", "0", "--val_freq", "0",
            "--seed", "1", "--iters", "6", "--ckpt_freq", "4",
            "--occ_train", "--occ_train_warmup", "2",
            "--occ_train_every", "3", "--occupancy_res", "8",
            "--occ_train_mode", "full", "--occ_floor", "2"]
    cli.main(argv)
    run_dir = str(tmp_path / "logs" / "occ")
    with open(run_dir + "/scene.json") as fp:
        geo = json.load(fp)
    assert geo["occ_train"]["floor"] == 2
    r = NerfRenderer.from_run_dir(run_dir)
    assert r.cfg.occ_floor == 2 or r.occupancy is None  # empty-bake guard
    # stickiness: re-invoke without --occ_floor → floor survives
    cli.main(argv[:-2])
    with open(run_dir + "/scene.json") as fp:
        geo2 = json.load(fp)
    assert geo2["occ_train"]["floor"] == 2
