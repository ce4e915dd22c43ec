"""Occupancy-grid accelerated serving: bake, probe, and render contracts.

The grid replaces the coarse MLP pass at serving time (render/occupancy.py)
— these tests pin the bake against the direct MLP, the probe's
nearest-vertex/clamping semantics, and the render path's invariants
(chunk invariance, mesh invariance, determinism) with the grid active.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig, apply_nerf
from cvnerf_tpu.ops.encoding import freq_encode
from cvnerf_tpu.render.occupancy import (OccupancyGrid, bake_occupancy,
                                         occupancy_sigma)
from cvnerf_tpu.render.renderer import RenderConfig, render_rays, \
    render_rays_chunked
from cvnerf_tpu.train.state import create_train_state

TINY = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=32, head_width=16)


@pytest.fixture(scope="module")
def tiny_params():
    return create_train_state(jax.random.PRNGKey(11), mlp=TINY).params


def test_bake_matches_relu_of_direct_apply(tiny_params):
    grid = bake_occupancy(tiny_params["fine"], TINY, (-1.0,) * 3,
                          (1.0,) * 3, resolution=9, dilate=0)
    assert grid.values.shape == (9, 9, 9)
    ax = np.linspace(-1, 1, 9, dtype=np.float32)
    pts = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    enc = freq_encode(pts, TINY.xyz_freqs)
    dir_enc = np.zeros((len(pts), TINY.dir_dim), np.float32)
    sigma = np.asarray(apply_nerf(tiny_params["fine"], enc, dir_enc,
                                  TINY))[:, 3]
    np.testing.assert_allclose(np.asarray(grid.values).reshape(-1),
                               np.maximum(sigma, 0), rtol=1e-5, atol=1e-5)


def test_bake_pallas_interpret_matches_oracle(tiny_params):
    """The bake's fused-kernel branch (zeros viewdirs, sigma column, tile
    plumbing) == the jnp-oracle branch — exercised in the Pallas
    interpreter so the CPU suite covers the glue that otherwise only runs
    on the real chip (where a bad bake costs a 4-12 min compile to debug)."""
    kw = dict(resolution=7, dilate=1, chunk=64)
    g_oracle = bake_occupancy(tiny_params["fine"], TINY, (-1.0,) * 3,
                              (1.0,) * 3, pallas="off", **kw)
    g_kernel = bake_occupancy(tiny_params["fine"], TINY, (-1.0,) * 3,
                              (1.0,) * 3, pallas="interpret", **kw)
    np.testing.assert_allclose(np.asarray(g_kernel.values),
                               np.asarray(g_oracle.values),
                               rtol=2e-5, atol=2e-5)


def test_bake_rejects_bad_pallas_mode(tiny_params):
    with pytest.raises(ValueError, match="pallas"):
        bake_occupancy(tiny_params["fine"], TINY, (-1.0,) * 3, (1.0,) * 3,
                       resolution=5, pallas="maybe")


def test_dilation_is_conservative(tiny_params):
    g0 = bake_occupancy(tiny_params["fine"], TINY, (-1.0,) * 3, (1.0,) * 3,
                        resolution=9, dilate=0)
    g1 = bake_occupancy(tiny_params["fine"], TINY, (-1.0,) * 3, (1.0,) * 3,
                        resolution=9, dilate=1)
    assert (np.asarray(g1.values) >= np.asarray(g0.values) - 1e-6).all()


def test_dilation_matches_scipy_max_filter(tiny_params):
    """The on-device reduce_window dilation == scipy maximum_filter
    mode='nearest' of the undilated bake (incl. non-cubic lattices and
    radius 2) — the exact semantics the host-side implementation had."""
    from scipy.ndimage import maximum_filter
    for res, dilate in (((5, 6, 7), 1), (9, 2)):
        g0 = bake_occupancy(tiny_params["fine"], TINY, (-1.0,) * 3,
                            (1.0,) * 3, resolution=res, dilate=0)
        gd = bake_occupancy(tiny_params["fine"], TINY, (-1.0,) * 3,
                            (1.0,) * 3, resolution=res, dilate=dilate)
        want = maximum_filter(np.asarray(g0.values),
                              size=2 * dilate + 1, mode="nearest")
        np.testing.assert_allclose(np.asarray(gd.values), want,
                                   rtol=1e-6, atol=1e-6)


def test_probe_nearest_vertex_and_clamping():
    vals = np.arange(3 * 4 * 5, dtype=np.float32).reshape(3, 4, 5)
    grid = OccupancyGrid(
        values=jnp.asarray(vals), bbox_min=jnp.zeros(3),
        inv_spacing=jnp.asarray([2.0, 3.0, 4.0]))  # bbox [0,1]^3
    # Exactly at vertex (i,j,k)/(res-1): returns vals[i,j,k].
    pts = jnp.asarray([[0.0, 0.0, 0.0],
                       [1.0, 1.0, 1.0],
                       [0.5, 1 / 3, 0.25],
                       [0.26, 0.0, 0.0],     # rounds to i=1 (0.52 -> 1)
                       [-5.0, 2.0, 0.5]])    # out of box: clamps
    got = np.asarray(occupancy_sigma(grid, pts))
    want = [vals[0, 0, 0], vals[2, 3, 4], vals[1, 1, 1], vals[1, 0, 0],
            vals[0, 3, 2]]
    np.testing.assert_allclose(got, want)


def _rays(n=12, seed=0):
    rng = np.random.RandomState(seed)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 4.0
    d = rng.randn(n, 3).astype(np.float32) * 0.08
    d[:, 2] = -1.0
    v = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(v)


def test_render_with_occupancy_runs_and_differs_from_plain(tiny_params):
    # Bias the density heads positive so the scene has opacity (an
    # untrained net can render all-black, making the comparison vacuous).
    params = jax.tree.map(lambda x: x, tiny_params)
    for net in ("coarse", "fine"):
        params[net] = dict(params[net])
        params[net]["alpha"] = {
            "w": params[net]["alpha"]["w"],
            "b": params[net]["alpha"]["b"] + 2.0}
    cfg = RenderConfig(n_coarse=8, n_fine=8, mlp=TINY).eval_mode()
    grid = bake_occupancy(params["fine"], TINY, (-1.5,) * 3,
                          (1.5,) * 3, resolution=17)
    tiny_params = params
    o, d, v = _rays()
    near, far = jnp.full((12,), 2.0), jnp.full((12,), 6.0)
    key = jax.random.PRNGKey(0)
    out_occ = render_rays(key, tiny_params, o, d, v, near, far, cfg,
                          occupancy=grid)
    out_mlp = render_rays(key, tiny_params, o, d, v, near, far, cfg)
    for k in ("rgb", "acc", "depth"):
        assert np.isfinite(np.asarray(out_occ[k])).all(), k
    # Same shapes; rgb_coarse aliases the fine map on the occupancy path.
    np.testing.assert_array_equal(out_occ["rgb"], out_occ["rgb_coarse"])
    # Different resample weights -> (generically) different fine depths.
    assert not np.allclose(out_occ["rgb"], out_mlp["rgb"])


def test_occupancy_render_is_deterministic_and_chunk_invariant(tiny_params):
    cfg = RenderConfig(n_coarse=8, n_fine=8, mlp=TINY).eval_mode()
    grid = bake_occupancy(tiny_params["fine"], TINY, (-1.5,) * 3,
                          (1.5,) * 3, resolution=17)
    o, d, v = _rays(n=24)
    key = jax.random.PRNGKey(3)
    a = render_rays_chunked(key, tiny_params, o, d, v, 2.0, 6.0, cfg,
                            chunk=8, occupancy=grid)
    b = render_rays_chunked(key, tiny_params, o, d, v, 2.0, 6.0, cfg,
                            chunk=24, occupancy=grid)
    np.testing.assert_array_equal(np.asarray(a["rgb"]), np.asarray(b["rgb"]))


def test_occupancy_render_matches_on_mesh(tiny_params):
    from cvnerf_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    if mesh is None or mesh.devices.size < 2:
        pytest.skip("needs the virtual multi-device mesh")
    cfg = RenderConfig(n_coarse=8, n_fine=8, mlp=TINY).eval_mode()
    grid = bake_occupancy(tiny_params["fine"], TINY, (-1.5,) * 3,
                          (1.5,) * 3, resolution=17)
    o, d, v = _rays(n=16)
    key = jax.random.PRNGKey(5)
    single = render_rays_chunked(key, tiny_params, o, d, v, 2.0, 6.0, cfg,
                                 chunk=16, occupancy=grid)
    sharded = render_rays_chunked(key, tiny_params, o, d, v, 2.0, 6.0, cfg,
                                  chunk=16, mesh=mesh, occupancy=grid)
    np.testing.assert_array_equal(np.asarray(single["rgb"]),
                                  np.asarray(sharded["rgb"]))


def test_full_mode_runs_and_is_chunk_invariant(tiny_params):
    import dataclasses
    cfg = dataclasses.replace(
        RenderConfig(n_coarse=8, n_fine=8, mlp=TINY).eval_mode(),
        occupancy_mode="full")
    grid = bake_occupancy(tiny_params["fine"], TINY, (-1.5,) * 3,
                          (1.5,) * 3, resolution=17)
    o, d, v = _rays(n=24)
    key = jax.random.PRNGKey(9)
    a = render_rays_chunked(key, tiny_params, o, d, v, 2.0, 6.0, cfg,
                            chunk=8, occupancy=grid)
    b = render_rays_chunked(key, tiny_params, o, d, v, 2.0, 6.0, cfg,
                            chunk=24, occupancy=grid)
    np.testing.assert_array_equal(np.asarray(a["rgb"]), np.asarray(b["rgb"]))
    assert np.isfinite(np.asarray(a["rgb"])).all()
    # Without a grid, occupancy_mode="full" is inert: identical to the
    # plain pipeline (the flag only applies when a grid is passed).
    plain = render_rays_chunked(key, tiny_params, o, d, v, 2.0, 6.0,
                                RenderConfig(n_coarse=8, n_fine=8,
                                             mlp=TINY).eval_mode(),
                                chunk=24)
    no_grid = render_rays_chunked(key, tiny_params, o, d, v, 2.0, 6.0, cfg,
                                  chunk=24)
    np.testing.assert_array_equal(np.asarray(plain["rgb"]),
                                  np.asarray(no_grid["rgb"]))


def test_empty_grid_falls_back_to_near_uniform(tiny_params):
    """A ray missing all occupancy gets sample_pdf's ε-uniform placement —
    the render must stay finite, not NaN."""
    cfg = RenderConfig(n_coarse=8, n_fine=8, mlp=TINY).eval_mode()
    grid = OccupancyGrid(values=jnp.zeros((5, 5, 5)),
                         bbox_min=jnp.asarray([-1.5] * 3),
                         inv_spacing=jnp.asarray([4 / 3.0] * 3))
    o, d, v = _rays(n=6)
    out = render_rays(jax.random.PRNGKey(0), tiny_params, o, d, v,
                      jnp.full((6,), 2.0), jnp.full((6,), 6.0), cfg,
                      occupancy=grid)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_serve_enable_occupancy(tmp_path, tiny_params):
    from cvnerf_tpu.render.renderer import RenderConfig as RC
    from cvnerf_tpu.serve import NerfRenderer
    from cvnerf_tpu.train.checkpoint import save_checkpoint
    from cvnerf_tpu.train.state import TrainState, create_train_state
    d = str(tmp_path / "ckpt")
    state = create_train_state(jax.random.PRNGKey(0), mlp=TINY)
    save_checkpoint(d, TrainState(params=state.params,
                                  opt_state=state.opt_state, step=1))
    r = NerfRenderer(d, height=10, width=12, focal=10.0, near=2.0, far=6.0,
                     cfg=RC(n_coarse=4, n_fine=4, mlp=TINY), chunk=120,
                     use_mesh=False)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0
    plain = r.render_pose(pose)
    assert r.enable_occupancy(resolution=17) is r
    fast = r.render_pose(pose)
    assert fast.shape == plain.shape and np.isfinite(fast).all()
    # Re-rendering with the grid is deterministic.
    np.testing.assert_array_equal(fast, r.render_pose(pose))
    # Full mode: still renders, still deterministic.
    r.enable_occupancy(resolution=17, mode="full")
    full = r.render_pose(pose)
    assert full.shape == plain.shape and np.isfinite(full).all()
    np.testing.assert_array_equal(full, r.render_pose(pose))
    with pytest.raises(ValueError, match="mode"):
        r.enable_occupancy(resolution=17, mode="turbo")
