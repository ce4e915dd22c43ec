"""Int8 post-training quantization: oracle accuracy, kernel equivalence,
renderer dispatch, and serving integration (ops/quantize.py +
ops/pallas/fused_mlp_int8.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvnerf_tpu.models.nerf_mlp import (
    NerfMLPConfig,
    apply_nerf,
    init_nerf_params,
)
from cvnerf_tpu.ops.encoding import freq_encode
from cvnerf_tpu.ops.pallas.fused_mlp_int8 import fused_nerf_apply_int8
from cvnerf_tpu.ops.quantize import (
    QuantizedNerfParams,
    apply_nerf_quant,
    calibrate_nerf_quant,
    calibration_samples,
    quantize_nerf,
    quantize_nerf_params,
)

FULL = NerfMLPConfig()                       # 256/128 — kernel-eligible
BBOX = ((-1.5,) * 3, (1.5,) * 3)


@pytest.fixture(scope="module")
def quantized():
    cfg = FULL
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    pts, dirs = calibration_samples(jax.random.PRNGKey(1), 4096, *BBOX)
    return cfg, params, quantize_nerf(params, cfg, pts, dirs)


def _encode(cfg, pts, dirs):
    return (freq_encode(pts, cfg.xyz_freqs), freq_encode(dirs, cfg.dir_freqs))


def test_calibration_scales(quantized):
    cfg, params, _ = quantized
    pts, dirs = calibration_samples(jax.random.PRNGKey(1), 4096, *BBOX)
    calib = calibrate_nerf_quant(params, cfg, pts, dirs)
    assert calib["enc_x"].shape == (cfg.xyz_dim,)
    assert calib["enc_d"].shape == (cfg.dir_dim,)
    # Trig features are bounded by 1; id features by the bbox extent.
    assert float(jnp.max(calib["enc_x"][3:])) <= 1.0 + 1e-6
    assert float(jnp.max(calib["enc_x"][:3])) <= 1.5 + 1e-6
    # Hidden maxima are per-channel vectors (free at runtime: the requant
    # multiplier folds into the producer's per-channel dequant scale).
    assert calib["h1"].shape == (cfg.trunk_width,)
    assert calib["h10"].shape == (cfg.head_width,)
    for k in ("h1", "h8", "feat", "h10"):
        assert float(jnp.min(calib[k])) >= 0.0


def test_zero_activation_calibration_is_safe():
    """A dead layer (all-zero maxima) must not produce inf/nan scales."""
    cfg = NerfMLPConfig(xyz_freqs=2, dir_freqs=1, trunk_width=32,
                        head_width=32)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    calib = {"enc_x": jnp.zeros(cfg.xyz_dim), "enc_d": jnp.zeros(cfg.dir_dim)}
    for k in ("h1", "h2", "h3", "h4", "h5", "h6", "h7", "h8", "feat"):
        calib[k] = jnp.zeros(cfg.trunk_width)
    calib["h10"] = jnp.zeros(cfg.head_width)
    qp = quantize_nerf_params(params, cfg, calib)
    for leaf in jax.tree.leaves(qp):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()


def test_oracle_tracks_float_net(quantized):
    """w8a8 output within a few percent of the float oracle at init."""
    cfg, params, qp = quantized
    pts, dirs = calibration_samples(jax.random.PRNGKey(2), 2048, *BBOX)
    ex, ed = _encode(cfg, pts, dirs)
    ref = np.asarray(apply_nerf(params, ex, ed, cfg))
    q = np.asarray(apply_nerf_quant(qp, ex, ed, cfg))
    scale = np.abs(ref).max(axis=0)
    assert (np.abs(q - ref).max(axis=0) <= 0.05 * scale + 1e-3).all()


def test_quantized_weights_saturate_range(quantized):
    """Per-output-channel scales: every column uses the full int8 range."""
    _, _, qp = quantized
    for name, lay in qp.layers.items():
        colmax = np.abs(np.asarray(lay["qw"], np.int32)).max(axis=0)
        assert colmax.min() >= 126, name   # max/127 scale → max quantizes to ±127


def test_kernel_bitwise_integer_pipeline(quantized):
    """With power-of-two head scales and zero head biases the f32 dequant
    is exact, so kernel == oracle BITWISE proves every int8 activation and
    head accumulator matches."""
    cfg, _, qp = quantized
    L = dict(qp.layers)
    for h in ("alpha", "l11"):
        L[h] = {"qw": L[h]["qw"],
                "s": jnp.full_like(L[h]["s"], 2.0 ** -10),
                "b": jnp.zeros_like(L[h]["b"])}
    qp2 = QuantizedNerfParams(layers=L, inv_act=qp.inv_act)
    pts, dirs = calibration_samples(jax.random.PRNGKey(3), 300, *BBOX)
    ex, ed = _encode(cfg, pts, dirs)
    oracle = np.asarray(apply_nerf_quant(qp2, ex, ed, cfg))
    kern = np.asarray(fused_nerf_apply_int8(qp2, pts, dirs, cfg, tile=256,
                                            interpret=True))
    np.testing.assert_array_equal(kern, oracle)


def test_kernel_matches_oracle_real_scales(quantized):
    """Arbitrary scales: identical up to one FMA-contraction rounding of
    the heads' ``acc*s + b`` (the integer pipeline is exact either way)."""
    cfg, _, qp = quantized
    pts, dirs = calibration_samples(jax.random.PRNGKey(4), 500, *BBOX)
    ex, ed = _encode(cfg, pts, dirs)
    oracle = np.asarray(apply_nerf_quant(qp, ex, ed, cfg))
    kern = np.asarray(fused_nerf_apply_int8(qp, pts, dirs, cfg, tile=256,
                                            interpret=True))
    np.testing.assert_allclose(kern, oracle, atol=1e-6, rtol=0)


def test_kernel_pads_ragged_point_counts(quantized):
    cfg, _, qp = quantized
    pts, dirs = calibration_samples(jax.random.PRNGKey(5), 130, *BBOX)
    ex, ed = _encode(cfg, pts, dirs)
    oracle = np.asarray(apply_nerf_quant(qp, ex, ed, cfg))
    kern = np.asarray(fused_nerf_apply_int8(qp, pts, dirs, cfg, tile=128,
                                            interpret=True))
    assert kern.shape == (130, 4)
    np.testing.assert_allclose(kern, oracle, atol=1e-6, rtol=0)


def test_kernel_rejects_unaligned_widths():
    cfg = NerfMLPConfig(trunk_width=24, head_width=16)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    pts, dirs = calibration_samples(jax.random.PRNGKey(1), 256, *BBOX)
    qp = quantize_nerf(params, cfg, pts, dirs)
    with pytest.raises(ValueError, match="multiple of 32"):
        fused_nerf_apply_int8(qp, pts, dirs, cfg, tile=128, interpret=True)


def test_renderer_dispatches_on_quantized_params(quantized):
    """render_rays with QuantizedNerfParams: runs the int8 path, output
    close to the float render, and bitwise chunk-invariant."""
    from cvnerf_tpu.render.renderer import (
        RenderConfig,
        render_rays,
        render_rays_chunked,
    )
    cfg, params, qp = quantized
    rcfg = RenderConfig(n_coarse=8, n_fine=8, perturb=False, mlp=cfg,
                        pallas="off")
    n = 24
    key = jax.random.PRNGKey(0)
    o = jnp.stack([jnp.zeros(n), jnp.zeros(n), jnp.full((n,), -4.0)], -1)
    v = jnp.stack([jnp.linspace(-0.2, 0.2, n), jnp.zeros(n), jnp.ones(n)], -1)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    near, far = jnp.full((n,), 2.5), jnp.full((n,), 5.5)

    fl = render_rays(key, {"coarse": params, "fine": params}, o, v, v,
                     near, far, rcfg)
    qt = render_rays(key, {"coarse": qp, "fine": qp}, o, v, v,
                     near, far, rcfg)
    assert np.isfinite(np.asarray(qt["rgb"])).all()
    # int8 noise moves the image slightly, never wildly (untrained net).
    assert float(jnp.abs(qt["rgb"] - fl["rgb"]).max()) < 0.2

    full = render_rays_chunked(key, {"coarse": qp, "fine": qp}, o, v, v,
                               2.5, 5.5, rcfg, chunk=24)
    split = render_rays_chunked(key, {"coarse": qp, "fine": qp}, o, v, v,
                                2.5, 5.5, rcfg, chunk=8)
    np.testing.assert_array_equal(np.asarray(full["rgb"]),
                                  np.asarray(split["rgb"]))


def test_renderer_interpret_kernel_path_matches_oracle_path(quantized):
    """pallas='interpret' (the TPU kernel, interpreted) vs pallas='off'
    (jnp oracle) inside the full renderer: same small render."""
    from cvnerf_tpu.render.renderer import RenderConfig, render_rays
    cfg, _, qp = quantized
    n = 8
    key = jax.random.PRNGKey(1)
    o = jnp.stack([jnp.zeros(n), jnp.zeros(n), jnp.full((n,), -4.0)], -1)
    v = jnp.stack([jnp.linspace(-0.1, 0.1, n), jnp.zeros(n), jnp.ones(n)], -1)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    near, far = jnp.full((n,), 2.5), jnp.full((n,), 5.5)
    params = {"coarse": qp, "fine": qp}
    base = dict(n_coarse=4, n_fine=4, perturb=False, mlp=cfg)
    a = render_rays(key, params, o, v, v, near, far,
                    RenderConfig(pallas="off", **base))
    b = render_rays(key, params, o, v, v, near, far,
                    RenderConfig(pallas="interpret", **base))
    np.testing.assert_allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]),
                               atol=1e-5, rtol=0)


def test_renderer_falls_back_to_oracle_on_odd_widths():
    """Widths the int8 kernel can't tile (not %32) must route to the jnp
    oracle inside the renderer instead of raising mid-render."""
    from cvnerf_tpu.render.renderer import RenderConfig, render_rays
    cfg = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=24,
                        head_width=16)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    pts, dirs = calibration_samples(jax.random.PRNGKey(1), 256, *BBOX)
    qp = quantize_nerf(params, cfg, pts, dirs)
    n = 8
    key = jax.random.PRNGKey(1)
    o = jnp.stack([jnp.zeros(n), jnp.zeros(n), jnp.full((n,), -4.0)], -1)
    v = jnp.stack([jnp.linspace(-0.1, 0.1, n), jnp.zeros(n), jnp.ones(n)], -1)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    near, far = jnp.full((n,), 2.5), jnp.full((n,), 5.5)
    p = {"coarse": qp, "fine": qp}
    base = dict(n_coarse=4, n_fine=4, perturb=False, mlp=cfg)
    # pallas='interpret' would hit the kernel; the guard must reroute.
    a = render_rays(key, p, o, v, v, near, far,
                    RenderConfig(pallas="interpret", **base))
    b = render_rays(key, p, o, v, v, near, far,
                    RenderConfig(pallas="off", **base))
    np.testing.assert_array_equal(np.asarray(a["rgb"]), np.asarray(b["rgb"]))


def test_serve_enable_int8(tmp_path):
    """Checkpoint → enable_int8 → render: runs, deterministic, and the
    float master copy still drives the occupancy bake afterwards."""
    from cvnerf_tpu.render.renderer import RenderConfig as RC
    from cvnerf_tpu.serve import NerfRenderer
    from cvnerf_tpu.train.checkpoint import save_checkpoint
    from cvnerf_tpu.train.state import TrainState, create_train_state
    tiny = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=32,
                         head_width=32)
    d = str(tmp_path / "ckpt")
    state = create_train_state(jax.random.PRNGKey(0), mlp=tiny)
    params = state.params
    for net in ("coarse", "fine"):
        params[net]["alpha"]["b"] = params[net]["alpha"]["b"] + 1.0
    save_checkpoint(d, TrainState(params=params,
                                  opt_state=state.opt_state, step=7))
    r = NerfRenderer(d, height=10, width=12, focal=10.0, near=2.0, far=6.0,
                     cfg=RC(n_coarse=4, n_fine=4, mlp=tiny), chunk=120,
                     use_mesh=False)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0
    plain = r.render_pose(pose)
    assert r.enable_int8(n_calib=2048) is r
    assert isinstance(r.params["fine"], QuantizedNerfParams)
    q = r.render_pose(pose)
    assert q.shape == plain.shape and np.isfinite(q).all()
    assert float(np.abs(q - plain).max()) < 0.2
    np.testing.assert_array_equal(q, r.render_pose(pose))
    # Composes with occupancy (bake reads the float master copy).
    r.enable_occupancy(resolution=9)
    both = r.render_pose(pose)
    assert both.shape == plain.shape and np.isfinite(both).all()


def test_quantized_params_jit_and_tree_roundtrip(quantized):
    _, _, qp = quantized
    leaves, treedef = jax.tree.flatten(qp)
    back = jax.tree.unflatten(treedef, leaves)
    assert isinstance(back, QuantizedNerfParams)

    @jax.jit
    def f(q):
        return q.layers["l1"]["s"].sum()

    assert np.isfinite(float(f(qp)))
