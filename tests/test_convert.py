"""Tests for the reference (PyTorch) checkpoint importer (utils/convert.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cvnerf_tpu.ops.encoding import freq_encode
from cvnerf_tpu.models.nerf_mlp import apply_nerf
from cvnerf_tpu.utils.convert import (
    import_torch_checkpoint,
    load_torch_checkpoint,
    params_from_torch_state_dict,
)
from test_torch_parity import _TorchReferenceModel, _torch_freq_embed


def _torch_model(seed=0, **kw):
    torch.manual_seed(seed)
    return _TorchReferenceModel(**kw)


def test_state_dict_roundtrip_matches_torch_forward():
    """Weights born in torch, imported into our pytree, must produce the
    same outputs our framework-side parity test guarantees in the other
    direction."""
    model = _torch_model()
    params, cfg = params_from_torch_state_dict(model.state_dict())
    assert (cfg.xyz_freqs, cfg.dir_freqs) == (10, 4)
    assert (cfg.trunk_width, cfg.head_width) == (256, 128)

    rng = np.random.RandomState(3)
    pts = rng.randn(32, 3).astype(np.float32)
    dirs = rng.randn(32, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ours = np.asarray(apply_nerf(
        jax.tree.map(jnp.asarray, params),
        freq_encode(jnp.asarray(pts), 10), freq_encode(jnp.asarray(dirs), 4),
        cfg))
    with torch.no_grad():
        tin = torch.cat([_torch_freq_embed(torch.from_numpy(pts), 10),
                         _torch_freq_embed(torch.from_numpy(dirs), 4)], -1)
        theirs = model(tin).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_nonstandard_architecture_inferred():
    model = _torch_model(xyz_dim=3 + 6 * 4, dir_dim=3 + 6 * 2, w=64, h=32)
    _, cfg = params_from_torch_state_dict(model.state_dict())
    assert (cfg.xyz_freqs, cfg.dir_freqs) == (4, 2)
    assert (cfg.trunk_width, cfg.head_width) == (64, 32)


@pytest.mark.parametrize("keys", [("coarse", "fine"),
                                  ("model", "model_fine"),
                                  ("network_fn", "network_fine")])
def test_two_net_checkpoint_layouts(tmp_path, keys):
    ck, fk = keys
    path = str(tmp_path / "ref.pt")
    torch.save({ck: _torch_model(0).state_dict(),
                fk: _torch_model(1).state_dict(),
                "global_step": 2499}, path)
    params, cfg = load_torch_checkpoint(path)
    assert set(params) == {"coarse", "fine"}
    # distinct nets survive as distinct params
    assert not np.allclose(params["coarse"]["l1"]["w"],
                           params["fine"]["l1"]["w"])


def test_bare_state_dict_serves_single_net(tmp_path):
    path = str(tmp_path / "one.pt")
    torch.save(_torch_model(0).state_dict(), path)
    params, _ = load_torch_checkpoint(path)
    np.testing.assert_array_equal(params["coarse"]["l1"]["w"],
                                  params["fine"]["l1"]["w"])


def test_missing_layer_is_a_clear_error():
    sd = _torch_model(0).state_dict()
    del sd["l_alpha.weight"]
    with pytest.raises(KeyError, match="l_alpha.weight"):
        params_from_torch_state_dict(sd)


def test_import_cli_with_geometry_writes_scene_json(tmp_path):
    """cvnerf-import --height/--width/... writes a scene.json so the
    imported run serves with `cvnerf-serve --run` (zero geometry flags)."""
    from cvnerf_tpu.serve import NerfRenderer
    from cvnerf_tpu.utils.convert import main as imp_main

    path = str(tmp_path / "ref.pt")
    tiny = dict(xyz_dim=3 + 6 * 4, dir_dim=3 + 6 * 2, w=32, h=16)
    torch.save(_torch_model(0, **tiny).state_dict(), path)
    out = str(tmp_path / "run")
    imp_main([path, out, "--step", "7", "--height", "8", "--width", "8",
              "--focal", "10", "--near", "2", "--far", "6",
              "--n_coarse_samples", "4", "--n_fine_samples", "4"])
    r = NerfRenderer.from_run_dir(out, chunk=64, use_mesh=False)
    assert r.step == 7 and (r.height, r.width) == (8, 8)
    assert r.cfg.mlp.trunk_width == 32
    rgb = r.render_pose(np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0],
                                  [0, 0, 1.0, 4.0]]))
    assert np.isfinite(rgb).all()


def test_import_rejects_full_pickle_without_flag(tmp_path):
    """Checkpoints that need pickle code execution are refused unless
    --allow_pickle is given (external .pt files are untrusted input)."""
    from cvnerf_tpu.utils.convert import load_torch_checkpoint

    path = str(tmp_path / "module.pt")
    torch.save({"coarse": _torch_model(0)}, path)   # live nn.Module
    with pytest.raises(ValueError, match="allow_pickle"):
        load_torch_checkpoint(path)
    params, _ = load_torch_checkpoint(path, allow_pickle=True)
    assert "coarse" in params


def test_export_roundtrip(tmp_path):
    """cvnerf checkpoint → torch .pt → re-import: weights must survive
    both directions bit-exactly, and the exported file must be
    weights_only-loadable (plain tensors, no pickle code)."""
    import jax
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig, init_nerf_params
    from cvnerf_tpu.train.checkpoint import save_checkpoint
    from cvnerf_tpu.train.state import TrainState, create_train_state
    from cvnerf_tpu.utils.convert import (export_torch_checkpoint,
                                          load_torch_checkpoint)

    tiny = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=32,
                         head_width=16)
    st = create_train_state(jax.random.PRNGKey(5), mlp=tiny)
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, TrainState(params=st.params,
                                     opt_state=st.opt_state,
                                     step=st.step + 42))
    out = str(tmp_path / "exported.pt")
    step = export_torch_checkpoint(ckpt, out)
    assert step == 42

    blob = torch.load(out, map_location="cpu", weights_only=True)
    assert blob["step"] == 42
    params, cfg = load_torch_checkpoint(out)
    assert cfg == tiny
    for net in ("coarse", "fine"):
        for layer, lv in st.params[net].items():
            np.testing.assert_array_equal(
                np.asarray(lv["w"]), params[net][layer]["w"])


def test_export_empty_dir_is_clear_error(tmp_path):
    from cvnerf_tpu.utils.convert import export_torch_checkpoint
    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        export_torch_checkpoint(str(tmp_path / "nothing"),
                                str(tmp_path / "o.pt"))


def test_export_cli(tmp_path):
    import jax
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
    from cvnerf_tpu.train.checkpoint import save_checkpoint
    from cvnerf_tpu.train.state import create_train_state
    from cvnerf_tpu.utils.convert import main as conv_main

    tiny = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=32,
                         head_width=16)
    st = create_train_state(jax.random.PRNGKey(0), mlp=tiny)
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, st)
    out = str(tmp_path / "e.pt")
    conv_main(["--export", ckpt, out])
    assert torch.load(out, weights_only=True)["step"] == 0


def test_export_cli_explicit_step_zero(tmp_path):
    """`--export --step 0` must export the step-0 checkpoint, not silently
    fall through to the latest (falsy-zero regression)."""
    import jax
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
    from cvnerf_tpu.train.checkpoint import save_checkpoint
    from cvnerf_tpu.train.state import TrainState, create_train_state
    from cvnerf_tpu.utils.convert import main as conv_main

    tiny = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=32,
                         head_width=16)
    st = create_train_state(jax.random.PRNGKey(0), mlp=tiny)
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, st)                                   # step 0
    save_checkpoint(ckpt, TrainState(params=st.params,
                                     opt_state=st.opt_state,
                                     step=st.step + 7))         # step 7
    out = str(tmp_path / "e.pt")
    conv_main(["--export", "--step", "0", ckpt, out])
    assert torch.load(out, weights_only=True)["step"] == 0
    conv_main(["--export", ckpt, str(tmp_path / "latest.pt")])
    assert torch.load(str(tmp_path / "latest.pt"),
                      weights_only=True)["step"] == 7


def test_import_then_render(tmp_path):
    """Full switcher path: torch .pt -> orbax checkpoint -> NerfRenderer."""
    from cvnerf_tpu.render.renderer import RenderConfig
    from cvnerf_tpu.serve import NerfRenderer

    path = str(tmp_path / "ref.pt")
    tiny = dict(xyz_dim=3 + 6 * 4, dir_dim=3 + 6 * 2, w=32, h=16)
    torch.save({"coarse": _torch_model(0, **tiny).state_dict(),
                "fine": _torch_model(1, **tiny).state_dict()}, path)
    out = str(tmp_path / "run")
    cfg = import_torch_checkpoint(path, out, step=2499)

    r = NerfRenderer(out + "/checkpoints", height=8, width=8, focal=10.0,
                     near=2.0, far=6.0,
                     cfg=RenderConfig(n_coarse=4, n_fine=4, mlp=cfg),
                     chunk=64, use_mesh=False)
    assert r.step == 2499
    rgb = r.render_pose(np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0],
                                  [0, 0, 1.0, 4.0]]))
    assert rgb.shape == (8, 8, 3) and np.isfinite(rgb).all()
