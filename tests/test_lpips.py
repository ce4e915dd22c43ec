"""LPIPS (weights-pluggable perceptual metric): graph + loader contracts.

No pretrained weights exist in this environment, so these tests pin the
metric's mathematical properties and the loader's validation with randomly
generated weight bundles of the exact published shapes.
"""

import numpy as np
import pytest

from cvnerf_tpu.utils.lpips import (_STAGES, export_weights_script,
                                    load_weights, lpips_images)


def _random_bundle(seed=0, path=None):
    rng = np.random.RandomState(seed)
    out = {}
    for i, (ch, k, _, _) in enumerate(_STAGES):
        cin = 3 if i == 0 else _STAGES[i - 1][0]
        out[f"conv{i}_w"] = rng.randn(ch, cin, k, k).astype(np.float32) * 0.1
        out[f"conv{i}_b"] = rng.randn(ch).astype(np.float32) * 0.1
        # Calibration weights are non-negative in the published model.
        out[f"lin{i}"] = rng.rand(ch).astype(np.float32)
    if path is not None:
        np.savez(path, **out)
    return out


def test_identical_images_have_zero_distance():
    w = _random_bundle()
    img = np.random.RandomState(1).rand(48, 48, 3).astype(np.float32)
    # Not exactly 0.0: XLA may fuse the two (identical) feature branches
    # differently, so equal inputs give equal-up-to-ulp tap values.
    assert abs(lpips_images(img, img, w)) < 1e-9


def test_distinct_images_positive_and_symmetric():
    w = _random_bundle()
    rng = np.random.RandomState(2)
    a = rng.rand(48, 48, 3).astype(np.float32)
    b = rng.rand(48, 48, 3).astype(np.float32)
    d_ab = lpips_images(a, b, w)
    d_ba = lpips_images(b, a, w)
    assert d_ab > 0
    assert d_ab == d_ba
    assert np.isfinite(d_ab)


def test_small_perturbation_smaller_than_large():
    w = _random_bundle()
    rng = np.random.RandomState(3)
    a = rng.rand(32, 32, 3).astype(np.float32)
    near = np.clip(a + 0.01 * rng.randn(*a.shape), 0, 1).astype(np.float32)
    far = rng.rand(32, 32, 3).astype(np.float32)
    assert lpips_images(a, near, w) < lpips_images(a, far, w)


def test_loader_roundtrip_and_validation(tmp_path):
    path = str(tmp_path / "w.npz")
    _random_bundle(path=path)
    w = load_weights(path)
    assert set(w) >= {"conv0_w", "lin4"}
    img = np.random.RandomState(4).rand(40, 40, 3).astype(np.float32)
    # Path form is accepted directly.
    assert abs(lpips_images(img, img, path)) < 1e-9

    with pytest.raises(FileNotFoundError, match="export"):
        load_weights(str(tmp_path / "missing.npz"))

    bad = _random_bundle()
    del bad["lin3"]
    np.savez(str(tmp_path / "bad.npz"), **bad)
    with pytest.raises(ValueError, match="lin3"):
        load_weights(str(tmp_path / "bad.npz"))

    bad = _random_bundle()
    bad["conv2_w"] = bad["conv2_w"][:, :10]
    np.savez(str(tmp_path / "bad2.npz"), **bad)
    with pytest.raises(ValueError, match="conv2_w"):
        load_weights(str(tmp_path / "bad2.npz"))


def test_shape_validation():
    w = _random_bundle()
    a = np.zeros((48, 48, 3), np.float32)
    with pytest.raises(ValueError, match="matching"):
        lpips_images(a, np.zeros((48, 40, 3), np.float32), w)
    with pytest.raises(ValueError, match="too small"):
        lpips_images(np.zeros((16, 16, 3), np.float32),
                     np.zeros((16, 16, 3), np.float32), w)


def test_export_script_names_every_loaded_key():
    script = export_weights_script()
    for key in ("conv{i}_w", "conv{i}_b", "lin{i}", "lpips_alex.npz"):
        assert key in script
