"""Tests for stratified + inverse-CDF sampling (ops/sampling.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvnerf_tpu.ops.sampling import sample_pdf, stratified_samples


def test_stratified_no_perturb_linspace():
    t = stratified_samples(None, 2.0, 6.0, 5, 3, perturb=False)
    assert t.shape == (3, 5)
    np.testing.assert_allclose(np.asarray(t[0]), [2.0, 3.0, 4.0, 5.0, 6.0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(t[1]), np.asarray(t[0]))


def test_stratified_per_ray_bounds():
    near = jnp.array([0.0, 1.0])
    far = jnp.array([1.0, 3.0])
    t = stratified_samples(None, near, far, 3, 2, perturb=False)
    np.testing.assert_allclose(np.asarray(t), [[0.0, 0.5, 1.0],
                                               [1.0, 2.0, 3.0]], atol=1e-6)


def test_stratified_perturb_within_bins():
    key = jax.random.PRNGKey(0)
    n, s = 64, 16
    t0 = stratified_samples(None, 2.0, 6.0, s, n, perturb=False)
    t = stratified_samples(key, 2.0, 6.0, s, n, perturb=True)
    t0 = np.asarray(t0)
    mids = 0.5 * (t0[..., 1:] + t0[..., :-1])
    lower = np.concatenate([t0[..., :1], mids], -1)
    upper = np.concatenate([mids, t0[..., -1:]], -1)
    t = np.asarray(t)
    assert (t >= lower - 1e-6).all() and (t <= upper + 1e-6).all()
    # still sorted per ray
    assert (np.diff(t, axis=-1) >= -1e-6).all()


def test_sample_pdf_shapes_and_bounds():
    key = jax.random.PRNGKey(1)
    n_rays, n_bins = 8, 63
    bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, n_bins), (n_rays, n_bins))
    weights = jax.random.uniform(key, (n_rays, n_bins - 1))
    s = sample_pdf(jax.random.PRNGKey(2), bins, weights, 128)
    assert s.shape == (n_rays, 128)
    s = np.asarray(s)
    assert (s >= 2.0 - 1e-5).all() and (s <= 6.0 + 1e-5).all()


def test_sample_pdf_concentrates_on_heavy_bin():
    # All weight in one bin → nearly all samples land inside that bin.
    n_bins = 11
    bins = jnp.linspace(0.0, 1.0, n_bins)[None, :]
    weights = jnp.zeros((1, n_bins - 1)).at[0, 4].set(1000.0)
    s = np.asarray(sample_pdf(jax.random.PRNGKey(3), bins, weights, 256))
    lo, hi = float(bins[0, 4]), float(bins[0, 5])
    frac = ((s >= lo) & (s <= hi)).mean()
    assert frac > 0.95


def test_sample_pdf_deterministic_path():
    bins = jnp.linspace(0.0, 1.0, 9)[None, :]
    weights = jnp.ones((1, 8))
    a = sample_pdf(None, bins, weights, 16, deterministic=True)
    b = sample_pdf(None, bins, weights, 16, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Uniform weights + linspace uniforms → evenly spread samples.
    s = np.asarray(a[0])
    assert abs(s[0] - 0.0) < 1e-5 and abs(s[-1] - 1.0) < 1e-5


def test_sample_pdf_shape_mismatch_raises():
    bins = jnp.linspace(0.0, 1.0, 8)[None, :]
    weights = jnp.ones((1, 8))  # must be bins-1 wide
    with pytest.raises(ValueError):
        sample_pdf(jax.random.PRNGKey(0), bins, weights, 4)


def test_sample_pdf_matches_torch_reference_math():
    """Numpy re-derivation of the reference algorithm (utils.py:4-53) with
    fixed uniforms must match our implementation exactly."""
    rng = np.random.RandomState(0)
    n_rays, n_bins, n = 4, 15, 32
    bins = np.sort(rng.rand(n_rays, n_bins), axis=-1).astype(np.float32)
    weights = rng.rand(n_rays, n_bins - 1).astype(np.float32)
    u = rng.rand(n_rays, n).astype(np.float32)

    # Reference math in numpy:
    eps = 1e-5
    w = weights + eps
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    idx = np.stack([np.searchsorted(cdf[i], u[i], side="right")
                    for i in range(n_rays)])
    upper = np.minimum(cdf.shape[-1] - 1, idx)
    lower = np.maximum(0, idx - 1)
    cdf_lo = np.take_along_axis(cdf, lower, -1)
    cdf_hi = np.take_along_axis(cdf, upper, -1)
    b_lo = np.take_along_axis(bins, lower, -1)
    b_hi = np.take_along_axis(bins, upper, -1)
    denom = cdf_hi - cdf_lo
    denom = np.where(denom < eps, 1.0, denom)
    expected = b_lo + (u - cdf_lo) / denom * (b_hi - b_lo)

    # Our implementation with the same uniforms, via monkeypatched RNG:
    import cvnerf_tpu.ops.sampling as sampling_mod
    orig = jax.random.uniform
    try:
        jax.random.uniform = lambda *a, **k: jnp.asarray(u)
        got = sampling_mod.sample_pdf(jax.random.PRNGKey(0),
                                      jnp.asarray(bins), jnp.asarray(weights),
                                      n)
    finally:
        jax.random.uniform = orig
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5,
                               atol=1e-6)


def test_merge_sorted_equals_sort():
    from cvnerf_tpu.ops.sampling import merge_sorted
    rng = np.random.RandomState(1)
    for la, lb in ((64, 128), (8, 8), (1, 7), (5, 3)):
        a = np.sort(rng.rand(50, la).astype(np.float32), -1)
        b = np.sort(rng.rand(50, lb).astype(np.float32), -1)
        got = np.asarray(merge_sorted(jnp.asarray(a), jnp.asarray(b)))
        want = np.sort(np.concatenate([a, b], -1), -1)
        np.testing.assert_array_equal(got, want)


def test_merge_sorted_with_duplicates_and_ties():
    from cvnerf_tpu.ops.sampling import merge_sorted
    a = jnp.asarray([[0.0, 0.5, 0.5, 1.0]])
    b = jnp.asarray([[0.5, 0.5]])
    got = np.asarray(merge_sorted(a, b))
    np.testing.assert_array_equal(got, [[0.0, 0.5, 0.5, 0.5, 0.5, 1.0]])
