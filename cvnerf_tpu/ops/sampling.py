"""Stratified coarse sampling and inverse-CDF hierarchical sampling.

Parity targets: reference ``main.py:221-234`` (stratified + midpoint-jitter
perturbation) and ``utils.py:4-53`` (``inv_transform_sampling``). Everything
is static-shape jnp, and the reference's ``torch.searchsorted``/``gather``
bin lookup is deliberately NOT reproduced with ``jnp.searchsorted``/gather —
those lower terribly on TPU (CLAUDE.md "TPU-hostile patterns"); the same
math runs as compare-count + masked min/max reductions (see ``sample_pdf``);
no host chunking.

RNG is explicit ``jax.random`` keys (the reference draws from an unseeded
global torch RNG — ``main.py:233``, ``utils.py:23`` — so runs there are
nondeterministic; here determinism is the default and a deterministic
*midpoint/linspace* eval path is additionally available, mirroring the
original NeRF's ``det`` flag which the reference dropped).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_samples(key: jax.Array | None,
                       near: jnp.ndarray, far: jnp.ndarray,
                       n_samples: int, n_rays: int,
                       perturb: bool,
                       u: jnp.ndarray | None = None) -> jnp.ndarray:
    """Depths ``t`` of stratified coarse samples, ``[n_rays, n_samples]``.

    Base grid is ``near·(1-s) + far·s`` for ``s = linspace(0, 1, n)``
    (reference ``main.py:221-223``). With ``perturb``, each interior sample
    jitters uniformly inside the bin bounded by neighboring midpoints
    (reference ``main.py:227-234``).

    Args:
        key: PRNG key; required when ``perturb`` is True and ``u`` is None.
        near, far: scalars or ``[n_rays]`` / ``[n_rays, 1]`` bounds.
        u: optional pre-drawn uniforms ``[n_rays, n_samples]`` — used by the
            renderer's per-ray RNG so results are invariant to sharding and
            chunking.
    """
    s = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    near = jnp.broadcast_to(jnp.reshape(jnp.asarray(near, jnp.float32), (-1, 1)),
                            (n_rays, 1))
    far = jnp.broadcast_to(jnp.reshape(jnp.asarray(far, jnp.float32), (-1, 1)),
                           (n_rays, 1))
    t = near * (1.0 - s) + far * s  # [n_rays, n_samples]

    if perturb:
        mids = 0.5 * (t[..., 1:] + t[..., :-1])
        upper = jnp.concatenate([mids, t[..., -1:]], axis=-1)
        lower = jnp.concatenate([t[..., :1], mids], axis=-1)
        if u is None:
            u = jax.random.uniform(key, t.shape, dtype=t.dtype)
        t = lower + (upper - lower) * u
    return t


def merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge two per-ray ASCENDING arrays ``a [n, la]``, ``b [n, lb]`` into
    one ascending ``[n, la+lb]`` array.

    TPU-native replacement for ``jnp.sort(concat([a, b]))`` when both inputs
    are already sorted (reference ``main.py:251`` sorts the coarse/fine
    depth union): ``[a asc | +inf pad | reversed(b) desc]`` is bitonic, so a
    single bitonic *merge* — ``log2`` compare-exchange stages of elementwise
    min/max, pure VPU work — sorts it, versus the ``O(log^2)`` stages of a
    full bitonic sort.
    """
    n, la = a.shape
    lb = b.shape[-1]
    m = la + lb
    size = 1 << (m - 1).bit_length()          # next power of two
    pad = size - m
    inf = jnp.full((n, pad), jnp.inf, a.dtype)
    # ascending | peak (+inf) | descending  → bitonic
    x = jnp.concatenate([a, inf, b[..., ::-1]], axis=-1)
    d = size // 2
    while d >= 1:
        y = x.reshape(n, -1, 2, d)
        lo = jnp.minimum(y[:, :, 0, :], y[:, :, 1, :])
        hi = jnp.maximum(y[:, :, 0, :], y[:, :, 1, :])
        x = jnp.stack([lo, hi], axis=2).reshape(n, size)
        d //= 2
    return x[..., :m]


def sample_pdf(key: jax.Array | None,
               bins: jnp.ndarray, weights: jnp.ndarray,
               n_samples: int, deterministic: bool = False,
               u: jnp.ndarray | None = None) -> jnp.ndarray:
    """Inverse-transform sampling from a piecewise-constant weight PDF.

    Parity with reference ``utils.py:4-53``: ε=1e-5 smoothing, normalize to a
    pdf, cumulative sum with a zero prepended, uniform draws, right-bisect
    ``searchsorted``, clamped lower/upper bin indices, and linear rescale of
    the uniform within its CDF bin with an ε-guard on degenerate bins.

    Args:
        bins: ``[n_rays, n_weights + 1]`` sample positions, ASCENDING along
            the last axis (coarse bin midpoints at the call site, reference
            ``main.py:248`` — sorted by construction). One wider than
            ``weights`` so it aligns with the zero-prepended CDF — the same
            convention the reference relies on (its gather indexes ``pts``
            and ``cdf`` with identical indices, ``utils.py:44-47``). The
            masked-reduction bracketing below relies on this monotonicity.
        weights: ``[n_rays, n_weights]`` unnormalized weights
            (``weights[..., 1:-1]`` at the call site, reference
            ``main.py:249``).
        deterministic: replaces the uniform draws with an evenly spaced
            ``linspace(0, 1, n)`` — the original NeRF's test-time ``det``
            path, absent in the reference (SURVEY.md C8); off by default.
    Returns:
        ``[n_rays, n_samples]`` new sample positions. Callers should
        ``lax.stop_gradient`` the result (the reference detaches,
        ``main.py:250``).
    """
    eps = 1e-5
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    # cdf: [n_rays, n_bins + 1]

    if deterministic:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    elif u is None:
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples), dtype=cdf.dtype)

    if bins.shape[-1] != cdf.shape[-1]:
        raise ValueError(
            f"bins must be one wider than weights: got bins[..., "
            f"{bins.shape[-1]}] vs weights[..., {weights.shape[-1]}]")

    # Right-bisection per ray WITHOUT searchsorted/gather: binary search +
    # gather lower terribly on TPU (lane-crossing dynamic indexing; the
    # vmapped-searchsorted version of this function took minutes to
    # *compile* and dominated render time). Both cdf and bins are ascending
    # along the bin axis, so the bracketing values are masked reductions
    # over a [q, n_bins] comparison — pure VPU work, no index materialization
    # (round 1 used one-hot contractions here, which materialized two
    # [n, q, n_bins] one-hots; the masked min/max form is the same math).
    #   lower = idx-1 clamped → the LAST bin with cdf <= u   (max over mask)
    #   upper = idx clamped   → the FIRST bin with cdf > u   (min over mask)
    ge = u[..., :, None] >= cdf[..., None, :]                 # [n, q, nb]
    ninf = jnp.asarray(-jnp.inf, cdf.dtype)
    pinf = jnp.asarray(jnp.inf, cdf.dtype)
    cdf_q = cdf[..., None, :]
    bins_q = bins[..., None, :]
    # cdf[0] = 0 <= u always, so the "lower" masks are never empty.
    cdf_lo = jnp.max(jnp.where(ge, cdf_q, ninf), axis=-1)
    bin_lo = jnp.max(jnp.where(ge, bins_q, ninf), axis=-1)
    # u >= every cdf (idx = nb, clamped to nb-1): empty mask → last bin.
    cdf_hi = jnp.min(jnp.where(ge, pinf, cdf_q), axis=-1)
    bin_hi = jnp.min(jnp.where(ge, pinf, bins_q), axis=-1)
    cdf_hi = jnp.where(jnp.isfinite(cdf_hi), cdf_hi, cdf[..., -1:])
    bin_hi = jnp.where(jnp.isfinite(bin_hi), bin_hi, bins[..., -1:])

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, jnp.ones_like(denom), denom)
    frac = (u - cdf_lo) / denom
    return bin_lo + frac * (bin_hi - bin_lo)
