"""Volume rendering: alpha compositing of raw network outputs along rays.

Parity target: reference ``main.py:170-204`` (``process_volume_info`` /
``_alpha_composite``). One fused jnp function — XLA keeps the whole chain
(deltas → sigmoid → noise → alpha → transmittance → weighted sums) on the VPU
with no intermediate HBM round-trips at training batch sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF_DIST = 1e10


def volume_render(raw_rgba: jnp.ndarray,
                  t_vals: jnp.ndarray,
                  ray_dirs: jnp.ndarray,
                  key: jax.Array | None = None,
                  noise_std: float = 0.0,
                  white_bkg: bool = False,
                  noise: jnp.ndarray | None = None):
    """Composite raw ``[..., n_samples, 4]`` network output into pixel RGB.

    The exact reference math (``main.py:170-204``):
      * ``delta_i = t_{i+1} - t_i`` with a terminal 1e10, scaled by ‖d‖ so
        depths measured in ray-parameter units become metric distances.
      * ``rgb = sigmoid(raw[..., :3])``.
      * optional Gaussian noise added to raw density *before* the ReLU
        (regularizer, reference ``main.py:186-191``).
      * ``alpha = 1 - exp(-relu(sigma) * delta)``.
      * transmittance ``T_i`` = exclusive cumprod of ``(1 - alpha + 1e-10)``.
      * ``weights = alpha * T``; ``rgb_map = sum(weights * rgb)``.
      * white background: ``rgb_map += 1 - sum(weights)``.

    Args:
        raw_rgba: ``[..., n_samples, 4]`` raw (rgb, sigma) from the MLP.
        t_vals: ``[..., n_samples]`` sample depths along each ray.
        ray_dirs: ``[..., 3]`` (unnormalized) ray directions.
        key: PRNG key for density noise (required if ``noise_std > 0``).
    Returns:
        dict with ``rgb`` ``[..., 3]``, ``weights`` ``[..., n_samples]``,
        ``acc`` ``[...]`` (accumulated opacity) and ``depth`` ``[...]``
        (expected termination depth — an addition over the reference, used
        for diagnostics).
    """
    deltas = t_vals[..., 1:] - t_vals[..., :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[..., :1], INF_DIST)], axis=-1)
    deltas = deltas * jnp.linalg.norm(ray_dirs[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw_rgba[..., :3])
    sigma = raw_rgba[..., 3]
    if noise_std > 0.0:
        if noise is None:
            noise = jax.random.normal(key, sigma.shape, sigma.dtype)
        sigma = sigma + noise * noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * deltas)
    # Exclusive cumulative product: T_i = prod_{j<i} (1 - alpha_j + 1e-10).
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1)[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * t_vals, axis=-1)

    if white_bkg:
        rgb_map = rgb_map + (1.0 - acc[..., None])

    return {"rgb": rgb_map, "weights": weights, "acc": acc, "depth": depth}


def distortion_loss(weights: jnp.ndarray, t_vals: jnp.ndarray,
                    near: jnp.ndarray, far: jnp.ndarray) -> jnp.ndarray:
    """Per-ray mip-NeRF 360 distortion regularizer (arXiv:2111.12077 eq. 15),
    adapted to point samples.

    Over normalized ray coordinates ``s = (t - near) / (far - near)``:

        L = sum_ij w_i w_j |s_i - s_j| + (1/3) sum_i w_i^2 delta_i

    The pairwise term pulls each ray's weight mass into one compact cluster
    (floaters and semi-transparent "fog" along the ray are exactly
    high-spread weight distributions); the self term shrinks each interval's
    own contribution. Not in the reference — a flag-gated training
    regularizer (``--distortion_loss``) targeting the sparse-capture
    floaters documented in the llff_360 band (ROADMAP round-3 item 8).

    The O(n^2) pairwise sum is computed in O(n) with exclusive prefix sums
    over the (already sorted, ascending) sample axis:

        sum_ij w_i w_j |s_i - s_j| = 2 sum_i w_i (s_i W_i - S_i),
        W_i = sum_{j<i} w_j,  S_i = sum_{j<i} w_j s_j

    (equivalence vs the brute-force double sum pinned in
    ``tests/test_anneal.py``).

    Args:
        weights: ``[..., n_samples]`` compositing weights (NOT detached —
            the regularizer must shape the density field).
        t_vals: ``[..., n_samples]`` ascending sample depths.
        near, far: ``[...]`` per-ray bounds used for normalization.
    Returns:
        ``[...]`` per-ray loss.
    """
    s = (t_vals - near[..., None]) / (far - near)[..., None]
    ws = weights * s
    w_before = jnp.cumsum(weights, axis=-1) - weights   # exclusive prefix
    ws_before = jnp.cumsum(ws, axis=-1) - ws
    pairwise = 2.0 * jnp.sum(ws * w_before - weights * ws_before, axis=-1)
    # Self term: each sample's interval is the gap to its successor (the
    # terminal sample gets no interval — its 1e10 compositing delta is a
    # sentinel, not geometry).
    delta = s[..., 1:] - s[..., :-1]
    self_term = jnp.sum(weights[..., :-1] ** 2 * delta, axis=-1) / 3.0
    return pairwise + self_term


def occlusion_loss(weights: jnp.ndarray, t_vals: jnp.ndarray,
                   near: jnp.ndarray, far: jnp.ndarray,
                   frac: float) -> jnp.ndarray:
    """Per-ray FreeNeRF occlusion regularizer (arXiv:2303.07418 sec. 3.3),
    in weight space over a normalized-depth window.

    Penalizes the compositing weight mass that lands within the first
    ``frac`` of each ray's [near, far] range: near-camera floaters are
    exactly rays whose weight concentrates right in front of the camera,
    where a sparse 360-degree capture has no multi-view supervision. The
    paper's form masks the first M *samples* of raw density; over a
    PDF-resampled fine pass the sample index is not a depth, so the window
    is taken in normalized depth ``s = (t - near)/(far - near)`` instead
    (identical on the stratified coarse grid, well-defined after
    resampling). Unlike the distortion regularizer, the global minimum is
    an empty NEAR REGION, not an empty ray — far geometry is unpenalized,
    so it cannot pull training into the empty-scene basin
    (BASELINE.md "Sparse-capture regularizers").

    Not in the reference — a flag-gated training regularizer
    (``--occlusion_loss``) modifying the loss of
    ``/root/reference/main.py:380-383``.

    Args:
        weights: ``[..., n_samples]`` compositing weights (not detached).
        t_vals: ``[..., n_samples]`` ascending sample depths.
        near, far: ``[...]`` per-ray bounds.
        frac: window size as a fraction of the ray range (static).
    Returns:
        ``[...]`` per-ray loss: total weight inside the window.
    """
    s = (t_vals - near[..., None]) / (far - near)[..., None]
    return jnp.sum(weights * (s < frac).astype(weights.dtype), axis=-1)
