"""Frequency positional encoding, as a closed-form vectorized op.

Behavior parity with the reference's ``FreqEmbedding`` (reference
``model.py:9-31``): output is ``[x, sin(2^0 x), cos(2^0 x), sin(2^1 x),
cos(2^1 x), ..., sin(2^(L-1) x), cos(2^(L-1) x)]`` concatenated on the last
axis, where each term carries the full input dimensionality. The reference
builds this as a Python list of lambdas evaluated per call; here it is a
single fused broadcast + reshape so XLA folds it into the adjacent matmul's
input, keeping everything on the VPU with no per-frequency dispatch.
"""

from __future__ import annotations

import jax.numpy as jnp


def encoding_dim(dim: int, n_freqs: int) -> int:
    """Output width of ``freq_encode``: identity + sin/cos per frequency.

    Matches reference ``model.py:73-75`` (``2 * dim * L``) plus the identity
    ``dim`` that the reference adds separately (``model.py:15-16``).
    """
    return dim + 2 * dim * n_freqs


def freq_encode(x: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """Encode ``x[..., d]`` to ``[..., d + 2*d*n_freqs]``.

    Frequencies are ``2**k`` for ``k = 0..n_freqs-1`` (the reference's
    ``2 ** linspace(0, L-1, L)``, ``model.py:19``). Ordering matches the
    reference exactly: identity first, then per-frequency ``sin`` then
    ``cos``, each a full ``d``-wide block.
    """
    if n_freqs == 0:
        return x
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)  # [L]
    # [..., L, d] — broadcast each frequency over the feature axis.
    scaled = x[..., None, :] * freqs[:, None]
    # [..., L, 2, d] with sin before cos so the flattened layout is
    # sin_k, cos_k per frequency, matching the reference lambda order.
    enc = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], 2 * n_freqs * x.shape[-1])
    return jnp.concatenate([x, enc], axis=-1)
