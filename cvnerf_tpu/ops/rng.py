"""Counter-based bulk per-ray RNG.

The renderer keys every random draw by ``(key, tag, global ray id)`` so that
renders and losses are bitwise invariant to device count, sharding, and chunk
size (the reference's single global torch RNG stream — ``main.py:233``,
``utils.py:23`` — changes results with chunk size). Round 1 implemented that
contract as a ``jax.vmap`` of ``fold_in`` + draw per ray, which costs ~2 ms
per 8192-ray chunk (~8% of a 400×400 frame). This module keeps the exact
same *contract* — ``u[i, j]`` depends only on ``(key, tag, ray_ids[i], j)``
— but derives all rays' bits in ONE vectorized Threefry-2x32 pass over a
``(ray_id, sample)`` counter lattice, using both 32-bit lanes of each
counter's output, i.e. one 20-round threefry evaluation per *two* samples
and zero per-ray key derivations.

Threefry-2x32-20 is the same keyed hash ``jax.random`` uses (Salmon et al.,
"Parallel Random Numbers: As Easy as 1, 2, 3", SC'11); implemented here
directly so the counter layout is ours. Equivalence with JAX's threefry is
pinned in ``tests/test_rng.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Random123 rotation schedule for Threefry-2x32.
_ROTATIONS = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = np.uint32(0x1BD11BDA)


def _rotl(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def threefry2x32(k0: jnp.ndarray, k1: jnp.ndarray,
                 c0: jnp.ndarray, c1: jnp.ndarray):
    """Threefry-2x32, 20 rounds. All args uint32, broadcastable; returns the
    two output words. Bit-for-bit identical to JAX's internal threefry
    (tests/test_rng.py::test_matches_jax_threefry)."""
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    ks = (k0, k1, k0 ^ k1 ^ _PARITY)
    x0 = jnp.asarray(c0, jnp.uint32) + k0
    x1 = jnp.asarray(c1, jnp.uint32) + k1
    for block in range(5):
        for r in range(4):
            x0 = x0 + x1
            x1 = _rotl(x1, _ROTATIONS[(4 * block + r) % 8])
            x1 = x1 ^ x0
        x0 = x0 + ks[(block + 1) % 3]
        x1 = x1 + ks[(block + 2) % 3] + np.uint32(block + 1)
    return x0, x1


def _key_words(key: jax.Array):
    """The two uint32 words of a PRNG key (typed or legacy)."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    return key[..., 0].astype(jnp.uint32), key[..., 1].astype(jnp.uint32)


def _bits_to_unit_float(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 bits → float32 uniform in [0, 1): top 23 bits into the mantissa
    of [1, 2), minus 1 (the same construction jax.random.uniform uses)."""
    f = jax.lax.bitcast_convert_type(
        (bits >> np.uint32(9)) | np.uint32(0x3F800000), jnp.float32)
    return f - 1.0


def _ray_bits(key: jax.Array, tag: int, ray_ids: jnp.ndarray,
              n: int) -> jnp.ndarray:
    """[len(ray_ids), n] uint32, entry (i, j) a pure function of
    (key, tag, ray_ids[i], j, n).

    NOTE the ``n``: the two threefry output words are laid out as
    ``[o0 | o1]`` with ``m = ceil(n/2)`` counters, so column j maps to a
    different (word, counter) pair at different ``n`` — streams are stable
    per (tag, n), NOT prefix-stable across different n. Every caller uses a
    fixed n per tag (jitter/resample/noise sample counts), which is what
    the partition-invariance contract needs; do not rely on shared
    prefixes between calls with different n."""
    tagged = jax.random.fold_in(key, tag)
    k0, k1 = _key_words(tagged)
    m = (n + 1) // 2
    c0 = jnp.broadcast_to(ray_ids.astype(jnp.uint32)[:, None],
                          (ray_ids.shape[0], m))
    c1 = jnp.broadcast_to(jnp.arange(m, dtype=jnp.uint32)[None, :], c0.shape)
    o0, o1 = threefry2x32(k0, k1, c0, c1)
    return jnp.concatenate([o0, o1], axis=-1)[:, :n]


def ray_uniform(key: jax.Array, tag: int, ray_ids: jnp.ndarray,
                n: int) -> jnp.ndarray:
    """[len(ray_ids), n] float32 uniforms in [0, 1), partition-invariant:
    row i's stream depends only on (key, tag, ray_ids[i])."""
    return _bits_to_unit_float(_ray_bits(key, tag, ray_ids, n))


def ray_sorted_uniform(key: jax.Array, tag: int, ray_ids: jnp.ndarray,
                       n: int) -> jnp.ndarray:
    """[len(ray_ids), n] float32 uniforms, ASCENDING within each ray.

    Exponential-spacings construction: for ``E_1..E_{n+1}`` iid Exp(1),
    ``u_(i) = (E_1+..+E_i) / (E_1+..+E_{n+1})`` has exactly the joint
    distribution of the ORDER STATISTICS of ``n`` iid U(0,1) draws — i.e.
    this is ``sort(ray_uniform(...))`` distributionally, without the sort.
    Used by the renderer's hierarchical resampling so the inverse-CDF output
    is monotone per ray and the coarse/fine depth union needs only a
    bitonic *merge* instead of a full 192-wide sort. Partition-invariant
    like every other draw here (row i depends only on (key, tag,
    ray_ids[i])).
    """
    u = ray_uniform(key, tag, ray_ids, n + 1)
    # u < 1 strictly, so log1p(-u) is finite; E = -log(1-u) ~ Exp(1).
    e = -jnp.log1p(-u)
    s = jnp.cumsum(e, axis=-1)
    total = jnp.maximum(s[..., -1:], jnp.float32(1e-37))
    # If the (n+1)-th spacing draws exactly 0 (prob 2^-23 per ray), the last
    # ratio would be exactly 1.0; clamp one ulp inside so the documented
    # [0, 1) contract holds for every consumer.
    return jnp.minimum(s[..., :n] / total,
                       np.nextafter(np.float32(1.0), np.float32(0.0),
                                    dtype=np.float32))


def ray_normal(key: jax.Array, tag: int, ray_ids: jnp.ndarray,
               n: int) -> jnp.ndarray:
    """[len(ray_ids), n] float32 standard normals, partition-invariant.

    Same inverse-CDF construction as ``jax.random.normal``:
    ``sqrt(2) · erf_inv(v)`` for ``v`` uniform in (-1, 1); the lower end is
    clamped one ulp inside -1 so erf_inv stays finite.
    """
    u = ray_uniform(key, tag, ray_ids, n)
    lo = np.nextafter(np.float32(-1.0), np.float32(0.0), dtype=np.float32)
    v = jnp.maximum(2.0 * u - 1.0, lo)
    return np.sqrt(2.0).astype(np.float32) * jax.lax.erf_inv(v)


def sample_without_replacement(key: jax.Array, n: int, m: int) -> jnp.ndarray:
    """``n`` DISTINCT uniform indices in ``[0, m)`` in O(n) work.

    ``jax.random.choice(replace=False)`` materializes (and sorts) an O(m)
    permutation on device — ~0.4 ms/step at a 400×400 pixel grid. This
    instead evaluates a keyed random *permutation* of ``[0, m)`` at points
    ``0..n-1`` only: a 4-round balanced Feistel network over ``ceil(log2 m)``
    bits (round function: threefry2x32) made domain-exact by cycle-walking.
    A Feistel PRP with an independent random round key per step is
    statistically indistinguishable from a uniform random permutation for
    sampling purposes; distinctness is structural (it is a bijection).

    The cycle walk re-encrypts out-of-range values; each pass escapes with
    probability ``p = m / 2^bits`` (``p > 1/4`` always — the even-bit
    rounding can put the domain up to 4× above ``m``). The pass count is
    chosen *statically from p* so the per-element miss probability is
    < 2^-40 regardless of where ``m`` falls (misses would yield a
    duplicate, never an out-of-range index — the final ``where`` guard
    clamps into range).
    """
    if n > m:
        raise ValueError(f"cannot draw {n} distinct values from [0, {m})")
    if m <= 2:
        base = jnp.arange(n, dtype=jnp.int32)
        if m == 2:
            return jnp.where(jax.random.bernoulli(key), 1 - base, base)
        return base
    # Even bit count → balanced halves (an unbalanced swap would truncate
    # bits and lose bijectivity).
    total_bits = max(2, (m - 1).bit_length())
    total_bits += total_bits % 2
    hb = total_bits // 2
    mask = np.uint32((1 << hb) - 1)
    k0, k1 = _key_words(key)

    def encrypt(x):
        left = (x >> np.uint32(hb)) & mask
        right = x & mask
        for rnd in range(4):
            f, _ = threefry2x32(k0 ^ np.uint32(rnd), k1, right,
                                jnp.full_like(right, rnd))
            left, right = right, (left ^ f) & mask
        return (left << np.uint32(hb)) | right

    y = encrypt(jnp.arange(n, dtype=jnp.uint32))
    # Cycle walk as a fori_loop (fixed trip count → one compiled body; an
    # unrolled walk costs ~25 s of compile time for no runtime benefit).
    # Trip count from the actual escape probability: (1-p)^passes < 2^-40.
    # p == 1 (m an exact power of two) needs no walk at all — the Feistel
    # domain equals [0, m).
    p = m / float(1 << total_bits)
    passes = (0 if p >= 1.0
              else int(np.ceil(-40.0 * np.log(2.0) / np.log1p(-p))))
    y = jax.lax.fori_loop(
        0, passes,
        lambda _, v: jnp.where(v < np.uint32(m), v, encrypt(v)), y)
    y = jnp.where(y < np.uint32(m), y, jnp.arange(n, dtype=jnp.uint32))
    return y.astype(jnp.int32)
