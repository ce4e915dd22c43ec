"""Golden-value tests for frequency positional encoding (ops/encoding.py)."""

import jax.numpy as jnp
import numpy as np

from cvnerf_tpu.ops.encoding import encoding_dim, freq_encode


def test_output_dims():
    assert encoding_dim(3, 10) == 63
    assert encoding_dim(3, 4) == 27
    x = jnp.ones((5, 3))
    assert freq_encode(x, 10).shape == (5, 63)
    assert freq_encode(x, 4).shape == (5, 27)


def test_zero_freqs_identity():
    x = jnp.arange(6.0).reshape(2, 3)
    np.testing.assert_array_equal(freq_encode(x, 0), x)


def test_golden_values_and_ordering():
    # Layout must be [x, sin(1x), cos(1x), sin(2x), cos(2x), ...] with each
    # term the full input width (reference model.py:15-31 lambda order).
    x = jnp.array([[0.1, -0.2, 0.3]])
    L = 3
    out = np.asarray(freq_encode(x, L))[0]
    xn = np.array([0.1, -0.2, 0.3])
    expected = [xn]
    for k in range(L):
        f = 2.0 ** k
        expected.append(np.sin(xn * f))
        expected.append(np.cos(xn * f))
    expected = np.concatenate(expected)
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)


def test_batch_shapes():
    x = jnp.ones((4, 7, 3))
    assert freq_encode(x, 4).shape == (4, 7, 27)
