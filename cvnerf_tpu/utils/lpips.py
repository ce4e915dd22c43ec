"""LPIPS perceptual distance (Zhang et al. 2018), AlexNet variant, in JAX.

Completes the original NeRF paper's metric triple (PSNR / SSIM / LPIPS);
the reference computes none of the three (its only quantitative output is
the raw MSE loss line — SURVEY.md §4). LPIPS needs *pretrained* AlexNet
features plus the LPIPS linear calibration — neither ships in a hermetic
environment — so this module is weights-pluggable by design: the forward
graph is implemented here in JAX (jitted, TPU-ready), and the constants
load from a single ``.npz`` exported once, anywhere torchvision+lpips are
installed, by ``export_weights_script()``'s snippet.

Graph (matching lpips.LPIPS(net='alex', spatial=False, lpips=True)):
  * inputs in [0, 1] are scaled to [-1, 1], then normalized by the fixed
    shift/scale constants;
  * AlexNet's five conv stages (conv→relu, with 3×3/stride-2 max-pools
    after stages 1, 2 — pools sit *before* stages 2, 3 and the features
    taps are post-relu);
  * per tap: channel-unit-normalize, squared difference, a non-negative
    1×1 conv ("lin" calibration), spatial mean, then sum over the 5 taps.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# AlexNet feature-extractor layout: (out_ch, kernel, stride, padding),
# with a 3×3 stride-2 max-pool before stages 2 and 3 (torchvision
# alexnet.features indices 0,3,6,8,10).
_STAGES = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_POOL_BEFORE = (1, 2)          # max-pool precedes these stage indices
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_WEIGHT_KEYS = tuple(
    [f"conv{i}_w" for i in range(5)] + [f"conv{i}_b" for i in range(5)]
    + [f"lin{i}" for i in range(5)])


def load_weights(path: str) -> dict:
    """Load an LPIPS weight bundle (``.npz``; see ``export_weights_script``).

    conv weights are expected in torch OIHW layout; lin weights as
    ``[C]`` per-channel non-negative calibration vectors.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"LPIPS weights not found: {path!r}. Export them once in any "
            "environment with torchvision+lpips installed — run the "
            "snippet from cvnerf_tpu.utils.lpips.export_weights_script().")
    data = np.load(path)
    missing = [k for k in _WEIGHT_KEYS if k not in data]
    if missing:
        raise ValueError(f"{path}: missing LPIPS weight arrays {missing}")
    # Committed device arrays: the jitted scorer then reuses them in place
    # instead of re-uploading ~9 MB of conv weights per scored image pair
    # (the host->device tunnel is the slow path on this platform).
    w = {k: jax.device_put(np.asarray(data[k], np.float32))
         for k in _WEIGHT_KEYS}
    for i, (ch, k, _, _) in enumerate(_STAGES):
        got = w[f"conv{i}_w"].shape
        want_in = 3 if i == 0 else _STAGES[i - 1][0]
        if got != (ch, want_in, k, k):
            raise ValueError(f"conv{i}_w: expected {(ch, want_in, k, k)}, "
                             f"got {got}")
        if w[f"lin{i}"].shape != (ch,):
            raise ValueError(f"lin{i}: expected ({ch},), "
                             f"got {w[f'lin{i}'].shape}")
    return w


def export_weights_script() -> str:
    """The snippet that produces the ``.npz`` this module loads."""
    return (
        "import numpy as np, lpips\n"
        "m = lpips.LPIPS(net='alex')\n"
        "feats = m.net.slice1[0], m.net.slice2[1], m.net.slice3[1], \\\n"
        "        m.net.slice4[0], m.net.slice5[0]\n"
        "out = {}\n"
        "for i, c in enumerate(feats):\n"
        "    out[f'conv{i}_w'] = c.weight.detach().numpy()\n"
        "    out[f'conv{i}_b'] = c.bias.detach().numpy()\n"
        "for i, l in enumerate(m.lins):\n"
        "    out[f'lin{i}'] = l.model[-1].weight.detach().numpy()"
        ".reshape(-1)\n"
        "np.savez('lpips_alex.npz', **out)\n")


def _alexnet_taps(w: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """Post-relu feature maps of the 5 stages. ``x``: [N, 3, H, W]."""
    taps = []
    for i, (_, _, stride, pad) in enumerate(_STAGES):
        if i in _POOL_BEFORE:
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 3, 3),
                                  (1, 1, 2, 2), "VALID")
        x = lax.conv_general_dilated(
            x, jnp.asarray(w[f"conv{i}_w"]),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.nn.relu(x + jnp.asarray(w[f"conv{i}_b"])[None, :, None,
                                                         None])
        taps.append(x)
    return taps


@functools.partial(jax.jit, static_argnames=())
def _lpips_nchw(w: dict, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]

    def prep(x):
        return ((2.0 * x - 1.0) - shift) / scale

    taps_a = _alexnet_taps(w, prep(a))
    taps_b = _alexnet_taps(w, prep(b))
    total = 0.0
    for i, (ta, tb) in enumerate(zip(taps_a, taps_b)):
        def unit(t):
            return t * lax.rsqrt(jnp.sum(t * t, axis=1, keepdims=True)
                                 + 1e-10)
        diff2 = (unit(ta) - unit(tb)) ** 2
        lin = jnp.asarray(w[f"lin{i}"])[None, :, None, None]
        total = total + jnp.mean(jnp.sum(diff2 * lin, axis=1),
                                 axis=(1, 2))
    return total


def lpips_images(a, b, weights: dict | str) -> float:
    """LPIPS distance between two ``[H, W, 3]`` float images in [0, 1].

    ``weights``: a bundle dict from :func:`load_weights` or its path.
    Images smaller than 32×32 are rejected: the stride-4 stem plus the two
    3×3/stride-2 valid pools leave an empty final feature map below 31 px
    (the spatial means would be NaN), matching torch's own failure there.
    """
    if isinstance(weights, str):
        weights = load_weights(weights)
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if a.shape != b.shape or a.ndim != 3 or a.shape[-1] != 3:
        raise ValueError(f"expected matching [H,W,3] images, got "
                         f"{a.shape} vs {b.shape}")
    if min(a.shape[:2]) < 32:
        raise ValueError(f"image too small for AlexNet-LPIPS: {a.shape}")
    na = jnp.transpose(jnp.asarray(a)[None], (0, 3, 1, 2))
    nb = jnp.transpose(jnp.asarray(b)[None], (0, 3, 1, 2))
    return float(_lpips_nchw(weights, na, nb)[0])
