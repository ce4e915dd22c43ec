"""Cross-framework parity: our encoding+MLP vs a PyTorch build of the
reference architecture (reference model.py:9-107) with identical weights.

This is the strongest C9/C10 parity evidence available without the original
captures: the exact layer graph — 5 ReLU trunk layers, xyz-encoding skip
concat, 3 more ReLU layers, density head off the 8th activation, a no-ReLU
feature layer, viewdir concat, 128-wide ReLU head, linear RGB — evaluated in
the reference's own framework must match our jnp (and therefore Pallas,
which is equivalence-tested against jnp) to float32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cvnerf_tpu.models.nerf_mlp import (
    NerfMLPConfig,
    apply_nerf,
    init_nerf_params,
)
from cvnerf_tpu.ops.encoding import freq_encode


def _torch_freq_embed(x, n_freqs):
    """Reference FreqEmbedding.embed (model.py:15-31) in torch."""
    outs = [x]
    for k in range(n_freqs):
        f = 2.0 ** k
        outs.append(torch.sin(x * f))
        outs.append(torch.cos(x * f))
    return torch.cat(outs, -1)


class _TorchReferenceModel(torch.nn.Module):
    """The reference NeRF MLP graph (model.py:51-107), built in torch."""

    def __init__(self, xyz_dim=63, dir_dim=27, w=256, h=128):
        super().__init__()
        self.xyz_dim, self.dir_dim = xyz_dim, dir_dim
        self.l1 = torch.nn.Linear(xyz_dim, w)
        self.l2 = torch.nn.Linear(w, w)
        self.l3 = torch.nn.Linear(w, w)
        self.l4 = torch.nn.Linear(w, w)
        self.l5 = torch.nn.Linear(w, w)
        self.l6 = torch.nn.Linear(w + xyz_dim, w)
        self.l7 = torch.nn.Linear(w, w)
        self.l8 = torch.nn.Linear(w, w)
        self.l9 = torch.nn.Linear(w, w)
        self.l_alpha = torch.nn.Linear(w, 1)
        self.l10 = torch.nn.Linear(w + dir_dim, h)
        self.l11 = torch.nn.Linear(h, 3)

    def forward(self, x):
        xyz, ang = torch.split(x, [self.xyz_dim, self.dir_dim], dim=-1)
        relu = torch.nn.functional.relu
        out = relu(self.l1(xyz))
        out = relu(self.l2(out))
        out = relu(self.l3(out))
        out = relu(self.l4(out))
        out = relu(self.l5(out))
        out = torch.cat((xyz, out), -1)      # skip: xyz first (model.py:94)
        out = relu(self.l6(out))
        out = relu(self.l7(out))
        out = relu(self.l8(out))
        density = self.l_alpha(out)          # off l8 act (model.py:100)
        out = self.l9(out)                   # no ReLU (model.py:101)
        out = torch.cat([out, ang], -1)
        out = relu(self.l10(out))
        rgb = self.l11(out)
        return torch.cat([rgb, density], -1)


def test_encoding_matches_torch_reference():
    x = np.random.RandomState(0).randn(32, 3).astype(np.float32)
    ours = np.asarray(freq_encode(jnp.asarray(x), 10))
    theirs = _torch_freq_embed(torch.from_numpy(x), 10).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_mlp_matches_torch_reference_with_shared_weights():
    cfg = NerfMLPConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)

    model = _TorchReferenceModel()
    name_map = {"l1": "l1", "l2": "l2", "l3": "l3", "l4": "l4", "l5": "l5",
                "l6": "l6", "l7": "l7", "l8": "l8", "l9": "l9",
                "alpha": "l_alpha", "l10": "l10", "l11": "l11"}
    with torch.no_grad():
        for ours_name, torch_name in name_map.items():
            layer = getattr(model, torch_name)
            # torch Linear stores weight as [out, in]; ours is [in, out].
            layer.weight.copy_(torch.from_numpy(
                np.asarray(params[ours_name]["w"]).T.copy()))
            layer.bias.copy_(torch.from_numpy(
                np.asarray(params[ours_name]["b"]).copy()))

    rng = np.random.RandomState(1)
    pts = rng.randn(64, 3).astype(np.float32) * 2
    dirs = rng.randn(64, 3).astype(np.float32)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)

    xyz_enc = freq_encode(jnp.asarray(pts), 10)
    dir_enc = freq_encode(jnp.asarray(dirs), 4)
    ours = np.asarray(apply_nerf(params, xyz_enc, dir_enc, cfg))

    with torch.no_grad():
        tin = torch.cat([
            _torch_freq_embed(torch.from_numpy(pts), 10),
            _torch_freq_embed(torch.from_numpy(dirs), 4)], -1)
        theirs = model(tin).numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
