"""Post-training int8 quantization of the NeRF MLP (serving-only).

The v5e MXU executes int8×int8→int32 dots at twice the bf16 rate (measured
on this chip: a dependent 12×[256,256] int8 chain sustains 151-166 TOPS in
Pallas vs the bf16 kernel's ~129 TF/s and the 134-136 TF/s bf16 chain
ceiling). The reference has no inference story at all (SURVEY.md §2 — it
re-runs the training script to render), so there is nothing to cite for
behavior here; this subsystem is deployment-side acceleration on top of the
same trained checkpoint, gated behind an explicit opt-in
(``NerfRenderer.enable_int8`` / ``cvnerf-serve --int8``) exactly like the
occupancy grid.

Scheme — standard symmetric post-training quantization:

* **Weights**: per-output-channel scales. The *input* activation scales are
  folded into the weight columns before quantization (``W' = W * s_in``),
  so every dot is a pure int8×int8→int32 contraction and dequantization is
  one per-output-channel f32 multiply: ``y = dot_i32 * s_out + b``.
* **Activations**: per-channel scales EVERYWHERE — encodings and hidden
  layers. Per-channel activation quantization is usually avoided because
  requantization then needs a per-channel multiplier, but here it is free:
  the requant multiplier folds into the *producing* layer's per-channel
  dequant scale and the consuming layer folds the activation scales into
  its weight rows, so the runtime epilogue is the same single fused
  multiply-add as per-tensor. (Measured on the trained sphere_hi net:
  per-tensor hidden scales lose several dB to activation outliers;
  per-channel recovers them.) Post-ReLU activations requantize into
  ``[0, 127]`` — the clamp subsumes the ReLU; the signed feature layer and
  the encodings use ``[-127, 127]``.
* **Heads stay f32 out**: sigma and rgb are dequantized accumulators — no
  output quantization error on the values compositing consumes.
* **Calibration**: max-abs over a sample of real network inputs (points
  drawn in the scene volume with unit directions); scales are
  ``max/127``. ``calibrate_nerf_quant`` records the maxima by running the
  float forward once.

Everything here is integer-exact: the Pallas int8 kernel
(``ops/pallas/fused_mlp_int8.py``) reproduces every int8 activation and
head accumulator of ``apply_nerf_quant`` BITWISE (proven by an
equivalence test with power-of-two head scales, where the f32 dequant is
exact); with arbitrary scales the two paths' final head outputs may differ
by one FMA-contraction rounding of ``acc*s + b`` (≤1e-7 absolute — the
compiler may fuse the multiply-add on either path).

Quality/throughput trade (measured on-chip, BASELINE.md): see the int8
serving table; like the occupancy grid this is opt-in per deployment.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
from cvnerf_tpu.ops.encoding import freq_encode

# Hidden activations that carry a scalar scale, in forward order.
_HIDDEN = ("h1", "h2", "h3", "h4", "h5", "h6", "h7", "h8", "feat", "h10")
# Layer name -> the activation feeding it (encodings handled separately).
_LAYERS = ("l1", "l2", "l3", "l4", "l5", "l6", "l7", "l8", "l9", "alpha",
           "l10", "l11")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class QuantizedNerfParams:
    """One network's int8-quantized parameters (a pytree).

    ``layers[name]``: ``{"qw": int8 [fan_in, fan_out], "s": f32 [fan_out],
    "b": f32 [fan_out]}``. ``s`` already includes the folded *input*
    activation scale, and — for every layer whose output is requantized —
    the *output* requantization multiplier ``127/max`` as well (``b``
    likewise), so the whole inter-layer epilogue is
    ``q_next = clip(round(acc_i32 * s + b), lo, 127)`` — one fused
    multiply-add, no separate requant step. The heads (``alpha``, ``l11``)
    keep raw dequant ``s``/``b``: their f32 outputs feed compositing
    directly.

    ``inv_act``: the ``127/max`` quantization multipliers for the two
    runtime-quantized activations, ``enc_x`` [xyz_dim] and ``enc_d``
    [dir_dim] (per-channel — the id rows span the scene bounds while the
    trig rows span [-1, 1]). Stored as the inverse so the oracle and the
    Pallas kernel perform the identical ``round(enc * inv)`` f32 multiply
    (a divide would round differently and break their bitwise equality).

    The renderer dispatches on this type: passing a ``QuantizedNerfParams``
    where a float param pytree is expected routes ``_query_mlp`` through
    the int8 path. Quantization is ephemeral serving state (like the baked
    occupancy grid) — checkpoints always store float params.
    """
    layers: dict
    inv_act: dict

    def tree_flatten(self):
        return (self.layers, self.inv_act), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _maxabs(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    return jnp.max(jnp.abs(x), axis=axis)


def calibrate_nerf_quant(params: dict,
                         cfg: NerfMLPConfig,
                         points: jnp.ndarray,
                         viewdirs: jnp.ndarray) -> dict:
    """Record per-activation maxima from one float forward pass.

    Args:
        params: float param pytree (``models.nerf_mlp``).
        points: ``[n, 3]`` calibration positions — should cover the volume
            the renderer will query (scene bbox samples work; real ray
            samples are better).
        viewdirs: ``[n, 3]`` unit directions.
    Returns:
        dict of f32 per-channel maxima vectors: ``enc_x`` [xyz_dim],
        ``enc_d`` [dir_dim], ``h1..h8``/``h10`` [trunk/head_width],
        ``feat`` [trunk_width] — feed to :func:`quantize_nerf_params`.
    """
    xyz_enc = freq_encode(points.astype(jnp.float32), cfg.xyz_freqs)
    dir_enc = freq_encode(viewdirs.astype(jnp.float32), cfg.dir_freqs)

    def dense(name, x):
        return x @ params[name]["w"] + params[name]["b"]

    relu = jax.nn.relu
    out = {"enc_x": _maxabs(xyz_enc, axis=0), "enc_d": _maxabs(dir_enc, axis=0)}
    h = relu(dense("l1", xyz_enc)); out["h1"] = _maxabs(h, axis=0)
    h = relu(dense("l2", h)); out["h2"] = _maxabs(h, axis=0)
    h = relu(dense("l3", h)); out["h3"] = _maxabs(h, axis=0)
    h = relu(dense("l4", h)); out["h4"] = _maxabs(h, axis=0)
    h = relu(dense("l5", h)); out["h5"] = _maxabs(h, axis=0)
    h = relu(dense("l6", jnp.concatenate([xyz_enc, h], axis=-1)))
    out["h6"] = _maxabs(h, axis=0)
    h = relu(dense("l7", h)); out["h7"] = _maxabs(h, axis=0)
    h = relu(dense("l8", h)); out["h8"] = _maxabs(h, axis=0)
    feat = dense("l9", h); out["feat"] = _maxabs(feat, axis=0)
    h = relu(dense("l10", jnp.concatenate([feat, dir_enc], axis=-1)))
    out["h10"] = _maxabs(h, axis=0)
    return out


def _act_scale(m: jnp.ndarray) -> jnp.ndarray:
    """max-abs -> symmetric int8 scale, zero-range safe."""
    return jnp.maximum(m, 1e-8).astype(jnp.float32) / 127.0


def _quantize_weight(w: jnp.ndarray, s_in: jnp.ndarray,
                     b: jnp.ndarray) -> dict:
    """Fold input scales into ``w``'s rows, quantize per output channel."""
    w_folded = w.astype(jnp.float32) * s_in[:, None]
    s_out = _act_scale(_maxabs(w_folded, axis=0))          # max/127, guarded
    qw = jnp.clip(jnp.round(w_folded / s_out[None, :]), -127, 127)
    return {"qw": qw.astype(jnp.int8), "s": s_out,
            "b": b.astype(jnp.float32)}


def quantize_nerf_params(params: dict,
                         cfg: NerfMLPConfig,
                         calib: dict) -> QuantizedNerfParams:
    """Float param pytree + calibration maxima -> int8 serving params."""
    s_ex = _act_scale(calib["enc_x"])                     # [xyz_dim]
    s_ed = _act_scale(calib["enc_d"])                     # [dir_dim]
    s_h = {k: _act_scale(calib[k]) for k in _HIDDEN}      # [width] vectors

    in_scales = {
        "l1": s_ex,
        "l2": s_h["h1"], "l3": s_h["h2"],
        "l4": s_h["h3"], "l5": s_h["h4"],
        # l6 input order is [xyz_enc | hidden] (reference model.py:94)
        "l6": jnp.concatenate([s_ex, s_h["h5"]]),
        "l7": s_h["h6"], "l8": s_h["h7"],
        "l9": s_h["h8"], "alpha": s_h["h8"],
        # l10 input order is [feat | dir_enc] (reference model.py:103)
        "l10": jnp.concatenate([s_h["feat"], s_ed]),
        "l11": s_h["h10"],
    }
    # The activation whose 127/max requant multiplier folds into each
    # layer's dequant scale+bias; heads (alpha, l11) stay raw-f32 out.
    out_act = {"l1": "h1", "l2": "h2", "l3": "h3", "l4": "h4", "l5": "h5",
               "l6": "h6", "l7": "h7", "l8": "h8", "l9": "feat",
               "l10": "h10"}
    layers = {}
    for name in _LAYERS:
        lay = _quantize_weight(params[name]["w"], in_scales[name],
                               params[name]["b"])
        act = out_act.get(name)
        if act is not None:
            inv = 1.0 / s_h[act]
            lay = {"qw": lay["qw"], "s": lay["s"] * inv, "b": lay["b"] * inv}
        layers[name] = lay
    inv_act = {"enc_x": 1.0 / s_ex, "enc_d": 1.0 / s_ed}
    return QuantizedNerfParams(layers=layers, inv_act=inv_act)


def _requant(y: jnp.ndarray, lo: int) -> jnp.ndarray:
    """Pre-folded f32 pre-activation -> int8; ``lo=0`` folds in the ReLU."""
    return jnp.clip(jnp.round(y), lo, 127).astype(jnp.int8)


def _idot(qa: jnp.ndarray, qw: jnp.ndarray) -> jnp.ndarray:
    """int8 [n, in] @ int8 [in, out] -> int32 [n, out] (exact)."""
    return jax.lax.dot_general(qa, qw, (((qa.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def apply_nerf_quant(qp: QuantizedNerfParams,
                     xyz_enc: jnp.ndarray,
                     dir_enc: jnp.ndarray,
                     cfg: NerfMLPConfig = NerfMLPConfig()) -> jnp.ndarray:
    """Int8 oracle of ``apply_nerf`` on pre-encoded inputs.

    Same layer graph as the float oracle (reference ``model.py:78-107``);
    every dot is int8×int8→int32, dequantized by one per-output-channel f32
    multiply. The Pallas int8 kernel matches this function bitwise.

    Returns ``[..., 4]`` raw (rgb, sigma) float32.
    """
    L, A = qp.layers, qp.inv_act

    def dq(name, qa):
        return (_idot(qa, L[name]["qw"]).astype(jnp.float32) * L[name]["s"]
                + L[name]["b"])

    def quant_enc(enc, inv):
        return jnp.clip(jnp.round(enc.astype(jnp.float32) * inv),
                        -127, 127).astype(jnp.int8)

    q_ex = quant_enc(xyz_enc, A["enc_x"])
    q_ed = quant_enc(dir_enc, A["enc_d"])

    q = _requant(dq("l1", q_ex), 0)
    q = _requant(dq("l2", q), 0)
    q = _requant(dq("l3", q), 0)
    q = _requant(dq("l4", q), 0)
    q = _requant(dq("l5", q), 0)
    q = _requant(dq("l6", jnp.concatenate([q_ex, q], axis=-1)), 0)
    q = _requant(dq("l7", q), 0)
    q = _requant(dq("l8", q), 0)

    sigma = dq("alpha", q)                                  # f32 out
    q_feat = _requant(dq("l9", q), -127)                    # no ReLU
    q = _requant(dq("l10", jnp.concatenate([q_feat, q_ed], axis=-1)), 0)
    rgb = dq("l11", q)                                      # f32 out
    return jnp.concatenate([rgb, sigma], axis=-1)


def quantize_nerf(params: dict,
                  cfg: NerfMLPConfig,
                  points: jnp.ndarray,
                  viewdirs: jnp.ndarray) -> QuantizedNerfParams:
    """Calibrate + quantize in one step (the serving entry point)."""
    calib = calibrate_nerf_quant(params, cfg, points, viewdirs)
    return quantize_nerf_params(params, cfg, calib)


def calibration_samples(key: jax.Array, n: int,
                        bbox_min, bbox_max) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform scene-volume positions + uniform unit directions.

    The volume must cover everything the renderer will query — under-sized
    bounds CLIP the position (id) encoding rows, which is catastrophic
    (measured −12 dB on sphere_hi when calibrated at ±1.5 while rays reach
    |p|≈2.9). When camera poses are available, prefer
    :func:`ray_calibration_samples` (exactly the query distribution).
    Without poses there is no exact bound: rays reach
    ``|p| ≤ |origin| + far``, so a ``±far`` cube under-covers whenever
    cameras sit away from the origin — it is a fallback heuristic, not a
    superset guarantee (NDC scenes are the exception: the NDC box is
    exact).
    """
    kp, kd = jax.random.split(key)
    lo = jnp.asarray(bbox_min, jnp.float32)
    hi = jnp.asarray(bbox_max, jnp.float32)
    pts = jax.random.uniform(kp, (n, 3), jnp.float32) * (hi - lo) + lo
    d = jax.random.normal(kd, (n, 3), jnp.float32)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    return pts, d


def ray_calibration_samples(key: jax.Array, n: int, poses,
                            height: int, width: int, focal: float,
                            near: float, far: float,
                            ndc: bool = False,
                            ndc_variant: str = "canonical",
                            ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Calibration (points, viewdirs) drawn from REAL render queries.

    Samples random pixels across the given camera poses and uniform depths
    in [near, far] along those rays — the exact distribution the renderer
    feeds the MLP (including the NDC warp, under which volume-uniform box
    samples would mis-weight depth). Max-abs calibration only needs
    coverage, so uniform depths (vs stratified per-ray) are sufficient.
    """
    from cvnerf_tpu.ops.rays import ndc_rays, rays_for_pixels
    poses = jnp.asarray(poses, jnp.float32)[:, :3, :4]
    n_pose = poses.shape[0]
    kp, ki, kj, kt = jax.random.split(key, 4)
    pick = jax.random.randint(kp, (n,), 0, n_pose)
    ii = jax.random.randint(ki, (n,), 0, width).astype(jnp.float32)
    jj = jax.random.randint(kj, (n,), 0, height).astype(jnp.float32)
    rays_o, rays_d = jax.vmap(
        lambda x, y, c2w: rays_for_pixels(x, y, width, height, focal, c2w)
    )(ii, jj, poses[pick])
    viewdirs = rays_d / jnp.maximum(
        jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-8)
    if ndc:
        rays_o, rays_d = ndc_rays(height, width, focal, 1.0, rays_o, rays_d,
                                  variant=ndc_variant)
    t = (jax.random.uniform(kt, (n, 1), jnp.float32) * (far - near) + near)
    return rays_o + t * rays_d, viewdirs
