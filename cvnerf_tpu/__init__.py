"""cvnerf_tpu — a TPU-native NeRF framework (JAX / XLA / Pallas / pjit).

A from-scratch, TPU-first rebuild of the capabilities of the reference PyTorch
NeRF (johnfay11/CV-Nerf): Blender-synthetic and LLFF/COLMAP ingest, pinhole ray
generation, NDC transforms, frequency positional encoding, the coarse/fine
NeRF MLP, stratified + inverse-CDF hierarchical sampling, alpha-composited
volume rendering, a config-driven training loop, and spiral novel-view video
rendering.

Design stance (see SURVEY.md §7): rays are embarrassingly parallel and the
model is tiny, so weights are replicated, ray batches shard over a
``jax.sharding.Mesh``, the per-ray pipeline is fused (XLA + Pallas), every hot
path is jitted, and the host stays out of the loop.
"""

__version__ = "0.1.0"
