"""Device mesh and sharding layout for the ray-data-parallel design.

The reference is single-process single-GPU (reference ``main.py:15``, no
distributed imports anywhere — SURVEY.md §2.4). The TPU-native scaling axis
is rays: they are embarrassingly parallel, the model is ~1.19M params/net, so
the layout is

  * 1-D ``Mesh(('rays',))`` over all chips (ICI-connected within a slice);
  * ray batches sharded on axis 0 over ``'rays'``;
  * params/optimizer state replicated;
  * gradient allreduce inserted by XLA's SPMD partitioner (a ``psum`` over
    ICI) when the jitted train step consumes sharded rays into replicated
    parameter gradients.

Everything here works identically on a virtual CPU mesh
(``--xla_force_host_platform_device_count=N``), which is how multi-chip
logic is tested without hardware.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(devices=None) -> Mesh:
    """A 1-D mesh over all (or the given) devices, named ``'rays'``."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (the ray axis) over the mesh."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
