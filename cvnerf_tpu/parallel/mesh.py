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

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Opt-in multi-host (multi-process) initialization.

    One JAX process per host: ICI connects chips within a slice, DCN
    connects slices/hosts (SURVEY.md §2.4 "Collectives backend"). Call this
    BEFORE any other JAX API. Configuration comes from the arguments or,
    when they are None, the standard environment variables
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``
    — also settable via ``main.py --coordinator ...``). Returns True when
    distributed mode was initialized; without a coordinator address this is
    a no-op returning False, so single-host runs are untouched.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return False
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_mesh(devices=None) -> Mesh:
    """A 1-D mesh over all (or the given) devices, named ``'rays'``.

    Under multi-process JAX (``initialize_distributed``), ``jax.devices()``
    is the GLOBAL device list, so the mesh spans every chip of every host;
    jit inserts the gradient ``psum`` over ICI within a slice and DCN
    across hosts automatically.
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (the ray axis) over the mesh."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_to_mesh(x, mesh: Mesh):
    """Fully replicate host data ``x`` onto every device of ``mesh``.

    Single-process: a plain ``device_put``. Multi-process: each process
    holds the same host value (our dataset/state pattern — loaders are
    deterministic and seeds are shared), so the global replicated array is
    assembled from per-local-device copies without any cross-host transfer.
    """
    sh = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(x, sh)

    def one(leaf):
        leaf = np.asarray(leaf)
        local = [jax.device_put(leaf, d) for d in mesh.local_devices]
        return jax.make_array_from_single_device_arrays(leaf.shape, sh,
                                                        local)

    return jax.tree.map(one, x)
