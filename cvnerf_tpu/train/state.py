"""Train state: coarse+fine params, Adam state, step counter.

Optimizer parity with the reference: Adam(lr, betas=(0.9, 0.999)) over the
merged coarse+fine parameter list (reference ``main.py:144``), with the
exponential decay ``lr * 0.1 ** (step / (1000 * lr_decay))`` the reference
applies by mutating param groups after each update (``main.py:388-394``).
``optax.exponential_decay`` reproduces that schedule exactly (continuous,
non-staircase): optax's update count k equals the reference's ``i - 1``, and
the reference's update at iter i uses the lr assigned at iter i-1.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig, init_nerf_params


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """A pytree carrying everything that changes during training."""
    params: Any      # {"coarse": pytree, "fine": pytree}
    opt_state: Any
    step: jnp.ndarray  # scalar int32
    # Polyak/EMA average of ``params`` (``--ema_decay``): the deployable
    # weights of an EMA run — the raw params are the noisy last SGD
    # iterate. ``None`` when EMA is off, in which case the pytree keeps
    # the pre-EMA structure (None flattens to zero leaves), so existing
    # checkpoints, jitted programs, and consumers are unaffected.
    ema_params: Any = None


def make_lr_schedule(lr: float, lr_decay: int) -> optax.Schedule:
    """``lr * 0.1 ** (k / (1000 * lr_decay))`` (reference main.py:276-277,
    DECAY_RATE=0.1 / DECAY_SIZE=1000 at main.py:388-389)."""
    return optax.exponential_decay(
        init_value=lr,
        transition_steps=1000 * lr_decay,
        decay_rate=0.1,
        staircase=False,
    )


def make_optimizer(lr: float, lr_decay: int) -> optax.GradientTransformation:
    return optax.adam(learning_rate=make_lr_schedule(lr, lr_decay),
                      b1=0.9, b2=0.999)


def create_train_state(key: jax.Array,
                       lr: float = 5e-4,
                       lr_decay: int = 250,
                       mlp: NerfMLPConfig = NerfMLPConfig(),
                       ema: bool = False) -> TrainState:
    """Fresh coarse+fine networks and Adam state (reference main.py:127-146).

    ``ema=True`` allocates the Polyak-average slot initialized AT the
    fresh params (the standard bias-free warm start: the average then
    tracks the trajectory from step 0 instead of decaying away from a
    zero init); pair with ``TrainConfig.ema_decay > 0``.
    """
    k_c, k_f = jax.random.split(key)
    params = {
        "coarse": init_nerf_params(k_c, mlp),
        "fine": init_nerf_params(k_f, mlp),
    }
    opt = make_optimizer(lr, lr_decay)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        step=jnp.zeros((), jnp.int32),
        # A deep copy, not an alias: the donated step program would
        # otherwise see the same buffer twice (donate(a), donate(a)).
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )
