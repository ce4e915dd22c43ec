"""Checkpoint/resume determinism: train N steps straight vs train k steps,
save, restore, train N-k — identical parameters (step-keyed RNG + exact
fp32 state round-trip)."""

import jax
import jax.numpy as jnp
import numpy as np

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
from cvnerf_tpu.render.renderer import RenderConfig
from cvnerf_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from cvnerf_tpu.train.loop import TrainConfig, Trainer
from cvnerf_tpu.train.state import create_train_state

TINY = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=32, head_width=16)


def _setup():
    cfg = TrainConfig(
        height=12, width=12, focal=12.0, near=2.0, far=6.0,
        n_rays=32, lr=5e-3, lr_decay=250,
        render=RenderConfig(n_coarse=4, n_fine=4, perturb=True,
                            noise_std=1.0, mlp=TINY))
    rng = np.random.RandomState(0)
    images = rng.rand(2, 12, 12, 3).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)[:3]] * 2)
    poses[:, 2, 3] = 4.0
    return cfg, images, poses


def test_resume_bitwise_matches_straight_run(tmp_path):
    cfg, images, poses = _setup()

    def fresh():
        state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                                   lr_decay=cfg.lr_decay, mlp=TINY)
        return Trainer(cfg, state, images, poses, [0, 1], seed=3)

    # Straight: steps 1..10.
    tr_a = fresh()
    tr_a.run(1, 11)
    w_a = np.asarray(tr_a.state.params["fine"]["l1"]["w"])

    # Split: steps 1..5, checkpoint, restore into a new trainer, 6..10.
    tr_b = fresh()
    tr_b.run(1, 6)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, tr_b.state)

    template = create_train_state(jax.random.PRNGKey(42), lr=cfg.lr,
                                  lr_decay=cfg.lr_decay, mlp=TINY)
    restored = restore_checkpoint(ckpt, template)
    assert int(restored.step) == 5
    tr_c = Trainer(cfg, restored, images, poses, [0, 1], seed=3)
    tr_c.run(int(restored.step) + 1, 11)
    w_c = np.asarray(tr_c.state.params["fine"]["l1"]["w"])

    np.testing.assert_array_equal(w_a, w_c)
