"""Multi-host (multi-process) training: 2 JAX processes x 4 CPU devices.

The reference is single-process single-GPU (SURVEY.md §2.4); the TPU-native
design scales over a global mesh with ``jax.distributed``. This test runs
the REAL train step distributed across two coordinated processes on this
machine (DCN-over-localhost) and checks the loss against the same step on a
single-process 8-device mesh — the per-ray RNG keying makes the math
partition-invariant, so the distributed loss must match.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
port, pid = sys.argv[1], int(sys.argv[2])
from cvnerf_tpu.parallel.mesh import initialize_distributed, make_mesh
assert initialize_distributed(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2 and len(jax.devices()) == 8

import numpy as np
import jax.numpy as jnp
from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
from cvnerf_tpu.render.renderer import RenderConfig
from cvnerf_tpu.train.loop import TrainConfig, Trainer
from cvnerf_tpu.train.state import create_train_state

mlp = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=64, head_width=32)
cfg = TrainConfig(height=16, width=16, focal=16.0, near=2.0, far=6.0,
                  n_rays=64, lr=5e-4, lr_decay=250,
                  render=RenderConfig(n_coarse=8, n_fine=8, perturb=True,
                                      noise_std=1.0, mlp=mlp))
rng = np.random.RandomState(0)
images = rng.rand(2, 16, 16, 3).astype(np.float32)
poses = np.stack([np.eye(4, dtype=np.float32)[:3]] * 2)
poses[:, 2, 3] = 4.0
state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                           lr_decay=cfg.lr_decay, mlp=mlp)
tr = Trainer(cfg, state, images, poses, [0, 1], seed=0, mesh=make_mesh())
m = tr.run(1, 4)
print(f"MULTIHOST_LOSS {pid} {m['loss']!r}", flush=True)
"""


def _expected_loss():
    """The same 3 steps on this process's single-process 8-device mesh."""
    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
    from cvnerf_tpu.parallel.mesh import make_mesh
    from cvnerf_tpu.render.renderer import RenderConfig
    from cvnerf_tpu.train.loop import TrainConfig, Trainer
    from cvnerf_tpu.train.state import create_train_state

    mlp = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=64,
                        head_width=32)
    cfg = TrainConfig(height=16, width=16, focal=16.0, near=2.0, far=6.0,
                      n_rays=64, lr=5e-4, lr_decay=250,
                      render=RenderConfig(n_coarse=8, n_fine=8, perturb=True,
                                          noise_std=1.0, mlp=mlp))
    rng = np.random.RandomState(0)
    images = rng.rand(2, 16, 16, 3).astype(np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)[:3]] * 2)
    poses[:, 2, 3] = 4.0
    state = create_train_state(jax.random.PRNGKey(0), lr=cfg.lr,
                               lr_decay=cfg.lr_decay, mlp=mlp)
    tr = Trainer(cfg, state, images, poses, [0, 1], seed=0, mesh=make_mesh())
    return tr.run(1, 4)["loss"]


def test_two_process_train_matches_single_process():
    port = 12000 + os.getpid() % 4000
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)        # workers provision their own devices
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, "-c", _WORKER, str(port),
                               str(pid)],
                              cwd=REPO, env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for pid in (0, 1)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
    losses = []
    for out, _ in outs:
        line = [l for l in out.splitlines() if l.startswith("MULTIHOST_LOSS")]
        assert line, out
        losses.append(float(line[0].split()[-1]))
    # both processes observe the same replicated loss...
    assert losses[0] == losses[1]
    # ...and it matches the single-process 8-device run (partition-invariant
    # per-ray RNG; collectives may round differently, hence the tolerance).
    np.testing.assert_allclose(losses[0], _expected_loss(), rtol=1e-5)


def test_initialize_distributed_noop_without_coordinator(monkeypatch):
    from cvnerf_tpu.parallel.mesh import initialize_distributed
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize_distributed() is False
