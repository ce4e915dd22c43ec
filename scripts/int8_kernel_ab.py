"""On-chip A/B: fused int8 kernel vs fused bf16 kernel (forward, serving).

Interleaved in-process measurement per the repo bench discipline (compile
both, alternate windows, sync via device scalar pull). Also the on-chip
compile validation for the int8 kernel's tile sizes — the CPU interpreter
enforces no VMEM limit, so only this run proves a tile fits.

Usage: python scripts/int8_kernel_ab.py [--pts 1048576] [--tiles 1024,2048,4096]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(jax.device_get(x.ravel()[0]))


def bench(fn, *args, reps=20, windows=5):
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(*args)
        sync(y)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pts", type=int, default=1 << 20)
    ap.add_argument("--tiles", default="1024,2048,4096")
    args = ap.parse_args()

    from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig, init_nerf_params
    from cvnerf_tpu.ops.pallas.fused_mlp import (_forward_flops,
                                                 fused_nerf_apply)
    from cvnerf_tpu.ops.pallas.fused_mlp_int8 import fused_nerf_apply_int8
    from cvnerf_tpu.ops.quantize import calibration_samples, quantize_nerf

    cfg = NerfMLPConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    cal_p, cal_d = calibration_samples(jax.random.PRNGKey(1), 1 << 16,
                                       (-1.5,) * 3, (1.5,) * 3)
    qp = quantize_nerf(params, cfg, cal_p, cal_d)
    pts, dirs = calibration_samples(jax.random.PRNGKey(2), args.pts,
                                    (-1.5,) * 3, (1.5,) * 3)
    pts, dirs = jax.device_put(pts), jax.device_put(dirs)
    flops = _forward_flops(cfg) * args.pts

    bf16 = jax.jit(lambda p, d: fused_nerf_apply(
        params, p, d, cfg, jnp.bfloat16, 4096))
    t_b = bench(bf16, pts, dirs)
    print(f"bf16 kernel (tile 4096): {t_b*1e3:8.3f} ms  "
          f"{flops/t_b/1e12:6.1f} TF/s")

    for tile in [int(t) for t in args.tiles.split(",")]:
        f = jax.jit(lambda p, d, t=tile: fused_nerf_apply_int8(
            qp, p, d, cfg, tile=t))
        try:
            sync(f(pts, dirs))
        except Exception as e:
            print(f"int8 kernel (tile {tile}): COMPILE FAIL "
                  f"{type(e).__name__}: {str(e)[:200]}")
            continue
        # Interleave against bf16 within the same process.
        t_i = bench(f, pts, dirs)
        t_b2 = bench(bf16, pts, dirs)
        print(f"int8 kernel (tile {tile}): {t_i*1e3:8.3f} ms  "
              f"{flops/t_i/1e12:6.1f} TF/s   "
              f"speedup vs bf16 {min(t_b, t_b2)/t_i:5.2f}x")


if __name__ == "__main__":
    main()
