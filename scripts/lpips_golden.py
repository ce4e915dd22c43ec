#!/usr/bin/env python
"""LPIPS golden capture (VERDICT r3 weak #8 / next-round #7).

`cvnerf_tpu/utils/lpips.py` implements the AlexNet-LPIPS graph in JAX, but
this hermetic environment ships neither torchvision's AlexNet weights nor
the `lpips` package, so the implementation is pinned only by math
properties (zero/symmetry/monotonicity). This script closes the loop the
day an environment with those packages exists — run it THERE once:

    python scripts/lpips_golden.py --weights lpips_alex.npz

It then:
  1. exports the reference weights to `.npz` if missing (the snippet from
     `utils.lpips.export_weights_script`, executed when torchvision+lpips
     are importable);
  2. scores a DETERMINISTIC synthetic image pair (seeded gradients +
     checkerboards — no dataset needed) with BOTH the `lpips` package and
     our JAX graph;
  3. writes `results/lpips_golden.json` with the two values and their
     delta, and exits nonzero if they disagree beyond --tol.

Offline / packages absent: prints what is missing and exits 0 (no-op),
like scripts/fetch_datasets.py. The committed golden file then makes
`tests/test_lpips.py::test_against_golden_when_available` a real
regression test wherever weights exist.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def golden_pair(h: int = 64, w: int = 64) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic structured image pair in [0, 1] (no dataset needed)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    a = np.stack([xx / w, yy / h, ((xx + yy) % 16) / 16.0], -1)
    b = np.stack([((xx // 8 + yy // 8) % 2) * np.ones_like(xx),
                  1.0 - xx / w, yy / h], -1).astype(np.float32)
    return a, b


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--weights", default="lpips_alex.npz")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "lpips_golden.json"))
    ap.add_argument("--tol", type=float, default=1e-3)
    args = ap.parse_args(argv)

    # 1. export weights if missing
    if not os.path.exists(args.weights):
        try:
            import lpips  # noqa: F401
            import torch  # noqa: F401
            import torchvision  # noqa: F401
        except ImportError as e:
            print(f"no-op: {e.name} not installed and {args.weights} "
                  f"absent — run this script in an environment with "
                  f"torch+torchvision+lpips to capture the golden.")
            return 0
        from cvnerf_tpu.utils.lpips import export_weights_script
        script = export_weights_script().replace("lpips_alex.npz",
                                                 args.weights)
        exec(compile(script, "<export_weights_script>", "exec"), {})
        print(f"exported reference weights -> {args.weights}")

    # 2. score the deterministic pair with both implementations
    a, b = golden_pair()
    from cvnerf_tpu.utils.lpips import lpips_images, load_weights
    ours = float(lpips_images(a, b, load_weights(args.weights)))

    theirs = None
    try:
        import lpips
        import torch
        net = lpips.LPIPS(net="alex")
        to_t = lambda x: torch.from_numpy(  # noqa: E731
            (x * 2.0 - 1.0).transpose(2, 0, 1)[None]).float()
        with torch.no_grad():
            theirs = float(net(to_t(a), to_t(b)).item())
    except ImportError:
        print("lpips package not installed: recording our value only "
              "(cross-check pending)")

    payload = {"pair": "scripts/lpips_golden.py::golden_pair(64,64)",
               "ours": ours, "lpips_package": theirs,
               "weights_sha256": _sha256(args.weights)}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fp:
        json.dump(payload, fp, indent=2)
    print(json.dumps(payload))
    if theirs is not None and abs(ours - theirs) > args.tol:
        print(f"MISMATCH beyond tol={args.tol}")
        return 1
    return 0


def _sha256(path: str) -> str:
    import hashlib
    h = hashlib.sha256()
    with open(path, "rb") as fp:
        for chunk in iter(lambda: fp.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


if __name__ == "__main__":
    sys.exit(main())
