"""Import reference (PyTorch) NeRF checkpoints into cvnerf_tpu.

The reference's checkpointing never made it into its committed code (its
``.MISSING_LARGE_BLOBS`` lists ``results/lego/*.pt`` every 2,500 steps —
SURVEY.md §0), but users of the reference architecture hold torch
checkpoints of the exact ``Model`` layer graph (reference model.py:51-107):
``nn.Linear`` layers named ``l1``..``l11`` plus ``l_alpha``. This module
maps such a ``state_dict`` onto our functional parameter pytree so a
reference-trained model can be served/fine-tuned here without retraining.

Accepted torch checkpoint layouts (auto-detected):
  * a bare ``state_dict`` of one network;
  * a dict with two networks under any of the common key pairs
    (``coarse``/``fine``, ``model``/``model_fine``, ``network_fn``/
    ``network_fine`` ...), each either a state_dict or a nested
    ``{"state_dict": ...}``;
  * a dict with a single network under one of those keys (fine = coarse).

Architecture (widths, encoding L) is inferred from the weight shapes, so
non-default ``--trunk_width``-style variants import too.

CLI:
    cvnerf-import reference.pt logs/imported
    cvnerf-serve --ckpt logs/imported/checkpoints --height ... (or build a
    scene.json next to it and use --run)
"""

from __future__ import annotations

import os

import numpy as np

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig

# our layer name -> reference nn.Module attribute (reference model.py:57-71)
_NAME_MAP = {
    "l1": "l1", "l2": "l2", "l3": "l3", "l4": "l4", "l5": "l5",
    "l6": "l6", "l7": "l7", "l8": "l8", "l9": "l9",
    "alpha": "l_alpha", "l10": "l10", "l11": "l11",
}

# (coarse, fine) key pairs seen in the wild for two-net NeRF checkpoints.
_NET_KEY_PAIRS = [
    ("coarse", "fine"),
    ("model", "model_fine"),
    ("network_fn", "network_fine"),
    ("network_fn_state_dict", "network_fine_state_dict"),
    ("coarse_model", "fine_model"),
]


def _as_state_dict(obj) -> dict | None:
    """Normalize a candidate network entry to a flat state_dict."""
    if obj is None:
        return None
    if hasattr(obj, "state_dict"):          # a live nn.Module
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and any(k.endswith(".weight") for k in obj):
        return obj
    return None


def params_from_torch_state_dict(sd: dict) -> tuple[dict, NerfMLPConfig]:
    """One reference-``Model`` state_dict → (params pytree, inferred cfg).

    torch ``nn.Linear`` stores ``weight`` as ``[out, in]``; our pytree is
    ``{"w": [in, out], "b": [out]}`` — transposed here. The encoding sizes
    fall out of the shapes: ``l1`` consumes the xyz encoding
    (``3 + 6·L_xyz``), ``l10`` consumes ``trunk + (3 + 6·L_dir)``.
    """
    def arr(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                          else t, np.float32)

    params = {}
    for ours, theirs in _NAME_MAP.items():
        try:
            w = arr(sd[f"{theirs}.weight"])
            b = arr(sd[f"{theirs}.bias"])
        except KeyError as e:
            raise KeyError(
                f"state_dict is missing {e.args[0]!r} — not a reference "
                f"Model checkpoint (expected Linear layers "
                f"{sorted(set(_NAME_MAP.values()))})") from None
        params[ours] = {"w": w.T.copy(), "b": b.copy()}

    xyz_dim = params["l1"]["w"].shape[0]
    trunk = params["l1"]["w"].shape[1]
    head = params["l10"]["w"].shape[1]
    dir_dim = params["l10"]["w"].shape[0] - trunk
    for name, dim in (("xyz", xyz_dim), ("dir", dir_dim)):
        if (dim - 3) % 6:
            raise ValueError(
                f"{name} encoding input dim {dim} is not 3 + 6*L — "
                "not a frequency-encoded reference checkpoint")
    cfg = NerfMLPConfig(xyz_freqs=(xyz_dim - 3) // 6,
                        dir_freqs=(dir_dim - 3) // 6,
                        trunk_width=trunk, head_width=head)
    # Cross-check the remaining shapes against the inferred architecture.
    expect = {
        "l6": (trunk + xyz_dim, trunk),
        "l9": (trunk, trunk),
        "alpha": (trunk, 1),
        "l11": (head, 3),
    }
    for name, shape in expect.items():
        got = params[name]["w"].shape
        if got != shape:
            raise ValueError(
                f"layer {name}: weight shape {got} != {shape} expected "
                f"for the inferred architecture {cfg}")
    return params, cfg


def load_torch_checkpoint(path: str,
                          allow_pickle: bool = False
                          ) -> tuple[dict, NerfMLPConfig]:
    """A ``.pt`` file → ``{"coarse": ..., "fine": ...}`` params + cfg.

    Loads with ``weights_only=True`` (no arbitrary-code pickle execution —
    these checkpoints come from outside this codebase). Checkpoints that
    pickled live ``nn.Module`` objects need ``allow_pickle=True`` /
    ``--allow_pickle``, which runs their pickle code: only use it on
    checkpoints you trust.
    """
    import torch
    try:
        blob = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not allow_pickle:
            raise ValueError(
                f"{path} is not a plain-tensor checkpoint "
                f"(weights_only load failed: {e}). If you trust its "
                "source, retry with allow_pickle=True / --allow_pickle "
                "(this executes the file's pickle code).") from e
        blob = torch.load(path, map_location="cpu", weights_only=False)

    coarse = fine = None
    if isinstance(blob, dict):
        for ck, fk in _NET_KEY_PAIRS:
            c = _as_state_dict(blob.get(ck))
            if c is not None:
                coarse, fine = c, _as_state_dict(blob.get(fk))
                break
    if coarse is None:
        coarse = _as_state_dict(blob)
    if coarse is None:
        raise ValueError(
            f"{path}: unrecognized checkpoint layout — expected a "
            f"state_dict or a dict holding one under {_NET_KEY_PAIRS}")

    params_c, cfg = params_from_torch_state_dict(coarse)
    if fine is not None:
        params_f, cfg_f = params_from_torch_state_dict(fine)
        if cfg_f != cfg:
            raise ValueError(
                f"coarse/fine architectures disagree: {cfg} vs {cfg_f}")
    else:
        params_f = params_c   # single-net checkpoint: serve it as both
    return {"coarse": params_c, "fine": params_f}, cfg


def import_torch_checkpoint(path: str, out_dir: str,
                            step: int = 0,
                            allow_pickle: bool = False) -> NerfMLPConfig:
    """Convert a torch checkpoint into an orbax run checkpoint.

    Writes ``<out_dir>/checkpoints`` (params + fresh optimizer state at
    ``step``) — loadable by ``NerfRenderer``, ``--ft_path``, and resume.
    """
    import os

    import jax
    import jax.numpy as jnp

    from cvnerf_tpu.train.checkpoint import save_checkpoint
    from cvnerf_tpu.train.state import TrainState, create_train_state

    params, cfg = load_torch_checkpoint(path, allow_pickle=allow_pickle)
    template = create_train_state(jax.random.PRNGKey(0), mlp=cfg)
    params = jax.tree.map(jnp.asarray, params)
    state = TrainState(params=params, opt_state=template.opt_state,
                       step=jnp.int32(step))
    save_checkpoint(os.path.join(out_dir, "checkpoints"), state)
    return cfg


def torch_state_dict_from_params(params: dict) -> dict:
    """One network's params pytree → a reference-``Model`` state_dict.

    The inverse of :func:`params_from_torch_state_dict`: weights transpose
    back to torch's ``[out, in]``. Lets a cvnerf_tpu-trained model be
    loaded by reference-architecture PyTorch tooling for validation.
    """
    import torch
    sd = {}
    for ours, theirs in _NAME_MAP.items():
        w = np.asarray(params[ours]["w"], np.float32)
        b = np.asarray(params[ours]["b"], np.float32)
        sd[f"{theirs}.weight"] = torch.from_numpy(w.T.copy())
        sd[f"{theirs}.bias"] = torch.from_numpy(b.copy())
    return sd


def export_torch_checkpoint(ckpt_dir: str, out_path: str,
                            step: int | None = None) -> int:
    """An orbax run checkpoint → a two-net torch ``.pt`` file.

    Writes ``{"coarse": state_dict, "fine": state_dict, "step": N}`` —
    plain tensors only, loadable with ``torch.load(weights_only=True)``.
    Returns the exported step. The architecture is read from the stored
    weight shapes (any template-free restore), so non-default widths
    export too.
    """
    import torch

    from cvnerf_tpu.train.checkpoint import restore_params

    params, got_step = restore_params(ckpt_dir, step=step)
    # Mid-anneal checkpoints (--freq_anneal): the loss only ever trained
    # the weights through the step's frequency window, so export the
    # windowed weights — what every consumer here renders with (serve/eval
    # apply the same transform via scene.json, which in a run-dir layout
    # sits next to the checkpoints dir). Foreign layouts / past-horizon
    # checkpoints export raw weights unchanged.
    import json

    geo = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(ckpt_dir)),
                               "scene.json")) as fp:
            geo = json.load(fp)
    except (OSError, ValueError):
        geo = None   # no/corrupt snapshot: plain export
    fa = geo.get("freq_anneal", 0) if isinstance(geo, dict) else 0
    if isinstance(fa, (int, float)) and int(fa) > 0 and int(got_step) < fa:
        # A valid snapshot that claims an anneal horizon must transform or
        # fail loudly — silently exporting raw weights here would ship
        # untrained high-band rows at full magnitude.
        from cvnerf_tpu.models.nerf_mlp import anneal_model_params
        mlp = NerfMLPConfig(**geo["mlp"])
        params = anneal_model_params(params, mlp, int(got_step) / int(fa))
        print(f"exporting a mid-anneal checkpoint (step {got_step} < "
              f"freq_anneal {int(fa)}): applying the training-time "
              f"frequency window")
    blob = {"coarse": torch_state_dict_from_params(params["coarse"]),
            "fine": torch_state_dict_from_params(params["fine"]),
            "step": int(got_step)}
    torch.save(blob, out_path)
    return int(got_step)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Convert checkpoints between the reference's PyTorch "
                    "format and cvnerf_tpu's orbax format")
    p.add_argument("src", help="import: path to the .pt file; "
                               "--export: the orbax checkpoints dir")
    p.add_argument("dst", help="import: run directory to create (gets a "
                               "checkpoints/ subdir); --export: the .pt "
                               "path to write")
    p.add_argument("--export", action="store_true",
                   help="reverse direction: orbax checkpoint → torch .pt "
                        "({'coarse': state_dict, 'fine': state_dict, "
                        "'step': N}, plain tensors, weights_only-loadable)")
    p.add_argument("--step", type=int, default=None,
                   help="import: step to stamp on the imported state "
                        "(default 0); --export: which checkpoint step to "
                        "export (default latest)")
    p.add_argument("--allow_pickle", action="store_true",
                   help="permit full-pickle checkpoints (EXECUTES the "
                        "file's pickle code — trusted sources only)")
    # Optional scene geometry: with all five given, a scene.json snapshot
    # is written so the imported run serves via `cvnerf-serve --run`.
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--focal", type=float, default=None)
    p.add_argument("--near", type=float, default=None)
    p.add_argument("--far", type=float, default=None)
    p.add_argument("--ndc", action="store_true",
                   help="scene.json NDC mode (forward-facing LLFF scenes)")
    p.add_argument("--white_bkg", action="store_true")
    p.add_argument("--n_coarse_samples", type=int, default=64)
    p.add_argument("--n_fine_samples", type=int, default=128)
    args = p.parse_args(argv)
    if args.export:
        # args.step is None unless given: an explicit --step 0 exports the
        # step-0 checkpoint (the norm for imported runs), not the latest.
        step = export_torch_checkpoint(args.src, args.dst, step=args.step)
        print(f"Exported {args.src} (step {step}) -> {args.dst} "
              "(reference-Model state_dicts under 'coarse'/'fine')")
        return
    cfg = import_torch_checkpoint(args.src, args.dst,
                                  step=0 if args.step is None else args.step,
                                  allow_pickle=args.allow_pickle)
    print(f"Imported {args.src} -> {args.dst}/checkpoints "
          f"(architecture: {cfg})")
    geo = (args.height, args.width, args.focal, args.near, args.far)
    if all(v is not None for v in geo):
        from cvnerf_tpu.serve import write_scene_snapshot
        write_scene_snapshot(
            args.dst, height=args.height, width=args.width,
            focal=args.focal, near=args.near, far=args.far, ndc=args.ndc,
            ndc_variant="canonical", white_bkg=args.white_bkg,
            n_coarse=args.n_coarse_samples, n_fine=args.n_fine_samples,
            bf16=False, mlp=cfg)
        print(f"Serve with: cvnerf-serve --run {args.dst}")
    elif any(v is not None for v in geo):
        print("[WARN] partial geometry given — scene.json needs all of "
              "--height --width --focal --near --far; skipped")
        print("Serve with: cvnerf-serve --ckpt "
              f"{args.dst}/checkpoints --height ...")
    else:
        print("Serve with: cvnerf-serve --ckpt "
              f"{args.dst}/checkpoints --height ... (or re-import "
              "with --height/--width/--focal/--near/--far to enable "
              "`cvnerf-serve --run`)")


if __name__ == "__main__":
    main()
