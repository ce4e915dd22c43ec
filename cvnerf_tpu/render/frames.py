"""Full-image and pose-sequence (spiral video) rendering.

Parity targets: reference ``render`` with ``c2w=`` (``main.py:49-87``) and
``render_full`` (``main.py:102-124``).

TPU-first restructure: one jitted program renders a whole frame (ray grid →
viewdir normalize → optional NDC → chunked hierarchical render → reshape);
the pose loop stays on the host but runs *pipelined* — frame i+1's device
computation is dispatched before frame i's result is pulled back, so PNG
encode/IO overlaps device render (the reference renders strictly
sequentially, SURVEY.md §3.3).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from cvnerf_tpu.ops.rays import ndc_rays, ray_grid
from cvnerf_tpu.render.renderer import RenderConfig, render_rays_chunked


@partial(jax.jit,
         static_argnames=("height", "width", "cfg", "ndc", "ndc_variant",
                          "chunk", "mesh"))
def render_image(key: jax.Array,
                 params: dict,
                 height: int,
                 width: int,
                 focal: float,
                 c2w: jnp.ndarray,
                 near: float,
                 far: float,
                 cfg: RenderConfig,
                 ndc: bool = False,
                 ndc_variant: str = "canonical",
                 chunk: int = 4096,
                 mesh=None,
                 occupancy=None) -> dict:
    """Render one ``[H, W]`` frame from a camera pose.

    Matches reference ``render(c2w=...)`` semantics (``main.py:49-87``):
    viewdirs are normalized from the *pre-NDC* world directions, then rays
    are optionally warped to NDC with ``near=1``. With ``mesh``, each ray
    chunk is split across the device mesh (identical pixels, per-ray RNG).
    """
    rays_o, rays_d = ray_grid(height, width, focal, c2w)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    if ndc:
        rays_o, rays_d = ndc_rays(height, width, focal, 1.0, rays_o, rays_d,
                                  variant=ndc_variant)

    out = render_rays_chunked(key, params, rays_o, rays_d, viewdirs,
                              near, far, cfg, chunk=chunk, mesh=mesh,
                              occupancy=occupancy)
    return jax.tree.map(
        lambda x: x.reshape(height, width, *x.shape[1:]), out)


def render(key: jax.Array,
           params: dict,
           height: int,
           width: int,
           focal: float,
           chunk: int = 4096,
           rays: tuple[jnp.ndarray, jnp.ndarray] | None = None,
           c2w: jnp.ndarray | None = None,
           ndc: bool = True,
           near: float = 0.0,
           far: float = 1.0,
           cfg: RenderConfig = RenderConfig(),
           ndc_variant: str = "canonical"):
    """Reference-shaped convenience entry (reference ``render``,
    main.py:49-87): render either a full image from ``c2w`` or an arbitrary
    ``(origins, directions)`` ray batch.

    ``ndc`` defaults to True exactly like the reference (main.py:49) —
    pass ``ndc=False`` for anything that is not a forward-facing LLFF
    scene (the reference's ``create_model`` does the same, main.py:160-161).

    Returns ``(rgb, extras)`` where ``extras`` carries ``rgb_coarse`` /
    ``acc`` / ``depth`` — the reference returns ``[rgb_map, {'rgb_c': ...}]``.
    """
    if (rays is None) == (c2w is None):
        raise ValueError("provide exactly one of rays= or c2w=")
    if c2w is not None:
        out = render_image(key, params, height, width, focal,
                           jnp.asarray(c2w)[:3, :4], near, far, cfg,
                           ndc=ndc, ndc_variant=ndc_variant, chunk=chunk)
    else:
        rays_o, rays_d = rays
        sh = rays_d.shape
        rays_o = jnp.reshape(rays_o, (-1, 3))
        rays_d = jnp.reshape(rays_d, (-1, 3))
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        if ndc:
            rays_o, rays_d = ndc_rays(height, width, focal, 1.0, rays_o,
                                      rays_d, variant=ndc_variant)
        out = render_rays_chunked(key, params, rays_o, rays_d, viewdirs,
                                  near, far, cfg, chunk=chunk)
        out = jax.tree.map(
            lambda x: x.reshape(*sh[:-1], *x.shape[1:]), out)
    rgb = out.pop("rgb")
    return rgb, out


def render_poses_to_frames(key: jax.Array,
                           params: dict,
                           poses,
                           height: int,
                           width: int,
                           focal: float,
                           near: float,
                           far: float,
                           cfg: RenderConfig,
                           ndc: bool = False,
                           ndc_variant: str = "canonical",
                           chunk: int = 4096,
                           factor: int = 0,
                           on_frame: Callable[[int, np.ndarray], None] | None = None,
                           mesh=None,
                           frame_keys: tuple[str, ...] = ("rgb",),
                           occupancy=None,
                           collect: bool = True):
    """Render a pose sequence to ``[N, H, W, 3]`` uint8-ready float frames.

    Reference parity: ``render_full`` (``main.py:102-124``), including the
    optional ``factor`` downscale of H/W/focal (``main.py:105-108``).

    Pipelining: each ``render_image`` call is dispatched asynchronously; the
    host only blocks on frame i when converting it to numpy, by which point
    frame i+1 is already executing on device. ``on_frame(i, rgb)`` (e.g. a
    PNG writer) runs between dispatches, overlapping IO with device compute.

    ``frame_keys`` selects which render outputs to collect (``"rgb"``,
    ``"depth"``, ``"acc"``, ``"rgb_coarse"``). With the default, returns
    the ``[N, H, W, 3]`` RGB array; otherwise a dict of stacked arrays,
    one per requested key (used for depth/disparity videos).

    ``on_frame`` receives RGB frames only — it exists for PNG/preview
    writers. Combining it with a ``frame_keys`` that omits ``"rgb"`` is
    rejected (the callback would silently never fire).

    ``collect=False`` drops each frame after ``on_frame`` consumes it and
    returns None — streaming consumers (cvnerf-eval over a 200-view
    800×800 split ≈ 1.5 GB if stacked) keep one frame of host memory
    instead of the whole sequence. Requires ``on_frame`` (a no-collect,
    no-callback render would do work nobody observes).
    """
    if not collect and on_frame is None:
        raise ValueError("collect=False requires on_frame (nothing would "
                         "observe the frames)")
    if on_frame is not None and "rgb" not in frame_keys:
        raise ValueError(
            "on_frame receives rgb frames; include 'rgb' in frame_keys "
            f"(got {frame_keys!r}) or drop the callback")
    if factor:
        height, width = height // factor, width // factor
        focal = focal / factor

    if len(poses) == 0:
        def empty_for(k):  # rgb maps carry a channel axis; depth/acc don't
            ch = (3,) if k in ("rgb", "rgb_coarse") else ()
            return np.zeros((0, height, width, *ch), np.float32)
        if frame_keys == ("rgb",):
            return empty_for("rgb")
        return {k: empty_for(k) for k in frame_keys}

    keys = jax.random.split(key, len(poses))
    pending: list[tuple[int, dict]] = []
    frames: list[dict | None] = [None] * len(poses)

    def drain(entry):
        i, out = entry
        vals = {k: np.asarray(out[k]) for k in frame_keys}  # blocks frame i
        if collect:
            frames[i] = vals
        if on_frame is not None and "rgb" in vals:
            on_frame(i, vals["rgb"])

    for i, pose in enumerate(poses):
        c2w = jnp.asarray(pose)[:3, :4]
        out = render_image(keys[i], params, height, width, float(focal), c2w,
                           float(near), float(far), cfg, ndc=ndc,
                           ndc_variant=ndc_variant, chunk=chunk, mesh=mesh,
                           occupancy=occupancy)
        pending.append((i, out))
        if len(pending) > 1:  # keep one frame in flight
            drain(pending.pop(0))

    while pending:
        drain(pending.pop(0))
    if not collect:
        return None
    if frame_keys == ("rgb",):
        return np.stack([f["rgb"] for f in frames], 0)
    return {k: np.stack([f[k] for f in frames], 0) for k in frame_keys}
