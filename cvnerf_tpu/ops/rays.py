"""Pinhole ray generation and NDC projection.

Parity targets: reference ``main.py:19-46`` (``compute_rays``) and
``data_helpers.py:327-344`` (``get_ndc``). Both are pure jnp functions, safe
under ``jit`` / ``vmap`` / ``shard_map``.

TPU-first deviation from the reference: the reference builds a full H×W ray
grid every training iteration and then gathers ≤4096 pixels from it
(reference ``main.py:351-372`` — the single biggest host-side waste, SURVEY.md
§2.3-7). Here ``rays_for_pixels`` generates rays *only* for the sampled pixel
ids, so the per-step geometry cost is O(n_rays), not O(H·W).
"""

from __future__ import annotations

import jax.numpy as jnp


def camera_ray_directions(px_x: jnp.ndarray, px_y: jnp.ndarray,
                          width: float, height: float,
                          focal: float) -> jnp.ndarray:
    """Camera-space ray directions for pixel coordinates.

    The pinhole model of reference ``main.py:35-38``:
    ``d = ((x - W/2)/f, -(y - H/2)/f, -1)`` — x right, y down in pixel space,
    camera looks down -z with y up in camera space.

    Args:
        px_x: pixel column coordinates ``[...]`` (float or int).
        px_y: pixel row coordinates ``[...]``.
    Returns:
        ``[..., 3]`` camera-space directions (not normalized).
    """
    px_x = jnp.asarray(px_x, jnp.float32)
    px_y = jnp.asarray(px_y, jnp.float32)
    d_x = (px_x - width * 0.5) / focal
    d_y = -(px_y - height * 0.5) / focal
    return jnp.stack([d_x, d_y, -jnp.ones_like(d_x)], axis=-1)


def rays_for_pixels(px_x: jnp.ndarray, px_y: jnp.ndarray,
                    width: float, height: float, focal: float,
                    c2w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World-space ray (origins, directions) for an arbitrary set of pixels.

    Rotation by ``c2w[:3, :3]`` and origin broadcast from ``c2w[:3, -1]``,
    matching reference ``main.py:41-46`` but evaluated only at the requested
    pixels.

    Args:
        px_x, px_y: ``[...]`` pixel coordinates.
        c2w: ``[3, 4]`` (or ``[4, 4]``) camera-to-world matrix.
    Returns:
        (origins ``[..., 3]``, directions ``[..., 3]``).
    """
    dirs_cam = camera_ray_directions(px_x, px_y, width, height, focal)
    # Row-vector rotate: sum_k dirs[k] * R[:, k]  == R @ d.
    dirs_world = jnp.einsum("...k,jk->...j", dirs_cam, c2w[:3, :3])
    origins = jnp.broadcast_to(c2w[:3, -1], dirs_world.shape)
    return origins, dirs_world


def rays_for_pixels_batched(px_x: jnp.ndarray, px_y: jnp.ndarray,
                            width: float, height: float, focal: float,
                            c2w: jnp.ndarray
                            ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray-camera variant of :func:`rays_for_pixels`.

    ``c2w`` is ``[..., 3, 4]`` batched to match the pixel arrays: each ray
    gets its own camera. Used by cross-image ray batching
    (``--ray_batching``, ``train/loop.py``), where one training batch draws
    pixels from every training view at once — the original NeRF paper's
    training mode for real captures, absent from the reference (its step
    always samples a single image, ``main.py:347-349``). Intrinsics
    (width/height/focal) are shared, which holds for every loader here.
    """
    dirs_cam = camera_ray_directions(px_x, px_y, width, height, focal)
    dirs_world = jnp.einsum("...k,...jk->...j", dirs_cam, c2w[..., :3, :3])
    origins = jnp.broadcast_to(c2w[..., :3, -1], dirs_world.shape)
    return origins, dirs_world


def ray_grid(height: int, width: int, focal: float,
             c2w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full-image ray grid ``([H, W, 3], [H, W, 3])``.

    Equivalent to reference ``compute_rays`` (``main.py:19-46``): row-major
    grid, x varying along the second axis.
    """
    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    return rays_for_pixels(px, py, width, height, focal, c2w)


def ndc_rays(height: float, width: float, focal: float, near: float,
             rays_o: jnp.ndarray, rays_d: jnp.ndarray,
             variant: str = "canonical") -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project rays to normalized device coordinates (forward-facing scenes).

    ``variant="canonical"`` is the standard NeRF NDC warp (shift origins to
    the near plane along the ray direction, then apply the perspective map).
    ``variant="reference"`` reproduces the reference's ``get_ndc``
    (``data_helpers.py:327-344``) exactly, including both of its deviations
    from canonical NeRF: (1) the near-plane shift moves the origin along
    *itself* (``o + t·o``, data_helpers.py:330) instead of along the ray,
    and (2) ``r_ori`` is overwritten with the NDC origin *before* the
    direction components are computed (data_helpers.py:336-340), so the
    reference's directions mix ray slopes with NDC-origin components. Kept
    behind a flag for bit-parity studies (SURVEY.md §2.3-3).

    WARNING: the reference variant is numerically unusable on recentered
    forward-facing captures (the standard LLFF pipeline): the ``o + t·o``
    shift cannot move a camera off the z≈0 plane recentering puts it on,
    so origins project to |z| >> 1 (outside the NDC frustum) and exactly
    z=0 yields inf/NaN — measured: a 3k-step train run under this variant
    NaNs, and a camera at z=0.013 lands its NDC origin at ~77. The
    reference itself could never exercise this code end-to-end (its HEAD
    crashes at the ``batchify_rays`` NameError first, main.py:79). This is
    the evidence for the canonical default.

    Args:
        rays_o, rays_d: ``[..., 3]`` world-space rays.
    Returns:
        (ndc origins, ndc directions), both ``[..., 3]``.
    """
    sx = -1.0 / (width / (2.0 * focal))
    sy = -1.0 / (height / (2.0 * focal))

    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    if variant == "reference":
        rays_o = rays_o + t[..., None] * rays_o
    elif variant == "canonical":
        rays_o = rays_o + t[..., None] * rays_d
    else:
        raise ValueError(f"unknown NDC variant: {variant!r}")

    o0 = sx * rays_o[..., 0] / rays_o[..., 2]
    o1 = sy * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    if variant == "reference":
        # The reference computes directions AFTER overwriting the origin
        # with its NDC coordinates (data_helpers.py:336-341).
        d0 = sx * (rays_d[..., 0] / rays_d[..., 2] - o0 / o2)
        d1 = sy * (rays_d[..., 1] / rays_d[..., 2] - o1 / o2)
        d2 = -2.0 * near / o2
    else:
        d0 = sx * (rays_d[..., 0] / rays_d[..., 2]
                   - rays_o[..., 0] / rays_o[..., 2])
        d1 = sy * (rays_d[..., 1] / rays_d[..., 2]
                   - rays_o[..., 1] / rays_o[..., 2])
        d2 = -2.0 * near / rays_o[..., 2]

    ndc_o = jnp.stack([o0, o1, o2], axis=-1)
    ndc_d = jnp.stack([d0, d1, d2], axis=-1)
    return ndc_o, ndc_d


# Reference-name alias: ``compute_rays(h, w, f, pose)`` (reference
# main.py:19-46) is ``ray_grid`` — identical argument order and returns.
compute_rays = ray_grid
