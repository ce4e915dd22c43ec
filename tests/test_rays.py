"""Tests for pinhole ray generation and NDC projection (ops/rays.py)."""

import jax.numpy as jnp
import numpy as np

from cvnerf_tpu.ops.rays import (
    camera_ray_directions,
    ndc_rays,
    ray_grid,
    rays_for_pixels,
)


def test_center_pixel_points_down_negz():
    # Pixel exactly at the principal point → direction (0, 0, -1) in camera
    # space (reference main.py:35-38 pinhole model).
    d = camera_ray_directions(jnp.array(2.0), jnp.array(2.0), 4.0, 4.0, 10.0)
    np.testing.assert_allclose(np.asarray(d), [0.0, 0.0, -1.0], atol=1e-7)


def test_identity_pose_grid():
    h, w, f = 4, 6, 8.0
    c2w = jnp.eye(4)[:3]
    o, d = ray_grid(h, w, f, c2w)
    assert o.shape == (h, w, 3) and d.shape == (h, w, 3)
    np.testing.assert_allclose(np.asarray(o), 0.0)
    # Hand-computed corner: pixel (x=0, y=0).
    np.testing.assert_allclose(
        np.asarray(d[0, 0]), [(0 - 3.0) / 8.0, -(0 - 2.0) / 8.0, -1.0],
        atol=1e-6)
    # x increases along axis 1, y along axis 0 (row-major grid).
    assert d[0, 1, 0] > d[0, 0, 0]
    assert d[1, 0, 1] < d[0, 0, 1]


def test_rotation_and_translation():
    # 90° rotation about z, translation (1, 2, 3).
    c2w = jnp.array([[0.0, -1.0, 0.0, 1.0],
                     [1.0, 0.0, 0.0, 2.0],
                     [0.0, 0.0, 1.0, 3.0]])
    o, d = rays_for_pixels(jnp.array([2.0]), jnp.array([2.0]), 4.0, 4.0, 10.0,
                           c2w)
    np.testing.assert_allclose(np.asarray(o[0]), [1.0, 2.0, 3.0], atol=1e-7)
    # Camera dir (0,0,-1) rotated by R = still (0,0,-1) for rotation about z.
    np.testing.assert_allclose(np.asarray(d[0]), [0.0, 0.0, -1.0], atol=1e-7)


def test_grid_matches_pixelwise():
    # rays_for_pixels at (x, y) must equal the grid entry [y, x] — the
    # O(n_rays) path replacing the reference's full-grid-then-gather.
    h, w, f = 5, 7, 9.0
    c2w = jnp.array([[0.9, 0.1, 0.0, 0.5],
                     [-0.1, 0.9, 0.2, -1.0],
                     [0.0, -0.2, 1.0, 2.0]])
    og, dg = ray_grid(h, w, f, c2w)
    px = jnp.array([0.0, 3.0, 6.0])
    py = jnp.array([4.0, 2.0, 0.0])
    op, dp = rays_for_pixels(px, py, w, h, f, c2w)
    for i, (x, y) in enumerate(zip([0, 3, 6], [4, 2, 0])):
        np.testing.assert_allclose(np.asarray(op[i]), np.asarray(og[y, x]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(dp[i]), np.asarray(dg[y, x]),
                                   atol=1e-6)


def test_ndc_canonical_near_plane():
    # After the canonical shift, origins sit on the z = -near plane, so
    # ndc o2 = 1 + 2*near/oz = 1 - 2 = -1 (ray start maps to ndc z = -1).
    o = jnp.array([[0.3, -0.2, -0.5]])
    d = jnp.array([[0.1, 0.05, -1.0]])
    ndc_o, ndc_d = ndc_rays(8.0, 8.0, 4.0, 1.0, o, d, variant="canonical")
    np.testing.assert_allclose(np.asarray(ndc_o[..., 2]), -1.0, atol=1e-6)
    # Ray pointing to -inf z maps to ndc z → +1: o2 + d2 = -1 + 2 = 1.
    np.testing.assert_allclose(np.asarray(ndc_o[..., 2] + ndc_d[..., 2]), 1.0,
                               atol=1e-6)


def test_ndc_reference_variant_differs():
    o = jnp.array([[0.3, -0.2, -0.5]])
    d = jnp.array([[0.1, 0.05, -1.0]])
    a = ndc_rays(8.0, 8.0, 4.0, 1.0, o, d, variant="canonical")
    b = ndc_rays(8.0, 8.0, 4.0, 1.0, o, d, variant="reference")
    assert not np.allclose(np.asarray(a[0]), np.asarray(b[0]))


def test_ndc_reference_variant_golden():
    # Numpy re-derivation of the reference get_ndc (data_helpers.py:327-344)
    # including BOTH of its deviations: the o + t*o shift AND directions
    # computed from the already-overwritten NDC origin.
    rng = np.random.RandomState(0)
    o = rng.randn(6, 3).astype(np.float32)
    o[:, 2] = -np.abs(o[:, 2]) - 0.5
    d = rng.randn(6, 3).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    h, w, f, near = 10.0, 8.0, 4.0, 1.0

    tm = -(near + o[:, 2]) / d[:, 2]
    ro = o + tm[:, None] * o                      # deviation (1)
    ori0 = -1.0 / (w / (2 * f)) * ro[:, 0] / ro[:, 2]
    ori1 = -1.0 / (h / (2 * f)) * ro[:, 1] / ro[:, 2]
    ori2 = 1.0 + 2.0 * near / ro[:, 2]
    ndc_o_exp = np.stack([ori0, ori1, ori2], -1)  # r_ori overwritten here
    dir0 = -1.0 / (w / (2 * f)) * (d[:, 0] / d[:, 2] - ori0 / ori2)
    dir1 = -1.0 / (h / (2 * f)) * (d[:, 1] / d[:, 2] - ori1 / ori2)
    dir2 = -2.0 * near / ori2                     # deviation (2)
    ndc_d_exp = np.stack([dir0, dir1, dir2], -1)

    ndc_o, ndc_d = ndc_rays(h, w, f, near, jnp.asarray(o), jnp.asarray(d),
                            variant="reference")
    np.testing.assert_allclose(np.asarray(ndc_o), ndc_o_exp, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ndc_d), ndc_d_exp, rtol=1e-5,
                               atol=1e-6)


def test_ndc_reference_variant_diverges_at_recentered_poses():
    """The reference's o + t*o shift cannot move a camera off the z=0 plane
    (where LLFF recentering puts it): exact z=0 produces non-finite NDC
    coordinates, while the canonical warp stays on the near plane. This is
    the documented evidence for the canonical default (PARITY.md item 3)."""
    import jax.numpy as jnp
    from cvnerf_tpu.ops.rays import ndc_rays
    o = jnp.array([[0.1, -0.2, 0.0]])
    d = jnp.array([[0.01, 0.02, -1.0]])
    co, cd = ndc_rays(96.0, 128.0, 120.0, 1.0, o, d, variant="canonical")
    ro, rd = ndc_rays(96.0, 128.0, 120.0, 1.0, o, d, variant="reference")
    assert np.isfinite(np.asarray(co)).all()
    assert np.isfinite(np.asarray(cd)).all()
    assert np.allclose(np.asarray(co)[0, 2], -1.0)  # on the near plane
    assert not np.isfinite(np.asarray(ro)).all()
