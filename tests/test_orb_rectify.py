"""Tests for ops/rectify.py and ops/orb.py (ESKF front-end kernels)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vio_msckf_tpu.config import euroc_config
from vio_msckf_tpu.ops.rectify import (
    stereo_rectify,
    rectify_map,
    warp_bilinear,
)
from vio_msckf_tpu.ops.distortion import project_points
from vio_msckf_tpu.ops import orb


@pytest.fixture(scope="module")
def cfg():
    return euroc_config()


@pytest.fixture(scope="module")
def rect(cfg):
    return stereo_rectify(cfg.cam0, cfg.cam1, cfg.T_cn_cnm1)


def test_rectify_geometry(cfg, rect):
    """Rectified frames share orientation; baseline lies on -x of rect1."""
    T = np.asarray(cfg.T_cn_cnm1, np.float64)
    R, t = T[:3, :3], T[:3, 3]
    R0, R1 = rect["R_rect0"], rect["R_rect1"]
    # rotations are orthonormal
    for M in (R0, R1):
        assert np.allclose(M @ M.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(M), 1.0)
    # same orientation: R_rect1 @ R == R_rect0
    assert np.allclose(R1 @ R, R0, atol=1e-12)
    t_new = R1 @ t
    assert np.isclose(-t_new[0], rect["baseline"])
    assert np.allclose(t_new[1:], 0.0, atol=1e-12)
    # both cameras rotated by a similar amount (Bouguet split)
    ang0 = np.degrees(np.arccos((np.trace(R0) - 1) / 2))
    ang1 = np.degrees(np.arccos((np.trace(R1) - 1) / 2))
    assert abs(ang0 - ang1) < 2.0


def test_rectified_rows_align(cfg, rect):
    """A 3D point projects to the SAME row in both rectified views."""
    rng = np.random.default_rng(1)
    # points in the rectified (common) frame, in front of both cams
    pts_rect = np.stack([
        rng.uniform(-1.5, 1.5, 20),
        rng.uniform(-1.0, 1.0, 20),
        rng.uniform(3.0, 9.0, 20),
    ], axis=-1)
    fxn, fyn, cxn, cyn = rect["K_new"]
    b = rect["baseline"]
    # cam0 view: x_rect0 = R_rect0 x_c0 -> pixel via K_new
    u0 = fxn * pts_rect[:, 0] / pts_rect[:, 2] + cxn
    v0 = fyn * pts_rect[:, 1] / pts_rect[:, 2] + cyn
    # cam1 rect frame: same orientation, origin shifted +b along x
    u1 = fxn * (pts_rect[:, 0] - b) / pts_rect[:, 2] + cxn
    v1 = fyn * pts_rect[:, 1] / pts_rect[:, 2] + cyn
    assert np.allclose(v0, v1)
    assert np.all(u0 >= u1)  # positive disparity
    # depth from disparity: z = fx * b / disp
    z = fxn * b / (u0 - u1)
    assert np.allclose(z, pts_rect[:, 2], rtol=1e-6)


def test_rectify_map_consistency(cfg, rect):
    """map(rect_pixel) == original distorted pixel of the same ray."""
    m0 = np.asarray(rectify_map(cfg.cam0, rect["R_rect0"], rect["K_new"]))
    fxn, fyn, cxn, cyn = rect["K_new"]
    rng = np.random.default_rng(2)
    W, H = cfg.cam0.resolution
    us = rng.uniform(100, W - 100, 10).astype(int)
    vs = rng.uniform(100, H - 100, 10).astype(int)
    for u, v in zip(us, vs):
        ray_rect = np.array([(u - cxn) / fxn, (v - cyn) / fyn, 1.0])
        ray_cam = rect["R_rect0"].T @ ray_rect
        pix = np.asarray(project_points(
            jnp.asarray(ray_cam, jnp.float32), cfg.cam0.intrinsics,
            cfg.cam0.distortion_model,
            jnp.asarray(cfg.cam0.distortion_coeffs, jnp.float32),
        ))
        assert np.allclose(m0[v, u], pix, atol=2e-2)


def test_warp_bilinear_identity_and_shift():
    img = jnp.asarray(np.random.default_rng(3).uniform(0, 255, (40, 50)),
                      jnp.float32)
    yy, xx = np.mgrid[0:40, 0:50].astype(np.float32)
    ident = jnp.asarray(np.stack([xx, yy], axis=-1))
    out = np.asarray(warp_bilinear(img, ident))
    assert np.allclose(out, np.asarray(img), atol=1e-5)
    shift = jnp.asarray(np.stack([xx + 3, yy], axis=-1))
    out = np.asarray(warp_bilinear(img, shift))
    assert np.allclose(out[:, :-3], np.asarray(img)[:, 3:], atol=1e-5)


def test_hamming_matrix_matches_popcount():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 2, (7, 256)).astype(bool)
    b = rng.integers(0, 2, (9, 256)).astype(bool)
    D = np.asarray(orb.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    ref = (a[:, None, :] ^ b[None, :, :]).sum(-1)
    assert np.array_equal(D.astype(int), ref)


def _textured(rng, H=120, W=160):
    base = rng.uniform(0, 1, (-(-H // 8), -(-W // 8)))
    img = np.kron(base, np.ones((8, 8)))[:H, :W]
    img += rng.uniform(0, 0.08, (H, W))
    return (img * 255).astype(np.float32)


def test_descriptor_self_match():
    rng = np.random.default_rng(5)
    img = jnp.asarray(_textured(rng))
    xy, resp, bits, ang, valid = orb.detect_and_describe(
        img, 20.0, 4, 4, 6
    )
    assert int(valid.sum()) >= 10
    idx, dist, matched = orb.match_crosscheck(bits, valid, bits, valid)
    v = np.asarray(valid)
    assert np.array_equal(np.asarray(idx)[v], np.flatnonzero(v) * 0
                          + np.asarray(idx)[v])  # well-formed
    assert np.all(np.asarray(matched)[v])
    assert np.allclose(np.asarray(dist)[v], 0.0)
    # self-match maps each keypoint to itself
    assert np.array_equal(np.asarray(idx)[v], np.flatnonzero(v))


def test_descriptor_shift_match():
    """Pure-translation pair: matched keypoints displaced by the shift."""
    rng = np.random.default_rng(6)
    big = _textured(rng, 140, 200)
    img_a = jnp.asarray(big[:120, :160])
    img_b = jnp.asarray(big[:120, 6:166])  # shifted left content by 6 px
    xa, _, ba, _, va = orb.detect_and_describe(img_a, 20.0, 4, 4, 6)
    xb, _, bb, _, vb = orb.detect_and_describe(img_b, 20.0, 4, 4, 6)
    idx, dist, matched = orb.match_crosscheck(ba, va, bb, vb, 40.0)
    m = np.asarray(matched)
    assert m.sum() >= 8
    dx = np.asarray(xa)[m, 0] - np.asarray(xb)[np.asarray(idx)[m], 0]
    dy = np.asarray(xa)[m, 1] - np.asarray(xb)[np.asarray(idx)[m], 1]
    med_dx = np.median(dx)
    med_dy = np.median(dy)
    assert abs(med_dx - 6.0) < 1.0, med_dx
    assert abs(med_dy) < 1.0, med_dy
