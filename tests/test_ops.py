"""Front-end op tests: distortion roundtrips, FAST detection on synthetic
corners, pyramidal LK on synthetically warped images (the cv2-oracle role
is played by exact synthetic ground truth, since OpenCV is unavailable in
this environment)."""

import numpy as np
import jax.numpy as jnp

from vio_msckf_tpu.config import euroc_config
from vio_msckf_tpu.ops import (
    build_pyramid,
    detect_grid_features,
    distort_points,
    fast_score_map,
    pyramidal_lk,
    undistort_points,
)


def test_radtan_roundtrip(rng):
    cfg = euroc_config()
    cam = cfg.cam0
    pts_n = rng.uniform(-0.5, 0.5, size=(200, 2)).astype(np.float32)
    pix = distort_points(
        jnp.asarray(pts_n), cam.intrinsics, cam.distortion_model,
        cam.distortion_coeffs,
    )
    back = undistort_points(
        pix, cam.intrinsics, cam.distortion_model, cam.distortion_coeffs
    )
    np.testing.assert_allclose(np.asarray(back), pts_n, atol=1e-4)


def test_equidistant_roundtrip(rng):
    intr = (460.0, 458.0, 376.0, 240.0)
    coeffs = (-0.01, 0.02, -0.005, 0.001)
    pts_n = rng.uniform(-0.6, 0.6, size=(100, 2)).astype(np.float32)
    pix = distort_points(jnp.asarray(pts_n), intr, "equidistant", coeffs)
    back = undistort_points(pix, intr, "equidistant", coeffs)
    np.testing.assert_allclose(np.asarray(back), pts_n, atol=1e-4)


def test_undistort_with_rectification(rng):
    """Rectification-matrix path used by stereo prediction
    (image.py:569-575): undistort into cam1's rotated frame then distort
    with cam1 intrinsics must equal direct projection through R."""
    cfg = euroc_config()
    cam0, cam1 = cfg.cam0, cfg.cam1
    R = cfg.T_cn_cnm1_np[:3, :3]
    pts_n = rng.uniform(-0.3, 0.3, size=(50, 2))
    pix0 = distort_points(
        jnp.asarray(pts_n, jnp.float32), cam0.intrinsics,
        cam0.distortion_model, cam0.distortion_coeffs,
    )
    rect = undistort_points(
        pix0, cam0.intrinsics, cam0.distortion_model,
        cam0.distortion_coeffs, rectification_matrix=R,
    )
    # Oracle: rotate the homogeneous normalized point by R.
    h = np.concatenate([pts_n, np.ones((50, 1))], axis=1) @ R.T
    expect = h[:, :2] / h[:, 2:3]
    np.testing.assert_allclose(np.asarray(rect), expect, atol=1e-4)


def _corner_image(H=120, W=160):
    """Blocks with strong corners at known positions."""
    img = np.full((H, W), 40.0, np.float32)
    corners = [(30, 40), (30, 120), (90, 40), (90, 100)]
    for (cy, cx) in corners:
        img[cy:cy + 18, cx:cx + 18] = 220.0
    return img, corners


def test_fast_detects_block_corners():
    img, corners = _corner_image()
    score = np.asarray(fast_score_map(jnp.asarray(img), 15.0))
    assert (score > 0).sum() >= len(corners)
    ys, xs = np.nonzero(score)
    # Every detection sits near a block corner.
    block_corners = []
    for (cy, cx) in corners:
        block_corners += [
            (cy, cx), (cy, cx + 17), (cy + 17, cx), (cy + 17, cx + 17)
        ]
    for y, x in zip(ys, xs):
        d = min(abs(y - by) + abs(x - bx) for by, bx in block_corners)
        assert d <= 3, f"stray detection at {(y, x)}"
    # Border must be clean.
    assert score[:3].sum() == 0 and score[:, :3].sum() == 0


def test_fast_flat_image_empty(rng):
    img = rng.uniform(0, 5, size=(64, 64)).astype(np.float32)
    score = np.asarray(fast_score_map(jnp.asarray(img), 15.0))
    assert (score > 0).sum() == 0


def test_grid_selection():
    img, _ = _corner_image()
    score = fast_score_map(jnp.asarray(img), 15.0)
    mask = jnp.ones(img.shape, bool)
    xy, resp, valid = detect_grid_features(score, mask, 4, 5, 4)
    xy, resp, valid = map(np.asarray, (xy, resp, valid))
    assert valid.any()
    # Selected positions actually carry their reported scores.
    s = np.asarray(score)
    for g in range(xy.shape[0]):
        for k in range(xy.shape[1]):
            if valid[g, k]:
                x, y = int(xy[g, k, 0]), int(xy[g, k, 1])
                assert s[y, x] == resp[g, k]
    # Masking kills selections.
    _, _, v2 = detect_grid_features(score, jnp.zeros(img.shape, bool), 4, 5, 4)
    assert not np.asarray(v2).any()


def _textured_image(rng, H=160, W=200):
    img = rng.uniform(0, 255, size=(H // 8, W // 8))
    img = np.kron(img, np.ones((8, 8)))
    # Smooth a bit so bilinear shifts are well-posed.
    k = np.array([1, 4, 6, 4, 1]) / 16.0
    for ax in (0, 1):
        img = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, img
        )
    return img.astype(np.float32)


def test_lk_recovers_translation(rng):
    img = _textured_image(rng)
    shift = np.array([6.3, -4.7])  # (dx, dy) subpixel
    H, W = img.shape
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    # next(x) = prev(x - shift)  =>  features move by +shift.
    from scipy.ndimage import map_coordinates
    nxt = map_coordinates(
        img, [yy - shift[1], xx - shift[0]], order=1, mode="nearest"
    ).astype(np.float32)

    pts = rng.uniform([30, 30], [W - 30, H - 30], size=(40, 2)).astype(
        np.float32
    )
    pyr0 = build_pyramid(jnp.asarray(img), 3)
    pyr1 = build_pyramid(jnp.asarray(nxt), 3)
    tracked, status, _ = pyramidal_lk(
        tuple(pyr0), tuple(pyr1), jnp.asarray(pts), jnp.asarray(pts)
    )
    tracked, status = np.asarray(tracked), np.asarray(status)
    assert status.mean() > 0.8
    err = np.linalg.norm(tracked[status] - (pts[status] + shift), axis=1)
    assert np.median(err) < 0.25, f"median LK error {np.median(err):.3f}px"


def test_lk_flags_out_of_frame(rng):
    img = _textured_image(rng)
    pyr = tuple(build_pyramid(jnp.asarray(img), 3))
    pts = np.array([[5.0, 5.0]], np.float32)
    init = np.array([[-30.0, -30.0]], np.float32)
    _, status, _ = pyramidal_lk(pyr, pyr, jnp.asarray(pts), jnp.asarray(init))
    # Tracking from a valid point with identity images should succeed even
    # from a bad init (it converges back) OR be flagged; never NaN.
    tracked, _, _ = pyramidal_lk(pyr, pyr, jnp.asarray(pts), jnp.asarray(pts))
    assert np.isfinite(np.asarray(tracked)).all()


def test_pyramid_shapes():
    img = jnp.zeros((480, 752))
    pyr = build_pyramid(img, 3)
    assert [p.shape for p in pyr] == [
        (480, 752), (240, 376), (120, 188), (60, 94)
    ]


def test_lk_verify_matches_separate_passes(rng):
    """The merged finest-level verification pass (lk_verify) must agree
    with two independent single-pair refinements on the same data."""
    from vio_msckf_tpu.ops.klt import lk_verify, prepare_pyramid

    img_a = _textured_image(rng)
    img_b = _textured_image(rng, H=160, W=200)
    shift = np.array([2.1, -1.4])
    H, W = img_a.shape
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    from scipy.ndimage import map_coordinates

    nxt_a = map_coordinates(
        img_a, [yy - shift[1], xx - shift[0]], order=1, mode="nearest"
    ).astype(np.float32)
    nxt_b = map_coordinates(
        img_b, [yy + shift[1], xx + shift[0]], order=1, mode="nearest"
    ).astype(np.float32)

    pts_a = rng.uniform([40, 40], [W - 40, H - 40], size=(24, 2)).astype(
        np.float32)
    pts_b = rng.uniform([40, 40], [W - 40, H - 40], size=(30, 2)).astype(
        np.float32)

    pyr = lambda im: prepare_pyramid(tuple(build_pyramid(jnp.asarray(im), 3)))
    pa, na = pyr(img_a), pyr(nxt_a)
    pb, nb = pyr(img_b), pyr(nxt_b)

    # Start near the solution (verification passes always do).
    init_a = pts_a + shift + rng.normal(size=pts_a.shape) * 0.5
    init_b = pts_b - shift + rng.normal(size=pts_b.shape) * 0.5

    (ga, sa, ea), (gb, sb, eb) = lk_verify(
        pa, na, pb, nb,
        jnp.asarray(pts_a), jnp.asarray(init_a.astype(np.float32)),
        jnp.asarray(pts_b), jnp.asarray(init_b.astype(np.float32)),
    )
    ga, sa = np.asarray(ga), np.asarray(sa)
    gb, sb = np.asarray(gb), np.asarray(sb)
    assert sa.mean() > 0.8 and sb.mean() > 0.8
    err_a = np.linalg.norm(ga[sa] - (pts_a[sa] + shift), axis=1)
    err_b = np.linalg.norm(gb[sb] - (pts_b[sb] - shift), axis=1)
    assert np.median(err_a) < 0.3, np.median(err_a)
    assert np.median(err_b) < 0.3, np.median(err_b)


def test_fast_pallas_matches_xla(rng):
    """The fused Pallas FAST+NMS kernel (interpret mode on CPU) must equal
    the XLA score map exactly — same op order on the same f32 values."""
    from vio_msckf_tpu.ops.fast_pallas import fast_score_map_pallas

    # Structured texture + noise, EuRoC-sized and an odd non-strip-aligned
    # size to exercise the row padding.
    for H, W in ((480, 752), (100, 200)):
        u, v = np.meshgrid(np.arange(W), np.arange(H))
        img = (
            128.0
            + 60.0 * np.sin(0.15 * u) * np.cos(0.11 * v)
            + 20.0 * rng.standard_normal((H, W))
        ).astype(np.float32)
        ref = np.asarray(fast_score_map(jnp.asarray(img), 15.0))
        got = np.asarray(
            fast_score_map_pallas(jnp.asarray(img), 15.0, interpret=True)
        )
        np.testing.assert_allclose(got, ref, atol=1e-4)
        assert (ref > 0).sum() > 50  # the comparison is not vacuous
