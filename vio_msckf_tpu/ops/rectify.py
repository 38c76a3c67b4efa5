"""Stereo rectification: Bouguet-style rotation split + XLA bilinear warp.

TPU-native replacement for the reference ESKF pipeline's use of
cv2.stereoRectify / cv2.initUndistortRectifyMap / cv2.remap
(ESKF/stereo.py:96-153, 240-250). The rectifying rotations and the new
common projection are computed once on the host in float64; the per-frame
image warp is a dense bilinear gather that XLA vectorizes over the whole
image — no per-pixel Python.

Geometry. Given x_c1 = R @ x_c0 + t (cam0 -> cam1), we pick rotations
R_rect0 (cam0 -> rect) and R_rect1 (cam1 -> rect) such that

  * both rectified frames share one orientation:  R_rect1 @ R = R_rect0;
  * the baseline lies on the rectified x-axis:    R_rect1 @ t = (-b, 0, 0).

As in Bouguet's method, the relative rotation is split in half (each camera
rotates by ~R^(1/2)) before aligning the baseline, so neither image is
warped much more than the other.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vio_msckf_tpu.ops.distortion import distort_points


def _rotvec_to_mat(r):
    angle = np.linalg.norm(r)
    if angle < 1e-12:
        return np.eye(3)
    a = r / angle
    K = np.array(
        [[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def _mat_to_rotvec(R):
    cos = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    angle = np.arccos(cos)
    if angle < 1e-12:
        return np.zeros(3)
    axis = np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    ) / (2.0 * np.sin(angle))
    return axis * angle


def stereo_rectify(cam0, cam1, T_cn_cnm1, zoom=1.0):
    """Host-side (numpy, float64) rectification setup.

    cam0/cam1: CameraConfig; T_cn_cnm1: 4x4, vec_cam0 -> vec_cam1.

    Returns a dict with R_rect0, R_rect1 (3x3), K_new (fx, fy, cx, cy),
    baseline (meters), and T_rect_cam0 (the rect frame expressed relative
    to cam0, = R_rect0).
    """
    T = np.asarray(T_cn_cnm1, np.float64)
    R, t = T[:3, :3], T[:3, 3]

    # Half-rotation split (Bouguet): rotate cam1 back by half the relative
    # rotation, cam0 forward by the other half.
    om = _mat_to_rotvec(R)
    R_half1 = _rotvec_to_mat(-om / 2.0)  # applied to cam1
    t_half = R_half1 @ t

    # Align the (half-rotated) baseline with the x-axis: the rectified
    # x-axis must satisfy x_rect . t_half = -|t| (so cam0's origin sits at
    # (-b, 0, 0) in the rectified cam1 frame, i.e. rect x points from cam0
    # toward cam1 — positive disparity u_l - u_r).
    e1 = -t_half / np.linalg.norm(t_half)
    # e2 orthogonal to e1 with no z-component (keeps image rows ~level).
    e2 = np.array([-e1[1], e1[0], 0.0])
    n2 = np.linalg.norm(e2)
    if n2 < 1e-9:  # degenerate: baseline along z
        e2 = np.array([0.0, 1.0, 0.0])
    else:
        e2 = e2 / n2
    e3 = np.cross(e1, e2)
    A = np.stack([e1, e2, e3])  # rows = rect axes in half-rotated frame

    R_rect1 = A @ R_half1
    R_rect0 = R_rect1 @ R
    baseline = float(np.linalg.norm(t))

    W, H = cam0.resolution
    fx, fy = cam0.intrinsics[0], cam0.intrinsics[1]
    f_new = zoom * (fx + fy) / 2.0
    K_new = (f_new, f_new, W / 2.0, H / 2.0)

    # Invariants (cheap, catch convention bugs at setup time).
    t_new = R_rect1 @ t
    assert abs(t_new[0] + baseline) < 1e-9, t_new
    assert np.allclose(t_new[1:], 0.0, atol=1e-9), t_new
    assert np.allclose(R_rect1 @ R, R_rect0, atol=1e-12)

    return dict(
        R_rect0=R_rect0,
        R_rect1=R_rect1,
        K_new=K_new,
        baseline=baseline,
    )


def rectify_map(cam, R_rect, K_new):
    """Inverse map for the rectified image: for every output pixel, the
    source pixel in the original (distorted) image.

    Returns (H, W, 2) float32 (x, y) source coordinates.
    """
    W, H = cam.resolution
    fxn, fyn, cxn, cyn = K_new
    u = (jnp.arange(W, dtype=jnp.float32) - cxn) / fxn
    v = (jnp.arange(H, dtype=jnp.float32) - cyn) / fyn
    xn, yn = jnp.meshgrid(u, v)  # (H, W)
    rays = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)  # rect frame
    rays = rays @ jnp.asarray(R_rect, jnp.float32)  # == R_rect.T @ ray
    xy = rays[..., 0:2] / jnp.maximum(rays[..., 2:3], 1e-9)
    return distort_points(
        xy, cam.intrinsics, cam.distortion_model,
        jnp.asarray(cam.distortion_coeffs, jnp.float32),
    )


def warp_bilinear(img, map_xy):
    """Sample `img` (H, W) at map_xy (H', W', 2); zeros outside."""
    H, W = img.shape
    x = map_xy[..., 0]
    y = map_xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def at(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        val = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb, val, 0.0)

    v00 = at(y0i, x0i)
    v01 = at(y0i, x0i + 1)
    v10 = at(y0i + 1, x0i)
    v11 = at(y0i + 1, x0i + 1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
