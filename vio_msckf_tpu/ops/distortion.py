"""Camera distortion models as vmappable closed forms.

TPU-native replacement for the reference's cv2 calls
(undistort_points / distort_points, MSCKF/image.py:640-702): radtan
(plumb-bob, 4 coefficients) and equidistant (fisheye) forward models in
closed form, inverses by fixed-point iteration — the same scheme OpenCV's
`undistortPoints` uses internally. Supports the rectification-matrix +
new-intrinsics path the front-end uses for stereo prediction
(image.py:569-575).

All functions take points of shape (..., 2) and are jit/vmap-safe.
"""

import jax.numpy as jnp

_ITERS = 10  # fixed-point iterations (cv2 uses 5; a few extra cost nothing)


def _radtan_forward(xy, coeffs):
    """Normalized -> distorted normalized, plumb-bob k1 k2 p1 p2."""
    k1, k2, p1, p2 = coeffs
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def _equidistant_forward(xy, coeffs):
    """Normalized -> distorted normalized, Kannala-Brandt k1..k4."""
    k1, k2, k3, k4 = coeffs
    x, y = xy[..., 0], xy[..., 1]
    r = jnp.sqrt(x * x + y * y)
    r_safe = jnp.maximum(r, 1e-12)
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    scale = jnp.where(r > 1e-8, theta_d / r_safe, 1.0)
    return xy * scale[..., None]


def _forward(xy, coeffs, model):
    if model == "equidistant":
        return _equidistant_forward(xy, coeffs)
    return _radtan_forward(xy, coeffs)


def _inverse(xyd, coeffs, model):
    """Distorted normalized -> undistorted normalized via fixed-point
    iteration x_{k+1} = x_d - (distort(x_k) - x_k)."""
    xy = xyd
    for _ in range(_ITERS):
        err = _forward(xy, coeffs, model) - xy
        xy = xyd - err
    return xy


def _K_of(intrinsics, dtype):
    fx, fy, cx, cy = intrinsics
    return jnp.asarray(
        [[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype
    )


def undistort_points(
    pts,
    intrinsics,
    distortion_model,
    distortion_coeffs,
    rectification_matrix=None,
    new_intrinsics=(1.0, 1.0, 0.0, 0.0),
):
    """Pixel points -> (optionally rectified) normalized or re-projected
    points, mirroring image.py:640-674.

    With default `new_intrinsics = (1,1,0,0)` the output is normalized image
    coordinates (the front-end's publish path, image.py:419-424).
    """
    dtype = pts.dtype
    fx, fy, cx, cy = intrinsics
    xy_d = jnp.stack(
        [(pts[..., 0] - cx) / fx, (pts[..., 1] - cy) / fy], axis=-1
    )
    xy = _inverse(xy_d, distortion_coeffs, distortion_model)
    if rectification_matrix is not None:
        R = jnp.asarray(rectification_matrix, dtype)
        h = jnp.concatenate(
            [xy, jnp.ones_like(xy[..., :1])], axis=-1
        ) @ R.T
        xy = h[..., 0:2] / jnp.maximum(h[..., 2:3], 1e-12)
    nfx, nfy, ncx, ncy = new_intrinsics
    return jnp.stack(
        [xy[..., 0] * nfx + ncx, xy[..., 1] * nfy + ncy], axis=-1
    )


def distort_points(pts_normalized, intrinsics, distortion_model,
                   distortion_coeffs):
    """Normalized points -> distorted pixel points (image.py:676-702)."""
    xy_d = _forward(pts_normalized, distortion_coeffs, distortion_model)
    fx, fy, cx, cy = intrinsics
    return jnp.stack(
        [xy_d[..., 0] * fx + cx, xy_d[..., 1] * fy + cy], axis=-1
    )


def project_points(p_cam, intrinsics, distortion_model, distortion_coeffs):
    """3D camera-frame points -> distorted pixels (pinhole + distortion)."""
    z = jnp.maximum(p_cam[..., 2:3], 1e-9)
    return distort_points(
        p_cam[..., 0:2] / z, intrinsics, distortion_model, distortion_coeffs
    )
