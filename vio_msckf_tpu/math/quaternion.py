"""JPL-convention quaternion algebra as branch-free jnp primitives.

Quaternions are stored scalar-last, ``q = [x, y, z, w]``, in the JPL
convention of Trawny & Roumeliotis, "Indirect Kalman Filter for 3D Attitude
Estimation" (Eq. 78): ``quat_to_rot(q)`` returns the rotation matrix that
takes a vector from the *world* frame to the *body* frame when ``q`` is the
world-to-body attitude quaternion.

Semantics parity: reference MSCKF/utils.py:4-128 (skew, to_rotation,
to_quaternion, quaternion_multiplication, small_angle_quaternion,
from_two_vectors — including the Hamilton->JPL conjugate at utils.py:128).
All branches are rewritten as `jnp.where` selections so every function is
jit/vmap/scan-safe with static shapes; everything is dtype-polymorphic
(works in float32 on TPU and float64 under x64 test configs).
"""

import jax.numpy as jnp

_EPS = 1e-12


def skew(v):
    """Skew-symmetric cross-product matrix of a 3-vector (utils.py:4-12).

    Batched: accepts (..., 3) and returns (..., 3, 3).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def quat_normalize(q):
    """Normalize to a unit quaternion (utils.py:55-59)."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conjugate(q):
    """JPL quaternion conjugate: negate the vector part (utils.py:61-65)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_to_rot(q):
    """Quaternion -> rotation matrix, Trawny Eq. 78 (utils.py:14-27).

    R = (2w^2 - 1) I - 2 w [v]x + 2 v v^T, with q normalized first.
    Batched over leading axes.
    """
    q = quat_normalize(q)
    v = q[..., :3]
    w = q[..., 3]
    eye = jnp.eye(3, dtype=q.dtype)
    eye = jnp.broadcast_to(eye, v.shape[:-1] + (3, 3))
    w_ = w[..., None, None]
    vvT = v[..., :, None] * v[..., None, :]
    return (2.0 * w_ * w_ - 1.0) * eye - 2.0 * w_ * skew(v) + 2.0 * vvT


def rot_to_quat(R):
    """Rotation matrix -> JPL quaternion [x,y,z,w] (utils.py:29-53).

    Shepperd's method: four candidate quaternions, one per dominant trace
    combination, selected branch-free with the same decision tree as the
    reference (R22 sign, then R00 vs +/-R11). Batched over leading axes.
    """
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    t0 = 1.0 + r00 - r11 - r22
    q0 = jnp.stack([t0, r01 + r10, r20 + r02, r12 - r21], axis=-1)
    t1 = 1.0 - r00 + r11 - r22
    q1 = jnp.stack([r01 + r10, t1, r21 + r12, r20 - r02], axis=-1)
    t2 = 1.0 - r00 - r11 + r22
    q2 = jnp.stack([r02 + r20, r21 + r12, t2, r01 - r10], axis=-1)
    t3 = 1.0 + r00 + r11 + r22
    q3 = jnp.stack([r12 - r21, r20 - r02, r01 - r10, t3], axis=-1)

    neg_z = (r22 < 0)[..., None]
    q_negz = jnp.where((r00 > r11)[..., None], q0, q1)
    q_posz = jnp.where((r00 < -r11)[..., None], q2, q3)
    q = jnp.where(neg_z, q_negz, q_posz)
    return quat_normalize(q)


def quat_mul(q1, q2):
    """JPL product q1 * q2 via the left L-matrix (utils.py:67-82).

    Both inputs are normalized first and the product is re-normalized,
    matching the reference exactly. Batched over leading axes.
    """
    q1 = quat_normalize(q1)
    q2 = quat_normalize(q2)
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    q = jnp.stack(
        [
            w1 * x2 + z1 * y2 - y1 * z2 + x1 * w2,
            -z1 * x2 + w1 * y2 + x1 * z2 + y1 * w2,
            y1 * x2 - x1 * y2 + w1 * z2 + z1 * w2,
            -x1 * x2 - y1 * y2 - z1 * z2 + w1 * w2,
        ],
        axis=-1,
    )
    return quat_normalize(q)


def small_angle_quat(dtheta):
    """Error-angle 3-vector -> unit quaternion (utils.py:85-101).

    Trawny Eqs. (238)-(239): q = [dtheta/2, sqrt(1 - |dtheta/2|^2)] when the
    half-angle norm is <= 1, else the renormalized [dtheta/2, 1] form.
    Batched over leading axes.
    """
    dq = dtheta / 2.0
    n2 = jnp.sum(dq * dq, axis=-1, keepdims=True)
    w_small = jnp.sqrt(jnp.maximum(1.0 - n2, 0.0))
    q_small = jnp.concatenate([dq, w_small], axis=-1)
    ones = jnp.ones_like(n2)
    q_big = jnp.concatenate([dq, ones], axis=-1) / jnp.sqrt(1.0 + n2)
    return jnp.where(n2 <= 1.0, q_small, q_big)


def from_two_vectors(v0, v1):
    """JPL quaternion rotating v0 onto v1 (utils.py:104-128).

    Builds the Hamilton rotation quaternion (three cases: antiparallel,
    parallel, generic) then conjugates to JPL, exactly as the reference does
    at utils.py:128. Branch-free for jit.
    """
    v0 = v0 / jnp.maximum(jnp.linalg.norm(v0, axis=-1, keepdims=True), _EPS)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), _EPS)
    d = jnp.sum(v0 * v1, axis=-1)

    # Generic case.
    s = jnp.sqrt(jnp.maximum((1.0 + d) * 2.0, _EPS))
    axis_gen = jnp.cross(v0, v1)
    q_gen = jnp.concatenate(
        [axis_gen / s[..., None], 0.5 * s[..., None]], axis=-1
    )

    # Antiparallel: rotate about any axis orthogonal to v0.
    ex = jnp.zeros_like(v0).at[..., 0].set(1.0)
    ey = jnp.zeros_like(v0).at[..., 1].set(1.0)
    ax = jnp.cross(ex, v0)
    ax = jnp.where(
        (jnp.linalg.norm(ax, axis=-1, keepdims=True) < 1e-6),
        jnp.cross(ey, v0),
        ax,
    )
    q_anti = jnp.concatenate([ax, jnp.zeros_like(d)[..., None]], axis=-1)

    # Parallel: identity.
    q_id = jnp.zeros_like(q_gen).at[..., 3].set(1.0)

    q = jnp.where(
        (d < -0.999999)[..., None],
        q_anti,
        jnp.where((d > 0.999999)[..., None], q_id, q_gen),
    )
    q = quat_normalize(q)
    return quat_conjugate(q)  # Hamilton -> JPL, as utils.py:128


def axis_angle_to_rot(rvec):
    """Rodrigues: axis-angle vector -> rotation matrix.

    TPU-native closed form replacing cv2.Rodrigues (reference
    MSCKF/image.py:482-483). Uses the numerically-safe sinc expansions near
    zero angle. Batched over leading axes.
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta < 1e-8
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks.
    safe_t = jnp.where(small, jnp.ones_like(theta), theta)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_t) / safe_t)
    b = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / (safe_t * safe_t)
    )
    K = skew(rvec)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)
