"""SE(3) rigid transforms as (R, t) array pairs.

Replaces the reference's `Isometry3d` object (MSCKF/utils.py:132-152) with
plain-array functions so poses live inside pytrees and vmap cleanly. A pose
is the pair ``(R, t)`` with ``x_out = R @ x + t``; batched over leading axes.
"""

import jax.numpy as jnp


def pose_compose(R1, t1, R2, t2):
    """(R1,t1) * (R2,t2), as Isometry3d.__mul__ (utils.py:149-152)."""
    R = R1 @ R2
    t = jnp.einsum("...ij,...j->...i", R1, t2) + t1
    return R, t


def pose_inverse(R, t):
    """Inverse transform, as Isometry3d.inverse (utils.py:146-147)."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def pose_apply(R, t, x):
    """Apply the transform to points x with shape (..., 3)."""
    return jnp.einsum("...ij,...j->...i", R, x) + t


def pose_matrix(R, t):
    """Pack (R, t) into a 4x4 homogeneous matrix (utils.py:140-144)."""
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def pose_from_matrix(T):
    """Unpack a 4x4 homogeneous matrix into (R, t)."""
    return T[..., :3, :3], T[..., :3, 3]
