"""Camera-clone state augmentation as a masked block write.

Replaces the reference's covariance reallocation (state_augmentation,
MSCKF/msckf.py:385-407; numba kernel jit_utils.py:137-167) with writes into
the constant-size covariance at the next free clone slot — no realloc, no
dynamic shapes.
"""

import jax.lax as lax
import jax.numpy as jnp

from vio_msckf_tpu.math import quat_to_rot, rot_to_quat, skew
from vio_msckf_tpu.filter.state import FilterState


def augment(state: FilterState) -> FilterState:
    """Append the camera clone for the current IMU pose.

    Clone pose (msckf.py:391-401): R_w_c = R_i_c R_w_i,
    t_c_w = p + R_w_i^T t_c_i. Covariance rows (jit_utils.py:142-166):
    J (6x21) with J[:3,:3]=R_i_c, J[:3,15:18]=I, J[3:6,:3]=skew(R_w_i^T t_c_i),
    J[3:6,12:15]=I, J[3:6,18:21]=I; new block row = J P[:21,:], new diagonal
    = J P11 J^T; then symmetrize (msckf.py:407).
    """
    dtype = state.P.dtype
    R_i_c = state.R_imu_cam0
    t_c_i = state.t_cam0_imu

    R_w_i = quat_to_rot(state.q)
    R_w_c = R_i_c @ R_w_i
    t_c_w = state.p + R_w_i.T @ t_c_i
    q_c = rot_to_quat(R_w_c)

    k = state.n_clones  # next free slot (slot order = age order)
    clone_q = state.clone_q.at[k].set(q_c)
    clone_p = state.clone_p.at[k].set(t_c_w)
    clone_q_null = state.clone_q_null.at[k].set(q_c)
    clone_p_null = state.clone_p_null.at[k].set(t_c_w)
    clone_valid = state.clone_valid.at[k].set(True)

    eye3 = jnp.eye(3, dtype=dtype)
    J = jnp.zeros((6, 21), dtype)
    J = J.at[0:3, 0:3].set(R_i_c)
    J = J.at[0:3, 15:18].set(eye3)
    J = J.at[3:6, 0:3].set(skew(R_w_i.T @ t_c_i))
    J = J.at[3:6, 12:15].set(eye3)
    J = J.at[3:6, 18:21].set(eye3)

    P = state.P
    row = J @ P[:21, :]            # (6, D); zero on inactive columns
    diag = J @ P[:21, :21] @ J.T   # (6, 6)
    start = 21 + 6 * k
    P = _write_clone_block(P, row, diag, start)
    P = (P + P.T) / 2.0

    return state.replace(
        clone_q=clone_q,
        clone_p=clone_p,
        clone_q_null=clone_q_null,
        clone_p_null=clone_p_null,
        clone_valid=clone_valid,
        n_clones=state.n_clones + 1,
        P=P,
    )


def _write_clone_block(P, row, diag, start):
    """Write the 6-row strip, its transpose, and the 6x6 diagonal block at
    dynamic offset `start` (the masked-write equivalent of the covariance
    grow at jit_utils.py:160-166). The diagonal block is written last so it
    overrides the zero columns the strips carry at the new slot."""
    zero = jnp.zeros((), jnp.int32)
    P = lax.dynamic_update_slice(P, row, (start, zero))
    P = lax.dynamic_update_slice(P, row.T, (zero, start))
    P = lax.dynamic_update_slice(P, diag, (start, start))
    return P
