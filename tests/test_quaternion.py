"""Unit tests for JPL quaternion math against scipy oracles.

Conventions under test mirror reference MSCKF/utils.py:
  * JPL scalar-last [x,y,z,w]; quat_to_rot is Trawny Eq. 78, which equals
    the transpose of the Hamilton (scipy) matrix for the same components.
  * quat_mul composes as R(q1*q2) = R(q1) @ R(q2).
  * from_two_vectors(v0, v1) returns q with R(q) @ v0 = v1 (utils.py:104-128
    builds Hamilton then conjugates to JPL).
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from vio_msckf_tpu.math import (
    axis_angle_to_rot,
    from_two_vectors,
    quat_mul,
    quat_normalize,
    quat_to_rot,
    rot_to_quat,
    skew,
    small_angle_quat,
)


def random_unit_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_skew(rng):
    v = rng.normal(size=(5, 3))
    S = np.asarray(skew(v))
    for i in range(5):
        a = rng.normal(size=3)
        np.testing.assert_allclose(S[i] @ a, np.cross(v[i], a), atol=1e-6)
        np.testing.assert_allclose(S[i], -S[i].T, atol=1e-7)


def test_quat_to_rot_matches_scipy_transpose(rng):
    q = random_unit_quats(rng, 20)
    R = np.asarray(quat_to_rot(q.astype(np.float32)))
    R_ref = Rotation.from_quat(q).as_matrix().transpose(0, 2, 1)
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_rot_to_quat_roundtrip(rng):
    q = random_unit_quats(rng, 50)
    R = Rotation.from_quat(q).as_matrix().transpose(0, 2, 1)
    q_back = np.asarray(rot_to_quat(R.astype(np.float32)))
    R_back = np.asarray(quat_to_rot(q_back))
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_rot_to_quat_degenerate_axes():
    # 180-degree rotations exercise every branch of Shepperd's selection.
    for axis in np.eye(3):
        R = Rotation.from_rotvec(np.pi * axis).as_matrix().T
        q = np.asarray(rot_to_quat(R.astype(np.float64)))
        np.testing.assert_allclose(
            np.asarray(quat_to_rot(q)), R, atol=1e-6
        )


def test_quat_mul_composes_rotations(rng):
    q1 = random_unit_quats(rng, 10)
    q2 = random_unit_quats(rng, 10)
    q12 = np.asarray(quat_mul(q1.astype(np.float32), q2.astype(np.float32)))
    R12 = np.asarray(quat_to_rot(q12))
    R_expect = np.asarray(quat_to_rot(q1)) @ np.asarray(quat_to_rot(q2))
    np.testing.assert_allclose(R12, R_expect, atol=1e-5)


def test_small_angle_quat(rng):
    dtheta = rng.normal(size=(10, 3)) * 0.01
    q = np.asarray(small_angle_quat(dtheta.astype(np.float32)))
    # Exact small-rotation quaternion (JPL): R(q) approx I - [dtheta]x.
    R = np.asarray(quat_to_rot(q))
    R_expect = Rotation.from_rotvec(-dtheta).as_matrix()
    np.testing.assert_allclose(R, R_expect, atol=1e-4)
    # Large-angle branch stays normalized.
    big = np.asarray(small_angle_quat(np.array([3.0, 0.0, 0.0])))
    np.testing.assert_allclose(np.linalg.norm(big), 1.0, atol=1e-6)


def test_from_two_vectors(rng):
    for _ in range(10):
        v0 = rng.normal(size=3)
        v1 = rng.normal(size=3)
        v0 /= np.linalg.norm(v0)
        v1 /= np.linalg.norm(v1)
        q = np.asarray(from_two_vectors(v0, v1))
        R = np.asarray(quat_to_rot(q))
        np.testing.assert_allclose(R @ v0, v1, atol=1e-5)
    # Parallel and antiparallel cases.
    v = np.array([0.0, 0.0, 1.0])
    q_id = np.asarray(from_two_vectors(v, v))
    np.testing.assert_allclose(
        np.asarray(quat_to_rot(q_id)), np.eye(3), atol=1e-6
    )
    q_flip = np.asarray(from_two_vectors(v, -v))
    np.testing.assert_allclose(
        np.asarray(quat_to_rot(q_flip)) @ v, -v, atol=1e-5
    )


def test_axis_angle_to_rot(rng):
    rvec = rng.normal(size=(10, 3))
    R = np.asarray(axis_angle_to_rot(rvec.astype(np.float32)))
    R_ref = Rotation.from_rotvec(rvec).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)
    # Zero-angle edge case.
    R0 = np.asarray(axis_angle_to_rot(np.zeros(3)))
    np.testing.assert_allclose(R0, np.eye(3), atol=1e-7)


def test_quat_normalize(rng):
    q = rng.normal(size=(4, 4)).astype(np.float32)
    qn = np.asarray(quat_normalize(q))
    np.testing.assert_allclose(
        np.linalg.norm(qn, axis=-1), np.ones(4), atol=1e-6
    )
