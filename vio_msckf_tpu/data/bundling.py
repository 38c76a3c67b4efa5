"""Shared host-side IMU bundling: slice a raw IMU stream into per-frame
padded bundles.

Replicates the boundary logic of the reference's batch_imu_processing
(/root/reference/MSCKF/msckf.py:262-287): each frame consumes the samples in
(state_ts, frame_ts]; dt chains from the previous consumed sample; the first
frame consumes nothing (is_first_img, msckf.py:190-192). One implementation
feeds both the synthetic simulator and the EuRoC CSV reader.
"""

import warnings

import numpy as np


def bundle_imu_stream(imu_t, gyro_s, acc_s, frames_t, max_per_frame):
    """Pad per-frame IMU slices into fixed (Nf, M, ...) arrays.

    imu_t: (S,) sample timestamps. gyro_s/acc_s: (S, 3). frames_t: (Nf,)
    frame timestamps. Returns (gyro (Nf,M,3), acc (Nf,M,3), dt (Nf,M),
    valid (Nf,M)) float32/bool.

    A frame with more than M pending samples (e.g. after a dropped camera
    frame at 200 Hz IMU / 20 Hz camera) consumes the first M; the rest
    stay in the stream and are integrated by the NEXT frame — no samples
    are lost, but that frame's clone pose lags its image timestamp by the
    deferred span, so the overflow is surfaced as a warning.
    """
    M = max_per_frame
    Nf = len(frames_t)
    gyro = np.zeros((Nf, M, 3), np.float32)
    acc = np.zeros((Nf, M, 3), np.float32)
    dts = np.zeros((Nf, M), np.float32)
    valid = np.zeros((Nf, M), bool)

    if Nf == 0:
        return gyro, acc, dts, valid

    overflow_frames = 0
    state_ts = frames_t[0]
    for k, ft in enumerate(frames_t):
        if k == 0:
            continue  # first frame processes no IMU (msckf.py:190-192)
        sel = np.flatnonzero((imu_t >= state_ts) & (imu_t <= ft))
        if len(sel) > M:
            overflow_frames += 1
        sel = sel[:M]
        prev = state_ts
        for j, si in enumerate(sel):
            gyro[k, j] = gyro_s[si]
            acc[k, j] = acc_s[si]
            dts[k, j] = imu_t[si] - prev
            valid[k, j] = True
            prev = imu_t[si]
        if len(sel):
            state_ts = imu_t[sel[-1]] + 1e-9
    if overflow_frames:
        warnings.warn(
            f"{overflow_frames}/{Nf} frames had more than {M} pending IMU "
            "samples (dropped camera frames?); extras were deferred to the "
            "next frame. Raise FilterConfig.imu_per_frame for headroom.",
            stacklevel=2,
        )
    return gyro, acc, dts, valid
