"""End-to-end ESKF VIO pipeline: rectified ORB stereo front-end + 18-state
error-state filter, frame-clocked, one jit per frame (or lax.scan over a
whole sequence).

Re-designs the reference's script pipeline (ESKF/eskf_vio.py:94-166 with
ESKF/stereo.py:156-373) TPU-first:

  * cv2 stereoRectify/remap        -> ops/rectify.py (setup on host once,
                                      warp as one dense bilinear gather);
  * cv2 ORB_create + BFMatcher     -> ops/orb.py (oriented FAST + steered
                                      BRIEF; Hamming matching as an MXU
                                      matmul; crossCheck = mutual argmin);
  * the per-frame Python while loop interleaving IMU and image events
                                   -> frame bundles carrying a padded IMU
                                      slice, stepped under lax.scan;
  * per-feature Python EKF loop    -> masked lax.scan (eskf/filter.py).

Fixed shapes throughout: K keypoints per image (grid top-k), K stereo
matches, K temporal matches — validity masks instead of dynamic lists.
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from vio_msckf_tpu.config import VIOConfig, euroc_config
from vio_msckf_tpu.eskf.filter import (
    EskfParams,
    EskfState,
    init_state,
    init_covariance,
    eskf_frame_step,
)
from vio_msckf_tpu.ops.orb import detect_and_describe, match_crosscheck
from vio_msckf_tpu.ops.rectify import (
    stereo_rectify,
    rectify_map,
    warp_bilinear,
)


@dataclass(frozen=True)
class EskfConfig:
    """Front-end + filter knobs (reference values where they exist)."""

    fast_threshold: float = 20.0
    grid_row: int = 8
    grid_col: int = 8
    per_cell: int = 8                 # K = row*col*per_cell keypoints
    match_max_hamming: float = 64.0
    stereo_row_gate_px: float = 2.0   # |v_l - v_r| < 2 (stereo.py:283)
    pixel_sigma: float = 0.5          # image noise sigma in px (eskf_vio.py:67)
    error_threshold_px: float = 10.0  # innovation gate in px (eskf_vio.py:68)
    imu_per_frame: int = 16           # padded IMU samples per frame

    @property
    def n_keypoints(self):
        return self.grid_row * self.grid_col * self.per_cell


@struct.dataclass
class FrontendFrame:
    """Per-frame front-end product kept in the carry for temporal matching:
    the previous frame's left-image descriptors and stereo-matched
    normalized uvd coordinates."""

    bits: jnp.ndarray    # (K, 256) bool — left-image descriptors
    uvd: jnp.ndarray     # (K, 3) normalized (u, v, d)
    valid: jnp.ndarray   # (K,) bool — survived the stereo gates


class EskfVio:
    """The full secondary pipeline.

    Usage:
        vio = EskfVio(vio_config)
        carry = vio.init(first_acc_sample_imu_frame)
        step = jax.jit(vio.step)
        carry, out = step(carry, frame)   # frame: images + IMU slice

    frame keys: cam0_img, cam1_img (H, W) float; imu_gyro, imu_acc (M, 3)
    in IMU/body frame; imu_dt (M,); imu_valid (M,).
    """

    def __init__(self, config: VIOConfig = None, eskf: EskfConfig = None,
                 dtype=jnp.float32):
        self.config = config or euroc_config()
        self.eskf = eskf or EskfConfig()
        self.dtype = dtype

        cfg = self.config
        rect = stereo_rectify(cfg.cam0, cfg.cam1, cfg.T_cn_cnm1)
        self.K_new = rect["K_new"]
        self.baseline = rect["baseline"]
        self._map0 = rectify_map(cfg.cam0, rect["R_rect0"], self.K_new)
        self._map1 = rectify_map(cfg.cam1, rect["R_rect1"], self.K_new)

        # IMU samples are rotated into the RECTIFIED left camera frame up
        # front, like the reference's R_LB (eskf_vio.py:44,106-107).
        T_imu_cam0 = cfg.cam0.T_imu_cam_np
        self.R_imu_rect = np.asarray(
            rect["R_rect0"] @ T_imu_cam0[:3, :3], np.float64
        )

        f = self.K_new[0]
        self.params = EskfParams(
            gyro_noise=cfg.noise.gyro_noise ** 0.5,
            acc_noise=cfg.noise.acc_noise ** 0.5,
            gyro_walk=cfg.noise.gyro_bias_noise ** 0.5,
            acc_walk=cfg.noise.acc_bias_noise ** 0.5,
            meas_cov=jnp.eye(2, dtype=dtype)
            * (self.eskf.pixel_sigma / f) ** 2,
            error_threshold=self.eskf.error_threshold_px / f,
        )

    # ---------------------------------------------------------------- #

    def init(self, first_acc_imu):
        """carry = (state, P, prev_frontend, last_R, last_t).

        first_acc_imu: one accelerometer sample in the IMU frame; gravity
        is initialized from it like eskf_vio.py:77-79.
        """
        g = self.R_imu_rect @ np.asarray(first_acc_imu, np.float64)
        gn = np.linalg.norm(g)
        assert gn > 1e-6, (
            "first accelerometer sample is ~zero; pass a real static-phase "
            "IMU sample (the reference seeds gravity from it, "
            "eskf_vio.py:77-79)"
        )
        g = g * (-9.8 / gn)
        state = init_state(g.astype(np.float32), self.dtype)
        P = init_covariance(self.dtype)
        K = self.eskf.n_keypoints
        prev = FrontendFrame(
            bits=jnp.zeros((K, 256), bool),
            uvd=jnp.zeros((K, 3), self.dtype),
            valid=jnp.zeros((K,), bool),
        )
        return (state, P, prev,
                jnp.eye(3, dtype=self.dtype), jnp.zeros(3, self.dtype))

    # ---------------------------------------------------------------- #

    def _stereo_frontend(self, img0, img1):
        """Rectify, detect+describe both views, stereo-gate matches.

        Returns a FrontendFrame of the left keypoints that found a valid
        stereo partner (normalized uvd per stereo.py:338-373).
        """
        e = self.eskf
        rect0 = warp_bilinear(img0.astype(jnp.float32), self._map0)
        rect1 = warp_bilinear(img1.astype(jnp.float32), self._map1)

        xy0, _, bits0, _, v0 = detect_and_describe(
            rect0, e.fast_threshold, e.grid_row, e.grid_col, e.per_cell
        )
        xy1, _, bits1, _, v1 = detect_and_describe(
            rect1, e.fast_threshold, e.grid_row, e.grid_col, e.per_cell
        )

        idx1, _, matched = match_crosscheck(
            bits0, v0, bits1, v1, e.match_max_hamming
        )
        xy1m = xy1[idx1]
        # Stereo gates: same row (<2 px) and positive disparity u_l >= u_r
        # (stereo.py:282-284).
        row_ok = jnp.abs(xy0[:, 1] - xy1m[:, 1]) < e.stereo_row_gate_px
        disp = xy0[:, 0] - xy1m[:, 0]
        ok = matched & row_ok & (disp >= 0.0)

        fxn, fyn, cxn, cyn = self.K_new
        uvd = jnp.stack([
            (xy0[:, 0] - cxn) / fxn,
            (xy0[:, 1] - cyn) / fyn,
            disp / (fxn * self.baseline),
        ], axis=-1)
        return FrontendFrame(bits=bits0, uvd=uvd, valid=ok)

    def step(self, carry, frame):
        """One stereo frame end to end."""
        state, P, prev, last_R, last_t = carry

        cur = self._stereo_frontend(frame["cam0_img"], frame["cam1_img"])

        # Temporal left-left descriptor matching (stereo.py:317-330).
        idx2, _, tmatched = match_crosscheck(
            prev.bits, prev.valid, cur.bits, cur.valid,
            self.eskf.match_max_hamming,
        )
        uvd1 = prev.uvd
        uvd2 = cur.uvd[idx2]
        match_valid = tmatched & cur.valid[idx2]

        R_ic = jnp.asarray(self.R_imu_rect, self.dtype)
        kf_frame = dict(
            imu_gyro=frame["imu_gyro"] @ R_ic.T,
            imu_acc=frame["imu_acc"] @ R_ic.T,
            imu_dt=frame["imu_dt"],
            imu_valid=frame["imu_valid"],
            uvd1=uvd1,
            uvd2=uvd2,
            match_valid=match_valid,
            last_R=last_R,
            last_t=last_t,
        )
        state, P, innovations = eskf_frame_step(state, P, kf_frame,
                                                self.params)

        # "These variables encode last stereo pose" (eskf_vio.py:164-166).
        carry = (state, P, cur, state.R, state.p)

        inno_norm = jnp.linalg.norm(innovations, axis=-1)
        n_matches = jnp.sum(match_valid)
        inliers = jnp.sum(
            match_valid & (inno_norm < self.params.error_threshold)
        )
        out = dict(
            p=state.p,
            v=state.v,
            R=state.R,
            a_b=state.a_b,
            w_b=state.w_b,
            g=state.g,
            cov_trace=jnp.trace(P),
            n_matches=n_matches,
            n_inliers=inliers,
        )
        return carry, out

    def run_sequence(self, carry, frames):
        return jax.lax.scan(self.step, carry, frames)
