"""The full VIO engine: stereo front-end + MSCKF back-end in one jitted step.

The reference wires its stages with queues and threads (MSCKF/vio.py:11-65);
here the whole per-frame pipeline — pyramids, FAST, KLT, stereo gates,
IMU-scan propagation, augmentation, triangulation, gated info-form update,
pruning — is a single pure function `step(carry, frame) -> (carry, out)`
compiled once by XLA. Sequences run under `lax.scan` or a host feed loop;
replicas vmap/shard over a device mesh (see vio_msckf_tpu/parallel/).
"""

import jax
import jax.numpy as jnp

from vio_msckf_tpu.config import VIOConfig
from vio_msckf_tpu.filter.msckf import MSCKF
from vio_msckf_tpu.frontend.tracker import StereoTracker


class VIOEngine:
    def __init__(self, config: VIOConfig, dtype=jnp.float32):
        self.config = config
        self.tracker = StereoTracker(config)
        self.kf = MSCKF(config, dtype)

    def init(self, q0=None, bg0=None, gravity=None):
        """Fresh (tracker, filter, feature-map) carry."""
        ts = self.tracker.init()
        state, fmap = self.kf.init(q0, bg0, gravity)
        return (ts, state, fmap)

    def reset(self, carry):
        """Full system reset (reference MSCKF.reset, msckf.py:832-857 +
        the front-end's first-frame re-init): fresh tracker state and a
        fresh filter keeping the current extrinsics estimate."""
        _, state, fmap = carry
        ts = self.tracker.init()
        state, fmap = self.kf.reset(state, fmap)
        return (ts, state, fmap)

    def step(self, carry, frame):
        """One stereo frame end to end.

        frame keys: cam0_img (H,W), cam1_img (H,W), imu_gyro (M,3),
        imu_acc (M,3), imu_dt (M,), imu_valid (M,).
        """
        ts, state, fmap = carry
        ts, msg = self.tracker.step(
            ts, frame["cam0_img"], frame["cam1_img"],
            frame["imu_gyro"], frame["imu_dt"], frame["imu_valid"],
        )
        msg = dict(msg)
        msg.pop("diag")  # tracker observability counters; filter-irrelevant
        kf_frame = dict(
            imu_gyro=frame["imu_gyro"],
            imu_acc=frame["imu_acc"],
            imu_dt=frame["imu_dt"],
            imu_valid=frame["imu_valid"],
            **msg,
        )
        (state, fmap), out = self.kf.step((state, fmap), kf_frame)
        return (ts, state, fmap), out

    def run_sequence(self, carry, frames):
        return jax.lax.scan(self.step, carry, frames)
