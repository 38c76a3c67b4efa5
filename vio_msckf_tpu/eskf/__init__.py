"""Loosely-coupled 18-state Error-State Kalman Filter VIO (secondary
pipeline, mirroring the reference's ESKF/ capability — ESKF/vio.py,
ESKF/eskf_vio.py, ESKF/stereo.py — as one scanned jit)."""

from vio_msckf_tpu.eskf.filter import (
    EskfParams,
    EskfState,
    init_state,
    init_covariance,
    propagate,
    update_features,
    eskf_frame_step,
)
from vio_msckf_tpu.eskf.pipeline import EskfVio, EskfConfig

__all__ = [
    "EskfParams",
    "EskfState",
    "init_state",
    "init_covariance",
    "propagate",
    "update_features",
    "eskf_frame_step",
    "EskfVio",
    "EskfConfig",
]
