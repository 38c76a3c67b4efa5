from vio_msckf_tpu.frontend.tracker import (
    StereoTracker,
    TrackerState,
)

__all__ = ["StereoTracker", "TrackerState"]
