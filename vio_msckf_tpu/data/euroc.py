"""EuRoC MAV dataset reader.

Covers the reference's data layer (MSCKF/dataset.py:12-221): ground-truth /
IMU CSV parsing, timestamp-sorted stereo PNG listing with the 0.01 s sync
assertion, and start-time offsetting. Reading is array-oriented (whole CSVs
via numpy, images decoded on demand) instead of per-line generators; image
decode goes through the native C++ loader (vio_msckf_tpu/runtime) when
built, falling back to PIL.
"""

import os

import numpy as np


class EuRoCSequence:
    """One EuRoC sequence directory (…/MH_01_easy with mav0/ inside)."""

    def __init__(self, path, start_offset=0.0):
        mav = os.path.join(path, "mav0")
        self.imu = self._read_imu(os.path.join(mav, "imu0", "data.csv"))
        gt_csv = os.path.join(
            mav, "state_groundtruth_estimate0", "data.csv"
        )
        self.groundtruth = (
            self._read_groundtruth(gt_csv) if os.path.exists(gt_csv) else None
        )
        self.cam0_files, self.cam0_t = self._list_imgs(
            os.path.join(mav, "cam0", "data")
        )
        self.cam1_files, self.cam1_t = self._list_imgs(
            os.path.join(mav, "cam1", "data")
        )
        assert len(self.cam0_files) == len(self.cam1_files), (
            "stereo length mismatch"  # dataset.py:164
        )
        # Stereo sync check (dataset.py:174).
        assert np.all(np.abs(self.cam0_t - self.cam1_t) < 0.01), (
            "unsynced stereo pair"
        )
        self.starttime = max(self.imu["t"][0], self.cam0_t[0])
        self.set_starttime(start_offset)

    @staticmethod
    def _read_imu(path):
        raw = np.genfromtxt(path, delimiter=",", skip_header=1)
        return dict(
            t=raw[:, 0] * 1e-9,
            gyro=raw[:, 1:4],
            acc=raw[:, 4:7],
        )

    @staticmethod
    def _read_groundtruth(path):
        raw = np.genfromtxt(path, delimiter=",", skip_header=1)
        return dict(
            t=raw[:, 0] * 1e-9,
            p=raw[:, 1:4],
            q_wxyz=raw[:, 4:8],
            v=raw[:, 8:11],
            bw=raw[:, 11:14],
            ba=raw[:, 14:17],
        )

    @staticmethod
    def _list_imgs(d):
        names = sorted(
            (f for f in os.listdir(d) if f.endswith(".png")),
            key=lambda x: float(x[:-4]),
        )  # dataset.py:217-221
        t = np.array([float(f[:-4]) * 1e-9 for f in names])
        return [os.path.join(d, f) for f in names], t

    def set_starttime(self, offset):
        """Start-offset masking (dataset.py:210-215; vio.py:88 uses 40 s)."""
        t0 = self.starttime + offset
        self._imu_from = int(np.searchsorted(self.imu["t"], t0))
        self._cam_from = int(np.searchsorted(self.cam0_t, t0))

    @property
    def frame_times(self):
        return self.cam0_t[self._cam_from:]

    def imu_stream(self):
        i = self._imu_from
        return (
            self.imu["t"][i:], self.imu["gyro"][i:], self.imu["acc"][i:]
        )

    def load_image(self, idx, cam=0):
        files = self.cam0_files if cam == 0 else self.cam1_files
        path = files[self._cam_from + idx]
        return load_png_gray(path)

    def __len__(self):
        return len(self.cam0_t) - self._cam_from

    def gt_aligned_positions(self, times):
        """Ground-truth positions interpolated at the given times (for ATE;
        the reference never computes this — SURVEY.md section 4)."""
        gt = self.groundtruth
        if gt is None:
            return None
        return np.stack(
            [np.interp(times, gt["t"], gt["p"][:, k]) for k in range(3)],
            axis=1,
        )


def load_png_gray(path):
    """Decode one grayscale PNG. Uses the native C++ loader when built
    (runtime/euroc_loader.cc), else PIL."""
    from vio_msckf_tpu.runtime import native_loader

    if native_loader.available():
        return native_loader.load_png_gray(path)
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), np.uint8)


def bundle_euroc_frames(seq: EuRoCSequence, config, max_frames=None):
    """Per-frame IMU bundles for an EuRoC sequence (shared slicing logic
    in data/bundling.py; see batch_imu_processing, msckf.py:262-287).

    Returns (frames dict without images, init dict, frame_times).
    """
    from vio_msckf_tpu.data.bundling import bundle_imu_stream
    from vio_msckf_tpu.filter.msckf import initialize_gravity_and_bias

    M = config.filter.imu_per_frame
    imu_t, gyro_s, acc_s = seq.imu_stream()
    if len(imu_t) == 0:
        raise ValueError(
            "no IMU samples after the start offset — the sequence is "
            "shorter than --offset (the reference's 40 s static-start "
            "skip, vio.py:88, assumes a full-length EuRoC run); pass a "
            "smaller --offset"
        )
    n_init = config.filter.init_imu_samples
    q0, bg, gravity = initialize_gravity_and_bias(
        gyro_s[:n_init], acc_s[:n_init]
    )
    t_ready = imu_t[min(n_init, len(imu_t) - 1)]

    frame_t = seq.frame_times
    first = int(np.searchsorted(frame_t, t_ready))
    frames_t = frame_t[first:]
    if max_frames is not None:
        frames_t = frames_t[:max_frames]

    gyro, acc, dts, valid = bundle_imu_stream(
        imu_t, gyro_s, acc_s, frames_t, M
    )

    frames = dict(imu_gyro=gyro, imu_acc=acc, imu_dt=dts, imu_valid=valid)
    init = dict(q0=q0, bg0=bg, gravity=gravity)
    return frames, init, first, frames_t
