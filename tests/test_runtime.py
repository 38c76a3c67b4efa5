"""Native runtime tests: C++ PNG decode + prefetching ring vs PIL oracle."""

import os

import numpy as np
import pytest
from PIL import Image

from vio_msckf_tpu.runtime import native_loader


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(12):
        img = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
        p = str(d / f"{1403636579763555584 + i}.png")
        Image.fromarray(img, mode="L").save(p)
        paths.append((p, img))
    return paths


def test_native_build():
    assert native_loader.available(), "C++ runtime failed to build"


def test_decode_matches_pil(png_dir):
    for path, img in png_dir:
        out = native_loader.load_png_gray(path)
        np.testing.assert_array_equal(out, img)


def test_decode_rgb_and_16bit(tmp_path):
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.png")
    Image.fromarray(rgb, mode="RGB").save(p)
    out = native_loader.load_png_gray(p)
    assert out.shape == (20, 30)  # converted to gray without error


def test_prefetching_loader_ordered(png_dir):
    paths = [p for p, _ in png_dir]
    imgs = [i for _, i in png_dir]
    loader = native_loader.PrefetchingLoader(
        paths, width=64, height=48, ring=3, threads=3
    )
    seen = []
    for idx, frame in loader:
        np.testing.assert_array_equal(frame, imgs[idx])
        seen.append(idx)
    loader.close()
    assert seen == list(range(len(paths)))


def test_loader_throughput_smoke(png_dir):
    """Many passes through the ring to shake out races."""
    paths = [p for p, _ in png_dir] * 8
    loader = native_loader.PrefetchingLoader(
        paths, width=64, height=48, ring=4, threads=4
    )
    count = sum(1 for _ in loader)
    loader.close()
    assert count == len(paths)


def test_imu_bundling_overflow_warns():
    """More pending IMU samples than the frame budget must be deferred to
    the next frame (no loss) and surfaced as a warning (ADVICE r2)."""
    import warnings
    import numpy as np
    from vio_msckf_tpu.data.bundling import bundle_imu_stream

    # 200 Hz IMU, camera frames at 0, 0.05, 0.15 (one dropped at 0.10):
    # the 0.15 frame has ~20 pending samples > M=16.
    imu_t = np.arange(0.0, 0.2, 0.005)
    S = len(imu_t)
    gyro = np.tile(np.arange(S)[:, None], (1, 3)).astype(float)
    acc = gyro + 1000.0
    frames_t = np.array([0.0, 0.05, 0.15])

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        g, a, dt, valid = bundle_imu_stream(imu_t, gyro, acc, frames_t, 16)
    assert any("pending IMU" in str(x.message) for x in w)
    # Frame 2 consumed exactly 16; none lost (the remainder would go to a
    # following frame).
    assert valid[2].sum() == 16
    # The samples frame 2 consumed are the FIRST 16 pending ones.
    consumed = g[2][valid[2]][:, 0]
    assert consumed[0] == 11  # first sample after 0.05
    assert np.all(np.diff(consumed) == 1)

def test_imu_bundling_matches_naive_reference():
    """The O(S) searchsorted bundling must produce the exact outputs of the
    naive per-frame-scan implementation it replaced (VERDICT r4 item 8),
    including overflow deferral and empty frames."""
    import numpy as np
    from vio_msckf_tpu.data.bundling import bundle_imu_stream

    def naive(imu_t, gyro_s, acc_s, frames_t, M):
        Nf = len(frames_t)
        gyro = np.zeros((Nf, M, 3), np.float32)
        acc = np.zeros((Nf, M, 3), np.float32)
        dts = np.zeros((Nf, M), np.float32)
        valid = np.zeros((Nf, M), bool)
        state_ts = frames_t[0]
        for k, ft in enumerate(frames_t):
            if k == 0:
                continue
            sel = np.flatnonzero((imu_t >= state_ts) & (imu_t <= ft))[:M]
            prev = state_ts
            for j, si in enumerate(sel):
                gyro[k, j] = gyro_s[si]
                acc[k, j] = acc_s[si]
                dts[k, j] = imu_t[si] - prev
                valid[k, j] = True
                prev = imu_t[si]
            if len(sel):
                state_ts = imu_t[sel[-1]] + 1e-9
        return gyro, acc, dts, valid

    rng = np.random.default_rng(3)
    # Jittery 200 Hz stream, frames at 20 Hz with two dropped frames and
    # one frame BEFORE any samples (empty selection).
    imu_t = np.cumsum(rng.uniform(0.004, 0.006, 400)) + 0.5
    gyro_s = rng.normal(size=(400, 3))
    acc_s = rng.normal(size=(400, 3))
    frames_t = 0.4 + 0.05 * np.arange(36)
    frames_t = np.delete(frames_t, [7, 8, 20])

    for M in (8, 16, 32):
        got = bundle_imu_stream(imu_t, gyro_s, acc_s, frames_t, M)
        want = naive(imu_t, gyro_s, acc_s, frames_t, M)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
