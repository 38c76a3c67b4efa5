"""End-to-end EuRoC ON-DISK pipeline test.

No real EuRoC data can exist in this environment (zero egress), so this
test materializes a rendered sequence in the exact EuRoC MAV directory
layout (mav0/{imu0,cam0,cam1,state_groundtruth_estimate0}, ns timestamps,
CSV headers, per-frame PNGs — reference dataset.py:12-221) and drives the
full `--path` flow: directory scan, CSV parse, stereo sync assert, PNG
decode through the native prefetch loader, static gravity init, the
per-frame jitted engine, TUM trajectory output, and SE3-aligned ATE
against the interpolated ground truth. Everything a real-dataset run
exercises except the photons.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vio_msckf_tpu.config import euroc_config
from vio_msckf_tpu.data.simulator import SimConfig, simulate_sequence
from vio_msckf_tpu.data.render import render_sequence


@pytest.fixture(scope="module")
def euroc_dir(tmp_path_factory):
    """Write a 6 s rendered sequence in EuRoC mav0/ layout."""
    from PIL import Image

    root = tmp_path_factory.mktemp("euroc_synth")
    cfg = euroc_config()
    sim = SimConfig(duration=6.0, seed=4, amp=(1.5, 1.0, 0.5),
                    yaw_rate=0.2, wobble_amp=0.1)
    seq = simulate_sequence(cfg, sim)

    mav = root / "mav0"
    (mav / "imu0").mkdir(parents=True)
    (mav / "cam0" / "data").mkdir(parents=True)
    (mav / "cam1" / "data").mkdir(parents=True)
    (mav / "state_groundtruth_estimate0").mkdir(parents=True)

    # imu0/data.csv (ns timestamps, gyro then acc — dataset.py:55-76)
    t0_ns = 1403636579763555584  # arbitrary EuRoC-era epoch
    imu_ns = (seq["imu_t"] * 1e9).astype(np.int64) + t0_ns
    with open(mav / "imu0" / "data.csv", "w") as f:
        f.write("#timestamp [ns],w_RS_S_x,w_RS_S_y,w_RS_S_z,"
                "a_RS_S_x,a_RS_S_y,a_RS_S_z\n")
        for i in range(len(imu_ns)):
            g = seq["imu_gyro"][i]
            a = seq["imu_acc"][i]
            f.write(f"{imu_ns[i]},{g[0]},{g[1]},{g[2]},"
                    f"{a[0]},{a[1]},{a[2]}\n")

    # groundtruth CSV (p, q_wxyz, v, bw, ba — dataset.py:12-47)
    gt_ns = (seq["frame_t"] * 1e9).astype(np.int64) + t0_ns
    with open(mav / "state_groundtruth_estimate0" / "data.csv", "w") as f:
        f.write("#timestamp,p_x,p_y,p_z,q_w,q_x,q_y,q_z,"
                "v_x,v_y,v_z,bw_x,bw_y,bw_z,ba_x,ba_y,ba_z\n")
        for i in range(len(gt_ns)):
            p = seq["gt_p"][i]
            f.write(f"{gt_ns[i]},{p[0]},{p[1]},{p[2]},1,0,0,0,"
                    "0,0,0,0,0,0,0,0,0\n")

    # Rendered stereo PNGs.
    R_stack = seq["gt_R_i_w"].transpose(0, 2, 1)
    cam0, cam1 = render_sequence(cfg, R_stack, seq["gt_p"], radius=14.0,
                                 seed=7)
    cam0 = np.clip(np.asarray(cam0), 0, 255).astype(np.uint8)
    cam1 = np.clip(np.asarray(cam1), 0, 255).astype(np.uint8)
    for i in range(len(gt_ns)):
        Image.fromarray(cam0[i]).save(
            mav / "cam0" / "data" / f"{gt_ns[i]}.png")
        Image.fromarray(cam1[i]).save(
            mav / "cam1" / "data" / f"{gt_ns[i]}.png")
    return str(root)


def test_euroc_path_end_to_end(euroc_dir, tmp_path):
    """The complete --path flow through the CLI entry function."""
    from vio_msckf_tpu import cli

    out_tum = str(tmp_path / "traj.tum")
    parser = cli.build_parser()
    args = parser.parse_args(
        ["--path", euroc_dir, "--offset", "0", "--out", out_tum]
    )
    from vio_msckf_tpu.utils.logging import get_logger
    rc = cli.run_msckf_euroc(args, get_logger("test.euroc"))
    assert rc == 0

    # TUM trajectory written and parsable.
    rows = np.loadtxt(out_tum)
    assert rows.ndim == 2 and rows.shape[1] == 8
    assert np.isfinite(rows).all()

    # SE3-aligned ATE against the on-disk ground truth must be small —
    # the full-fat correctness bound for the dataset code path.
    from vio_msckf_tpu.data.euroc import EuRoCSequence
    from vio_msckf_tpu.utils.metrics import ate_rmse

    seq = EuRoCSequence(euroc_dir, start_offset=0.0)
    gt = seq.gt_aligned_positions(rows[:, 0])
    ate = ate_rmse(rows[:, 1:4], gt, align=True)
    assert ate < 0.5, f"EuRoC-path ATE {ate:.3f} m"


def test_euroc_reader_matches_sim(euroc_dir):
    """The CSV/PNG round trip preserves the IMU stream and stereo sync."""
    from vio_msckf_tpu.data.euroc import EuRoCSequence

    seq = EuRoCSequence(euroc_dir, start_offset=0.0)
    assert len(seq) > 100
    imu_t, gyro, acc = seq.imu_stream()
    assert np.all(np.diff(imu_t) > 0)
    # Static head: accelerometer magnitude ~ g.
    assert abs(np.linalg.norm(acc[:100].mean(axis=0)) - 9.81) < 0.1
    img = seq.load_image(0, cam=0)
    W, H = euroc_config().cam0.resolution
    assert img.shape == (H, W)
