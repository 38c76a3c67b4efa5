"""Full image->pose pipeline test: rendered distorted stereo frames of a
textured world through the complete engine (front-end + filter)."""

import numpy as np
import jax
import jax.numpy as jnp

from vio_msckf_tpu.config import euroc_config
from vio_msckf_tpu.data.simulator import (
    SimConfig, simulate_sequence, bundle_frames,
)
from vio_msckf_tpu.data.render import make_renderer
from vio_msckf_tpu.engine import VIOEngine
from vio_msckf_tpu.utils.metrics import ate_rmse


def test_image_to_pose_pipeline():
    cfg = euroc_config()
    sim = SimConfig(
        duration=4.0, seed=4, amp=(1.5, 1.0, 0.5), yaw_rate=0.2,
        wobble_amp=0.1,
    )
    seq = simulate_sequence(cfg, sim)
    frames, init, first = bundle_frames(seq, cfg)
    render = make_renderer(cfg, radius=14.0, seed=7)

    eng = VIOEngine(cfg)
    carry = eng.init(init["q0"], init["bg0"], init["gravity"])
    step = jax.jit(eng.step)

    n = len(frames["timestamp"])
    est = []
    ntracks = []
    for k in range(n):
        R_w_i = jnp.asarray(seq["gt_R_i_w"][first + k].T)
        p = jnp.asarray(seq["gt_p"][first + k])
        img0, img1 = render(R_w_i, p)
        frame = dict(
            cam0_img=img0, cam1_img=img1,
            imu_gyro=jnp.asarray(frames["imu_gyro"][k]),
            imu_acc=jnp.asarray(frames["imu_acc"][k]),
            imu_dt=jnp.asarray(frames["imu_dt"][k]),
            imu_valid=jnp.asarray(frames["imu_valid"][k]),
        )
        carry, out = step(carry, frame)
        est.append(np.asarray(out.p))
        ntracks.append(int(np.asarray(carry[0].valid).sum()))

    est = np.asarray(est)
    gt = seq["gt_p"][first:first + n]
    assert np.isfinite(est).all()
    # The tracker must sustain a healthy feature count.
    assert np.mean(ntracks[5:]) > 50
    ate = ate_rmse(est, gt, align=False)
    assert ate < 0.10, f"full-pipeline ATE {ate:.3f} m"
