"""Engine-level A/B of the LK and gating backends on the real chip.

Same methodology as the FAST kernel A/B (PROFILE_r04.md): the full
220-frame image->pose scan, 3 reps, best time — because context is what
matters (isolated microbenchmarks hide fusion/overlap effects).

Rows: (lk, gamma) in {xla, pallas} x {cholesky, pallas}.

Run: python scripts/ab_lk.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from vio_msckf_tpu.config import euroc_config
from vio_msckf_tpu.engine import VIOEngine
from vio_msckf_tpu.utils.metrics import ate_rmse


def build(cfg):
    from vio_msckf_tpu.data.simulator import (
        SimConfig, simulate_sequence, bundle_frames,
    )
    from vio_msckf_tpu.data.render import render_sequence

    sim = SimConfig(duration=12.0, seed=4, amp=(1.5, 1.0, 0.5),
                    yaw_rate=0.2, wobble_amp=0.1)
    seq = simulate_sequence(cfg, sim)
    frames, init, first = bundle_frames(seq, cfg)
    n = len(frames["timestamp"])
    R_stack = seq["gt_R_i_w"][first:first + n].transpose(0, 2, 1)
    p_stack = seq["gt_p"][first:first + n]
    cam0, cam1 = render_sequence(cfg, R_stack, p_stack, radius=14.0, seed=7)
    dev = dict(
        cam0_img=cam0, cam1_img=cam1,
        imu_gyro=jnp.asarray(frames["imu_gyro"]),
        imu_acc=jnp.asarray(frames["imu_acc"]),
        imu_dt=jnp.asarray(frames["imu_dt"]),
        imu_valid=jnp.asarray(frames["imu_valid"]),
    )
    return dev, init, p_stack, n


def main():
    cfg0 = euroc_config()
    print("devices:", jax.devices(), flush=True)
    frames, init, gt, n = build(cfg0)
    print(f"{n} frames", flush=True)

    combos = [("xla", "cholesky"), ("pallas", "cholesky"),
              ("xla", "pallas"), ("pallas", "pallas")]
    if len(sys.argv) > 1 and sys.argv[1] == "--fast-only":
        # Just the production combo — for env-knob experiments like
        # VIO_LK_PRECISION (set per process; read at kernel trace time).
        combos = [("pallas", "pallas")]
        print("VIO_LK_PRECISION =",
              os.environ.get("VIO_LK_PRECISION", "highest"), flush=True)
    for lk_be, gm_be in combos:
        cfg = cfg0.replace(
            frontend=dataclasses.replace(cfg0.frontend, lk_backend=lk_be),
            filter=dataclasses.replace(cfg0.filter, gamma_solver=gm_be),
        )
        eng = VIOEngine(cfg)
        carry0 = eng.init(init["q0"], init["bg0"], init["gravity"])
        run = jax.jit(eng.run_sequence)
        t0 = time.time()
        _, outs = run(carry0, frames)
        jax.block_until_ready(outs.p)
        compile_s = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            _, outs = run(carry0, frames)
            jax.block_until_ready(outs.p)
            best = min(best, time.time() - t0)
        ate = ate_rmse(np.asarray(outs.p), gt, align=False)
        print(f"lk={lk_be:6s} gamma={gm_be:8s}: {n/best:7.1f} fps "
              f"({best/n*1e3:5.2f} ms/step)  ATE {ate:.4f} m  "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
