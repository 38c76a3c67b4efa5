"""Worker process for the 2-process jax.distributed CPU test.

Launched by tests/test_distributed.py, one instance per rank. Each worker
owns 2 virtual CPU devices; the global mesh is (replica=2, block=2) with
the BLOCK axis spanning the two processes, so the EKF update's TSQR
all_gather (filter/update.py:tsqr_reduce_update) crosses the process
boundary — the DCN path of the multi-host design (SURVEY.md section 5).

Writes rank<r>.npz with this process's rows of the per-frame pose output;
the parent merges them and asserts parity with a single-process run.
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=20)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    os.environ["VIO_NUM_PROCESSES"] = str(args.nprocs)
    os.environ["VIO_PROCESS_ID"] = str(args.rank)
    os.environ["VIO_COORDINATOR"] = args.coordinator

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from vio_msckf_tpu.parallel import (
        initialize_from_env,
        make_global_mesh,
        make_global_batch,
        make_multichip_filter_step,
        tiny_config,
    )
    from vio_msckf_tpu.parallel.distributed import collect_local_outputs

    assert initialize_from_env(), "expected multi-process env"
    assert jax.process_count() == args.nprocs
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * args.nprocs

    mesh = make_global_mesh(
        n_replica=2, n_block=2, block_across_processes=True
    )
    # Every device pair along 'block' must span both processes.
    procs = np.vectorize(lambda d: d.process_index)(mesh.devices)
    assert (procs[:, 0] != procs[:, 1]).all(), procs

    cfg = tiny_config()
    from vio_msckf_tpu.data.simulator import (
        SimConfig, simulate_sequence, bundle_frames,
    )
    from vio_msckf_tpu.filter.msckf import MSCKF

    kf0 = MSCKF(cfg)
    carries, frame_list, n_min = [], [], None
    for seed in (1, 2):
        seq = simulate_sequence(cfg, SimConfig(duration=6.0, seed=seed))
        frames, init, _ = bundle_frames(seq, cfg)
        carries.append(kf0.init(init["q0"], init["bg0"], init["gravity"]))
        frames = {k: v for k, v in frames.items() if k != "timestamp"}
        frame_list.append(frames)
        n = len(frames["imu_dt"])
        n_min = n if n_min is None else min(n_min, n)
    carry_np = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *carries
    )
    frames_np = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x)[:n_min] for x in xs]),
        *frame_list,
    )

    step, _ = make_multichip_filter_step(cfg, mesh, use_block=True)
    carry = make_global_batch(mesh, carry_np)

    n_run = min(n_min, args.frames)
    rows_p = {}
    for k in range(n_run):
        frame = make_global_batch(
            mesh, jax.tree_util.tree_map(lambda v: v[:, k], frames_np)
        )
        carry, out = step(carry, frame)
        for b, p in collect_local_outputs(out.p):
            rows_p.setdefault(b, []).append(p)

    idx = np.asarray(sorted(rows_p), np.int32)
    p = np.stack([np.stack(rows_p[b]) for b in sorted(rows_p)])
    np.savez(os.path.join(args.out, f"rank{args.rank}.npz"), idx=idx, p=p)
    print(f"rank {args.rank}: wrote rows {idx.tolist()}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
