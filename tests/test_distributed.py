"""Multi-host code path (VERDICT r3 item 3): two local jax.distributed
CPU processes run the block-sharded filter step over a GLOBAL mesh whose
block axis spans the process boundary; the merged output must match a
single-process run bit-for-tolerance.

This is the CPU stand-in for the BASELINE.md 2-host target (real multi-host
hardware is unreachable here); it validates the bootstrap, the global-mesh
shard_map step, cross-process collectives in the TSQR update reduction,
and the host-local feeding path.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_FRAMES = 20


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _reference_run():
    """Single-process vmap reference with the identical workload."""
    from vio_msckf_tpu.parallel import tiny_config
    from vio_msckf_tpu.filter.msckf import MSCKF
    from vio_msckf_tpu.data.simulator import (
        SimConfig, simulate_sequence, bundle_frames,
    )

    cfg = tiny_config()
    kf = MSCKF(cfg)
    carries, frame_list, n_min = [], [], None
    for seed in (1, 2):
        seq = simulate_sequence(cfg, SimConfig(duration=6.0, seed=seed))
        frames, init, _ = bundle_frames(seq, cfg)
        carries.append(kf.init(init["q0"], init["bg0"], init["gravity"]))
        frames = {k: v for k, v in frames.items() if k != "timestamp"}
        frame_list.append(frames)
        n = len(frames["imu_dt"])
        n_min = n if n_min is None else min(n_min, n)
    carry = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *carries)
    frames_b = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x)[:n_min] for x in xs]),
        *frame_list,
    )
    step = jax.jit(jax.vmap(kf.step))
    ps = []
    for k in range(min(n_min, N_FRAMES)):
        frame = jax.tree_util.tree_map(lambda v: v[:, k], frames_b)
        carry, out = step(carry, frame)
        ps.append(np.asarray(out.p))
    return np.stack(ps, axis=1)  # (B, T, 3)


def test_two_process_filter_parity(tmp_path):
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "distributed_worker.py"),
             "--rank", str(r), "--nprocs", "2",
             "--coordinator", f"localhost:{port}",
             "--out", str(tmp_path), "--frames", str(N_FRAMES)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for r in (0, 1)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so[-2000:]}\n{se[-4000:]}"

    rows = {}
    for r in (0, 1):
        z = np.load(tmp_path / f"rank{r}.npz")
        for i, b in enumerate(z["idx"]):
            rows[int(b)] = z["p"][i]
    assert sorted(rows) == [0, 1], f"merged rows {sorted(rows)}"
    merged = np.stack([rows[0], rows[1]])  # (B, T, 3)

    ref = _reference_run()
    assert np.isfinite(merged).all()
    np.testing.assert_allclose(merged, ref, atol=5e-3)
