"""Multi-host execution: jax.distributed bootstrap + process-spanning
meshes + host-local data feeding.

The reference has no distributed communication backend of any kind
(SURVEY.md section 2.4: queue.Queue + threads only; no NCCL/MPI/Gloo).
The TPU-native equivalent (SURVEY.md section 5) built here:

  * one JAX process per host, bootstrapped with
    ``jax.distributed.initialize`` — the coordinator service replaces the
    rendezvous role NCCL/MPI would play in a GPU framework;
  * ONE global (replica, block) mesh over ``jax.devices()``, which after
    initialization spans every process's chips — the same shard_map
    filter/engine steps from multichip.py run unchanged, with XLA routing
    collectives over ICI within a host and DCN across hosts;
  * host-local feeding: each process materializes only the batch rows its
    devices own; ``make_global_batch`` assembles the global arrays from a
    per-process callback, so no host ever holds the full batch.

Environment protocol (single-process no-op when unset):
  VIO_NUM_PROCESSES   total process count
  VIO_PROCESS_ID      this process's rank (0-based)
  VIO_COORDINATOR     host:port of rank 0 (default localhost:12411)

The 2-host scaling north star (BASELINE.md: >= 80 % efficiency at 2+
hosts) cannot be measured in this environment (one tunneled chip); the
code path is validated by tests/test_distributed.py, which launches two
local CPU processes, spans the block axis ACROSS them (so the TSQR
all_gather crosses the process boundary), and asserts parity with the
single-process filter.
"""

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_from_env():
    """Bootstrap jax.distributed from VIO_* env vars.

    Returns True if a multi-process runtime was initialized, False for
    the single-process default. Must run before any other JAX call.
    """
    n = int(os.environ.get("VIO_NUM_PROCESSES", "1"))
    if n <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=os.environ.get(
            "VIO_COORDINATOR", "localhost:12411"
        ),
        num_processes=n,
        process_id=int(os.environ["VIO_PROCESS_ID"]),
    )
    return True


def make_global_mesh(n_replica=None, n_block=1, block_across_processes=False):
    """(replica, block) mesh over ALL devices (every process's).

    With ``block_across_processes`` the device grid is laid out so the
    block axis pairs devices of DIFFERENT processes — the update's TSQR
    all_gather then rides the cross-host link, which is the interesting
    path to validate. Default layout keeps block within a host (the
    production choice: the per-update reduction is latency-sensitive,
    replica crossing hosts is embarrassingly parallel).
    """
    devices = np.asarray(jax.devices())
    if n_replica is None:
        n_replica = devices.size // n_block
    assert devices.size >= n_replica * n_block, (
        f"need {n_replica * n_block} devices, have {devices.size}"
    )
    devices = devices[: n_replica * n_block]
    if block_across_processes:
        grid = devices.reshape(n_block, n_replica).T
    else:
        grid = devices.reshape(n_replica, n_block)
    return Mesh(grid, axis_names=("replica", "block"))


def make_global_batch(mesh, tree_np, spec=P("replica")):
    """Assemble a global batched pytree on a (possibly multi-process) mesh
    from numpy leaves, providing data per addressable shard.

    Each process may pass leaves that are only valid at the global indices
    its devices own (the callback is never asked for other rows) — or the
    full array, out of which local shards are sliced. Works identically in
    single-process meshes, where it degrades to a plain device_put.
    """
    def put(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree_util.tree_map(put, tree_np)


def local_rows(mesh, n_rows, spec=P("replica")):
    """The set of leading-axis indices this process's devices own under
    `spec` — what a host-local data loader should materialize."""
    sharding = NamedSharding(mesh, spec)
    rows = set()
    for d, idx in sharding.devices_indices_map((n_rows,)).items():
        if d.process_index == jax.process_index():
            sl = idx[0]
            rows.update(range(*sl.indices(n_rows)))
    return sorted(rows)


def collect_local_outputs(x):
    """(global_row_index, numpy value) pairs for this process's shards of a
    leading-axis-sharded output array."""
    out = []
    for shard in x.addressable_shards:
        sl = shard.index[0]
        start = 0 if sl.start is None else sl.start
        data = np.asarray(shard.data)
        for i in range(data.shape[0]):
            out.append((start + i, data[i]))
    return out
