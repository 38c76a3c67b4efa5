"""Multi-chip execution: sequence replicas x feature-block sharding.

The reference has no distributed execution of any kind (SURVEY.md section
2.4: threads + queues only). This module is the new first-class scale-out
design:

  * mesh axis ``replica`` — data parallelism over sequences: a batch of
    independent VIO runs (e.g. the 11-sequence EuRoC suite) is sharded on
    its leading axis; each device advances its own filters. No collectives
    cross this axis.
  * mesh axis ``block`` — feature-block parallelism *inside* each filter:
    the per-feature heavy math (triangulation LM, measurement Jacobians,
    chi-square gating) is sliced over the feature table; each shard
    QR-compresses its local row stack and the (D, D) triangles are reduced
    with a TSQR tree over ICI (filter/update.py: tsqr_reduce_update) — the
    distributed form of the reference's tall QR (msckf.py:549-563).

Everything is built on `jax.shard_map` over a `jax.sharding.Mesh`, so the
same code path runs on a virtual CPU mesh (tests, driver dryrun) and on a
real TPU pod slice (ICI collectives inserted by XLA).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vio_msckf_tpu.config import (
    VIOConfig,
    euroc_config,
    CameraConfig,
    _t,
)
from vio_msckf_tpu.filter.msckf import MSCKF
from vio_msckf_tpu.engine import VIOEngine


def make_mesh(n_replica, n_block=1, devices=None):
    """Mesh with axes ('replica', 'block')."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_replica * n_block, (
        f"need {n_replica * n_block} devices, have {devices.size}"
    )
    devs = devices[: n_replica * n_block].reshape(n_replica, n_block)
    return Mesh(devs, axis_names=("replica", "block"))


def _batch_spec(tree, spec):
    return jax.tree_util.tree_map(lambda _: spec, tree)


def shard_batch(mesh, tree):
    """Place a batched pytree (leading axis = sequence) on the mesh,
    sharded over 'replica' and replicated over 'block'."""
    sharding = NamedSharding(mesh, P("replica"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def make_multichip_filter_step(config: VIOConfig, mesh: Mesh,
                               use_block=True):
    """Batched filter-only step (feature measurements in, poses out),
    sharded sequence-wise over 'replica' with the update reduction sharded
    over 'block'. Returns (jitted step, MSCKF instance).

    step(carry_batch, frame_batch) -> (carry_batch, out_batch); all leaves
    carry the sequence axis first.
    """
    kf = MSCKF(config, block_axis="block" if use_block else None)
    vstep = jax.vmap(kf.step)

    def local(carry, frame):
        return vstep(carry, frame)

    spec = P("replica")
    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    return jax.jit(sharded), kf


def make_multichip_engine_step(config: VIOConfig, mesh: Mesh,
                               use_block=True):
    """Batched full-engine step (stereo images + IMU in, poses out), same
    sharding layout as the filter step. This is the 'training step' of this
    framework: the complete per-frame computation."""
    eng = VIOEngine(config)
    eng.kf.block_axis = "block" if use_block else None
    vstep = jax.vmap(eng.step)

    def local(carry, frame):
        return vstep(carry, frame)

    spec = P("replica")
    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    return jax.jit(sharded), eng


def tiny_config():
    """A miniature config for multi-chip dry runs: small images, short
    window, few features — same code paths, tiny shapes."""
    cam = dict(
        intrinsics=(80.0, 80.0, 48.0, 32.0),
        distortion_model="radtan",
        distortion_coeffs=(-0.05, 0.01, 0.0, 0.0),
        resolution=(96, 64),
    )
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[0, 3] = -0.11
    cfg = euroc_config(
        cam0=CameraConfig(T_imu_cam=_t(T0), **cam),
        cam1=CameraConfig(T_imu_cam=_t(T1), **cam),
        T_cn_cnm1=_t(T1),
    )
    cfg = cfg.replace(
        filter=cfg.filter.__class__(
            max_cam_state_size=6,
            max_features=32,
            imu_per_frame=16,  # >= 10 real samples/frame at 200/20 Hz
        ),
        frontend=cfg.frontend.__class__(
            grid_row=2, grid_col=2, max_tracks=16,
            lk_pyramid_levels=2,
        ),
    )
    return cfg
