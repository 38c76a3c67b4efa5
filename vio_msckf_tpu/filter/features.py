"""Feature-map bookkeeping as fixed-shape mask algebra.

Replaces the reference's `map_server` dict upserts
(add_feature_observations, MSCKF/msckf.py:409-427) with id-matching +
free-slot allocation over a constant-size table. Observations are stored
per *clone slot* so they shift together with the clone window on pruning.
"""

import jax.numpy as jnp

from vio_msckf_tpu.filter.state import FeatureMap


def add_observations(
    fmap: FeatureMap,
    ids: jnp.ndarray,        # (K,) int32 frontend feature ids
    zs: jnp.ndarray,         # (K, 4) normalized [u0, v0, u1, v1]
    meas_valid: jnp.ndarray,  # (K,) bool
    cur_slot: jnp.ndarray,   # () int32 clone slot of the current frame
):
    """Upsert this frame's measurements; returns (fmap, tracking_rate).

    tracking_rate = tracked / (previous map size + 1e-5), msckf.py:427.
    """
    F = fmap.fid.shape[0]

    # Match incoming ids against occupied slots.
    eq = (fmap.fid[:, None] == ids[None, :]) & fmap.valid[:, None] & meas_valid[None, :]
    existing = jnp.any(eq, axis=0)            # (K,)
    slot_of = jnp.argmax(eq, axis=0)          # (K,) valid where existing

    curr_num = jnp.sum(fmap.valid)
    tracked_num = jnp.sum(existing)
    tracking_rate = tracked_num / (curr_num + 1e-5)

    # Allocate free slots (ascending index) for new features.
    new = meas_valid & ~existing
    free_order = jnp.argsort(fmap.valid.astype(jnp.int32), stable=True)  # free first
    num_free = F - curr_num
    nth_new = jnp.cumsum(new.astype(jnp.int32)) - 1
    overflow = nth_new >= num_free
    new_slot = free_order[jnp.clip(nth_new, 0, F - 1)]

    target = jnp.where(existing, slot_of, new_slot)
    drop = ~meas_valid | (new & overflow)
    target = jnp.where(drop, F, target)  # out-of-bounds -> dropped scatter

    obs = fmap.obs.at[target, cur_slot].set(zs, mode="drop")
    obs_valid = fmap.obs_valid.at[target, cur_slot].set(True, mode="drop")
    new_target = jnp.where(new & ~drop, target, F)
    fid = fmap.fid.at[new_target].set(ids, mode="drop")
    valid = fmap.valid.at[new_target].set(True, mode="drop")
    # Fresh slots must start un-triangulated with no stale observations.
    initialized = fmap.initialized.at[new_target].set(False, mode="drop")
    obs_valid = obs_valid.at[new_target, :].set(False, mode="drop")
    obs_valid = obs_valid.at[new_target, cur_slot].set(True, mode="drop")

    fmap = fmap.replace(
        fid=fid, valid=valid, obs=obs, obs_valid=obs_valid,
        initialized=initialized,
    )
    return fmap, tracking_rate


def clear_features(fmap: FeatureMap, remove_mask: jnp.ndarray) -> FeatureMap:
    """Drop the masked features (the analog of `del map_server[id]`,
    msckf.py:649-650, 688-689)."""
    keep = ~remove_mask
    return fmap.replace(
        fid=jnp.where(keep, fmap.fid, -1),
        valid=fmap.valid & keep,
        obs_valid=fmap.obs_valid & keep[:, None],
        initialized=fmap.initialized & keep,
    )
