"""Clone-window pruning as a gather permutation over the fixed covariance.

Replaces the reference's covariance row/column deletion + realloc
(prune_cam_state_buffer, MSCKF/msckf.py:730-818) with a block permutation
that compacts surviving clone slots and zeroes the freed tail — the
fixed-shape equivalent of the shift at msckf.py:810-815. Redundant-clone
selection mirrors find_redundant_cam_states (msckf.py:691-727).
"""

import jax
import jax.numpy as jnp

from vio_msckf_tpu.math import quat_to_rot, rot_to_quat
from vio_msckf_tpu.filter.state import FilterState, FeatureMap, MsckfParams
from vio_msckf_tpu.filter.update import stack_update, tsqr_reduce_update
from vio_msckf_tpu.filter.triangulation import (
    triangulate_all,
    check_motion_one,
)


def find_redundant_slots(state: FilterState, params: MsckfParams):
    """Pick the two clone slots to remove (msckf.py:691-727).

    The key state sits 4 from the end; the two candidates after it are
    removed if they moved little relative to the key (angle < rot_th,
    distance < trans_th, tracking_rate > rate_th), otherwise the oldest
    remaining slots go. Returns (r0, r1) with r0 < r1.
    """
    fc = params.config.filter
    n = state.n_clones
    key = n - 4

    R_key = quat_to_rot(state.clone_q[key])
    p_key = state.clone_p[key]

    def redundant(slot):
        R = quat_to_rot(state.clone_q[slot])
        p = state.clone_p[slot]
        dist = jnp.linalg.norm(p - p_key)
        w = rot_to_quat(R @ R_key.T)[3]
        angle = 2.0 * jnp.arccos(jnp.clip(w, -1.0, 1.0))
        return (
            (angle < fc.rotation_threshold)
            & (dist < fc.translation_threshold)
            & (state.tracking_rate > fc.tracking_rate_threshold)
        )

    c0 = redundant(n - 3)
    c1 = redundant(n - 2)
    first_after_0 = jnp.where(c0, 0, 1)
    r0 = jnp.where(c0, n - 3, 0)
    r1 = jnp.where(c1, n - 2, first_after_0)
    lo = jnp.minimum(r0, r1)
    hi = jnp.maximum(r0, r1)
    return lo, hi


def _compact_permutation(N, keep_mask):
    """Stable permutation putting kept slots (in order) first."""
    return jnp.argsort(~keep_mask, stable=True)


def _permute_cov(P, perm, new_active_mask):
    """Apply the 6-dim block permutation to clone rows/cols of P and zero
    the freed tail (the fixed-shape form of msckf.py:810-815)."""
    D = P.shape[0]
    idx = jnp.concatenate(
        [
            jnp.arange(21),
            (21 + 6 * perm[:, None] + jnp.arange(6)[None, :]).reshape(-1),
        ]
    )
    P = P[idx][:, idx]
    mask = jnp.concatenate(
        [jnp.ones(21, bool), jnp.repeat(new_active_mask, 6)]
    ).astype(P.dtype)
    return P * mask[:, None] * mask[None, :]


def prune_clones(
    state: FilterState, fmap: FeatureMap, params: MsckfParams,
    axis_name=None,
):
    """One pruning pass (msckf.py:730-818). Call only when the window is
    full; `maybe_prune` wraps this in a lax.cond."""
    cfg = params.config
    N = cfg.filter.max_cam_state_size
    r0, r1 = find_redundant_slots(state, params)
    rm_mask = (
        jnp.zeros(N, bool).at[r0].set(True).at[r1].set(True)
    ) & state.clone_valid

    involved = fmap.obs_valid & rm_mask[None, :]
    n_involved = jnp.sum(involved, axis=1)

    # Triangulate the not-yet-initialized features with 2 involved obs,
    # using every current clone (feature.py passes all cam states).
    positions, tri_ok = triangulate_all(
        fmap.obs, fmap.obs_valid, state.clone_q, state.clone_p,
        params.R_cam0_cam1, params.t_cam0_cam1, cfg.triangulation,
        axis_name=axis_name,
    )
    motion_ok = jax.vmap(
        lambda o, ov: check_motion_one(
            o, ov, state.clone_q, state.clone_p,
            cfg.triangulation.translation_threshold,
        )
    )(fmap.obs, fmap.obs_valid)

    need_tri = fmap.valid & (n_involved >= 2) & ~fmap.initialized
    newly_ok = need_tri & motion_ok & tri_ok
    # Fresh triangulation when converged (see remove_lost_features for the
    # rationale — stale positions correlate successive prune updates).
    use_pos = jnp.where(tri_ok[:, None], positions, fmap.position)
    process = fmap.valid & (n_involved >= 2) & (fmap.initialized | newly_ok)

    Hc, rc, _ = stack_update(
        state, params,
        positions=use_pos,
        obs=fmap.obs,
        use_masks=involved,
        process_mask=process,
        dofs=n_involved,       # dof = #involved clones (msckf.py:789)
        axis_name=axis_name,
    )
    state = tsqr_reduce_update(state, Hc, rc, params, axis_name=axis_name)

    # Newly triangulated survivors keep their position (feature.py:292-294).
    fmap = fmap.replace(
        position=jnp.where(newly_ok[:, None], positions, fmap.position),
        initialized=fmap.initialized | newly_ok,
        # Remove the involved observations for every feature
        # (msckf.py:750, 759-767, 794-795).
        obs_valid=fmap.obs_valid & ~rm_mask[None, :],
    )

    # Compact the clone window + covariance + per-feature obs columns.
    keep = state.clone_valid & ~rm_mask
    perm = _compact_permutation(N, keep)
    n_new = jnp.sum(keep)
    new_valid = jnp.arange(N) < n_new

    state = state.replace(
        clone_q=state.clone_q[perm],
        clone_p=state.clone_p[perm],
        clone_q_null=state.clone_q_null[perm],
        clone_p_null=state.clone_p_null[perm],
        clone_valid=new_valid,
        n_clones=n_new.astype(jnp.int32),
        P=_permute_cov(state.P, perm, new_valid),
    )
    fmap = fmap.replace(
        obs=fmap.obs[:, perm, :],
        obs_valid=fmap.obs_valid[:, perm] & new_valid[None, :],
    )
    return state, fmap


def maybe_prune(state: FilterState, fmap: FeatureMap, params: MsckfParams,
                axis_name=None):
    """prune_cam_state_buffer gate (msckf.py:731-732)."""
    full = state.n_clones >= params.config.filter.max_cam_state_size
    return jax.lax.cond(
        full,
        lambda s, f: prune_clones(s, f, params, axis_name=axis_name),
        lambda s, f: (s, f),
        state,
        fmap,
    )
