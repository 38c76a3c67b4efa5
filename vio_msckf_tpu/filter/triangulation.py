"""Multi-view inverse-depth triangulation, vmapped over the feature table.

Replaces the reference's per-feature Python LM loops
(Feature.cost/jacobian/generate_initial_guess/check_motion/
initialize_position, MSCKF/feature.py:33-295) with fixed-iteration,
mask-gated Levenberg-Marquardt run in lockstep for every feature slot.

Semantics notes:
  * Views are interleaved (cam0_i, cam1_i) per observing clone, poses
    expressed relative to the first observing clone's cam0 frame
    (feature.py:182-213).
  * Two-view linear initial guess from the first and last cam0
    observations (feature.py:99-122, 216-218).
  * Huber-weighted LM, damping 1e-3 scaled by 10x per accept/reject,
    clamped to [1e-10, 1e12] (feature.py:220-276). One intentional fix: the
    reference initializes `is_cost_reduced` once *outside* the outer loop
    (feature.py:224), so after the first accepted step later outer
    iterations never enter the inner loop — effectively a single LM step.
    We reset the flag each outer iteration (the behavior of the C++
    msckf_vio this port descends from), which strictly improves accuracy.
  * Cheirality: solution valid iff depth > 0 in every observing view
    (feature.py:284-289); the world position is written regardless
    (feature.py:292-294).
"""

import jax
import jax.numpy as jnp

from vio_msckf_tpu.math import quat_to_rot
from vio_msckf_tpu.config import TriangulationConfig

_SAFE = 1e-12


def _view_poses(clone_q, clone_p, obs_valid, R_c0c1, t_c0c1):
    """Per-clone cam0/cam1 poses relative to the first observing clone's
    cam0 frame. Returns (R_rel, t_rel) each (N, 2, 3, ...) with view axis
    [cam0, cam1], plus the anchor pose (R_a, t_a): first-cam0 -> world."""
    N = clone_q.shape[0]
    # cam -> world poses (feature.py:200-205).
    R_c0_w = jnp.swapaxes(quat_to_rot(clone_q), -1, -2)  # (N,3,3)
    t_c0_w = clone_p
    # T_cam1_cam0 = Isometry3d(R_c0c1, t_c0c1).inverse()  (feature.py:185-186)
    R_10 = R_c0c1.T
    t_10 = -R_c0c1.T @ t_c0c1
    R_c1_w = R_c0_w @ R_10
    t_c1_w = jnp.einsum("nij,j->ni", R_c0_w, t_10) + t_c0_w

    i0 = jnp.argmax(obs_valid)  # first observing clone
    R_a = R_c0_w[i0]
    t_a = t_c0_w[i0]

    # pose.inverse() * T_c0_w : first cam0 frame -> this view (feature.py:209-213)
    def rel(Rv, tv):
        Rr = jnp.einsum("nji,jk->nik", Rv, R_a)  # Rv^T @ R_a
        tr = jnp.einsum("nji,nj->ni", Rv, t_a[None, :] - tv)
        return Rr, tr

    R0r, t0r = rel(R_c0_w, t_c0_w)
    R1r, t1r = rel(R_c1_w, t_c1_w)
    R_rel = jnp.stack([R0r, R1r], axis=1)  # (N, 2, 3, 3)
    t_rel = jnp.stack([t0r, t1r], axis=1)  # (N, 2, 3)
    return R_rel, t_rel, R_a, t_a, i0


def _two_view_depth(R, t, z1, z2, dtype):
    """Linear two-view depth along bearing z1 (feature.py:99-122)."""
    m = R @ jnp.concatenate([z1, jnp.ones(1, dtype)])
    a = m[0:2] - z2 * m[2]
    b = z2 * t[2] - t[0:2]
    return (a @ b) / jnp.maximum(a @ a, _SAFE)


def _to_inverse_depth(z1, depth, dtype):
    p = jnp.concatenate([z1, jnp.ones(1, dtype)]) * depth
    denom = jnp.where(jnp.abs(p[2]) > _SAFE, p[2], _SAFE)
    return jnp.array([p[0] / denom, p[1] / denom, 1.0 / denom], dtype)


def _initial_guess(R_rel, t_rel, obs, i0, obs_valid, Rv, tv, zv, view_valid):
    """Two candidate two-view linear guesses, best-cost wins.

    The reference seeds LM from the first/last cam0 pair only
    (cam_poses[-2], feature.py:216-218) — which has ZERO baseline when the
    platform is static, yielding a garbage depth the 5x5 LM iterations may
    never recover from (the reference sidesteps this by skipping EuRoC's
    static 40 s head, vio.py:88). We additionally seed from the first
    clone's STEREO pair, whose ~11 cm baseline always exists, and keep the
    seed with the lower reprojection cost.
    """
    dtype = obs.dtype
    N = obs.shape[0]
    iN = N - 1 - jnp.argmax(obs_valid[::-1])
    z1 = obs[i0, 0:2]

    # (a) temporal: first->last cam0 (reference behavior)
    d_temporal = _two_view_depth(
        R_rel[iN, 0], t_rel[iN, 0], z1, obs[iN, 0:2], dtype
    )
    x_t = _to_inverse_depth(z1, d_temporal, dtype)
    # (b) stereo: first clone cam0->cam1 (always has baseline)
    d_stereo = _two_view_depth(
        R_rel[i0, 1], t_rel[i0, 1], z1, obs[i0, 2:4], dtype
    )
    x_s = _to_inverse_depth(z1, d_stereo, dtype)

    c_t = _costs(Rv, tv, zv, x_t, view_valid)
    c_s = _costs(Rv, tv, zv, x_s, view_valid)
    better_t = c_t < c_s
    x0 = jnp.where(better_t, x_t, x_s)
    cost0 = jnp.where(better_t, c_t, c_s)
    return x0, cost0


def _costs(R_rel, t_rel, z, x, view_valid):
    """Total reprojection cost over valid views (feature.py:33-55)."""
    g = jnp.concatenate([x[0:2], jnp.ones(1, x.dtype)])
    h = jnp.einsum("vij,j->vi", R_rel, g) + x[2] * t_rel  # (V,3)
    h3 = jnp.where(jnp.abs(h[:, 2]) > _SAFE, h[:, 2], _SAFE)
    z_hat = h[:, 0:2] / h3[:, None]
    e = jnp.sum((z_hat - z) ** 2, axis=-1)
    return jnp.sum(jnp.where(view_valid, e, 0.0))


def _solve3_sym(A, b):
    """Closed-form solve of a symmetric 3x3 system via the adjugate
    (Cramer). The LM normal matrix is J^T J + lam I — symmetric positive
    definite with damping-bounded conditioning, so the explicit cofactor
    solve is f32-safe here.

    Why not jnp.linalg.solve: under the feature-table vmap it lowers to a
    batched (F, 3, 3) "LuDecomposition" TPU custom call; the r5 on-chip
    profile measured those calls at 280 ms per 220-frame run (~13% of the
    whole engine step, the single largest op cluster) for what is ~50
    multiplies of work per feature. The adjugate form is pure fused VPU
    arithmetic and vmaps to nothing special."""
    a00, a01, a02 = A[0, 0], A[0, 1], A[0, 2]
    a11, a12, a22 = A[1, 1], A[1, 2], A[2, 2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    det = jnp.where(jnp.abs(det) > _SAFE, det, _SAFE)
    x0 = (c00 * b[0] + c01 * b[1] + c02 * b[2]) / det
    x1 = (c01 * b[0] + c11 * b[1] + c12 * b[2]) / det
    x2 = (c02 * b[0] + c12 * b[1] + c22 * b[2]) / det
    return jnp.stack([x0, x1, x2])


def _normal_equations(R_rel, t_rel, z, x, view_valid, huber_eps):
    """Accumulate the Huber-weighted 3x3 normal equations
    (feature.py:57-97, 239-248)."""
    g = jnp.concatenate([x[0:2], jnp.ones(1, x.dtype)])
    h = jnp.einsum("vij,j->vi", R_rel, g) + x[2] * t_rel
    h3 = jnp.where(jnp.abs(h[:, 2]) > _SAFE, h[:, 2], _SAFE)
    W = jnp.concatenate([R_rel[:, :, 0:2], t_rel[:, :, None]], axis=-1)  # (V,3,3)
    J = (
        W[:, 0:2, :] / h3[:, None, None]
        - W[:, 2:3, :] * (h[:, 0:2] / (h3 * h3)[:, None])[:, :, None]
    )  # (V,2,3)
    z_hat = h[:, 0:2] / h3[:, None]
    r = z_hat - z  # (V,2)
    e = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(e <= huber_eps, 1.0, huber_eps / (2.0 * jnp.maximum(e, _SAFE)))
    w2 = jnp.where(e <= huber_eps, 1.0, w * w)
    w2 = jnp.where(view_valid, w2, 0.0)
    A = jnp.einsum("v,vki,vkj->ij", w2, J, J)
    b = jnp.einsum("v,vki,vk->i", w2, J, r)
    return A, b


def triangulate_one(
    obs,          # (N, 4) normalized stereo obs per clone slot
    obs_valid,    # (N,) bool
    clone_q,      # (N, 4)
    clone_p,      # (N, 3)
    R_c0c1,
    t_c0c1,
    cfg: TriangulationConfig,
):
    """LM inverse-depth solve for one feature; mask-safe for empty slots.

    Returns (p_world (3,), is_valid ()).
    """
    dtype = obs.dtype
    N = obs.shape[0]
    R_rel, t_rel, R_a, t_a, i0 = _view_poses(
        clone_q, clone_p, obs_valid, R_c0c1, t_c0c1
    )
    # Flatten views: (2N, ...) interleaved (cam0_i, cam1_i).
    Rv = R_rel.reshape(2 * N, 3, 3)
    tv = t_rel.reshape(2 * N, 3)
    zv = obs.reshape(N, 2, 2).reshape(2 * N, 2)
    view_valid = jnp.repeat(obs_valid, 2)

    x0, cost0 = _initial_guess(
        R_rel, t_rel, obs, i0, obs_valid, Rv, tv, zv, view_valid
    )

    eye3 = jnp.eye(3, dtype=dtype)

    # Both LM loops are lax.while_loops so a converged solve exits early
    # (the reference's `delta < precision` break, feature.py:276). Under
    # the feature-table vmap the loops run until the LAST feature
    # converges — still ~3-8x fewer iterations than the fixed 5x5
    # schedule on typical frames, since the stereo seed is already close.
    def inner_cond(carry):
        j, x, cost, lam, delta_norm, reduced, A, b = carry
        return (j < cfg.inner_loop_max_iteration) & ~reduced

    def inner_body(carry):
        j, x, cost, lam, delta_norm, reduced, A, b = carry
        delta = _solve3_sym(A + lam * eye3, b)
        x_new = x - delta
        new_cost = _costs(Rv, tv, zv, x_new, view_valid)
        accept = new_cost < cost
        x = jnp.where(accept, x_new, x)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(
            accept,
            jnp.maximum(lam / 10.0, 1e-10),
            jnp.minimum(lam * 10.0, 1e12),
        )
        delta_norm = jnp.linalg.norm(delta)
        reduced = reduced | accept
        return j + 1, x, cost, lam, delta_norm, reduced, A, b

    def outer_cond(carry):
        i, x, cost, lam, delta_norm = carry
        return (i < cfg.outer_loop_max_iteration) & (
            delta_norm > cfg.estimation_precision
        )

    def outer_body(carry):
        i, x, cost, lam, delta_norm = carry
        A, b = _normal_equations(Rv, tv, zv, x, view_valid, cfg.huber_epsilon)
        inner0 = (jnp.zeros((), jnp.int32), x, cost, lam, delta_norm,
                  jnp.asarray(False), A, b)
        _, x, cost, lam, delta_norm, _, _, _ = jax.lax.while_loop(
            inner_cond, inner_body, inner0
        )
        return i + 1, x, cost, lam, delta_norm

    init = (jnp.zeros((), jnp.int32), x0, cost0,
            jnp.asarray(cfg.initial_damping, dtype),
            jnp.asarray(jnp.inf, dtype))
    _, x, _, _, _ = jax.lax.while_loop(outer_cond, outer_body, init)

    rho = jnp.where(jnp.abs(x[2]) > _SAFE, x[2], _SAFE)
    p_anchor = jnp.array([x[0] / rho, x[1] / rho, 1.0 / rho], dtype)

    # Cheirality over every observing view (feature.py:284-289).
    depths = jnp.einsum("vij,j->vi", Rv, p_anchor)[:, 2] + tv[:, 2]
    ok = jnp.all(jnp.where(view_valid, depths > 0.0, True))
    ok = ok & jnp.any(obs_valid)

    p_world = R_a @ p_anchor + t_a
    return p_world, ok


def check_motion_one(obs, obs_valid, clone_q, clone_p, threshold):
    """Parallax gate (feature.py:124-165): orthogonal translation between
    the first and last observing clones vs the first bearing. Disabled when
    threshold < 0 (the shipped config, config.py:10)."""
    N = obs.shape[0]
    i0 = jnp.argmax(obs_valid)
    iN = N - 1 - jnp.argmax(obs_valid[::-1])
    R_c0_w = jnp.swapaxes(quat_to_rot(clone_q), -1, -2)
    bearing = jnp.concatenate([obs[i0, 0:2], jnp.ones(1, obs.dtype)])
    bearing = bearing / jnp.maximum(jnp.linalg.norm(bearing), _SAFE)
    bearing_w = R_c0_w[i0] @ bearing
    translation = clone_p[iN] - clone_p[i0]
    parallel = translation @ bearing_w
    orthogonal = translation - parallel * bearing_w
    return jnp.where(
        threshold < 0, True, jnp.linalg.norm(orthogonal) > threshold
    )


def triangulate_all(fmap_obs, fmap_obs_valid, clone_q, clone_p, R_c0c1,
                    t_c0c1, cfg: TriangulationConfig, axis_name=None):
    """vmap of `triangulate_one` over the feature axis.

    With `axis_name` set (under shard_map), each device solves its
    F/n_block slice of the table and the (position, ok) results are
    all-gathered back — the feature-block sharding of SURVEY.md section 2.4.
    """
    fn = jax.vmap(
        lambda o, ov: triangulate_one(o, ov, clone_q, clone_p, R_c0c1,
                                      t_c0c1, cfg)
    )
    if axis_name is None:
        return fn(fmap_obs, fmap_obs_valid)
    F = fmap_obs.shape[0]
    nb = jax.lax.axis_size(axis_name)
    bi = jax.lax.axis_index(axis_name)
    Fl = F // nb
    obs_l = jax.lax.dynamic_slice_in_dim(fmap_obs, bi * Fl, Fl, axis=0)
    ov_l = jax.lax.dynamic_slice_in_dim(fmap_obs_valid, bi * Fl, Fl, axis=0)
    p_l, ok_l = fn(obs_l, ov_l)
    p = jax.lax.all_gather(p_l, axis_name).reshape(F, 3)
    ok = jax.lax.all_gather(ok_l, axis_name).reshape(F)
    return p, ok
