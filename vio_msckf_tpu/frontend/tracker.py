"""Stereo feature tracking front-end as one fixed-shape jitted step.

TPU-native replacement for the reference `ImageProcessor`
(MSCKF/image.py:36-718). The dynamic Python feature lists become a
constant-size track table; the per-frame pipeline is:

  temporal KLT (gyro-predicted) -> stereo match (3 LK passes + gates)
  -> FAST detection under an occupancy mask -> per-cell top-k birth
  -> per-cell lifetime cap -> publish normalized stereo measurements.

Reference-semantics map:
  * gyro prediction H = K R K^-1 (predict_feature_tracking,
    image.py:521-552) with R from mean angular velocity + Rodrigues
    (integrate_imu_data, image.py:440-487). We compute the mean over the
    frame's IMU bundle — the same samples the filter propagates over —
    instead of the reference's slightly offset window [prev-0.01,
    curr-0.004) (image.py:453-461); at 200 Hz the difference is <= 1
    sample on each edge.
  * stereo_match (image.py:554-638): rotation-predicted initial guess via
    undistort(R_cam0_cam1)+distort, forward LK cam0->cam1, backward LK
    consistency (err < 3 px), vertical-disparity gate (< 20 px), bounds
    check, essential-matrix epipolar gate (threshold 5 norm-pixel units).
    One intentional fix: the reference evaluates only the first component
    of the epipolar constraint (`(pt1 * line)[0]`, image.py:632); we use
    the full dot product pt1 . E pt0 (the standard residual).
  * first frame == "no surviving tracks": detection + stereo match + top-3
    per cell is exactly initialize_first_frame (image.py:166-217).
  * birth/cap policy: per-cell top-5 FAST candidates pre-match, top-3
    matched births (add_new_features, image.py:317-390), then a per-cell
    lifetime cap of 5 (prune_features, image.py:392-404).
"""

import jax
import jax.numpy as jnp
from flax import struct

from vio_msckf_tpu.config import VIOConfig
from vio_msckf_tpu.math import axis_angle_to_rot, skew
from vio_msckf_tpu.ops.distortion import distort_points, undistort_points
from vio_msckf_tpu.ops.fast import fast_score_map, detect_grid_features
from vio_msckf_tpu.ops.klt import FlatPyramid, lk_verify, prepare_pyramid, pyramidal_lk
from vio_msckf_tpu.ops.pyramid import build_pyramid

import numpy as np


@struct.dataclass
class TrackerState:
    ids: jnp.ndarray        # (T,) int32, -1 empty
    lifetime: jnp.ndarray   # (T,) int32
    cam0_pts: jnp.ndarray   # (T, 2) pixels
    cam1_pts: jnp.ndarray   # (T, 2) pixels
    valid: jnp.ndarray      # (T,) bool
    next_id: jnp.ndarray    # () int32
    pyr_prev: FlatPyramid   # previous cam0 pyramid (lane-row representation)
    has_prev: jnp.ndarray   # () bool


class StereoTracker:
    """Functional front-end; all per-frame work is one jittable step."""

    def __init__(self, config: VIOConfig):
        self.config = config
        fe = config.frontend
        cam0, cam1 = config.cam0, config.cam1

        T0 = np.linalg.inv(cam0.T_imu_cam_np)  # cam0 -> imu (image.py:87)
        T1 = np.linalg.inv(cam1.T_imu_cam_np)
        self.R_cam0_imu = T0[:3, :3]
        self.t_cam0_imu = T0[:3, 3]
        self.R_cam1_imu = T1[:3, :3]
        self.t_cam1_imu = T1[:3, 3]
        # image.py:569,610-612
        self.R_cam0_cam1 = self.R_cam1_imu.T @ self.R_cam0_imu
        self.t_cam0_cam1 = self.R_cam1_imu.T @ (
            self.t_cam0_imu - self.t_cam1_imu
        )
        self.E = skew(jnp.asarray(self.t_cam0_cam1)) @ jnp.asarray(
            self.R_cam0_cam1
        )
        fx0, fy0, _, _ = cam0.intrinsics
        fx1, fy1, _, _ = cam1.intrinsics
        # norm pixel unit (image.py:622-624)
        self.norm_pixel_unit = 4.0 / (fx0 + fy0 + fx1 + fy1)
        self.width, self.height = cam0.resolution
        self.grid_row, self.grid_col = fe.grid_row, fe.grid_col
        self.cell_h = -(-self.height // fe.grid_row)
        self.cell_w = -(-self.width // fe.grid_col)

    # -- init ---------------------------------------------------------------

    def init(self, dtype=jnp.float32):
        T = self.config.frontend.max_tracks
        lv = self.config.frontend.lk_pyramid_levels
        h, w = self.height, self.width
        pyr = prepare_pyramid(tuple(
            jnp.zeros((h // (2 ** l), w // (2 ** l)), jnp.float32)
            for l in range(lv + 1)
        ))
        return TrackerState(
            ids=jnp.full((T,), -1, jnp.int32),
            lifetime=jnp.zeros(T, jnp.int32),
            cam0_pts=jnp.zeros((T, 2), dtype),
            cam1_pts=jnp.zeros((T, 2), dtype),
            valid=jnp.zeros(T, bool),
            next_id=jnp.zeros((), jnp.int32),
            pyr_prev=pyr,
            has_prev=jnp.asarray(False),
        )

    # -- helpers ------------------------------------------------------------

    def _in_bounds(self, pts):
        return (
            (pts[:, 0] >= 0) & (pts[:, 0] <= self.width - 1)
            & (pts[:, 1] >= 0) & (pts[:, 1] <= self.height - 1)
        )

    def _cell_code(self, pts):
        row = (pts[:, 1] // self.cell_h).astype(jnp.int32)
        col = (pts[:, 0] // self.cell_w).astype(jnp.int32)
        row = jnp.clip(row, 0, self.grid_row - 1)
        col = jnp.clip(col, 0, self.grid_col - 1)
        return row * self.grid_col + col

    def _predict_tracking(self, pts, R_p_c, intrinsics):
        """H = K R_p_c K^-1 rotation compensation (image.py:521-552)."""
        fx, fy, cx, cy = intrinsics
        K = jnp.asarray(
            [[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], pts.dtype
        )
        Kinv = jnp.asarray(
            [[1.0 / fx, 0.0, -cx / fx], [0.0, 1.0 / fy, -cy / fy],
             [0.0, 0.0, 1.0]], pts.dtype
        )
        Hm = K @ R_p_c.astype(pts.dtype) @ Kinv
        h = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=1) @ Hm.T
        return h[:, 0:2] / jnp.maximum(h[:, 2:3], 1e-9)

    def _stereo_predict(self, cam0_pts):
        """Rotation-only prediction into cam1 (image.py:566-578)."""
        cam0, cam1 = self.config.cam0, self.config.cam1
        und = undistort_points(
            cam0_pts, cam0.intrinsics, cam0.distortion_model,
            cam0.distortion_coeffs,
            rectification_matrix=jnp.asarray(self.R_cam0_cam1),
        )
        return distort_points(
            und, cam1.intrinsics, cam1.distortion_model,
            cam1.distortion_coeffs,
        )

    def _stereo_gates(self, cam0_pts, cam1_pts, cam1_init, back_err,
                      active):
        """Stereo inlier gates (image.py:554-638): backward-consistency
        error, vertical disparity, bounds, essential-matrix epipolar.

        Returns (inliers, gates) where gates maps gate name -> per-point
        pass mask (True = passed), for kill attribution diagnostics."""
        fe = self.config.frontend
        cam0, cam1 = self.config.cam0, self.config.cam1
        disparity = jnp.abs(cam1_init[:, 1] - cam1_pts[:, 1])

        ok_back = back_err < fe.stereo_backward_err_px
        ok_disp = disparity < fe.stereo_disparity_max_px
        ok_bounds = self._in_bounds(cam1_pts)

        # Epipolar gate with the known essential matrix (image.py:609-636).
        p0n = undistort_points(
            cam0_pts, cam0.intrinsics, cam0.distortion_model,
            cam0.distortion_coeffs,
        )
        p1n = undistort_points(
            cam1_pts, cam1.intrinsics, cam1.distortion_model,
            cam1.distortion_coeffs,
        )
        ones = jnp.ones_like(p0n[:, :1])
        line = jnp.concatenate([p0n, ones], axis=1) @ self.E.T.astype(
            p0n.dtype
        )
        dot = jnp.sum(jnp.concatenate([p1n, ones], axis=1) * line, axis=1)
        line_norm = jnp.linalg.norm(line[:, 0:2], axis=1)
        epi_err = jnp.abs(dot) / jnp.maximum(line_norm, 1e-9)
        ok_epi = epi_err <= fe.stereo_threshold * self.norm_pixel_unit

        gates = dict(back=ok_back, disparity=ok_disp, bounds=ok_bounds,
                     epipolar=ok_epi)
        return active & ok_back & ok_disp & ok_bounds & ok_epi, gates

    @staticmethod
    def _rank_in_cell(codes, priority, entry_valid, n_cells):
        """rank[i] = #entries in the same cell with higher priority (stable
        by index) — vectorized replacement for the per-cell Python sorts
        (image.py:209-217, 344-350, 398-404).

        O(n log n): one lexicographic argsort on (valid desc, cell,
        -priority, index) puts each cell's entries in rank order; an entry's
        rank is its sorted position minus the start of its cell run.
        Replaces the round-1/2 O(n^2) pairwise-comparison matrix.
        """
        n = codes.shape[0]
        idx = jnp.arange(n)
        # Invalid entries sort to the back and never affect valid ranks.
        cell = jnp.where(entry_valid, codes, n_cells)
        # Composite key: cell major, then priority desc, then index asc.
        # Priorities are float; encode order via argsort of tuples using
        # two stable passes (last key first).
        order = jnp.argsort(-priority, stable=True)
        order = order[jnp.argsort(cell[order], stable=True)]
        # order: entries grouped by cell, best-first within each cell.
        sorted_cell = cell[order]
        pos = jnp.arange(n)
        is_start = jnp.concatenate(
            [jnp.ones(1, bool), sorted_cell[1:] != sorted_cell[:-1]]
        )
        run_start = jax.lax.cummax(jnp.where(is_start, pos, 0), axis=0)
        rank_sorted = pos - run_start
        return jnp.zeros(n, jnp.int32).at[order].set(
            rank_sorted.astype(jnp.int32)
        )

    # -- the per-frame step ---------------------------------------------------

    def step(self, ts: TrackerState, cam0_img, cam1_img, imu_gyro, imu_dt,
             imu_valid):
        """Process one stereo frame (stareo_callback, image.py:95-141).

        cam*_img: (H, W) uint8/float. imu_*: the frame's IMU bundle (for the
        gyro tracking prediction). Returns (new_state, feature message dict
        with ids (T,), obs (T,4) normalized, valid (T,)).
        """
        cfg = self.config
        fe = cfg.frontend
        lv = fe.lk_pyramid_levels
        T = fe.max_tracks
        cam0, cam1 = cfg.cam0, cfg.cam1

        # Accept uint8 frames: the dataset path ships decoded PNGs to the
        # device as uint8 (4x less host->device traffic — the tunnel's
        # bandwidth, not the chip, bounds the --path flow) and casts here.
        cam0_img = cam0_img.astype(jnp.float32)
        cam1_img = cam1_img.astype(jnp.float32)

        pyr0_2d = build_pyramid(cam0_img, lv)
        pyr0 = prepare_pyramid(pyr0_2d)
        pyr1 = prepare_pyramid(build_pyramid(cam1_img, lv))

        # --- gyro-integrated rotation prediction (image.py:440-487) ---
        nvalid = jnp.maximum(jnp.sum(imu_valid), 1)
        mean_w = jnp.sum(
            jnp.where(imu_valid[:, None], imu_gyro, 0.0), axis=0
        ) / nvalid
        dt_total = jnp.sum(jnp.where(imu_valid, imu_dt, 0.0))
        R0 = jnp.asarray(self.R_cam0_imu, mean_w.dtype)
        R1 = jnp.asarray(self.R_cam1_imu, mean_w.dtype)
        cam0_R_p_c = axis_angle_to_rot((R0.T @ mean_w) * dt_total).T
        cam1_R_p_c = axis_angle_to_rot((R1.T @ mean_w) * dt_total).T
        del cam1_R_p_c  # cam1 prediction unused: stereo runs its own LK

        # --- temporal tracking (image.py:219-313) ---
        pred = self._predict_tracking(
            ts.cam0_pts, cam0_R_p_c, cam0.intrinsics
        )
        lk_be = "pallas" if (
            fe.lk_backend == "pallas"
            or (fe.lk_backend == "auto" and jax.default_backend() == "tpu")
        ) else "xla"
        tracked_pts, st, _ = pyramidal_lk(
            ts.pyr_prev, pyr0, ts.cam0_pts, pred,
            fe.lk_patch_size, fe.lk_max_iteration, fe.lk_track_precision,
            backend=lk_be,
        )
        survived0 = (ts.valid & ts.has_prev & st
                     & self._in_bounds(tracked_pts))

        # --- detection under the occupancy mask (image.py:317-390) ---
        # Occupancy = scatter the surviving track points into the image grid,
        # then dilate by the suppression radius with a max-pool — one dense
        # pass, replacing the reference's per-feature mask painting
        # (image.py:326-330) and the round-1 serial per-track scan.
        # Built from the pre-verification survivors: a track that fails the
        # fwd-bwd or stereo gate below still suppresses re-detection near
        # itself for one frame (documented divergence from image.py:326-330,
        # which masks post-stereo-match features only).
        use_pallas = fe.fast_backend == "pallas" or (
            fe.fast_backend == "auto" and jax.default_backend() == "tpu"
        )
        if use_pallas:
            from vio_msckf_tpu.ops.fast_pallas import fast_score_map_pallas
            score = fast_score_map_pallas(pyr0_2d[0], fe.fast_threshold)
        else:
            score = fast_score_map(pyr0_2d[0], fe.fast_threshold)
        Hh, Ww = score.shape
        ix = jnp.clip(tracked_pts[:, 0].astype(jnp.int32), 0, Ww - 1)
        iy = jnp.clip(tracked_pts[:, 1].astype(jnp.int32), 0, Hh - 1)
        # Invalid points scatter out of range and are dropped.
        iy = jnp.where(survived0, iy, Hh)
        occ = jnp.zeros((Hh, Ww), bool).at[iy, ix].set(True, mode="drop")
        k = 2 * fe.mask_radius + 1
        occ = jax.lax.reduce_window(
            occ, False, jax.lax.bitwise_or, (k, k), (1, 1), "SAME"
        )
        mask = ~occ

        cand_xy, cand_resp, cand_valid = detect_grid_features(
            score, mask, self.grid_row, self.grid_col,
            fe.grid_max_feature_num,
        )
        C = self.grid_row * self.grid_col * fe.grid_max_feature_num
        cand_xy = cand_xy.reshape(C, 2)
        cand_resp = cand_resp.reshape(C)
        cand_valid = cand_valid.reshape(C)
        # Pad the candidate block to a sublane multiple: point counts that
        # are not multiples of 8 force XLA into slow layouts for the whole
        # LK pipeline — measured 3.30 -> 2.85 ms/frame unvmapped and
        # 7.06 -> 2.99 under vmap for P=228 vs 232
        # (scripts/profile_vmap_tracker.py). T=128 keeps T+C_pad and the
        # verify stack (2T+C_pad) aligned too.
        C_pad = -(-C // 8) * 8
        if C_pad != C:
            pad = C_pad - C
            cand_xy = jnp.pad(cand_xy, ((0, pad), (0, 0)))
            cand_resp = jnp.pad(cand_resp, (0, pad))
            cand_valid = jnp.pad(cand_valid, (0, pad))
            C = C_pad

        # --- stereo matching: survivors + candidates in ONE batched pass
        #     (image.py:279-288 and image.py:354 ran two) ---
        sm_pts = jnp.concatenate([tracked_pts, cand_xy], axis=0)
        sm_active = jnp.concatenate([survived0, cand_valid], axis=0)
        cam1_init = self._stereo_predict(sm_pts)
        sm_cam1, st_fwd, _ = pyramidal_lk(
            pyr0, pyr1, sm_pts, cam1_init,
            fe.lk_patch_size, fe.lk_max_iteration, fe.lk_track_precision,
            backend=lk_be,
        )

        # --- ONE merged finest-level verification pass for both
        #     backward-consistency checks (temporal fwd-bwd replacing the
        #     reference's unimplemented 2-pt RANSAC slot, image.py:292-313;
        #     stereo backward, image.py:585-588). Both start at converged
        #     solutions, so the coarse levels add nothing. ---
        (tb_pts, tb_st, _), (sb_pts, sb_st, _) = lk_verify(
            pyr0, ts.pyr_prev,            # pair A: curr0 -> prev0
            pyr1, pyr0,                   # pair B: curr1 -> curr0
            tracked_pts, ts.cam0_pts,
            sm_cam1, sm_pts,
            fe.lk_patch_size, fe.lk_max_iteration, fe.lk_track_precision,
            backend=lk_be,
        )
        fb_err = jnp.linalg.norm(tb_pts - ts.cam0_pts, axis=1)
        fb_ok = tb_st & (fb_err < fe.temporal_backward_err_px)
        survived = survived0 & fb_ok

        sm_back_err = jnp.linalg.norm(sb_pts - sm_pts, axis=1)
        sm_back_err = jnp.where(sb_st, sm_back_err, jnp.inf)
        sm_match, sm_gates = self._stereo_gates(
            sm_pts, sm_cam1, cam1_init, sm_back_err,
            sm_active & st_fwd,
        )
        cam1_pts, cand_cam1 = sm_cam1[:T], sm_cam1[T:]
        match, cand_match = sm_match[:T], sm_match[T:]
        survived = survived & match
        lifetime = jnp.where(survived, ts.lifetime + 1, 0)
        # Per-cell top grid_min among matched candidates (image.py:384-390).
        cand_codes = self._cell_code(cand_xy)
        cand_rank = self._rank_in_cell(
            cand_codes, cand_resp, cand_match, self.grid_row * self.grid_col
        )
        birth = cand_match & (cand_rank < fe.grid_min_feature_num)

        # --- per-cell lifetime cap over survivors + births
        #     (prune_features, image.py:392-404) ---
        all_pts = jnp.concatenate([tracked_pts, cand_xy], axis=0)
        all_valid = jnp.concatenate([survived, birth], axis=0)
        all_life = jnp.concatenate(
            [lifetime, jnp.ones(C, jnp.int32)], axis=0
        )
        codes = self._cell_code(all_pts)
        rank = self._rank_in_cell(
            codes, all_life, all_valid, self.grid_row * self.grid_col
        )
        keep = all_valid & (rank < fe.grid_max_feature_num)

        # --- rebuild the table: survivors keep ids, births get new ids ---
        keep_t = keep[:T]
        keep_c = keep[T:]
        n_keep_t = jnp.sum(keep_t)
        birth_order = jnp.cumsum(keep_c.astype(jnp.int32)) - 1
        new_ids = ts.next_id + birth_order

        slot_t = jnp.cumsum(keep_t.astype(jnp.int32)) - 1
        slot_c = n_keep_t + birth_order
        slot_t = jnp.where(keep_t, slot_t, T)
        slot_c = jnp.where(keep_c, slot_c, T)

        ids = jnp.full((T,), -1, jnp.int32)
        life_new = jnp.zeros(T, jnp.int32)
        p0 = jnp.zeros((T, 2), all_pts.dtype)
        p1 = jnp.zeros((T, 2), all_pts.dtype)

        ids = ids.at[slot_t].set(ts.ids, mode="drop")
        ids = ids.at[slot_c].set(new_ids.astype(jnp.int32), mode="drop")
        life_new = life_new.at[slot_t].set(lifetime, mode="drop")
        life_new = life_new.at[slot_c].set(1, mode="drop")
        p0 = p0.at[slot_t].set(tracked_pts, mode="drop")
        p0 = p0.at[slot_c].set(cand_xy, mode="drop")
        p1 = p1.at[slot_t].set(cam1_pts, mode="drop")
        p1 = p1.at[slot_c].set(cand_cam1, mode="drop")
        n_total = n_keep_t + jnp.sum(keep_c)
        valid_new = jnp.arange(T) < n_total

        new_state = TrackerState(
            ids=ids,
            lifetime=life_new,
            cam0_pts=p0,
            cam1_pts=p1,
            valid=valid_new,
            next_id=ts.next_id + jnp.sum(keep_c).astype(jnp.int32),
            pyr_prev=pyr0,
            has_prev=jnp.asarray(True),
        )

        # --- publish normalized measurements (image.py:406-438) ---
        und0 = undistort_points(
            p0, cam0.intrinsics, cam0.distortion_model,
            cam0.distortion_coeffs,
        )
        und1 = undistort_points(
            p1, cam1.intrinsics, cam1.distortion_model,
            cam1.distortion_coeffs,
        )
        obs = jnp.concatenate([und0, und1], axis=1)

        # --- per-gate kill attribution (cascade order: LK converge ->
        #     backward -> disparity -> bounds -> epipolar), over every
        #     point that reached the stereo stage. Cheap scalars for
        #     observability on hostile inputs; popped off the message by
        #     the engine before the filter sees it. ---
        def count(m):
            return jnp.sum(m).astype(jnp.int32)

        reached = sm_active
        alive = reached & st_fwd
        diag_kill = {"kill_lk": count(reached & ~st_fwd)}
        for name in ("back", "disparity", "bounds", "epipolar"):
            ok = sm_gates[name]
            diag_kill[f"kill_{name}"] = count(alive & ~ok)
            alive = alive & ok
        diag = dict(
            n_prev=count(ts.valid & ts.has_prev),
            kill_fwdbwd=count(survived0 & ~fb_ok),
            n_survived=count(survived),
            n_births=count(keep_c),
            **diag_kill,
        )

        msg = dict(feat_ids=ids, feat_obs=obs, feat_valid=valid_new,
                   diag=diag)
        return new_state, msg
