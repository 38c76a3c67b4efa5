"""Front-end tracker tests on synthetic planar stereo imagery.

A fronto-parallel textured plane at known depth gives exact ground truth:
cam1 is cam0 shifted by disparity fx*b/Z, camera translation shifts the
image by fx*dx/Z per frame. This exercises the full pipeline (detection,
temporal KLT, triple-LK stereo gates, grid cap, id lifecycle, publish)
without OpenCV."""

import numpy as np
import jax.numpy as jnp
import pytest

from vio_msckf_tpu.config import euroc_config, CameraConfig, _t
from vio_msckf_tpu.frontend import StereoTracker

FX = 400.0
DEPTH = 5.0
BASELINE = 0.11
W, H = 376, 240


def pinhole_cfg():
    """Distortion-free stereo rig: pure x baseline."""
    cam = dict(
        intrinsics=(FX, FX, W / 2, H / 2),
        distortion_model="radtan",
        distortion_coeffs=(0.0, 0.0, 0.0, 0.0),
        resolution=(W, H),
    )
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[0, 3] = -BASELINE  # vec_imu -> vec_cam1 == vec_cam0 - b x
    cfg = euroc_config(
        cam0=CameraConfig(T_imu_cam=_t(T0), **cam),
        cam1=CameraConfig(T_imu_cam=_t(T1), **cam),
        T_cn_cnm1=_t(T1),
    )
    return cfg


def texture(rng):
    img = rng.uniform(20, 235, size=(H // 4, (W + 200) // 4))
    img = np.kron(img, np.ones((4, 4)))
    k = np.array([1, 4, 6, 4, 1]) / 16.0
    for ax in (0, 1):
        img = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, img
        )
    return img.astype(np.float32)


def render(tex, x_offset):
    """Sample the wide texture with a horizontal offset (subpixel)."""
    from scipy.ndimage import map_coordinates
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    return map_coordinates(
        tex, [yy, xx + x_offset + 100.0], order=1, mode="nearest"
    ).astype(np.float32)


@pytest.fixture(scope="module")
def rig(request):
    return pinhole_cfg()


def run_frames(cfg, n_frames, cam_speed=0.02):
    rng = np.random.default_rng(5)
    tex = texture(rng)
    disp = FX * BASELINE / DEPTH  # px
    tracker = StereoTracker(cfg)
    ts = tracker.init()
    M = cfg.filter.imu_per_frame
    zeros_imu = (
        jnp.zeros((M, 3)), jnp.full((M,), 0.005), jnp.ones((M,), bool)
    )
    msgs, states = [], []
    for k in range(n_frames):
        shift = FX * cam_speed * k / DEPTH
        img0 = render(tex, shift)
        img1 = render(tex, shift + disp)  # u1 = u0 - disp
        ts, msg = tracker.step(
            ts, jnp.asarray(img0), jnp.asarray(img1), *zeros_imu
        )
        msgs.append({k2: np.asarray(v) for k2, v in msg.items()})
        states.append(ts)
    return msgs, states, disp


def test_detection_and_stereo(rig):
    msgs, states, disp = run_frames(rig, 1)
    m = msgs[0]
    n = m["feat_valid"].sum()
    assert n >= 20, f"only {n} features detected"
    obs = m["feat_obs"][m["feat_valid"]]
    # Normalized disparity u0 - u1 == b/Z, v0 == v1. Horizontal slips along
    # the epipolar line are physically unconstrained by the gates (as with
    # cv2's LK), so the check is statistical: tight median, bounded tail.
    d_err = np.abs((obs[:, 0] - obs[:, 2]) - BASELINE / DEPTH)
    assert np.median(d_err) < 0.15 / FX
    assert np.quantile(d_err, 0.9) < 1.0 / FX
    v_err = np.abs(obs[:, 1] - obs[:, 3])
    assert np.median(v_err) < 0.15 / FX
    assert v_err.max() < 3.0 / FX  # epipolar gate enforces the vertical


def test_tracking_and_lifecycle(rig):
    msgs, states, disp = run_frames(rig, 5)
    ids0 = set(msgs[0]["feat_ids"][msgs[0]["feat_valid"]].tolist())
    ids4 = set(msgs[4]["feat_ids"][msgs[4]["feat_valid"]].tolist())
    # A healthy majority of features survive 5 frames of slow motion.
    survivors = ids0 & ids4
    assert len(survivors) >= 0.6 * len(ids0)
    # Lifetimes grow for survivors.
    lt = np.asarray(states[4].lifetime)
    ids = np.asarray(states[4].ids)
    vmask = np.asarray(states[4].valid)
    lt_surv = lt[vmask & np.isin(ids, list(survivors))]
    assert (lt_surv == 5).all()

    # Tracked motion matches the ground-truth image shift.
    m0, m1 = msgs[0], msgs[1]
    shift_gt = 400.0 * 0.02 / DEPTH / FX  # normalized units per frame
    common = np.intersect1d(
        m0["feat_ids"][m0["feat_valid"]], m1["feat_ids"][m1["feat_valid"]]
    )
    u0 = {i: o for i, o in zip(m0["feat_ids"], m0["feat_obs"][:, 0])}
    u1 = {i: o for i, o in zip(m1["feat_ids"], m1["feat_obs"][:, 0])}
    # Camera moves +x 0.02 m -> scene moves -x in image -> u decreases.
    deltas = np.array([u1[i] - u0[i] for i in common])
    np.testing.assert_allclose(
        np.median(deltas), -shift_gt, atol=0.3 / FX
    )


def test_grid_cap(rig):
    msgs, states, _ = run_frames(rig, 3)
    cfg = rig
    st = states[-1]
    pts = np.asarray(st.cam0_pts)[np.asarray(st.valid)]
    cell_h = -(-H // cfg.frontend.grid_row)
    cell_w = -(-W // cfg.frontend.grid_col)
    codes = (
        (pts[:, 1] // cell_h).astype(int) * cfg.frontend.grid_col
        + (pts[:, 0] // cell_w).astype(int)
    )
    counts = np.bincount(codes, minlength=cfg.grid_num)
    assert counts.max() <= cfg.frontend.grid_max_feature_num


def test_ids_unique(rig):
    msgs, _, _ = run_frames(rig, 4)
    for m in msgs:
        ids = m["feat_ids"][m["feat_valid"]]
        assert len(ids) == len(set(ids.tolist()))
