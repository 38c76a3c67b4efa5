"""Checkpoint/resume, viewer process, CLI helpers, logging subsystems."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vio_msckf_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from vio_msckf_tpu.cli import _rot_to_hamilton_xyzw, write_tum, build_parser
from vio_msckf_tpu.utils.logging import StageTimer, get_logger, maybe_profile


def test_checkpoint_roundtrip(tmp_path):
    carry = (
        jnp.arange(12.0).reshape(3, 4),
        dict(a=jnp.ones((2, 2), bool), b=jnp.asarray(3, jnp.int32)),
        [jnp.zeros(5), jnp.full((7,), 2.5)],
    )
    path = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(path, carry, step=42, extra={"note": "x"})
    carry2, step, extra = load_checkpoint(path, carry)
    assert step == 42
    assert extra == {"note": "x"}
    for a, b in zip(jax.tree_util.tree_leaves(carry),
                    jax.tree_util.tree_leaves(carry2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert np.asarray(a).dtype == np.asarray(b).dtype


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    path = os.path.join(tmp_path, "c.npz")
    save_checkpoint(path, (jnp.zeros(3),))
    with pytest.raises(AssertionError):
        load_checkpoint(path, (jnp.zeros(4),))


def test_checkpoint_engine_carry_resume(tmp_path):
    """Saving/restoring the real engine carry is exact: stepping from a
    restored carry equals stepping from the original."""
    from vio_msckf_tpu.parallel import tiny_config
    from vio_msckf_tpu.engine import VIOEngine

    cfg = tiny_config()
    eng = VIOEngine(cfg)
    carry = eng.init()
    rng = np.random.default_rng(0)
    W, H = cfg.cam0.resolution
    M = cfg.filter.imu_per_frame
    frame = dict(
        cam0_img=jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32),
        cam1_img=jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32),
        imu_gyro=jnp.zeros((M, 3), jnp.float32),
        imu_acc=jnp.tile(jnp.asarray([0.0, 0.0, 9.81], jnp.float32),
                         (M, 1)),
        imu_dt=jnp.full((M,), 0.005, jnp.float32),
        imu_valid=jnp.ones((M,), bool),
    )
    step = jax.jit(eng.step)
    carry1, _ = step(carry, frame)

    path = os.path.join(tmp_path, "engine.npz")
    save_checkpoint(path, carry1, step=1)
    carry1r, k, _ = load_checkpoint(path, eng.init())
    assert k == 1

    c_a, out_a = step(carry1, frame)
    c_b, out_b = step(carry1r, frame)
    assert np.allclose(np.asarray(out_a.p), np.asarray(out_b.p))
    assert np.allclose(np.asarray(out_a.q), np.asarray(out_b.q))


def test_rot_to_hamilton_roundtrip():
    from scipy.spatial.transform import Rotation
    rng = np.random.default_rng(1)
    for _ in range(20):
        R = Rotation.from_rotvec(rng.normal(0, 1.5, 3)).as_matrix()
        q = _rot_to_hamilton_xyzw(R)
        R2 = Rotation.from_quat(q).as_matrix()
        assert np.allclose(R, R2, atol=1e-9)


def test_write_tum(tmp_path):
    path = os.path.join(tmp_path, "traj.txt")
    times = np.array([0.0, 0.1])
    ps = np.array([[0, 0, 0], [1, 2, 3]], float)
    Rs = [np.eye(3), np.eye(3)]
    write_tum(path, times, ps, Rs)
    rows = np.loadtxt(path)
    assert rows.shape == (2, 8)
    assert np.allclose(rows[1, 1:4], [1, 2, 3])
    assert np.allclose(rows[:, 7], 1.0)  # identity quaternion w


def test_cli_parser():
    ap = build_parser()
    args = ap.parse_args(["--demo", "--pipeline", "eskf", "--ratio", "0.4"])
    assert args.demo and args.pipeline == "eskf" and args.ratio == 0.4


def test_viewer_process(tmp_path):
    from vio_msckf_tpu.viewer import Viewer, DynamicArray

    arr = DynamicArray(3, capacity=2)
    for i in range(5):
        arr.append([i, 0, 0])
    assert len(arr) == 5
    assert np.allclose(arr.array()[:, 0], np.arange(5))

    png = os.path.join(tmp_path, "live.png")
    v = Viewer(out_png=png, interval=0.01)
    for i in range(10):
        v.update_pose([0.1 * i, 0.0, 0.0])
    v.update_image(np.zeros((48, 64), np.uint8))
    import time
    time.sleep(1.0)
    v.close()
    # The child writes its final frame on STOP; under full-suite load the
    # write can land shortly after join returns.
    deadline = time.time() + 30.0
    while not os.path.exists(png) and time.time() < deadline:
        time.sleep(0.25)
    assert os.path.exists(png)


def test_stage_timer_and_logger():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()
    get_logger("vio.test").info("hello")
    with maybe_profile(None):
        pass
