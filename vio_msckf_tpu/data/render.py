"""Synthetic stereo image rendering for full-pipeline runs.

Renders the camera views of a procedurally-textured sphere interior
(radius >> trajectory extent), so translation produces genuine parallax and
the rendered sequence exercises the entire image front-end (FAST, pyramids,
KLT, stereo gates, (un)distortion) with photometric consistency across
views. Texture is a band-limited sum of 3-D sinusoids — smooth at pixel
scale, so bilinear LK is well-posed.

Rendering accounts for lens distortion: each pixel's ray comes from the
camera's undistorted-coordinate LUT, so the images are genuinely distorted
observations and the tracker's undistort path is exercised end-to-end.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vio_msckf_tpu.config import VIOConfig
from vio_msckf_tpu.ops.distortion import undistort_points


def make_texture_basis(n_waves=24, radius=14.0, seed=0, min_wavelength_px=7.0,
                       fx=458.0):
    """Random sinusoid basis for the sphere texture. Frequencies are capped
    so the projected wavelength stays >= min_wavelength_px at distance
    ~radius (angular pixel scale 1/fx)."""
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(n_waves, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    w_max = 2 * np.pi * fx / (min_wavelength_px * radius)
    mags = rng.uniform(0.15 * w_max, w_max, size=n_waves)
    omegas = dirs * mags[:, None]
    phases = rng.uniform(0, 2 * np.pi, size=n_waves)
    amps = rng.uniform(0.5, 1.0, size=n_waves)
    amps = amps / amps.sum() * 110.0  # keep values in ~[128-110, 128+110]
    return (
        jnp.asarray(omegas, jnp.float32),
        jnp.asarray(phases, jnp.float32),
        jnp.asarray(amps, jnp.float32),
    )


def pixel_ray_lut(cam):
    """(H, W, 3) unit rays in the camera frame for every pixel, through the
    inverse distortion model. Jitted as one program — unjitted this is
    hundreds of eager dispatches, which crawls on a remote-tunnel backend."""
    W, H = cam.resolution
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    pix = jnp.asarray(
        np.stack([u, v], axis=-1).reshape(-1, 2), jnp.float32
    )

    @jax.jit
    def build(pix):
        xy = undistort_points(
            pix, cam.intrinsics, cam.distortion_model, cam.distortion_coeffs
        )
        rays = jnp.concatenate([xy, jnp.ones_like(xy[:, :1])], axis=1)
        rays = rays / jnp.linalg.norm(rays, axis=1, keepdims=True)
        return rays.reshape(H, W, 3)

    return build(pix)


def render_view(rays_lut, R_c_w, p_cam_w, texture, radius=14.0):
    """Render one camera view: intersect each pixel ray with the sphere
    |x| = radius and evaluate the sinusoid texture there.

    rays_lut: (H, W, 3) camera-frame rays; R_c_w: cam->world rotation;
    p_cam_w: camera position in world. Returns (H, W) float32 in [0, 255].
    """
    omegas, phases, amps = texture
    d = jnp.einsum("ij,hwj->hwi", R_c_w, rays_lut)  # world-frame rays
    # |p + t d| = radius, t > 0 (camera strictly inside the sphere).
    pd = jnp.einsum("hwi,i->hw", d, p_cam_w)
    pp = p_cam_w @ p_cam_w
    t = -pd + jnp.sqrt(jnp.maximum(pd * pd - (pp - radius * radius), 0.0))
    s = p_cam_w[None, None, :] + t[..., None] * d  # (H, W, 3) on sphere
    phase = jnp.einsum("hwi,ki->hwk", s, omegas) + phases
    val = 128.0 + jnp.einsum("hwk,k->hw", jnp.sin(phase), amps)
    return val.astype(jnp.float32)


def make_renderer(config: VIOConfig, radius=14.0, seed=0):
    """Returns a jitted `render(R_w_i, p_imu_w) -> (cam0_img, cam1_img)`."""
    tex = make_texture_basis(
        radius=radius, seed=seed, fx=config.cam0.intrinsics[0]
    )
    lut0 = pixel_ray_lut(config.cam0)
    lut1 = pixel_ray_lut(config.cam1)
    T_i_c0 = jnp.asarray(config.cam0.T_imu_cam_np, jnp.float32)
    T_i_c1 = jnp.asarray(config.cam1.T_imu_cam_np, jnp.float32)

    @jax.jit
    def render(R_w_i, p_imu_w):
        R_w_i = R_w_i.astype(jnp.float32)
        p_imu_w = p_imu_w.astype(jnp.float32)

        def cam_pose(T_i_c):
            R_i_c, t_i_c = T_i_c[:3, :3], T_i_c[:3, 3]
            R_c_w = R_w_i.T @ R_i_c.T          # cam -> world
            # cam origin in world: p + R_i_w @ (cam origin in imu frame)
            p_cam_i = -R_i_c.T @ t_i_c
            p_cam_w = p_imu_w + R_w_i.T @ p_cam_i
            return R_c_w, p_cam_w

        R0, p0 = cam_pose(T_i_c0)
        R1, p1 = cam_pose(T_i_c1)
        img0 = render_view(lut0, R0, p0, tex, radius)
        img1 = render_view(lut1, R1, p1, tex, radius)
        return img0, img1

    return render


def render_sequence(config: VIOConfig, R_w_i_stack, p_stack, radius=14.0,
                    seed=0, chunk=64):
    """Render a whole pose sequence as chunked vmapped jits (one dispatch
    per chunk, images stay on device). Returns (cam0 (N,H,W), cam1)."""
    render = make_renderer(config, radius=radius, seed=seed)
    vrender = jax.jit(jax.vmap(render))
    R = np.asarray(R_w_i_stack, np.float32)
    p = np.asarray(p_stack, np.float32)
    n = R.shape[0]
    # Pad the tail to a full chunk: a second trace/compile of the big
    # fused render kernel costs far more than the wasted frames.
    pad = (-n) % chunk
    if pad:
        R = np.concatenate([R, np.repeat(R[-1:], pad, axis=0)])
        p = np.concatenate([p, np.repeat(p[-1:], pad, axis=0)])
    outs0, outs1 = [], []
    for s in range(0, n + pad, chunk):
        i0, i1 = vrender(jnp.asarray(R[s:s + chunk]),
                         jnp.asarray(p[s:s + chunk]))
        outs0.append(i0)
        outs1.append(i1)
    return jnp.concatenate(outs0)[:n], jnp.concatenate(outs1)[:n]
