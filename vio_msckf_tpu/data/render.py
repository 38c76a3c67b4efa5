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

`RenderAugs` adds the hostile-world mode: per-frame exposure flicker
(gain/bias), additive sensor noise, vignetting, and independently moving
occluding spheres — the photometric and scene failure modes the tracker's
gates (fwd-bwd consistency, disparity, epipolar; reference
MSCKF/image.py:585-636) exist to catch. The default `augs=None` path is
bit-identical to the ideal world.
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from vio_msckf_tpu.config import VIOConfig
from vio_msckf_tpu.ops.distortion import undistort_points


@dataclass(frozen=True)
class RenderAugs:
    """Hostility knobs for the rendered world (all off by default)."""

    gain_amp: float = 0.0        # per-frame multiplicative flicker (+-)
    bias_amp: float = 0.0        # per-frame additive offset, DN
    noise_std: float = 0.0       # per-pixel Gaussian sensor noise, DN
    vignette: float = 0.0        # radial falloff fraction at the corners
    n_occluders: int = 0         # independently orbiting textured spheres
    occluder_radius: float = 0.8     # m
    occluder_orbit: float = 5.0      # mean orbit radius around origin, m
    occluder_speed: float = 0.5      # rad/s orbital angular speed
    frame_rate: float = 20.0         # frame index -> seconds
    seed: int = 99


# The committed hostile benchmark configuration (bench.py --suite).
HOSTILE_AUGS = RenderAugs(
    gain_amp=0.10, bias_amp=8.0, noise_std=2.5, vignette=0.3,
    n_occluders=3,
)


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


def render_view(rays_lut, R_c_w, p_cam_w, texture, radius=14.0,
                occ_centers=None, occ_radius=0.8):
    """Render one camera view: intersect each pixel ray with the sphere
    |x| = radius and evaluate the sinusoid texture there.

    rays_lut: (H, W, 3) camera-frame rays; R_c_w: cam->world rotation;
    p_cam_w: camera position in world. occ_centers (Noc, 3), when given,
    are opaque textured spheres of radius occ_radius that occlude the
    background wherever a ray hits one first. Returns (H, W) float32 in
    [0, 255].
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

    if occ_centers is not None:
        # Nearest occluder hit per pixel: |p + t d - c| = r_occ, smaller
        # positive root (camera outside the small spheres).
        rel = p_cam_w[None, :] - occ_centers          # (Noc, 3)
        b = jnp.einsum("hwi,ni->hwn", d, rel)         # (H, W, Noc)
        q = jnp.sum(rel * rel, axis=1) - occ_radius ** 2  # (Noc,)
        disc = b * b - q[None, None, :]
        root = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_occ = -b - root
        hit = (disc > 0.0) & (t_occ > 1e-3)
        t_occ = jnp.where(hit, t_occ, jnp.inf)
        t_near = jnp.min(t_occ, axis=-1)              # (H, W)
        j_near = jnp.argmin(t_occ, axis=-1)
        occluded = t_near < t
        # Texture the occluder surface in LOCAL coordinates (so the pattern
        # rides with the moving sphere) at 3x frequency — dense trackable
        # texture whose motion is inconsistent with ego-motion.
        s_occ = (
            p_cam_w[None, None, :]
            + t_near[..., None] * d
            - occ_centers[j_near]
        )
        phase_occ = jnp.einsum("hwi,ki->hwk", s_occ, 3.0 * omegas) + phases
        val_occ = 128.0 + jnp.einsum(
            "hwk,k->hw", jnp.sin(phase_occ), amps
        )
        val = jnp.where(occluded, val_occ, val)
    return val.astype(jnp.float32)


def _vignette_map(cam, strength):
    """(H, W) radial gain map: 1 at the principal point, (1 - strength) at
    the farthest corner."""
    W, H = cam.resolution
    fx, fy, cx, cy = cam.intrinsics
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    r2 = (u - cx) ** 2 + (v - cy) ** 2
    r2max = max(
        (c[0] - cx) ** 2 + (c[1] - cy) ** 2
        for c in ((0, 0), (W - 1, 0), (0, H - 1), (W - 1, H - 1))
    )
    return jnp.asarray(1.0 - strength * r2 / r2max, jnp.float32)


def _occluder_orbits(augs: RenderAugs):
    """Static per-occluder orbit parameters: orthonormal plane (a, b),
    orbit radius, phase — centers circle the origin independently."""
    rng = np.random.default_rng(augs.seed)
    n = augs.n_occluders
    a = rng.normal(size=(n, 3))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = rng.normal(size=(n, 3))
    b -= np.sum(a * b, axis=1, keepdims=True) * a
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    orbit = augs.occluder_orbit * (0.8 + 0.4 * rng.random(n))
    phase = rng.uniform(0, 2 * np.pi, size=n)
    speed = augs.occluder_speed * (0.7 + 0.6 * rng.random(n))
    return (
        jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
        jnp.asarray(orbit, jnp.float32), jnp.asarray(phase, jnp.float32),
        jnp.asarray(speed, jnp.float32),
    )


def make_renderer(config: VIOConfig, radius=14.0, seed=0, augs=None):
    """Returns a jitted `render(R_w_i, p_imu_w, k) -> (cam0_img, cam1_img)`
    where k is the int32 frame index (drives flicker / noise / occluder
    motion; unused when `augs` is None)."""
    tex = make_texture_basis(
        radius=radius, seed=seed, fx=config.cam0.intrinsics[0]
    )
    lut0 = pixel_ray_lut(config.cam0)
    lut1 = pixel_ray_lut(config.cam1)
    T_i_c0 = jnp.asarray(config.cam0.T_imu_cam_np, jnp.float32)
    T_i_c1 = jnp.asarray(config.cam1.T_imu_cam_np, jnp.float32)

    hostile = augs is not None
    if hostile:
        vig0 = _vignette_map(config.cam0, augs.vignette) \
            if augs.vignette > 0 else None
        vig1 = _vignette_map(config.cam1, augs.vignette) \
            if augs.vignette > 0 else None
        orbits = _occluder_orbits(augs) if augs.n_occluders > 0 else None
        base_key = jax.random.key(augs.seed)

    @jax.jit
    def render(R_w_i, p_imu_w, k):
        R_w_i = R_w_i.astype(jnp.float32)
        p_imu_w = p_imu_w.astype(jnp.float32)
        kf = k.astype(jnp.float32)

        def cam_pose(T_i_c):
            R_i_c, t_i_c = T_i_c[:3, :3], T_i_c[:3, 3]
            R_c_w = R_w_i.T @ R_i_c.T          # cam -> world
            # cam origin in world: p + R_i_w @ (cam origin in imu frame)
            p_cam_i = -R_i_c.T @ t_i_c
            p_cam_w = p_imu_w + R_w_i.T @ p_cam_i
            return R_c_w, p_cam_w

        occ_centers = None
        if hostile and orbits is not None:
            a, b, orbit, phase, speed = orbits
            ang = speed * (kf / augs.frame_rate) + phase
            occ_centers = orbit[:, None] * (
                jnp.cos(ang)[:, None] * a + jnp.sin(ang)[:, None] * b
            )

        R0, p0 = cam_pose(T_i_c0)
        R1, p1 = cam_pose(T_i_c1)
        kwargs = {}
        if occ_centers is not None:
            kwargs = dict(occ_centers=occ_centers,
                          occ_radius=augs.occluder_radius)
        img0 = render_view(lut0, R0, p0, tex, radius, **kwargs)
        img1 = render_view(lut1, R1, p1, tex, radius, **kwargs)

        if hostile:
            # Golden-angle phases: aperiodic per-frame exposure flicker,
            # slightly decorrelated between the two cameras.
            if augs.vignette > 0:
                img0 = img0 * vig0
                img1 = img1 * vig1
            if augs.gain_amp > 0 or augs.bias_amp > 0:
                g0 = 1.0 + augs.gain_amp * jnp.sin(2.39996 * kf)
                g1 = 1.0 + augs.gain_amp * jnp.sin(2.39996 * kf + 0.7)
                b0 = augs.bias_amp * jnp.sin(1.61803 * kf + 0.3)
                b1 = augs.bias_amp * jnp.sin(1.61803 * kf + 1.1)
                img0 = img0 * g0 + b0
                img1 = img1 * g1 + b1
            if augs.noise_std > 0:
                k0 = jax.random.fold_in(base_key, 2 * k)
                k1 = jax.random.fold_in(base_key, 2 * k + 1)
                img0 = img0 + augs.noise_std * jax.random.normal(
                    k0, img0.shape, jnp.float32
                )
                img1 = img1 + augs.noise_std * jax.random.normal(
                    k1, img1.shape, jnp.float32
                )
            img0 = jnp.clip(img0, 0.0, 255.0)
            img1 = jnp.clip(img1, 0.0, 255.0)
        return img0, img1

    return render


def render_sequence(config: VIOConfig, R_w_i_stack, p_stack, radius=14.0,
                    seed=0, chunk=64, augs=None):
    """Render a whole pose sequence as chunked vmapped jits (one dispatch
    per chunk, images stay on device). Returns (cam0 (N,H,W), cam1)."""
    render = make_renderer(config, radius=radius, seed=seed, augs=augs)
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
        ks = jnp.arange(s, s + chunk, dtype=jnp.int32)
        i0, i1 = vrender(jnp.asarray(R[s:s + chunk]),
                         jnp.asarray(p[s:s + chunk]), ks)
        outs0.append(i0)
        outs1.append(i1)
    return jnp.concatenate(outs0)[:n], jnp.concatenate(outs1)[:n]
