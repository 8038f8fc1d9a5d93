"""Synthetic two-view problems with known ground truth.

The reference has no test suite (SURVEY.md §4); its verification is
eval scripts against dataset ground truth.  For a hermetic test/bench
story we generate problems where the exact solution is known:

- a smooth band-limited random feature map (sum of low-frequency
  sinusoids) stands in for CNN features — smooth enough that bilinear
  resampling and local linearization behave like they do on real
  feature pyramids;
- reference-view point features are *defined* as the target map sampled
  at the ground-truth warp, so the GN residual is exactly zero at the
  true pose and convergence can be asserted to tight tolerances;
- ``make_synthetic_image_pair`` renders an actual RGB pair + depth by
  inverse-warping a procedural texture, for end-to-end model tests and
  training smoke runs (no dataset downloads are possible here).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from banet_tpu.geometry.camera import Intrinsics, backproject, warp_points
from banet_tpu.geometry.se3 import exp_so3
from banet_tpu.ops.resample import bilinear_sample


def smooth_feature_map(key, shape: Tuple[int, int, int, int],
                       num_waves: int = 24,
                       max_freq: float = 0.04) -> jnp.ndarray:
    """Band-limited random field: (B, H, W, C), values O(1), smooth."""
    B, H, W, C = shape
    k1, k2, k3 = jax.random.split(key, 3)
    freqs = max_freq * jax.random.normal(k1, (num_waves, 2))
    phases = 2 * jnp.pi * jax.random.uniform(k2, (B, num_waves, C))
    amps = jax.random.normal(k3, (B, num_waves, C)) / jnp.sqrt(num_waves)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    # (num_waves, H, W)
    carrier = freqs[:, 0:1, None] * yy[None] + freqs[:, 1:2, None] * xx[None]
    waves = jnp.sin(2 * jnp.pi * carrier[None, :, :, :, None]
                    + phases[:, :, None, None, :])
    return jnp.sum(amps[:, :, None, None, :] * waves, axis=1)


def make_two_view_problem(key, batch: int = 1, height: int = 64,
                          width: int = 80, channels: int = 8,
                          num_points: int = 256,
                          rot_magnitude: float = 0.05,
                          trans_magnitude: float = 0.05,
                          normalized_rays: bool = True,
                          basis_channels: int = 0) -> Dict:
    """Build a solvable two-view GN problem with known (R*, t*[, W*]).

    Returns a dict with everything the solvers consume plus the ground
    truth.  When ``basis_channels`` > 0 a depth basis and nonzero true
    coefficients W* are included (init_depth is the true depth *minus*
    basis . W*, so recovering W* fixes the depth).
    """
    ks = jax.random.split(key, 8)
    intr = Intrinsics(
        fx=jnp.full((batch,), 0.8 * width),
        fy=jnp.full((batch,), 0.8 * width),
        cx=jnp.full((batch,), width / 2.0),
        cy=jnp.full((batch,), height / 2.0),
    )
    # Points away from borders so the GT warp stays in-bounds.
    px = jax.random.uniform(ks[0], (batch, num_points), minval=0.2 * width,
                            maxval=0.8 * width)
    py = jax.random.uniform(ks[1], (batch, num_points), minval=0.2 * height,
                            maxval=0.8 * height)
    points = jnp.stack([px, py], axis=-1)
    rays = backproject(points, intr, normalized=normalized_rays)
    depth_true = jax.random.uniform(ks[2], (batch, num_points), minval=2.0,
                                    maxval=4.0)

    w_true = rot_magnitude * jax.random.normal(ks[3], (batch, 3))
    R_true = exp_so3(w_true)
    t_true = trans_magnitude * jax.random.normal(ks[4], (batch, 3))

    tgt = smooth_feature_map(ks[5], (batch, height, width, channels))

    out = dict(intr=intr, points=points, rays=rays, R_true=R_true,
               t_true=t_true, tgt_feats=tgt)

    if basis_channels:
        # Smooth per-point basis values and true coefficients.
        basis = 0.3 * smooth_feature_map(
            ks[6], (batch, height, width, basis_channels))
        b_pts = bilinear_sample(basis, points[..., 0], points[..., 1])
        W_true = 0.5 * jax.random.normal(ks[7], (batch, basis_channels))
        init_depth = depth_true - jnp.einsum("bnk,bk->bn", b_pts, W_true)
        out.update(basis_map=basis, basis_points=b_pts, W_true=W_true,
                   init_depth=init_depth, depth_true=depth_true)
    else:
        out.update(depth=depth_true)

    # Reference features = target features at the GT warp -> zero
    # residual at the true pose.
    gx, gy, *_ = warp_points(rays, depth_true, R_true, t_true, intr)
    out["ref_feats"] = bilinear_sample(tgt, gx, gy)
    return out


def _analytic_texture(key, num_waves: int = 48, max_freq: float = 2.0,
                      channels: int = 3):
    """Sum-of-sinusoids texture evaluable at ARBITRARY continuous world
    coordinates (no grid, no resampling error): returns
    ``tex(x, y) -> (..., channels)`` for x, y in meters."""
    k1, k2, k3 = jax.random.split(key, 3)
    freqs = max_freq * jax.random.normal(k1, (num_waves, 2))
    phases = 2 * jnp.pi * jax.random.uniform(k2, (num_waves, channels))
    amps = jax.random.normal(k3, (num_waves, channels)) / jnp.sqrt(
        num_waves)

    def tex(x, y):
        carrier = (freqs[:, 0] * x[..., None] +
                   freqs[:, 1] * y[..., None])  # (..., num_waves)
        waves = jnp.sin(2 * jnp.pi * carrier[..., None] +
                        phases)                 # (..., num_waves, ch)
        return jnp.sum(amps * waves, axis=-2)

    return tex


def _dead_leaves_texture(key, num_disks: int = 96,
                         radius_range: Tuple[float, float] = (0.08, 1.2),
                         extent: float = 8.0, channels: int = 3):
    """Dead-leaves texture: occluding random disks, the standard
    generative model of NATURAL-image statistics (scale-invariant
    power spectrum, sharp occlusion edges, heavy-tailed gradients) —
    everything the smooth band-limited sum-of-sinusoids textures lack.
    Used by the photographic-statistics eval domain "P" (VERDICT r4
    missing #1: all-synthetic accuracy might flatter feature nets fit
    to smooth analytic textures; this fixture stresses them with
    photo-like statistics while staying exactly renderable).

    Returns ``tex(x, y) -> (..., channels)`` like _analytic_texture
    (evaluable at arbitrary continuous world coordinates, no grid).
    Radii are log-uniform (approximating the scale-invariant r^-3
    law); a low-contrast smooth field fills the background so no
    region is featureless.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    centers = jax.random.uniform(k1, (num_disks, 2), minval=-extent,
                                 maxval=extent)
    lo, hi = radius_range
    radii = jnp.exp(jax.random.uniform(
        k2, (num_disks,), minval=jnp.log(lo), maxval=jnp.log(hi)))
    colors = 0.8 * jax.random.normal(k3, (num_disks, channels))
    base = _analytic_texture(k4, num_waves=12, max_freq=0.8,
                             channels=channels)
    # (K, 6): cx, cy, r^2, color...  — scanned far-to-near so later
    # (nearer) leaves overwrite earlier ones, exactly the dead-leaves
    # occlusion process.
    disks = jnp.concatenate([centers, (radii ** 2)[:, None], colors],
                            axis=-1)

    def tex(x, y):
        def body(col, p):
            inside = ((x - p[0]) ** 2 + (y - p[1]) ** 2) < p[2]
            return jnp.where(inside[..., None], p[3:3 + channels],
                             col), None
        col0 = 0.35 * base(x, y)
        out, _ = jax.lax.scan(body, col0, disks)
        return out

    return tex


# ---------------------------------------------------------------------------
# Domain randomization (VERDICT r3 item 6: the strongest in-env proxy for
# real-data generalization).  A "domain" fixes the nuisance statistics the
# tracker must be robust to: texture spectrum/contrast/palette, lens
# vignetting, illumination gradient, sensor gain/bias/noise, rolling-shutter
# skew.  Domains "A" (train) and "B" (held-out) have DISJOINT parameter
# ranges, so evaluating on B measures generalization to unseen imaging
# statistics, not memorization of the renderer (the role TUM fr1/fr2 plays
# for the reference, legacy/eval.py:234 — no real data exists in this
# zero-egress environment).
DOMAINS = {
    # Training domain: moderate texture, mild camera nuisances.
    "A": dict(tex_freq=(1.0, 2.2), tex_waves=48, contrast=(85.0, 115.0),
              color_mix=0.3, vignette=(0.0, 0.12), gradient=(0.0, 0.10),
              gain=(0.92, 1.08), bias=(-6.0, 6.0), noise=(0.0, 2.0),
              shutter=(0.0, 0.15)),
    # Held-out domain: finer+weaker texture, different palette mixing,
    # strong vignette/gradient, darker gain, more noise, more skew —
    # every range disjoint from (or outside) A's.
    "B": dict(tex_freq=(2.6, 4.5), tex_waves=20, contrast=(45.0, 75.0),
              color_mix=0.8, vignette=(0.15, 0.35), gradient=(0.12, 0.25),
              gain=(0.78, 0.90), bias=(6.0, 15.0), noise=(2.5, 4.5),
              shutter=(0.15, 0.30)),
    # Photographic-statistics eval domain: dead-leaves textures
    # (natural-image statistics — scale-invariant spectrum, occlusion
    # edges, heavy-tailed gradients) with mild camera nuisances, so
    # the texture statistics are the variable under test.  Never
    # trained on; the committed regression fixture
    # tests/data/photostat_seq is rendered from it.
    "P": dict(tex_kind="leaves", tex_freq=(1.0, 2.2), tex_waves=48,
              contrast=(85.0, 115.0), color_mix=0.15,
              vignette=(0.0, 0.10), gradient=(0.0, 0.08),
              gain=(0.95, 1.05), bias=(-4.0, 4.0), noise=(0.0, 1.5),
              shutter=(0.0, 0.10)),
}


def _uniform_in(key, rng: Tuple[float, float], shape=()):
    return jax.random.uniform(key, shape, minval=rng[0], maxval=rng[1])


def apply_camera_effects(key, rgb: jnp.ndarray, domain: str,
                         vignette_strength=None) -> jnp.ndarray:
    """Per-frame sensor/lens nuisances for a domain: radial vignette,
    linear illumination gradient, exposure gain, black-level bias,
    pixel noise.  ``rgb`` is (H, W, 3) in [0, 255].  Pass
    ``vignette_strength`` to pin the (per-camera, not per-frame)
    vignette across a sequence."""
    d = DOMAINS[domain]
    ks = jax.random.split(key, 5)
    H, W = rgb.shape[:2]
    yy, xx = jnp.meshgrid(jnp.linspace(-1.0, 1.0, H),
                          jnp.linspace(-1.0, 1.0, W), indexing="ij")
    v = (_uniform_in(ks[0], d["vignette"]) if vignette_strength is None
         else jnp.asarray(vignette_strength))
    r2 = (xx ** 2 + yy ** 2) / 2.0
    illum = 1.0 - v * r2
    theta = 2 * jnp.pi * jax.random.uniform(ks[1], ())
    g = _uniform_in(ks[2], d["gradient"])
    illum = illum * (1.0 + g * (xx * jnp.cos(theta) + yy * jnp.sin(theta)))
    gain = _uniform_in(ks[3], d["gain"])
    bias = _uniform_in(jax.random.fold_in(ks[3], 1), d["bias"])
    noise = _uniform_in(jax.random.fold_in(ks[3], 2), d["noise"])
    out = rgb * illum[..., None] * gain + bias
    out = out + noise * jax.random.normal(ks[4], rgb.shape)
    return jnp.clip(out, 0.0, 255.0)


def make_plane_scene(key, num_planes: int = 3,
                     depth_range: Tuple[float, float] = (2.0, 5.0),
                     domain: str = None):
    """A world of ``num_planes`` textured fronto-parallel planes.

    Returns (render_fn, plane_depths): ``render_fn(R_cw, t_cw, intr,
    height, width) -> (rgb (H, W, 3) in [0, 255], depth (H, W))``
    renders any camera pose (cam-from-world) with exact closed-form
    ray-plane intersection, z-buffered — coherent multi-view geometry
    with real parallax and occlusion boundaries, unlike the
    inverse-warp pair renderer.  Infinitely sharp and consistent: GT
    depth is exact z-depth, GT poses arbitrary.

    ``domain`` (see DOMAINS) randomizes the texture statistics per
    plane (spectrum, contrast, channel mixing); camera-side nuisances
    are applied by the callers via ``apply_camera_effects`` (they are
    per-frame, not per-world).  ``render_fn`` also accepts optional
    ``shutter_w``/``shutter_v`` (3-vectors): rolling-shutter readout —
    the pose advances by ``s * shutter`` across rows, s in [-.5, .5]
    (the nominal pose holds at the center row, so GT pose/depth stay
    well-defined there).
    """
    ks = jax.random.split(key, num_planes + 1)
    depths = jnp.sort(jax.random.uniform(
        ks[0], (num_planes,), minval=depth_range[0],
        maxval=depth_range[1]))
    if domain is None:
        texs = [_analytic_texture(ks[1 + j], max_freq=1.5 + 0.5 * j)
                for j in range(num_planes)]
        contrasts = [100.0] * num_planes
        mixes = [jnp.eye(3)] * num_planes
    else:
        d = DOMAINS[domain]
        texs, contrasts, mixes = [], [], []
        for j in range(num_planes):
            kj = jax.random.split(ks[1 + j], 4)
            freq = float(d["tex_freq"][0] +
                         (d["tex_freq"][1] - d["tex_freq"][0]) *
                         (j + 0.5) / num_planes)
            if d.get("tex_kind") == "leaves":
                # Nearer (smaller-extent) planes get proportionally
                # smaller leaves, mirroring the freq ramp of the
                # analytic branch.
                sc = 1.0 / freq
                texs.append(_dead_leaves_texture(
                    kj[0], radius_range=(0.08 * sc, 1.2 * sc)))
            else:
                texs.append(_analytic_texture(
                    kj[0], num_waves=d["tex_waves"], max_freq=freq))
            contrasts.append(_uniform_in(kj[1], d["contrast"]))
            m = d["color_mix"]
            M = ((1.0 - m) * jnp.eye(3) +
                 m * jax.random.normal(kj[2], (3, 3)) / jnp.sqrt(3.0))
            mixes.append(M)
    # Nearer planes occupy a random off-center disk (so farther planes
    # stay visible around them); the farthest plane is infinite.
    kd = jax.random.split(ks[0], num_planes)
    centers = jax.random.uniform(kd[0], (num_planes, 2), minval=-1.0,
                                 maxval=1.0)
    radii = jax.random.uniform(kd[1 % num_planes], (num_planes,),
                               minval=0.6, maxval=1.4)

    def render(R_cw, t_cw, intr, height: int, width: int,
               shutter_w=None, shutter_v=None):
        yy, xx = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                              jnp.arange(width, dtype=jnp.float32),
                              indexing="ij")
        fx = intr.fx.reshape(())
        fy = intr.fy.reshape(())
        cx = intr.cx.reshape(())
        cy = intr.cy.reshape(())
        rays = jnp.stack([(xx - cx) / fx, (yy - cy) / fy,
                          jnp.ones_like(xx)], axis=-1)  # (H, W, 3)
        Rt = R_cw.T
        if shutter_w is None:
            rw = rays @ Rt.T                   # ray dirs in world
            ow = -Rt @ t_cw                    # camera center in world
            ow_x, ow_y, ow_z = ow[0], ow[1], ow[2]
        else:
            # Rolling shutter: row r reads out at s = r/(H-1) - 0.5 of
            # the frame time; pose(s) = exp(s*w) @ R_cw, t + s*v.
            s = (jnp.arange(height, dtype=jnp.float32) /
                 max(height - 1, 1) - 0.5)
            dR = exp_so3(s[:, None] * shutter_w[None, :])   # (H, 3, 3)
            # world dir = (dR(s) @ R_cw)^T @ ray = R_cw^T dR^T ray
            rays_s = jnp.einsum("hji,hwj->hwi", dR, rays)
            rw = rays_s @ Rt.T
            t_s = t_cw[None, :] + s[:, None] * shutter_v[None, :]
            R_eff = jnp.einsum("hij,jk->hik", dR, R_cw)
            ow_rows = -jnp.einsum("hji,hj->hi", R_eff, t_s)  # (H, 3)
            ow_x, ow_y, ow_z = (ow_rows[:, 0:1], ow_rows[:, 1:2],
                                ow_rows[:, 2:3])

        best_z = jnp.full((height, width), jnp.inf)
        rgb = jnp.zeros((height, width, 3))
        for j in range(len(texs)):
            denom = rw[..., 2]
            denom = jnp.where(jnp.abs(denom) < 1e-6,
                              jnp.sign(denom) * 1e-6 + 1e-12, denom)
            z = (depths[j] - ow_z) / denom     # depth along CAMERA ray
            xw = ow_x + z * rw[..., 0]
            yw = ow_y + z * rw[..., 1]
            inside = (z > 0.1)
            if j < len(texs) - 1:
                d2 = ((xw - centers[j, 0]) ** 2 +
                      (yw - centers[j, 1]) ** 2)
                inside = inside & (d2 < radii[j] ** 2)
            hit = inside & (z < best_z)
            col = 127.5 + contrasts[j] * jnp.tanh(
                texs[j](xw, yw) @ mixes[j].T)
            rgb = jnp.where(hit[..., None], col, rgb)
            best_z = jnp.where(hit, z, best_z)
        depth = jnp.where(jnp.isfinite(best_z), best_z, 0.0)
        return rgb, depth

    return render, depths


def smooth_trajectory(key, num_frames: int, step_rot: float = 0.01,
                      step_trans: float = 0.02, step_scale=None):
    """Smooth random camera path: poses (cam-from-world) as
    (Rs (F, 3, 3), ts (F, 3)), starting at the identity, with a
    low-pass-filtered random-walk velocity.

    ``step_scale``: optional (F,) per-frame multiplier applied AFTER
    smoothing — lets a segment of frames move abruptly faster (the
    rescue-sequence fixture) without softening its onset."""
    k1, k2 = jax.random.split(key)
    w_steps = step_rot * jax.random.normal(k1, (num_frames, 3))
    t_steps = step_trans * jax.random.normal(k2, (num_frames, 3))
    # Smooth the per-frame increments (momentum 0.7).
    def smooth(steps):
        def body(carry, s):
            v = 0.7 * carry + 0.3 * s
            return v, v
        _, out = jax.lax.scan(body, jnp.zeros(3), steps)
        return out
    w_s = smooth(w_steps)
    t_s = smooth(t_steps)
    if step_scale is not None:
        sc = jnp.asarray(step_scale, jnp.float32)[:, None]
        w_s = w_s * sc
        t_s = t_s * sc
    Rs, ts = [jnp.eye(3)], [jnp.zeros(3)]
    for i in range(1, num_frames):
        dR = exp_so3(w_s[i][None])[0]
        Rs.append(dR @ Rs[-1])
        ts.append(dR @ ts[-1] + t_s[i])
    return jnp.stack(Rs), jnp.stack(ts)


def write_rendered_sequence(seq_dir: str, num_frames: int = 30,
                            size: Tuple[int, int] = (128, 160),
                            seed: int = 0, num_planes: int = 3,
                            step_rot: float = 0.01,
                            step_trans: float = 0.02,
                            fps: float = 30.0,
                            domain: str = None,
                            step_scale=None,
                            frame_contrast=None):
    """Render a COHERENT TUM-format sequence from the multi-plane world
    (geometrically consistent frames a tracker can actually track, with
    exact GT depth and trajectory) — the trajectory-level accuracy
    fixture this zero-egress environment substitutes for TUM data.
    Returns the loaded data.tum.TumSequence.

    ``domain``: draw world textures + per-frame camera effects from
    that DOMAINS entry (vignette pinned per-sequence — it is a lens
    property).  ``step_scale``: (F,) trajectory-step multiplier (fast-
    motion segments for the rescue fixture).  ``frame_contrast``: (F,)
    multiplier collapsing contrast around mid-gray on chosen frames
    (low-texture segments — auto-exposure blowout semantics).
    """
    import os

    import numpy as np
    from PIL import Image

    from banet_tpu.data.tum import DEPTH_SCALE, TumSequence
    from banet_tpu.geometry.se3 import rotation_to_quaternion

    H, W = size
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    intr = Intrinsics(jnp.array([0.9 * W]), jnp.array([0.9 * W]),
                      jnp.array([W / 2.0]), jnp.array([H / 2.0]))
    render, _ = make_plane_scene(k1, num_planes=num_planes,
                                 domain=domain)
    Rs, ts = smooth_trajectory(k2, num_frames, step_rot, step_trans,
                               step_scale=step_scale)
    if domain is not None:
        vstr = float(_uniform_in(jax.random.fold_in(key, 3),
                                 DOMAINS[domain]["vignette"]))

    os.makedirs(os.path.join(seq_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "depth"), exist_ok=True)
    rgb_lines, depth_lines, gt_lines = [], [], []
    render_j = jax.jit(lambda R, t: render(R, t, intr, H, W))
    effects_j = jax.jit(lambda k, rgb: apply_camera_effects(
        k, rgb, domain, vignette_strength=vstr)) \
        if domain is not None else None
    for i in range(num_frames):
        tstamp = 1000.0 + i / fps
        rgb, depth = render_j(Rs[i], ts[i])
        if frame_contrast is not None:
            c = float(frame_contrast[i])
            rgb = 127.5 + (rgb - 127.5) * c
        if effects_j is not None:
            rgb = effects_j(jax.random.fold_in(key, 100 + i), rgb)
        img = np.clip(np.asarray(rgb), 0, 255).astype(np.uint8)
        d16 = np.clip(np.asarray(depth) * DEPTH_SCALE, 0,
                      65535).astype(np.uint16)
        rp = f"rgb/{tstamp:.6f}.png"
        dp = f"depth/{tstamp:.6f}.png"
        Image.fromarray(img).save(os.path.join(seq_dir, rp))
        Image.fromarray(d16).save(os.path.join(seq_dir, dp))
        rgb_lines.append(f"{tstamp:.6f} {rp}")
        depth_lines.append(f"{tstamp:.6f} {dp}")
        # TUM GT is world-from-camera: center = -R^T t, orientation R^T.
        Rwc = np.asarray(Rs[i]).T
        pos = -Rwc @ np.asarray(ts[i])
        q = np.asarray(rotation_to_quaternion(jnp.asarray(Rwc)[None]))[0]
        gt_lines.append(
            f"{tstamp:.6f} {pos[0]:.6f} {pos[1]:.6f} {pos[2]:.6f} "
            f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}")
    for name, lines in [("rgb.txt", rgb_lines),
                        ("depth.txt", depth_lines),
                        ("groundtruth.txt", gt_lines)]:
        with open(os.path.join(seq_dir, name), "w") as f:
            f.write("# rendered plane-scene sequence\n" +
                    "\n".join(lines) + "\n")
    # Record the renderer's TRUE calibration; without this the loader
    # falls back to the freiburg guess (fx 535 vs the true 0.9*W) and
    # every consumer solves with wrong projective geometry.
    with open(os.path.join(seq_dir, "intrinsics.txt"), "w") as f:
        f.write(f"{0.9 * W:.6f} {0.9 * W:.6f} {W / 2.0:.6f} "
                f"{H / 2.0:.6f}\n")
    return TumSequence(seq_dir)


def make_plane_scene_pair(key, batch: int = 1, height: int = 128,
                          width: int = 160, num_planes: int = 3,
                          rot_magnitude: float = 0.03,
                          trans_magnitude: float = 0.05,
                          photometric_gain: float = 0.0,
                          pixel_noise: float = 0.0,
                          domain: str = None) -> Dict:
    """Training pair from the multi-plane world: real parallax,
    occlusion boundaries, exact GT depth/pose — the richer curriculum
    the inverse-warp ``make_synthetic_image_pair`` cannot provide.
    Optional photometric augmentation (per-image gain jitter + pixel
    noise) on the TARGET image only, so the model learns robustness to
    the violation of brightness constancy.

    ``domain`` (DOMAINS key): full domain randomization — textured
    world drawn from that domain's statistics, per-image camera
    effects on BOTH images (independent draws, shared per-scene
    vignette), and rolling-shutter skew on the target proportional to
    the inter-frame motion.  The explicit ``photometric_gain`` /
    ``pixel_noise`` knobs still add on top (keep them 0 with a
    domain).
    """
    ks = jax.random.split(key, batch * 2 + 2)
    intr = Intrinsics(
        fx=jnp.full((batch,), 0.9 * width),
        fy=jnp.full((batch,), 0.9 * width),
        cx=jnp.full((batch,), width / 2.0),
        cy=jnp.full((batch,), height / 2.0),
    )
    img1s, img2s, depths, Rls, tls = [], [], [], [], []
    for b in range(batch):
        kb = jax.random.split(ks[b], 8)
        render, _ = make_plane_scene(kb[0], num_planes=num_planes,
                                     domain=domain)
        intr_b = Intrinsics(intr.fx[b:b + 1], intr.fy[b:b + 1],
                            intr.cx[b:b + 1], intr.cy[b:b + 1])
        R_rel = exp_so3(rot_magnitude * jax.random.normal(kb[1], (3,))
                        [None])[0]
        t_rel = trans_magnitude * jax.random.normal(kb[2], (3,))
        rgb1, d1 = render(jnp.eye(3), jnp.zeros(3), intr_b, height,
                          width)
        if domain is None:
            rgb2, _d2 = render(R_rel, t_rel, intr_b, height, width)
        else:
            dd = DOMAINS[domain]
            # Shutter skew = (readout/frame time) x inter-frame motion.
            skew = _uniform_in(kb[5], dd["shutter"])
            w_rel = rot_magnitude * jax.random.normal(kb[1], (3,))
            rgb2, _d2 = render(R_rel, t_rel, intr_b, height, width,
                               shutter_w=skew * w_rel,
                               shutter_v=skew * t_rel)
            vstr = _uniform_in(kb[6], dd["vignette"])  # per-camera
            rgb1 = apply_camera_effects(jax.random.fold_in(kb[7], 0),
                                        rgb1, domain,
                                        vignette_strength=vstr)
            rgb2 = apply_camera_effects(jax.random.fold_in(kb[7], 1),
                                        rgb2, domain,
                                        vignette_strength=vstr)
        # Unconditional (jit-friendly with traced magnitudes; 0 = no-op).
        g = 1.0 + photometric_gain * jax.random.normal(kb[3], ())
        rgb2 = jnp.clip(rgb2 * g, 0.0, 255.0)
        rgb2 = rgb2 + pixel_noise * jax.random.normal(kb[4], rgb2.shape)
        img1s.append(rgb1)
        img2s.append(rgb2)
        depths.append(d1)
        Rls.append(R_rel)
        tls.append(t_rel)
    return dict(image1=jnp.stack(img1s), image2=jnp.stack(img2s),
                depth=jnp.stack(depths), intr=intr,
                R_true=jnp.stack(Rls), t_true=jnp.stack(tls))


def make_plane_scene_window(key, num_frames: int = 3, height: int = 128,
                            width: int = 160, num_planes: int = 3,
                            step_rot: float = 0.01,
                            step_trans: float = 0.02,
                            domain: str = None) -> Dict:
    """Short keyframe window from the multi-plane world: one keyframe
    plus ``num_frames`` targets along a smooth trajectory — the
    training distribution for ``BANet.window_bundle_adjust`` (the
    two-view pair makers cannot supervise the joint multi-frame
    solve).  Poses are cam_i-from-keyframe (the window solver's
    convention; the trajectory starts at the keyframe's identity).

    Returns dict(image_key (H, W, 3), images_tgt (F, H, W, 3),
    depth_key (H, W), intr (shape-(1,) Intrinsics), Rs_true (F, 3, 3),
    ts_true (F, 3)).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    intr = Intrinsics(fx=jnp.full((1,), 0.9 * width),
                      fy=jnp.full((1,), 0.9 * width),
                      cx=jnp.full((1,), width / 2.0),
                      cy=jnp.full((1,), height / 2.0))
    render, _ = make_plane_scene(k1, num_planes=num_planes,
                                 domain=domain)
    Rs, ts = smooth_trajectory(k2, num_frames + 1, step_rot, step_trans)
    rgb_key, depth_key = render(Rs[0], ts[0], intr, height, width)
    tgts = []
    for i in range(1, num_frames + 1):
        rgb_i, _d = render(Rs[i], ts[i], intr, height, width)
        if domain is not None:
            rgb_i = apply_camera_effects(jax.random.fold_in(k3, i),
                                         rgb_i, domain)
        tgts.append(rgb_i)
    return dict(image_key=rgb_key, images_tgt=jnp.stack(tgts),
                depth_key=depth_key, intr=intr,
                Rs_true=Rs[1:], ts_true=ts[1:])


def make_synthetic_image_pair(key, batch: int = 1, height: int = 256,
                              width: int = 320,
                              rot_magnitude: float = 0.03,
                              trans_magnitude: float = 0.05) -> Dict:
    """Render an RGB image pair + dense depth with known relative pose.

    image2 is produced by inverse-warping a procedural texture through a
    smooth depth surface, so photometric consistency holds exactly up to
    resampling error.  Values are in [0, 255] like the reference input
    pipeline (the encoder divides by 255, reference enc.py:185).
    """
    ks = jax.random.split(key, 5)
    intr = Intrinsics(
        fx=jnp.full((batch,), 0.9 * width),
        fy=jnp.full((batch,), 0.9 * width),
        cx=jnp.full((batch,), width / 2.0),
        cy=jnp.full((batch,), height / 2.0),
    )
    tex = smooth_feature_map(ks[0], (batch, height, width, 3), num_waves=48,
                             max_freq=0.25)
    image1 = 127.5 + 100.0 * jnp.tanh(tex)

    # Smooth positive depth surface around 3m.
    bump = smooth_feature_map(ks[1], (batch, height, width, 1), num_waves=8,
                              max_freq=0.02)[..., 0]
    depth = 3.0 + jnp.tanh(bump)

    w_true = rot_magnitude * jax.random.normal(ks[2], (batch, 3))
    R = exp_so3(w_true)
    t = trans_magnitude * jax.random.normal(ks[3], (batch, 3))

    yy, xx = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32),
                          indexing="ij")
    grid = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)[None]
    grid = jnp.broadcast_to(grid, (batch, height * width, 2))
    rays = backproject(grid, intr, normalized=False)
    px, py, *_ = warp_points(rays, depth.reshape(batch, -1), R, t, intr)
    image2 = bilinear_sample(image1, px, py).reshape(batch, height, width, 3)

    return dict(image1=image1, image2=image2, depth=depth, intr=intr,
                R_true=R, t_true=t)
