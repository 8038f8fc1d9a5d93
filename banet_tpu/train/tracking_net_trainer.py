"""Training for the DeepTAM-class TrackingNet (models/tracking_net.py).

The reference uses its tracking network purely as a pretrained baseline
(weights fetched out-of-band, D8; cascade semantics at reference
deeptam models/blocks.py:91-197).  The recipe here implements cascade
supervision exactly:

- **Per-level GT-residual targets.**  The running pose entering level l
  is replayed from the sample means of levels < l; the target for
  level l's samples is the SE(3) increment that moves that running
  pose exactly onto the GT pose (``se3_residual_increment``), so
  coarse levels learn large corrections and fine levels refinements.
  Targets are stop-gradiented: each level is supervised given what the
  cascade actually did, without the target chasing the prediction.
- **Spread calibration.**  The per-level sample std is pulled toward
  the (stop-gradiented) actual per-component error of that level's
  mean prediction — an uncertainty that matches realized error, rather
  than the collapse-to-zero that penalizing |samples - their own mean|
  produces.
- Final-pose supervision (geodesic rotation + translation L2) on the
  cascade output.
- **Dense GT-flow supervision.**  Each level's FlowBlock output is
  supervised against the analytic residual flow: for every keyframe
  pixel the displacement between its projection under the (replayed,
  stop-gradiented) running pose and under the GT pose, forward-splatted
  into the render's frame with the same z-buffered warp the network
  saw.  Without this the conv stack must discover correspondence from
  the pose loss alone, which single-batch-overfits but never
  generalizes across an infinite random-scene stream (measured: 4k
  steps flat at ~10 deg).  The reference's tracking network is trained
  the same way (its flow block, deeptam models/blocks.py:312-390, has
  a dedicated flow training stage).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from banet_tpu.config import Config
from banet_tpu.data.synthetic import make_synthetic_image_pair
from banet_tpu.geometry.camera import (Intrinsics, backproject,
                                       warp_points)
from banet_tpu.geometry.se3 import rotation_geodesic_angle
from banet_tpu.models.tracking_net import TrackingNet
from banet_tpu.ops.render import forward_warp_render


def _splatted_flow_target(depth, intr_l, R_run, t_run, R_gt, t_gt,
                          h, w, normalized_rays=False):
    """GT residual flow for one cascade level, in the render's frame.

    For every keyframe pixel: displacement between its projection under
    the running pose and under the GT pose, forward-splatted at the
    running pose with the same z-buffer the network's render used, so
    target and prediction live on the same grid.  Returned in units of
    the level width (resolution-independent).  Entirely stop-gradiented
    by the caller.  ``intr_l`` is the level-scaled intrinsics.
    """
    B = depth.shape[0]
    kd = jax.image.resize(depth, (B, h, w), "bilinear")
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32),
                          indexing="ij")
    grid = jnp.broadcast_to(
        jnp.stack([xx.ravel(), yy.ravel()], -1)[None], (B, h * w, 2))
    rays = backproject(grid, intr_l, normalized=normalized_rays)
    d = kd.reshape(B, h * w)
    px_g, py_g, _, _, _, _ = warp_points(rays, d, R_run, t_run, intr_l)
    px_t, py_t, _, _, _, _ = warp_points(rays, d, R_gt, t_gt, intr_l)
    flow = jnp.stack([px_t - px_g, py_t - py_g], -1).reshape(B, h, w, 2)
    wf, _, m = forward_warp_render(flow, kd, R_run, t_run, intr_l,
                                   normalized_rays=normalized_rays)
    return wf / float(w), m


class TNetTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState


def create_tnet_state(rng, image_size=(64, 96), levels: int = 3,
                      num_samples: int = 16,
                      learning_rate: float = 2e-4,
                      total_steps: int = 0
                      ) -> Tuple[TrackingNet, TNetTrainState,
                                 optax.GradientTransformation]:
    """``total_steps > 0`` switches to linear-warmup (2%) + cosine decay
    to learning_rate/10 over that horizon (the measured-better schedule
    from the round-1 campaign — config.py lr_schedule default)."""
    H, W = image_size
    net = TrackingNet(levels=levels, num_samples=num_samples,
                      normalized_rays=False)
    img = jnp.zeros((1, H, W, 3))
    depth = jnp.ones((1, H, W))
    intr = Intrinsics(jnp.array([W * 0.8]), jnp.array([W * 0.8]),
                      jnp.array([W / 2.0]), jnp.array([H / 2.0]))
    params = net.init(rng, img, depth, img, intr)["params"]
    if total_steps > 0:
        warmup = max(1, total_steps // 50)
        lr = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup, total_steps,
            end_value=learning_rate * 0.1)
    else:
        lr = learning_rate
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adam(lr))
    return net, TNetTrainState(step=jnp.zeros((), jnp.int32),
                               params=params, opt_state=tx.init(params)), tx


def make_tnet_train_step(net: TrackingNet,
                         tx: optax.GradientTransformation):
    """batch: image1/image2 (B,H,W,3), depth (B,H,W), intr_array (B,4),
    R_gt (B,3,3), t_gt (B,3)."""

    def loss_fn(params, batch):
        from banet_tpu.geometry.se3 import (se3_residual_increment,
                                            se3_update)

        intr = Intrinsics.from_array(batch["intr_array"])
        out = net.apply({"params": params}, batch["image1"],
                        batch["depth"], batch["image2"], intr)
        # Final-pose supervision.  The loss uses the SMOOTH rotation
        # distance (3 - tr(R^T R_gt)) / 2 == 1 - cos(theta): arccos has
        # an infinite derivative at theta = 0, so a geodesic-angle loss
        # NaNs the moment any pair is tracked exactly (observed on-chip
        # within 100 steps).  The angle itself is logged as a metric
        # only (stop-gradient via the smooth loss path).
        Rrel = jnp.swapaxes(out.R, -1, -2) @ batch["R_gt"]
        tr = Rrel[..., 0, 0] + Rrel[..., 1, 1] + Rrel[..., 2, 2]
        rot_loss = jnp.mean((3.0 - tr) / 2.0)
        ang = jax.lax.stop_gradient(
            rotation_geodesic_angle(out.R, batch["R_gt"]))
        terr_sq = jnp.sum((out.t - batch["t_gt"]) ** 2, axis=-1)
        # Smooth L2 (no sqrt: infinite derivative at exact match).
        pose_loss = rot_loss + jnp.mean(terr_sq)

        # Cascade supervision: replay the running pose through the
        # level means; each level's samples are pulled toward the
        # (stop-gradiented) increment that would land the running pose
        # exactly on GT, and each level's sample std is calibrated
        # against the realized per-component error of its mean.
        B = batch["R_gt"].shape[0]
        H, W = batch["image1"].shape[1:3]
        L = len(out.motion_samples)
        R_run = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        t_run = jnp.zeros((B, 3))
        residual_loss = 0.0
        spread_loss = 0.0
        flow_loss = 0.0
        for lvl, s in enumerate(out.motion_samples):       # (B, S, 6)
            # Dense flow supervision at this level's resolution, with
            # the running pose entering the level (matches the pose the
            # network's own render used).
            scale = 2 ** (L - 1 - lvl)
            h, w = H // scale, W // scale
            ftgt, fmask = jax.lax.stop_gradient(_splatted_flow_target(
                batch["depth"], intr.scale(1.0 / scale),
                jax.lax.stop_gradient(R_run),
                jax.lax.stop_gradient(t_run),
                batch["R_gt"], batch["t_gt"], h, w,
                normalized_rays=net.normalized_rays))
            fdiff = jnp.abs(out.flows[lvl][..., :2] - ftgt)
            fm = fmask[..., None]
            flow_loss += (jnp.sum(fdiff * fm) /
                          (2.0 * jnp.sum(fm) + 1e-6))

            target = jax.lax.stop_gradient(se3_residual_increment(
                R_run, t_run, batch["R_gt"], batch["t_gt"]))  # (B, 6)
            mean = jnp.mean(s, axis=1)                     # (B, 6)
            residual_loss += jnp.mean(jnp.abs(s - target[:, None, :]))
            err = jax.lax.stop_gradient(jnp.abs(mean - target))
            # Guarded std: d(sqrt)/d(var) is infinite at var = 0, and
            # the samples CAN collapse to identical values (tiny final-
            # layer init), NaN-ing the whole step.
            std = jnp.sqrt(jnp.var(s, axis=1) + 1e-12)
            spread_loss += jnp.mean(jnp.abs(std - err))
            R_run, t_run = se3_update(R_run, t_run, mean)
        residual_loss = residual_loss / L
        spread_loss = spread_loss / L
        flow_loss = flow_loss / L
        total = (pose_loss + residual_loss + 0.1 * spread_loss +
                 flow_loss)
        return total, {"pose_loss": pose_loss,
                       "residual_loss": residual_loss,
                       "spread_loss": spread_loss,
                       "flow_loss": flow_loss,
                       "ang_deg": jnp.degrees(jnp.mean(ang))}

    def step(state: TNetTrainState, batch: Dict):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, new_opt = tx.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(aux)
        metrics["total"] = loss
        return TNetTrainState(step=state.step + 1, params=params,
                              opt_state=new_opt), metrics

    return step


def tnet_synthetic_batch(key, batch=2, height=64, width=96) -> Dict:
    pair = make_synthetic_image_pair(key, batch, height, width,
                                     rot_magnitude=0.02,
                                     trans_magnitude=0.03)
    return dict(image1=pair["image1"], image2=pair["image2"],
                depth=pair["depth"],
                intr_array=pair["intr"].as_array(),
                R_gt=pair["R_true"], t_gt=pair["t_true"])
