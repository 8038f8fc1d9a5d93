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
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from banet_tpu.config import Config
from banet_tpu.data.synthetic import make_synthetic_image_pair
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.geometry.se3 import rotation_geodesic_angle
from banet_tpu.models.tracking_net import TrackingNet


class TNetTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState


def create_tnet_state(rng, image_size=(64, 96), levels: int = 3,
                      num_samples: int = 16,
                      learning_rate: float = 2e-4
                      ) -> Tuple[TrackingNet, TNetTrainState,
                                 optax.GradientTransformation]:
    H, W = image_size
    net = TrackingNet(levels=levels, num_samples=num_samples,
                      normalized_rays=False)
    img = jnp.zeros((1, H, W, 3))
    depth = jnp.ones((1, H, W))
    intr = Intrinsics(jnp.array([W * 0.8]), jnp.array([W * 0.8]),
                      jnp.array([W / 2.0]), jnp.array([H / 2.0]))
    params = net.init(rng, img, depth, img, intr)["params"]
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adam(learning_rate))
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
        # Final-pose supervision.
        ang = rotation_geodesic_angle(out.R, batch["R_gt"])
        terr = jnp.linalg.norm(out.t - batch["t_gt"], axis=-1)
        pose_loss = jnp.mean(ang) + jnp.mean(terr)

        # Cascade supervision: replay the running pose through the
        # level means; each level's samples are pulled toward the
        # (stop-gradiented) increment that would land the running pose
        # exactly on GT, and each level's sample std is calibrated
        # against the realized per-component error of its mean.
        B = batch["R_gt"].shape[0]
        R_run = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        t_run = jnp.zeros((B, 3))
        residual_loss = 0.0
        spread_loss = 0.0
        for s in out.motion_samples:                       # (B, S, 6)
            target = jax.lax.stop_gradient(se3_residual_increment(
                R_run, t_run, batch["R_gt"], batch["t_gt"]))  # (B, 6)
            mean = jnp.mean(s, axis=1)                     # (B, 6)
            residual_loss += jnp.mean(jnp.abs(s - target[:, None, :]))
            err = jax.lax.stop_gradient(jnp.abs(mean - target))
            std = jnp.std(s, axis=1)
            spread_loss += jnp.mean(jnp.abs(std - err))
            R_run, t_run = se3_update(R_run, t_run, mean)
        L = len(out.motion_samples)
        residual_loss = residual_loss / L
        spread_loss = spread_loss / L
        total = pose_loss + residual_loss + 0.1 * spread_loss
        return total, {"pose_loss": pose_loss,
                       "residual_loss": residual_loss,
                       "spread_loss": spread_loss,
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
