"""Training loop: optax optimizer + jitted train step + data parallelism.

All new design — the reference ships no training code (SURVEY.md
"Critical context").  The step is a pure function over a ``TrainState``
pytree; data parallelism is expressed with ``jax.sharding`` constraints
over a named mesh (see parallel/), so the same step runs on 1 chip or a
pod slice unchanged.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from banet_tpu.config import Config
from banet_tpu.data.synthetic import make_synthetic_image_pair
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.models.banet import BANet
from banet_tpu.train import losses as L


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    batch_stats: dict
    opt_state: optax.OptState


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    tc = cfg.train
    if tc.lr_schedule == "cosine":
        # Clamp warmup for short runs (decay_steps must stay positive).
        warmup = min(tc.warmup_steps, max(tc.total_steps // 10, 1))
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=tc.learning_rate,
            warmup_steps=warmup, decay_steps=tc.total_steps,
            end_value=tc.lr_final_scale * tc.learning_rate)
    else:
        lr = tc.learning_rate
    tx = optax.adamw(lr, weight_decay=tc.weight_decay)
    inner = optax.chain(optax.clip_by_global_norm(10.0), tx)
    # Skip (don't apply) any update whose gradients are non-finite:
    # one NaN gradient — e.g. the (6+K) bundle-solve VJP on a near-
    # singular domain-randomized batch — otherwise poisons EVERY
    # parameter through clip_by_global_norm(NaN) and the run dies
    # silently (the solver's own forward NaN-guards then emit identity
    # poses, so the loss curves keep looking plausibly finite — this
    # is exactly how campaign_r7's first attempt was lost; see
    # artifacts/campaign_r7/README_NANPOSTMORTEM.md).  100 consecutive
    # bad steps still abort via optax's counter semantics.
    return optax.apply_if_finite(inner, max_consecutive_errors=100)


def create_train_state(cfg: Config, rng, image_size=(64, 96),
                       num_points: int = 32) -> Tuple[BANet, TrainState]:
    # Train through UNGUARDED bundle steps: rejected steps pass zero
    # gradient into the basis/depth path, and the validated campaign
    # recipe (artifacts/README.md) was trained without rejection.
    # Inference keeps SolverConfig.bundle_reject_bad_steps.
    import dataclasses

    # fused_damping is inference-only (ops/pallas_damping.py has no
    # VJP); force the differentiable Flax path regardless of default.
    cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, bundle_reject_bad_steps=False, fused_damping=False))
    model = BANet(cfg)
    H, W = image_size
    img = jnp.zeros((1, H, W, 3))
    intr = Intrinsics(jnp.array([W * 0.9]), jnp.array([W * 0.9]),
                      jnp.array([W / 2.0]), jnp.array([H / 2.0]))
    pts = jnp.full((1, num_points, 2), 8.0)
    variables = model.init(rng, img, img, intr, pts)
    tx = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
    return model, state


def make_train_step(model: BANet, cfg: Config
                    ) -> Callable[[TrainState, Dict], Tuple[TrainState,
                                                            Dict]]:
    """Build the (jittable) train step.

    batch dict: image1/image2 (B,H,W,3), intr_array (B,4), points
    (B,N,2), R_gt (B,3,3), t_gt (B,3), depth_gt (B,H,W),
    valid_mask (B,H,W).
    """
    tx = make_optimizer(cfg)
    Fw = cfg.train.window_train_frames

    def loss_fn(params, batch_stats, batch):
        intr = Intrinsics.from_array(batch["intr_array"])
        # Full cascade (__call__): pose_track over ALL pyramid levels
        # from identity with GT point depths — the tracker's operating
        # condition — then bundle_adjust from the tracked pose.  Every
        # level's output is supervised (losses.total_loss).
        outputs, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image1"], batch["image2"], intr, batch["points"],
            train=True, point_depths=batch["point_depths"],
            mutable=["batch_stats"])
        terms = L.total_loss(outputs, batch, intr, cfg.train,
                             cfg.geometry.normalized_rays)
        if Fw > 0:
            # Window-BA term: run the joint multi-frame solve from the
            # NOISY warm starts the batch provides (tracked-pose error
            # model) and supervise the refined poses toward GT — the
            # solver must learn to improve a warm start, its
            # deployment condition.  Batch stats run in inference mode
            # (use_running_average) so the pair pass stays the single
            # source of batch-stats updates; intended for finetuning a
            # trained checkpoint, where those stats are settled.
            win_intr = Intrinsics.from_array(batch["win_intr_array"])
            win_out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["win_image_key"], batch["win_images_tgt"],
                win_intr, batch["win_points"],
                num_iters=cfg.train.window_train_iters,
                Rs0=batch["win_Rs0"], ts0=batch["win_ts0"],
                method=model.window_bundle_adjust)
            wterms = L.window_loss(win_out, batch["win_Rs_gt"],
                                   batch["win_ts_gt"],
                                   batch.get("win_depth_gt"))
            terms.update(wterms)
            wtot = (cfg.train.loss_rotation_weight *
                    wterms["win_rotation"] +
                    cfg.train.loss_translation_weight *
                    wterms["win_translation"])
            if "win_depth" in wterms:
                wtot += (cfg.train.loss_depth_weight *
                         wterms["win_depth"])
            terms["total"] = (terms["total"] +
                              cfg.train.loss_window_weight * wtot)
        return terms["total"], (terms, updates["batch_stats"])

    def train_step(state: TrainState, batch: Dict):
        (loss, (terms, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        metrics = {k: v for k, v in terms.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        # apply_if_finite's consecutive-skip counter: >0 means this
        # step's update was SKIPPED on a non-finite gradient.  Loops
        # must watch it — campaign_r7's second attempt silently skipped
        # every step for hours because nothing did (see
        # artifacts/campaign_r7/README_NANPOSTMORTEM.md).
        if hasattr(new_opt, "notfinite_count"):
            metrics["notfinite_count"] = new_opt.notfinite_count
        return new_state, metrics

    return train_step


def depth_at_points(depth: jnp.ndarray, points: jnp.ndarray
                    ) -> jnp.ndarray:
    """Bilinearly sample a (B, H, W) depth map at (B, N, 2) pixel
    points -> (B, N), floored away from the camera center (the same
    guard the bundle path applies to its sampled net depth)."""
    from banet_tpu.ops.resample import bilinear_sample

    d = bilinear_sample(depth[..., None], points[..., 0],
                        points[..., 1])[..., 0]
    return jnp.maximum(d, 0.01)


def crop_augmented_batch(key, batch: int = 2,
                         src_size: Tuple[int, int] = (60, 80),
                         dst_size: Tuple[int, int] = (64, 80),
                         border: int = 4,
                         num_points: int = 64) -> Dict:
    """Training batch through the reference's train-crop geometry
    (reference bundlenet.py:286-302): render a pair at the sensor size,
    trim a ``border``-pixel frame, resize the crop to the training
    size, and remap points / intrinsics with ``crop_remap`` /
    ``crop_adjusted_intrinsics`` so the projective geometry stays exact
    (the remap is affine in pixel coordinates, so projecting-then-
    remapping equals projecting with the adjusted intrinsics).

    Default sizes mirror the reference's 240x320 -> 256x320 shape ratio
    at test scale; pass (240, 320) -> (256, 320) for the real operating
    point.
    """
    from banet_tpu.geometry.camera import (crop_adjusted_intrinsics,
                                           crop_remap)

    Hs, Ws = src_size
    Hd, Wd = dst_size
    pair = make_synthetic_image_pair(key, batch, Hs, Ws)
    b = border

    def crop_resize(img, method="bilinear"):
        region = img[:, b:Hs - b, b:Ws - b]
        shape = (batch, Hd, Wd) + img.shape[3:]
        return jax.image.resize(region, shape, method)

    image1 = crop_resize(pair["image1"])
    image2 = crop_resize(pair["image2"])
    depth_gt = crop_resize(pair["depth"])

    k2 = jax.random.split(key, 2)[1]
    pts_src = jnp.stack([
        jax.random.uniform(k2, (batch, num_points), minval=b + 2.0,
                           maxval=Ws - b - 2.0),
        jax.random.uniform(jax.random.fold_in(k2, 1),
                           (batch, num_points), minval=b + 2.0,
                           maxval=Hs - b - 2.0),
    ], axis=-1)
    pts = crop_remap(pts_src, src_size, dst_size, b)
    intr = crop_adjusted_intrinsics(pair["intr"], src_size, dst_size, b)
    return dict(
        image1=image1, image2=image2,
        intr_array=intr.as_array(),
        points=pts,
        point_depths=depth_at_points(depth_gt, pts),
        R_gt=pair["R_true"], t_gt=pair["t_true"],
        depth_gt=depth_gt,
        valid_mask=jnp.ones_like(depth_gt),
    )


def window_batch_extras(key, num_frames: int = 3, height: int = 64,
                        width: int = 96, num_points: int = 64,
                        step_rot: float = 0.01, step_trans: float = 0.02,
                        rot_noise: float = 0.01,
                        trans_noise: float = 0.02,
                        domain: str = None) -> Dict:
    """The ``win_*`` batch keys consumed by the window-BA training term
    (one window per step): a keyframe + F-frame plane-scene window with
    GT poses, plus NOISY warm starts ``win_Rs0``/``win_ts0`` modelling
    tracked-pose error — the distribution window BA must improve on at
    deployment."""
    from banet_tpu.data.synthetic import make_plane_scene_window
    from banet_tpu.geometry.se3 import exp_so3

    kw, kp, kr, kt = jax.random.split(key, 4)
    win = make_plane_scene_window(kw, num_frames=num_frames,
                                  height=height, width=width,
                                  step_rot=step_rot,
                                  step_trans=step_trans, domain=domain)
    pts = jnp.stack([
        jax.random.uniform(kp, (1, num_points), minval=6.0,
                           maxval=width - 6.0),
        jax.random.uniform(jax.random.fold_in(kp, 1), (1, num_points),
                           minval=6.0, maxval=height - 6.0)], axis=-1)
    dR = exp_so3(rot_noise * jax.random.normal(kr, (num_frames, 3)))
    Rs0 = jnp.einsum("fij,fjk->fik", dR, win["Rs_true"])
    ts0 = win["ts_true"] + trans_noise * jax.random.normal(
        kt, (num_frames, 3))
    return dict(win_image_key=win["image_key"],
                win_images_tgt=win["images_tgt"],
                win_depth_gt=win["depth_key"],
                win_intr_array=win["intr"].as_array(),
                win_points=pts,
                win_Rs_gt=win["Rs_true"], win_ts_gt=win["ts_true"],
                win_Rs0=Rs0, win_ts0=ts0)


def synthetic_batch(key, batch: int = 2, height: int = 64, width: int = 96,
                    num_points: int = 64) -> Dict:
    """Self-contained training batch from the synthetic renderer (no
    datasets available in this environment; real-data batches come from
    data/tum.py + data/points.py with identical keys)."""
    pair = make_synthetic_image_pair(key, batch, height, width)
    k2 = jax.random.split(key, 2)[1]
    pts = jnp.stack([
        jax.random.uniform(k2, (batch, num_points), minval=6.0,
                           maxval=width - 6.0),
        jax.random.uniform(jax.random.fold_in(k2, 1), (batch, num_points),
                           minval=6.0, maxval=height - 6.0),
    ], axis=-1)
    return dict(
        image1=pair["image1"], image2=pair["image2"],
        intr_array=pair["intr"].as_array(),
        points=pts,
        point_depths=depth_at_points(pair["depth"], pts),
        R_gt=pair["R_true"], t_gt=pair["t_true"],
        depth_gt=pair["depth"],
        valid_mask=jnp.ones_like(pair["depth"]),
    )
