"""Round-2 accuracy campaign: train the flagship on the multi-plane
synthetic curriculum, with cosine LR + parameter EMA, then save
checkpoints for trajectory-level evaluation.

The reference ships no training code and its TF1 checkpoints are
unusable (SURVEY.md "Critical context" + §7 hard part #4); ATE parity
requires training from scratch.  This zero-egress environment has no
real datasets, so the curriculum is the analytic multi-plane renderer
(data/synthetic.make_plane_scene_pair): real parallax, occlusion
boundaries, photometric jitter — rendered on-device inside the jitted
batch builder.

Usage (TPU, ~background):
  python scripts/train_accuracy_campaign.py \
      --steps 5000 --image-size 256 320 --batch 4 \
      --out artifacts/campaign_r2

Writes: <out>/metrics.jsonl, <out>/ckpt (last), <out>/ckpt_ema (EMA).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--image-size", type=int, nargs=2,
                    default=(256, 320))
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--ema-decay", type=float, default=0.999)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--save-every", type=int, default=500,
                    help="overwrite <out>/ckpt(+_ema) every N steps so "
                         "an interrupted run loses at most N steps")
    ap.add_argument("--out", default="artifacts/campaign_r2")
    ap.add_argument("--pad-mode", default=None,
                    choices=["symmetric", "zero"],
                    help="conv padding (ModelConfig.conv_pad_mode); "
                         "recorded in <out>/model_config.json so "
                         "consumers rebuild the matching model")
    ap.add_argument("--feature-dtype", default=None,
                    choices=["float32", "bfloat16"],
                    help="solver feature-map dtype "
                         "(ModelConfig.solver_feature_dtype)")
    ap.add_argument("--domain", default=None, choices=["A", "B"],
                    help="domain-randomized curriculum "
                         "(data/synthetic.DOMAINS): textures, vignette/"
                         "gradient lighting, sensor gain/bias/noise, "
                         "rolling shutter — train on A, hold out B")
    ap.add_argument("--crop-augment", action="store_true",
                    help="route every batch through the reference's "
                         "train-crop geometry (bundlenet.py:286-302): "
                         "render at 15/16 H, trim a 4-px border, "
                         "resize to (H, W), remap points/intrinsics "
                         "with crop_remap/crop_adjusted_intrinsics")
    ap.add_argument("--legacy-bundle-train", action="store_true",
                    help="train with the round-2 bundle-solve "
                         "defaults (damp_last_diag=False, no W prior) "
                         "— the campaign_r4 recipe; isolates whether "
                         "the round-3 bundle-robustness defaults "
                         "changed the training dynamics (round-4 "
                         "finding: pad mode and curriculum are NOT "
                         "what separates r4's 0.0032 easy ATE from "
                         "r5/r6's ~0.012)")
    ap.add_argument("--init-from", default=None, metavar="CKPT_DIR",
                    help="initialize params+batch_stats (and EMA) from "
                         "this checkpoint at step 0 — finetune mode "
                         "(fresh optimizer, own cosine schedule over "
                         "--steps).  Distinct from --resume-from-step, "
                         "which continues THIS campaign's own run")
    ap.add_argument("--resume-from-step", type=int, default=0,
                    help="restore <out>/ckpt (params+batch_stats) and "
                         "<out>/ckpt_ema (EMA params) and continue the "
                         "curriculum at this step (a relay hang can "
                         "strand a run mid-campaign; optimizer moments "
                         "restart fresh, a brief Adam transient)")
    ap.add_argument("--window-train", type=int, default=0, metavar="F",
                    help="add the window-BA training term with "
                         "F-frame windows (TrainConfig."
                         "window_train_frames): trains THROUGH "
                         "window_bundle_adjust from noisy warm starts "
                         "so the joint solve learns to improve tracked "
                         "poses (VERDICT r4 item 3c).  Intended for "
                         "finetuning a trained checkpoint (batch stats "
                         "must be settled)")
    ap.add_argument("--nan-tripwire", type=int, default=200,
                    help="abort (exit 3) if apply_if_finite has "
                         "skipped this many CONSECUTIVE updates — a "
                         "skipping-forever run burns TPU hours while "
                         "learning nothing (campaign_r7 postmortem)")
    args = ap.parse_args()

    import dataclasses

    from banet_tpu.config import default_config
    from banet_tpu.data.synthetic import make_plane_scene_pair
    from banet_tpu.train.trainer import (create_train_state,
                                         make_train_step)
    from banet_tpu.utils.checkpoint import save_checkpoint

    def tree_all_finite(tree) -> bool:
        leaves = [jnp.all(jnp.isfinite(x)) for x in
                  jax.tree_util.tree_leaves(tree)
                  if hasattr(x, "dtype") and
                  jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)]
        return bool(jax.device_get(jnp.all(jnp.stack(leaves))))

    H, W = args.image_size
    cfg = default_config()
    # Exact resume (ckpt_full present) restores the optimizer state
    # including the schedule counter, so the cosine period stays the
    # full run; the legacy params-only resume restarts the counter at 0
    # and shortens the period so the decay still completes.
    exact_resume = bool(args.resume_from_step) and os.path.isdir(
        os.path.join(args.out, "ckpt_full"))
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, learning_rate=args.lr,
            total_steps=(args.steps if exact_resume or
                         not args.resume_from_step
                         else args.steps - args.resume_from_step),
            lr_schedule="cosine",
            window_train_frames=args.window_train))
    overrides = {}
    if args.pad_mode:
        overrides["conv_pad_mode"] = args.pad_mode
    if args.feature_dtype:
        overrides["solver_feature_dtype"] = args.feature_dtype
    if overrides:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **overrides))
    if args.legacy_bundle_train:
        cfg = dataclasses.replace(
            cfg, solver=dataclasses.replace(
                cfg.solver, damp_last_diag=False,
                bundle_w_prior_rel=0.0))

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "model_config.json"), "w") as f:
        json.dump(overrides, f)
    with open(os.path.join(args.out, "campaign_config.json"), "w") as f:
        json.dump(vars(args), f, indent=1)  # full provenance
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      image_size=(H, W),
                                      num_points=args.num_points)
    ema0 = None
    full_path = os.path.join(args.out, "ckpt_full")

    def opt_leaves(opt_state):
        # optax states are NamedTuples, which orbax round-trips as
        # lists; store flat numbered leaves and rebuild with the fresh
        # state's treedef instead.
        leaves = jax.tree_util.tree_leaves(opt_state)
        return {f"leaf_{i:04d}": jax.device_get(x)
                for i, x in enumerate(leaves)}

    def opt_unflatten(template_opt_state, leaf_dict):
        treedef = jax.tree_util.tree_structure(template_opt_state)
        leaves = [leaf_dict[k] for k in sorted(leaf_dict)]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    if args.init_from and not args.resume_from_step:
        from banet_tpu.utils.checkpoint import restore_checkpoint

        tmpl = {"params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats)}
        got = restore_checkpoint(args.init_from, tmpl)
        state = state.replace(params=got["params"],
                              batch_stats=got["batch_stats"])
        ema0 = got["params"]
        if not tree_all_finite(state.params):
            print(json.dumps({"fatal": "--init-from checkpoint has "
                              "non-finite params", "ckpt":
                              args.init_from}), flush=True)
            return 4
        print(json.dumps({"initialized_from": args.init_from}),
              flush=True)
    if args.resume_from_step:
        from banet_tpu.utils.checkpoint import restore_checkpoint

        tmpl = {"params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats)}
        if os.path.isdir(full_path):
            # EXACT resume: optimizer moments + schedule position +
            # EMA restored, so a relay-hang restart is seamless (no
            # Adam transient, no LR kink).
            full_tmpl = dict(tmpl,
                             opt_state=opt_leaves(state.opt_state),
                             ema=tmpl["params"])
            got = restore_checkpoint(full_path, full_tmpl)
            state = state.replace(
                params=got["params"],
                batch_stats=got["batch_stats"],
                opt_state=opt_unflatten(state.opt_state,
                                        got["opt_state"]))
            ema0 = got["ema"]
            print(json.dumps({"resumed_from": args.resume_from_step,
                              "exact": True}), flush=True)
        else:
            got = restore_checkpoint(os.path.join(args.out, "ckpt"),
                                     tmpl)
            state = state.replace(params=got["params"],
                                  batch_stats=got["batch_stats"])
            got_ema = restore_checkpoint(
                os.path.join(args.out, "ckpt_ema"), tmpl)
            ema0 = got_ema["params"]
            print(json.dumps({"resumed_from": args.resume_from_step,
                              "exact": False}), flush=True)
        # A corrupt (non-finite) checkpoint can NEVER recover — every
        # gradient through NaN params is NaN, every update is skipped,
        # and the run becomes a zombie (campaign_r7 attempt 2 resumed
        # from an all-NaN step-8500 checkpoint and burned hours doing
        # exactly that).  Refuse loudly instead.
        if not tree_all_finite(state.params):
            print(json.dumps({"fatal": "resume checkpoint has "
                              "non-finite params; refusing to train "
                              "from it", "out": args.out}), flush=True)
            return 4
    step_fn = jax.jit(make_train_step(model, cfg))

    # Crop-augment geometry (reference bundlenet.py:286-302 semantics;
    # mirrors train/trainer.crop_augmented_batch but over the plane-
    # scene curriculum): render at (15/16 H, W), trim a 4-px frame,
    # resize the crop to (H, W), remap points + intrinsics exactly.
    border = 4
    Hs = (H * 15) // 16
    Ws = W

    @jax.jit
    def make_batch(key, rot_mag, trans_mag, photo, noise):
        from banet_tpu.train.trainer import depth_at_points

        kp = jax.random.fold_in(key, 77)

        def with_window(base):
            if not args.window_train:
                return base
            from banet_tpu.train.trainer import window_batch_extras

            base.update(window_batch_extras(
                jax.random.fold_in(key, 99),
                num_frames=args.window_train, height=H, width=W,
                num_points=args.num_points,
                step_rot=rot_mag, step_trans=trans_mag,
                rot_noise=cfg.train.window_init_rot_noise,
                trans_noise=cfg.train.window_init_trans_noise,
                domain=args.domain))
            return base
        if not args.crop_augment:
            pair = make_plane_scene_pair(
                key, batch=args.batch, height=H, width=W,
                rot_magnitude=rot_mag, trans_magnitude=trans_mag,
                photometric_gain=photo, pixel_noise=noise,
                domain=args.domain)
            pts = jnp.stack([
                jax.random.uniform(kp, (args.batch, args.num_points),
                                   minval=6.0, maxval=W - 6.0),
                jax.random.uniform(jax.random.fold_in(kp, 1),
                                   (args.batch, args.num_points),
                                   minval=6.0, maxval=H - 6.0)], axis=-1)
            return with_window(dict(
                image1=pair["image1"], image2=pair["image2"],
                intr_array=pair["intr"].as_array(), points=pts,
                point_depths=depth_at_points(pair["depth"], pts),
                R_gt=pair["R_true"], t_gt=pair["t_true"],
                depth_gt=pair["depth"],
                valid_mask=(pair["depth"] > 0).astype(jnp.float32)))

        from banet_tpu.geometry.camera import (crop_adjusted_intrinsics,
                                               crop_remap)

        pair = make_plane_scene_pair(
            key, batch=args.batch, height=Hs, width=Ws,
            rot_magnitude=rot_mag, trans_magnitude=trans_mag,
            photometric_gain=photo, pixel_noise=noise,
            domain=args.domain)
        b = border

        def crop_resize(img, method="bilinear"):
            region = img[:, b:Hs - b, b:Ws - b]
            shape = (args.batch, H, W) + img.shape[3:]
            return jax.image.resize(region, shape, method)

        pts_src = jnp.stack([
            jax.random.uniform(kp, (args.batch, args.num_points),
                               minval=b + 2.0, maxval=Ws - b - 2.0),
            jax.random.uniform(jax.random.fold_in(kp, 1),
                               (args.batch, args.num_points),
                               minval=b + 2.0, maxval=Hs - b - 2.0),
        ], axis=-1)
        depth_gt = crop_resize(pair["depth"])
        intr = crop_adjusted_intrinsics(pair["intr"], (Hs, Ws), (H, W),
                                        b)
        return with_window(dict(
            image1=crop_resize(pair["image1"]),
            image2=crop_resize(pair["image2"]),
            intr_array=intr.as_array(),
            points=crop_remap(pts_src, (Hs, Ws), (H, W), b),
            # Depth at the SOURCE points from the uncropped map — the
            # remap is affine in pixels, so this is the same 3D point.
            point_depths=depth_at_points(pair["depth"], pts_src),
            R_gt=pair["R_true"], t_gt=pair["t_true"],
            depth_gt=depth_gt,
            valid_mask=(depth_gt > 0).astype(jnp.float32)))

    @jax.jit
    def ema_update(ema, params, decay):
        return jax.tree.map(lambda e, p: decay * e + (1 - decay) * p,
                            ema, params)

    ema = ema0 if ema0 is not None else state.params
    t_start = time.time()
    log_path = os.path.join(args.out, "metrics.jsonl")
    with open(log_path, "a") as logf:
        for i in range(args.resume_from_step, args.steps):
            frac = i / max(args.steps - 1, 1)
            # Curriculum: motion + photometric difficulty ramp.
            # Ramp to rot 0.05 rad / trans 0.08 m so the distribution
            # covers the hard held-out sequences (step 0.03/0.04 at
            # pair stride 2); the round-3 run topped out at 0.04/0.06
            # and eval translation stalled at the distribution edge.
            rot = jnp.float32(0.01 + 0.04 * min(1.0, 2 * frac))
            trn = jnp.float32(0.02 + 0.06 * min(1.0, 2 * frac))
            pho = jnp.float32(0.10 * min(1.0, max(0.0, 2 * frac - 0.5)))
            noi = jnp.float32(2.0 * min(1.0, max(0.0, 2 * frac - 0.5)))
            batch = make_batch(jax.random.PRNGKey(i), rot, trn, pho, noi)
            state, metrics = step_fn(state, batch)
            ema = ema_update(ema, state.params,
                             jnp.float32(args.ema_decay))
            if i % args.log_every == 0 or i == args.steps - 1:
                rec = {k: float(v) for k, v in metrics.items()}
                rec.update(step=i, wall_s=round(time.time() - t_start, 1))
                logf.write(json.dumps(rec) + "\n")
                logf.flush()
                print(json.dumps(rec), flush=True)
                # Tripwire: notfinite_count is apply_if_finite's
                # CONSECUTIVE-skip counter (resets on any finite step);
                # a large value means training has been a no-op for
                # that many steps and will stay one.  Abort loudly so
                # the supervisor does NOT blind-resume.
                if rec.get("notfinite_count", 0) >= args.nan_tripwire:
                    print(json.dumps(
                        {"fatal": "nan tripwire: "
                         f"{int(rec['notfinite_count'])} consecutive "
                         "skipped updates", "step": i}), flush=True)
                    return 3
            if args.save_every and (i + 1) % args.save_every == 0 \
                    and i != args.steps - 1:
                # Never overwrite a good checkpoint with a poisoned
                # one: a single all-NaN save is how campaign_r7 lost
                # its run (resume found only the corpse).
                if not tree_all_finite(state.params):
                    print(json.dumps(
                        {"fatal": "refusing to save non-finite params",
                         "step": i}), flush=True)
                    return 3
                save_checkpoint(
                    os.path.join(args.out, "ckpt"),
                    {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)})
                save_checkpoint(
                    os.path.join(args.out, "ckpt_ema"),
                    {"params": jax.device_get(ema),
                     "batch_stats": jax.device_get(state.batch_stats)})
                save_checkpoint(
                    full_path,
                    {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats),
                     "opt_state": opt_leaves(state.opt_state),
                     "ema": jax.device_get(ema)})

    variables = {"params": state.params,
                 "batch_stats": state.batch_stats}
    save_checkpoint(os.path.join(args.out, "ckpt"), variables)
    save_checkpoint(os.path.join(args.out, "ckpt_ema"),
                    {"params": jax.device_get(ema),
                     "batch_stats": state.batch_stats})
    print(json.dumps({"done": True,
                      "wall_s": round(time.time() - t_start, 1),
                      "out": args.out}))


if __name__ == "__main__":
    raise SystemExit(main())
