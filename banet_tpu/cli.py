"""Command-line interface.

The reference has no CLI layer (SURVEY.md §1: "no CLI layer, no config
layer"); its drivers are editable scripts with hardcoded paths
(legacy/example.py, legacy/seq_example.py, legacy/eval.py).  This
module exposes the same workflows as subcommands:

  python -m banet_tpu.cli odometry  <seq_dir> [--format tum|scannet|kitti]
  python -m banet_tpu.cli evaluate  <gt.txt> <est.txt> [--rpe-delta S]
  python -m banet_tpu.cli pairs     <tum_seq_dir> [--stride S] ...
  python -m banet_tpu.cli depth     <tum_seq_dir> [--stride S] ...
  python -m banet_tpu.cli train     [--steps N] [--synthetic] ...

Checkpoints restore via utils.checkpoint (optimistic partial restore),
so an encoder-only checkpoint also works.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def make_retarget_fn(k_src, k_new, size):
    """Per-frame camera-retargeting callable for the odometry loop:
    maps (rgb, depth) captured with ``k_src`` onto a virtual camera
    ``k_new`` at ``size`` (data/retarget.adjust_intrinsics — deeptam
    view_utils.py:70-143 semantics).  A factory so both intrinsics are
    bound BY VALUE at construction: the CLI rebinds its intrinsics
    variable right after building this, and an inline closure once
    late-bound it to src == dst, silently skipping the rescale
    (ADVICE r4 high; regression: tests/test_retarget.py
    test_make_retarget_fn_binds_source_intrinsics_by_value)."""
    import numpy as _np

    from banet_tpu.data.retarget import adjust_intrinsics

    k_src = _np.array(k_src, _np.float32, copy=True)
    k_new = _np.array(k_new, _np.float32, copy=True)
    Hn, Wn = size

    def retarget(rgb, depth):
        return adjust_intrinsics(rgb, depth, k_src, k_new, (Hn, Wn))

    return retarget


def _apply_ckpt_model_config(cfg, checkpoint: str | None):
    """Apply the model knobs recorded next to a campaign checkpoint
    (<ckpt_dir>/../model_config.json, written by
    scripts/train_accuracy_campaign.py) so the rebuilt model matches
    the one the weights were trained with (e.g. conv_pad_mode)."""
    if not checkpoint:
        return cfg
    sidecar = os.path.join(os.path.dirname(os.path.abspath(checkpoint)),
                           "model_config.json")
    if not os.path.exists(sidecar):
        return cfg
    with open(sidecar) as f:
        overrides = json.load(f)
    if not overrides:
        return cfg
    import dataclasses

    print(f"model config from {sidecar}: {overrides}", file=sys.stderr)
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, **overrides))


def _cmd_odometry(args) -> int:
    import numpy as np

    from banet_tpu.config import default_config
    from banet_tpu.eval.trajectory import save_tum_trajectory
    from banet_tpu.tracking import OdometryRunner, TwoViewTracker

    if len(args.sequence) > 1:
        return _cmd_odometry_batched(args)
    args.sequence = args.sequence[0]
    if args.format == "scannet":
        from banet_tpu.data.scannet import ScanNetScene

        seq = ScanNetScene(args.sequence)
    elif args.format == "kitti":
        from banet_tpu.data.kitti import KittiOdometrySequence

        seq = KittiOdometrySequence(args.sequence)
    else:
        from banet_tpu.data.tum import TumSequence

        seq = TumSequence(args.sequence)
    if len(seq) == 0:
        print("empty sequence", file=sys.stderr)
        return 1
    f0 = seq[0]
    rgb0 = f0.load_rgb()
    H, W = rgb0.shape[:2]
    retarget = None
    seq_intr = seq.intrinsics
    if getattr(args, "retarget", None):
        # Reference-harness camera retargeting (deeptam
        # view_utils.py:70-143 semantics, data/retarget.py): run any
        # sequence at the checkpoint's operating resolution.
        import numpy as _np

        from banet_tpu.data.retarget import default_retarget_intrinsics

        Hn, Wn = args.retarget
        if getattr(args, "retarget_intrinsics", None):
            k_new = _np.asarray(args.retarget_intrinsics, _np.float32)
        else:
            k_new = default_retarget_intrinsics(seq_intr, (H, W),
                                                (Hn, Wn))
        # Factory binds the SOURCE intrinsics eagerly: `seq_intr` is
        # rebound to k_new below, and an inline late-binding closure
        # here once silently called adjust_intrinsics with src == dst
        # (sx=sy=1 — no rescale; ADVICE r4 high).
        retarget = make_retarget_fn(seq_intr, k_new, (Hn, Wn))  # noqa: F811
        seq_intr = k_new
        H, W = Hn, Wn
    cfg = default_config()
    if args.iters:
        import dataclasses

        cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
            cfg.solver, level_iters=tuple(args.iters)))
    cfg = _apply_ckpt_model_config(cfg, args.checkpoint)
    if not getattr(args, "no_fast_layout", False):
        from banet_tpu.config import inference_config

        cfg = inference_config(cfg, image_size=(H, W))
    if getattr(args, "feature_dtype", None):
        import dataclasses

        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, solver_feature_dtype=args.feature_dtype))
    tracker = TwoViewTracker.initialize(cfg, image_size=(H, W),
                                        num_points=args.num_points)
    if args.checkpoint:
        from banet_tpu.utils.checkpoint import optimistic_restore

        merged, restored, skipped = optimistic_restore(
            args.checkpoint, tracker.variables)
        tracker.variables = merged
        print(f"restored {len(restored)} vars, skipped {len(skipped)}",
              file=sys.stderr)
    tnet = tnet_vars = None
    if args.tnet_checkpoint:
        import jax
        import jax.numpy as jnp

        from banet_tpu.geometry.camera import Intrinsics
        from banet_tpu.models.tracking_net import TrackingNet
        from banet_tpu.utils.checkpoint import restore_checkpoint

        th, tw = args.tnet_size
        tnet = TrackingNet(levels=3, num_samples=args.tnet_samples,
                           normalized_rays=False)
        img = jnp.zeros((1, th, tw, 3))
        dep = jnp.ones((1, th, tw))
        intr = Intrinsics(jnp.array([tw * 0.8]), jnp.array([tw * 0.8]),
                          jnp.array([tw / 2.0]), jnp.array([th / 2.0]))
        tmpl = tnet.init(jax.random.PRNGKey(0), img, dep, img,
                         intr)["params"]
        tnet_vars = {"params": restore_checkpoint(
            args.tnet_checkpoint, tmpl)}
        print(f"restored TrackingNet init from {args.tnet_checkpoint}",
              file=sys.stderr)
    kf_cfg = None
    if args.max_time_gap is not None or args.min_keep_ratio is not None:
        import dataclasses

        from banet_tpu.config import KeyframeConfig

        kf_cfg = KeyframeConfig()
        if args.max_time_gap is not None:
            kf_cfg = dataclasses.replace(kf_cfg,
                                         max_time_gap=args.max_time_gap)
        if args.min_keep_ratio is not None:
            kf_cfg = dataclasses.replace(
                kf_cfg, min_keep_ratio=args.min_keep_ratio)
    runner = OdometryRunner(tracker, keyframe_cfg=kf_cfg,
                            num_points=args.num_points,
                            window_ba=args.window_ba,
                            window_ba_mode=args.window_ba_mode,
                            tnet=tnet, tnet_variables=tnet_vars,
                            tnet_size=tuple(args.tnet_size),
                            tnet_mode=args.tnet_mode)
    if retarget is None:
        frames = ((f.timestamp, f.load_rgb(), f.load_depth())
                  for f in seq.frames[:args.max_frames])
    else:
        frames = ((f.timestamp,) + retarget(f.load_rgb(),
                                            f.load_depth())
                  for f in seq.frames[:args.max_frames])
    traj, stats = runner.run(frames, seq_intr)
    save_tum_trajectory(args.out, traj)
    out = {"frames": stats.num_frames,
           "keyframes": stats.num_keyframes,
           "out": args.out}
    if tnet is not None:
        out["tnet_rescues"] = stats.tnet_rescues
    if args.window_ba:
        out["window_refinements"] = stats.window_refinements
    print(json.dumps(out))
    return 0


def _load_sequence(path: str, fmt: str):
    if fmt == "scannet":
        from banet_tpu.data.scannet import ScanNetScene

        return ScanNetScene(path)
    if fmt == "kitti":
        from banet_tpu.data.kitti import KittiOdometrySequence

        return KittiOdometrySequence(path)
    from banet_tpu.data.tum import TumSequence

    return TumSequence(path)


def _cmd_odometry_batched(args) -> int:
    """Multi-sequence lockstep odometry (tracking/batch_odometry.py):
    one (S, ...) device batch per tick — the batched serving layout."""
    import time as _time

    from banet_tpu.config import default_config
    from banet_tpu.eval.trajectory import save_tum_trajectory
    from banet_tpu.tracking import TwoViewTracker
    from banet_tpu.tracking.batch_odometry import BatchedOdometryRunner

    # Per-sequence extras the batched runner does not support; fail
    # loudly instead of silently changing semantics (ADVICE r4).
    # Single-mode window BA IS supported (refined per element at rekey
    # with the serial runner's padded jit; batch_odometry.py docstring).
    unsupported = [
        ("--retarget", getattr(args, "retarget", None)),
        ("--tnet-checkpoint", getattr(args, "tnet_checkpoint", None)),
        ("--window-ba-mode multi",
         getattr(args, "window_ba", False)
         and getattr(args, "window_ba_mode", "single") == "multi"),
    ]
    bad = [name for name, val in unsupported if val]
    if bad:
        print("error: batched multi-sequence odometry does not support "
              + ", ".join(bad) + " (run sequences one at a time)",
              file=sys.stderr)
        return 2

    seqs = [_load_sequence(p, args.format) for p in args.sequence]
    for p, s in zip(args.sequence, seqs):
        if len(s) == 0:
            print(f"empty sequence: {p}", file=sys.stderr)
            return 1
    frame_lists = [[(f.timestamp, f.load_rgb(), f.load_depth())
                    for f in s.frames[:args.max_frames]] for s in seqs]
    H, W = frame_lists[0][0][1].shape[:2]
    for fl in frame_lists:
        assert fl[0][1].shape[:2] == (H, W), \
            "batched odometry needs equal-resolution sequences"

    cfg = default_config()
    if args.iters:
        import dataclasses

        cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
            cfg.solver, level_iters=tuple(args.iters)))
    cfg = _apply_ckpt_model_config(cfg, args.checkpoint)
    if not getattr(args, "no_fast_layout", False):
        from banet_tpu.config import inference_config

        cfg = inference_config(cfg, image_size=(H, W))
    if getattr(args, "feature_dtype", None):
        import dataclasses

        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, solver_feature_dtype=args.feature_dtype))
    tracker = TwoViewTracker.initialize(cfg, image_size=(H, W),
                                        num_points=args.num_points)
    if args.checkpoint:
        from banet_tpu.utils.checkpoint import optimistic_restore

        merged, restored, skipped = optimistic_restore(
            args.checkpoint, tracker.variables)
        tracker.variables = merged
        print(f"restored {len(restored)} vars, skipped {len(skipped)}",
              file=sys.stderr)
    kf_cfg = None
    if args.max_time_gap is not None or args.min_keep_ratio is not None:
        import dataclasses

        from banet_tpu.config import KeyframeConfig

        kf_cfg = KeyframeConfig()
        if args.max_time_gap is not None:
            kf_cfg = dataclasses.replace(kf_cfg,
                                         max_time_gap=args.max_time_gap)
        if args.min_keep_ratio is not None:
            kf_cfg = dataclasses.replace(
                kf_cfg, min_keep_ratio=args.min_keep_ratio)

    runner = BatchedOdometryRunner(tracker, keyframe_cfg=kf_cfg,
                                   num_points=args.num_points,
                                   window_ba=args.window_ba)
    t0 = _time.perf_counter()
    trajs, stats = runner.run(frame_lists,
                              [s.intrinsics for s in seqs])
    wall = _time.perf_counter() - t0
    outs = []
    for i, traj in enumerate(trajs):
        path = f"{args.out}.{i}.txt" if len(trajs) > 1 else args.out
        save_tum_trajectory(path, traj)
        outs.append(path)
    summary = {
        "sequences": len(seqs),
        "frames": stats.num_frames,
        "keyframes": stats.num_keyframes,
        "wall_s": round(wall, 3),
        "frames_per_s": round(stats.num_frames / wall, 2),
        "out": outs}
    if args.window_ba:
        summary["window_refinements"] = stats.window_refinements
    print(json.dumps(summary))
    return 0


def _cmd_evaluate(args) -> int:
    from banet_tpu.eval import (evaluate_ate, evaluate_rpe,
                                load_tum_trajectory)
    from banet_tpu.eval.associate import associate
    from banet_tpu.eval.trajectory import Trajectory

    gt = load_tum_trajectory(args.groundtruth)
    est = load_tum_trajectory(args.estimate)
    out = dict(evaluate_ate(gt, est, max_difference=args.max_difference))
    matches = associate(list(gt.timestamps), list(est.timestamps),
                        max_difference=args.max_difference)
    ia = [m[0] for m in matches]
    ib = [m[1] for m in matches]
    gt_m = Trajectory(gt.timestamps[ia], gt.poses[ia])
    est_m = Trajectory(est.timestamps[ib], est.poses[ib])
    try:
        out.update(evaluate_rpe(gt_m, est_m, delta=args.rpe_delta,
                                delta_unit=args.rpe_unit))
    except ValueError as e:
        # A bad delta must not discard the ATE results.
        out["rpe_error"] = str(e)
    print(json.dumps(out, indent=2))
    return 0


def _cmd_pairs(args) -> int:
    """GT-annotated pair evaluation over a TUM sequence (the
    legacy/eval.py workflow, pairs formed (i, i+stride))."""
    import numpy as np

    from banet_tpu.config import default_config
    from banet_tpu.data.tum import TumSequence
    from banet_tpu.eval.pair_eval import evaluate_pairs, summarize
    from banet_tpu.tracking import TwoViewTracker

    seq = TumSequence(args.sequence)
    frames = [f for f in seq.frames if f.gt_pose is not None]
    if len(frames) < args.stride + 1:
        print("not enough GT frames", file=sys.stderr)
        return 1
    rgb0 = frames[0].load_rgb()
    cfg = default_config()
    if args.iters:
        import dataclasses

        cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
            cfg.solver, level_iters=tuple(args.iters)))
    cfg = _apply_ckpt_model_config(cfg, args.checkpoint)
    from banet_tpu.config import inference_config

    cfg = inference_config(cfg, image_size=rgb0.shape[:2])
    tracker = TwoViewTracker.initialize(
        cfg, image_size=rgb0.shape[:2], num_points=args.num_points)
    if args.checkpoint:
        from banet_tpu.utils.checkpoint import optimistic_restore

        merged, restored, skipped = optimistic_restore(
            args.checkpoint, tracker.variables)
        tracker.variables = merged
        print(f"restored {len(restored)} vars, skipped {len(skipped)}",
              file=sys.stderr)

    def make_pairs():
        starts = list(range(0, len(frames) - args.stride,
                            args.stride))[:args.max_pairs]
        for i in starts:
            a, b = frames[i], frames[i + args.stride]
            T = np.linalg.inv(b.gt_pose) @ a.gt_pose  # target-from-ref
            yield dict(image1=a.load_rgb(), image2=b.load_rgb(),
                       depth1=a.load_depth(), depth2=b.load_depth(),
                       R_gt=T[:3, :3], t_gt=T[:3, 3])

    results = evaluate_pairs(tracker, make_pairs(), seq.intrinsics,
                             num_points=args.num_points,
                             viz_dir=args.viz_dir)
    print(json.dumps(summarize(results), indent=2))
    return 0


def _cmd_depth(args) -> int:
    """Depth-map evaluation over a TUM-format sequence: run monocular
    two-view bundle adjustment on frame pairs and score the initial and
    basis-refined depth maps against the sensor depth (the BA-Net
    paper's depth metric set; eval/depth_eval.py)."""
    from banet_tpu.config import default_config, inference_config
    from banet_tpu.data.tum import TumSequence
    from banet_tpu.eval.depth_eval import (evaluate_depth_pairs,
                                           summarize_depth)
    from banet_tpu.tracking import TwoViewTracker

    seq = TumSequence(args.sequence)
    frames = seq.frames
    if len(frames) < args.stride + 1:
        print("not enough frames", file=sys.stderr)
        return 1
    rgb0 = frames[0].load_rgb()
    cfg = default_config()
    cfg = _apply_ckpt_model_config(cfg, args.checkpoint)
    cfg = inference_config(cfg, image_size=rgb0.shape[:2])
    tracker = TwoViewTracker.initialize(
        cfg, image_size=rgb0.shape[:2], num_points=args.num_points)
    if args.checkpoint:
        from banet_tpu.utils.checkpoint import optimistic_restore

        merged, restored, skipped = optimistic_restore(
            args.checkpoint, tracker.variables)
        tracker.variables = merged
        print(f"restored {len(restored)} vars, skipped {len(skipped)}",
              file=sys.stderr)

    if args.window:
        from banet_tpu.eval.depth_eval import evaluate_depth_windows

        F = args.window

        def make_windows():
            starts = list(range(0, len(frames) - F,
                                args.stride))[:args.max_pairs]
            for i in starts:
                yield dict(
                    image_key=frames[i].load_rgb(),
                    images_tgt=np.stack(
                        [frames[i + 1 + j].load_rgb()
                         for j in range(F)]),
                    depth_key=frames[i].load_depth())

        import numpy as np

        results = evaluate_depth_windows(
            tracker, make_windows(), seq.intrinsics,
            num_points=args.num_points, max_depth=args.max_depth)
        out = summarize_depth(results)
        out["window_frames"] = F
        print(json.dumps(out, indent=2))
        return 0

    def make_pairs():
        starts = list(range(0, len(frames) - args.stride,
                            args.stride))[:args.max_pairs]
        for i in starts:
            a, b = frames[i], frames[i + args.stride]
            yield dict(image1=a.load_rgb(), image2=b.load_rgb(),
                       depth1=a.load_depth())

    results = evaluate_depth_pairs(tracker, make_pairs(),
                                   seq.intrinsics,
                                   num_points=args.num_points,
                                   max_depth=args.max_depth)
    print(json.dumps(summarize_depth(results), indent=2))
    return 0


def _cmd_train(args) -> int:
    import jax

    from banet_tpu.config import default_config
    from banet_tpu.train import (create_train_state, make_train_step,
                                 synthetic_batch)
    from banet_tpu.utils.checkpoint import save_checkpoint
    from banet_tpu.utils.logging import MetricsLogger

    cfg = default_config()
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(cfg.train.seed),
        image_size=tuple(args.image_size), num_points=args.num_points)
    if args.backbone_npy:
        from banet_tpu.utils.backbone_init import (load_backbone_npy,
                                                   seed_backbone)

        merged, restored, _skipped = seed_backbone(
            {"params": state.params, "batch_stats": state.batch_stats},
            load_backbone_npy(args.backbone_npy))
        state = state.replace(params=merged["params"],
                              batch_stats=merged["batch_stats"])
        print(f"seeded {len(restored)} encoder arrays from "
              f"{args.backbone_npy}", file=sys.stderr)
    step = jax.jit(make_train_step(model, cfg))
    logger = MetricsLogger(args.log_file)
    for i in range(args.steps):
        batch = synthetic_batch(jax.random.PRNGKey(1000 + i),
                                batch=cfg.train.batch_pairs,
                                height=args.image_size[0],
                                width=args.image_size[1],
                                num_points=args.num_points)
        state, metrics = step(state, batch)
        logger.log(i, **{k: v for k, v in metrics.items()})
    if args.checkpoint:
        save_checkpoint(args.checkpoint,
                        {"params": state.params,
                         "batch_stats": state.batch_stats})
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="banet_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    po = sub.add_parser("odometry", help="run sequence odometry on a "
                        "TUM RGB-D directory")
    po.add_argument("sequence", nargs="+",
                    help="sequence dir; several dirs => BATCHED "
                         "odometry (all sequences tracked in lockstep "
                         "in one device batch — the serving layout the "
                         "round-3 profile showed runs the marginal "
                         "frame ~2x cheaper than serial; trajectories "
                         "written as <out>.<i>.txt)")
    po.add_argument("--out", default="trajectory.txt")
    po.add_argument("--num-points", type=int, default=1024)
    po.add_argument("--max-frames", type=int, default=100000)
    po.add_argument("--checkpoint", default=None)
    po.add_argument("--format", choices=["tum", "scannet", "kitti"],
                    default="tum")
    po.add_argument("--no-fast-layout", action="store_true",
                    help="skip inference_config (s2d stem) — layout "
                         "A/B and debugging")
    po.add_argument("--feature-dtype", default=None,
                    choices=["float32", "bfloat16"],
                    help="override the solver feature-map dtype at "
                         "inference (bf16 halves the sampled-map "
                         "bytes; accuracy impact is measured, see "
                         "ModelConfig.solver_feature_dtype)")
    po.add_argument("--max-time-gap", type=float, default=None,
                    help="keyframe re-key time gate [s] (default 0.1; "
                         "KITTI's 10 Hz stream wants ~0.5)")
    po.add_argument("--min-keep-ratio", type=float, default=None,
                    help="keyframe re-key keep_ratio gate (default 0.8)")
    po.add_argument("--iters", type=int, nargs="+", default=None,
                    help="per-level GN iteration caps (early exit "
                         "makes extra iterations cheap; the reference "
                         "evaluates at 10 per level, legacy/eval.py:151)")
    po.add_argument("--tnet-checkpoint", default=None,
                    help="TrackingNet params checkpoint: hybrid "
                         "odometry (regression init -> GN refine)")
    po.add_argument("--tnet-size", type=int, nargs=2, default=(64, 96),
                    help="resolution the TrackingNet was trained at")
    po.add_argument("--tnet-samples", type=int, default=16)
    po.add_argument("--tnet-mode", choices=["rescue", "always"],
                    default="rescue",
                    help="rescue: regressor init only on frames whose "
                         "warm-start solve looks broken (adopted iff "
                         "the feature residual improves); always: try "
                         "it every frame under the same test")
    po.add_argument("--retarget", type=int, nargs=2, default=None,
                    metavar=("H", "W"),
                    help="resize+crop every frame to this resolution "
                         "with matched intrinsics before tracking "
                         "(reference deeptam view_utils.py:70-143)")
    po.add_argument("--retarget-intrinsics", type=float, nargs=4,
                    default=None, metavar=("FX", "FY", "CX", "CY"),
                    help="target intrinsics for --retarget (default: "
                         "source intrinsics scaled by the resolution "
                         "ratio — plain resize, no crop)")
    po.add_argument("--window-ba", action="store_true",
                    help="refine each keyframe window with the joint "
                    "Schur-complement BA")
    po.add_argument("--window-ba-mode", choices=["single", "multi"],
                    default="single",
                    help="multi: couple the previous keyframe into "
                         "each window solve (pose-graph-consistent "
                         "keyframe-chain refinement)")
    po.set_defaults(fn=_cmd_odometry)

    pe = sub.add_parser("evaluate", help="ATE + RPE between TUM "
                        "trajectory files")
    pe.add_argument("groundtruth")
    pe.add_argument("estimate")
    pe.add_argument("--max-difference", type=float, default=0.02)
    pe.add_argument("--rpe-delta", type=float, default=1.0)
    pe.add_argument("--rpe-unit", choices=["s", "f"], default="s")
    pe.set_defaults(fn=_cmd_evaluate)

    pp = sub.add_parser("pairs", help="GT-pair evaluation on a TUM "
                        "sequence (legacy/eval.py workflow)")
    pp.add_argument("sequence")
    pp.add_argument("--stride", type=int, default=5)
    pp.add_argument("--num-points", type=int, default=1024)
    pp.add_argument("--max-pairs", type=int, default=50)
    pp.add_argument("--iters", type=int, nargs="+", default=None,
                    help="per-level GN iteration caps")
    pp.add_argument("--checkpoint", default=None,
                    help="orbax checkpoint dir (optimistic restore)")
    pp.add_argument("--viz-dir", default=None,
                    help="save per-pair correspondence + warp-diff "
                         "panels (PNG) here")
    pp.set_defaults(fn=_cmd_pairs)

    pd = sub.add_parser("depth", help="depth-map metrics (abs-rel, "
                        "RMSE, deltas) of monocular two-view BA on a "
                        "TUM sequence")
    pd.add_argument("sequence")
    pd.add_argument("--stride", type=int, default=5)
    pd.add_argument("--num-points", type=int, default=1024)
    pd.add_argument("--max-pairs", type=int, default=20)
    pd.add_argument("--max-depth", type=float, default=10.0,
                    help="indoor RGB-D cap (use 80 for KITTI-like)")
    pd.add_argument("--checkpoint", default=None)
    pd.add_argument("--window", type=int, default=0, metavar="F",
                    help="score MULTI-FRAME window-BA depth instead of "
                         "the two-view pair: keyframe + F consecutive "
                         "targets (real baselines make the scale "
                         "observable; tracker.window_depth)")
    pd.set_defaults(fn=_cmd_depth)

    pt = sub.add_parser("train", help="train (synthetic data)")
    pt.add_argument("--steps", type=int, default=10)
    pt.add_argument("--image-size", type=int, nargs=2,
                    default=[256, 320])
    pt.add_argument("--num-points", type=int, default=512)
    pt.add_argument("--checkpoint", default=None)
    pt.add_argument("--backbone-npy", default=None,
                    help="seed the encoder from a .npy weight dict "
                         "(docs/REAL_DATA.md; reference enc.py:241)")
    pt.add_argument("--log-file", default=None)
    pt.set_defaults(fn=_cmd_train)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except (FileNotFoundError, ValueError) as e:
        # User-input problems surface as one clean line, not a
        # traceback; genuine bugs still raise.
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
