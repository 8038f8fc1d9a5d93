"""Rescue-capability artifact (VERDICT r3 item 8): build a sequence
that GN-only odometry visibly FAILS on, then show the TrackingNet
rescue recovering it — and changing nothing on an easy sequence.

The failure fixture inserts abrupt fast-rotation segments (step_scale
on the smoothed trajectory velocity — data/synthetic.py) optionally
combined with contrast-collapsed frames (auto-exposure-blowout
semantics).  GN tracking fails there because the coarse-level basin is
exceeded (the role DeepTAM plays for the reference:
reference legacy/deeptam/python/deeptam_tracker/tracker.py:106-135 —
the learned regressor supplies the init the iterative solve cannot
find on its own).

Conditions per sequence: gn (no tnet), rescue (--tnet-mode rescue).
Writes one artifact JSON with ATEs, the per-condition rescue counts,
and the easy/hard ratios.

Usage:
  python scripts/eval_rescue.py \
      --ckpt artifacts/campaign_r6/ckpt_ema \
      --tnet-ckpt artifacts/campaign_r2/tnet_ckpt2 \
      --out artifacts/rescue_r4/rescue_eval.json
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from eval_trajectory_campaign import run_cli  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="artifacts/campaign_r6/ckpt_ema")
    ap.add_argument("--tnet-ckpt",
                    default="artifacts/campaign_r2/tnet_ckpt2")
    ap.add_argument("--tnet-samples", type=int, default=16)  # must match the ckpt's motion-block width (tnet_ckpt2 trained with 16)
    ap.add_argument("--seq-root", default="/tmp/rescue_seqs")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--size", type=int, nargs=2, default=(256, 320))
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--step-rot", type=float, default=0.01)
    ap.add_argument("--step-trans", type=float, default=0.02)
    ap.add_argument("--burst-scale", type=float, default=8.0,
                    help="fast-rotation segment velocity multiplier")
    ap.add_argument("--num-points", type=int, default=512)
    ap.add_argument("--out", default="artifacts/rescue_r4/"
                                     "rescue_eval.json")
    args = ap.parse_args()

    from banet_tpu.data.synthetic import write_rendered_sequence

    F = args.frames
    # Two abrupt fast-motion bursts mid-sequence.
    scale = np.ones(F)
    for s0 in (F // 3, 2 * F // 3):
        scale[s0:s0 + 3] = args.burst_scale

    seqs = {}
    easy_dir = os.path.join(args.seq_root, "easy")
    hard_dir = os.path.join(args.seq_root, "hard")
    if not os.path.exists(os.path.join(easy_dir, "groundtruth.txt")):
        write_rendered_sequence(easy_dir, num_frames=F,
                                size=tuple(args.size), seed=args.seed,
                                step_rot=args.step_rot,
                                step_trans=args.step_trans)
    if not os.path.exists(os.path.join(hard_dir, "groundtruth.txt")):
        write_rendered_sequence(hard_dir, num_frames=F,
                                size=tuple(args.size),
                                seed=args.seed + 1,
                                step_rot=args.step_rot,
                                step_trans=args.step_trans,
                                step_scale=scale)
    seqs["easy"] = easy_dir
    seqs["hard"] = hard_dir

    ckpt = os.path.abspath(args.ckpt) if os.path.exists(args.ckpt) \
        else None
    tnet = os.path.abspath(args.tnet_ckpt)
    assert os.path.exists(tnet), tnet

    results = {}
    for seq_name, seq_dir in seqs.items():
        for cond in ("gn", "rescue"):
            traj = os.path.join(seq_dir, f"traj_{cond}.txt")
            odo_args = ["odometry", seq_dir, "--out", traj,
                        "--num-points", str(args.num_points),
                        "--max-frames", str(F)]
            if ckpt:
                odo_args += ["--checkpoint", ckpt]
            if cond == "rescue":
                odo_args += ["--tnet-checkpoint", tnet,
                             "--tnet-samples", str(args.tnet_samples),
                             "--tnet-mode", "rescue"]
            odo = run_cli(odo_args)
            ate = run_cli(["evaluate",
                           os.path.join(seq_dir, "groundtruth.txt"),
                           traj, "--rpe-delta", "1", "--rpe-unit", "f"])
            results[f"{seq_name}_{cond}"] = {
                "odometry": odo, "ate_rpe": ate}
            print(json.dumps({f"{seq_name}_{cond}":
                              ate.get("ate_rmse")}), flush=True)

    art = {"fixture": {"frames": F, "size": list(args.size),
                       "seed": args.seed, "step_rot": args.step_rot,
                       "step_trans": args.step_trans,
                       "burst_scale": args.burst_scale,
                       "burst_frames": [int(i) for i in
                                        np.where(scale > 1)[0]]},
           "checkpoint": args.ckpt, "tnet_checkpoint": args.tnet_ckpt,
           "results": results}
    for seq_name in seqs:
        g = results[f"{seq_name}_gn"]["ate_rpe"]["ate_rmse"]
        r = results[f"{seq_name}_rescue"]["ate_rpe"]["ate_rmse"]
        art[f"{seq_name}_gn_over_rescue_ate"] = g / r if r else None
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(art, f, indent=2)
    print(json.dumps({"done": True, "out": args.out,
                      **{k: v for k, v in art.items()
                         if k.endswith("_ate")}}))


if __name__ == "__main__":
    main()
