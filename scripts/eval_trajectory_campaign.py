"""Round-2 trajectory-level accuracy campaign: trained-vs-untrained ATE
through the CLI (odometry -> evaluate), plus pair-eval mean/median.

Renders a HELD-OUT coherent multi-plane sequence (seed disjoint from the
training curriculum's PRNGKey(i), i < steps), then for each condition
(untrained / trained / trained-EMA) drives the actual CLI surfaces the
way a user would:

  python -m banet_tpu.cli odometry <seq> --out traj.txt [--checkpoint C]
  python -m banet_tpu.cli evaluate <seq>/groundtruth.txt traj.txt
  python -m banet_tpu.cli pairs    <seq> --stride S [--checkpoint C]

and records ATE/RPE + pair-eval summaries and the trained/untrained
ratios in one artifact JSON.  (Reference capability being evidenced:
trajectory ATE evaluation of a trained model — legacy/eval.py:234 +
vendored evaluate_ate.py:116 semantics.)

Usage (CPU is fine; each CLI call is a fresh process):
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/eval_trajectory_campaign.py \
      --ckpt artifacts/campaign_r2/ckpt \
      --ckpt-ema artifacts/campaign_r2/ckpt_ema \
      --out artifacts/campaign_r2/trajectory_eval.json
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(cli_args, timeout=3600, retries=3):
    """Run a banet_tpu CLI subcommand; return the last stdout JSON.

    Retries with backoff: the device relay can refuse new connections
    for a window after another client disconnects (observed as
    "Backend 'axon' is not in the list of known backends" in the
    subprocess), and such transients must not kill an hour-long
    campaign."""
    import time

    cmd = [sys.executable, "-m", "banet_tpu.cli"] + cli_args
    # PREPEND to PYTHONPATH — replacing it drops entries the device
    # plugin needs (here: a sitecustomize dir that registers the
    # relay backend; overwriting it made every child die with
    # "Backend 'axon' is not in the list of known backends").
    old_pp = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ,
               PYTHONPATH=REPO + (os.pathsep + old_pp if old_pp else ""))
    print("+ " + " ".join(cli_args), flush=True)
    for attempt in range(retries):
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout, env=env, cwd=REPO)
        if proc.returncode == 0:
            break
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        if attempt + 1 < retries:
            wait = 60 * (attempt + 1)
            print(f"retrying {cli_args[0]} in {wait}s "
                  f"(attempt {attempt + 2}/{retries})", flush=True)
            time.sleep(wait)
    if proc.returncode != 0:
        raise RuntimeError(f"CLI failed: {cli_args[0]}")
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            # `evaluate` pretty-prints over multiple lines; re-join.
            start = proc.stdout.index(line)
            return json.loads(proc.stdout[start:])
    raise RuntimeError(f"no JSON in CLI output: {proc.stdout[-500:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="artifacts/campaign_r2/ckpt")
    ap.add_argument("--ckpt-ema",
                    default="artifacts/campaign_r2/ckpt_ema")
    ap.add_argument("--seq-dir", default="/tmp/heldout_seq_r2")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", type=int, nargs=2, default=(256, 320))
    ap.add_argument("--seed", type=int, default=9999)
    ap.add_argument("--step-rot", type=float, default=0.01,
                    help="per-frame rotation magnitude (rad); raise "
                         "for a harder sequence the untrained tracker "
                         "cannot follow")
    ap.add_argument("--step-trans", type=float, default=0.02)
    ap.add_argument("--num-points", type=int, default=512)
    ap.add_argument("--pair-stride", type=int, default=2)
    ap.add_argument("--max-pairs", type=int, default=20)
    ap.add_argument("--window-ba", action="store_true")
    ap.add_argument("--window-ba-mode", choices=["single", "multi"],
                    default="single")
    ap.add_argument("--domain", default=None, choices=["A", "B", "P"],
                    help="render the held-out sequence from this "
                         "nuisance domain (data/synthetic.DOMAINS) — "
                         "'B' is the held-out-statistics domain for "
                         "generalization evals, 'P' the photographic-"
                         "statistics (dead-leaves) domain")
    ap.add_argument("--iters", type=int, nargs="+", default=None,
                    help="per-level GN iteration caps for odometry/pairs")
    ap.add_argument("--tnet-ckpt", default=None,
                    help="TrackingNet checkpoint: adds a hybrid "
                         "(regression-init) odometry condition")
    ap.add_argument("--tnet-samples", type=int, default=16)
    ap.add_argument("--tnet-mode", choices=["rescue", "always"],
                    default="rescue")
    ap.add_argument("--triage", action="store_true",
                    help="trajectory-only (skip pairs + depth): fast "
                         "ATE triage of a candidate checkpoint")
    ap.add_argument("--out",
                    default="artifacts/campaign_r2/trajectory_eval.json")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    if not os.path.exists(os.path.join(args.seq_dir, "groundtruth.txt")):
        from banet_tpu.data.synthetic import write_rendered_sequence

        print(f"rendering held-out sequence -> {args.seq_dir}",
              flush=True)
        write_rendered_sequence(args.seq_dir, num_frames=args.frames,
                                size=tuple(args.size), seed=args.seed,
                                step_rot=args.step_rot,
                                step_trans=args.step_trans,
                                domain=args.domain)

    conditions = [("untrained", None, None)]
    for name, path in (("trained", args.ckpt),
                       ("trained_ema", args.ckpt_ema)):
        if path and os.path.exists(path):
            conditions.append((name, os.path.abspath(path), None))
        else:
            print(f"skipping {name}: no checkpoint at {path}",
                  flush=True)
    if args.tnet_ckpt and os.path.exists(args.tnet_ckpt):
        tn = os.path.abspath(args.tnet_ckpt)
        conditions.append(("hybrid_untrained", None, tn))
        if args.ckpt and os.path.exists(args.ckpt):
            conditions.append(
                ("hybrid_trained", os.path.abspath(args.ckpt), tn))

    results = {}
    for name, ckpt, tnet in conditions:
        traj = os.path.join(args.seq_dir, f"traj_{name}.txt")
        odo_args = ["odometry", args.seq_dir, "--out", traj,
                    "--num-points", str(args.num_points),
                    "--max-frames", str(args.frames)]
        if args.window_ba:
            odo_args += ["--window-ba", "--window-ba-mode",
                         args.window_ba_mode]
        if args.iters:
            odo_args += ["--iters"] + [str(i) for i in args.iters]
        if tnet:
            odo_args += ["--tnet-checkpoint", tnet,
                         "--tnet-samples", str(args.tnet_samples),
                         "--tnet-mode", args.tnet_mode]
        if ckpt:
            odo_args += ["--checkpoint", ckpt]
        odo = run_cli(odo_args)
        ate = run_cli(["evaluate",
                       os.path.join(args.seq_dir, "groundtruth.txt"),
                       traj, "--rpe-delta", "1", "--rpe-unit", "f"])
        if args.triage:
            results[name] = {"odometry": odo, "ate_rpe": ate}
            print(json.dumps({name: ate.get("ate_rmse")}), flush=True)
            continue
        pair_args = ["pairs", args.seq_dir,
                     "--stride", str(args.pair_stride),
                     "--num-points", str(args.num_points),
                     "--max-pairs", str(args.max_pairs)]
        if args.iters:
            pair_args += ["--iters"] + [str(i) for i in args.iters]
        if ckpt:
            pair_args += ["--checkpoint", ckpt]
        pairs = run_cli(pair_args)
        results[name] = {"odometry": odo, "ate_rpe": ate,
                         "pairs": pairs}
        if tnet is None:
            # Depth-map metrics of monocular two-view BA (the paper's
            # depth evaluation; eval/depth_eval.py) — skipped for the
            # hybrid conditions, whose delta is pose-only.
            # Depth needs a real baseline: two-view depth refinement is
            # near-unidentifiable at tiny parallax (ba/bundle_solver.py),
            # so score it at 3x the pose-pair stride.
            depth_args = ["depth", args.seq_dir,
                          "--stride", str(3 * args.pair_stride),
                          "--num-points", str(args.num_points),
                          "--max-pairs", str(min(args.max_pairs, 10))]
            if ckpt:
                depth_args += ["--checkpoint", ckpt]
            results[name]["depth"] = run_cli(depth_args)
        print(json.dumps({name: ate.get("ate_rmse")}), flush=True)

    art = {"sequence": {"dir": args.seq_dir, "frames": args.frames,
                        "size": list(args.size), "seed": args.seed,
                        "step_rot": args.step_rot,
                        "step_trans": args.step_trans,
                        "window_ba": bool(args.window_ba),
                        "window_ba_mode": (args.window_ba_mode
                                           if args.window_ba else None),
                        "domain": args.domain},
           "results": results}
    base = results.get("untrained", {}).get("ate_rpe", {})
    for name in ("trained", "trained_ema", "hybrid_untrained",
                 "hybrid_trained"):
        if name in results and "ate_rmse" in base:
            r = results[name]["ate_rpe"]
            art[f"{name}_over_untrained_ate"] = (
                r["ate_rmse"] / base["ate_rmse"])
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(art, f, indent=2)
    print(json.dumps({"done": True, "out": args.out,
                      **{k: v for k, v in art.items()
                         if k.endswith("_ate")}}))


if __name__ == "__main__":
    main()
