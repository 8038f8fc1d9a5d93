"""Supervisor for train_accuracy_campaign.py on a flaky device relay.

The relay can drop a reply mid-run, leaving the training process
blocked forever on a device fetch (observed twice in one day: the
process sleeps on a futex, its relay connection threads respawn, and
metrics.jsonl stops advancing while the checkpoint on disk stays at the
last --save-every multiple).  This wrapper watches metrics.jsonl and,
when it stalls, kills the exact child PID and relaunches with
--resume-from-step at the last saved step.

Usage:
  python scripts/supervise_campaign.py --out artifacts/campaign_r5b \
      --steps 20000 -- --pad-mode zero --feature-dtype bfloat16
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_logged_step(metrics_path: str) -> int:
    if not os.path.exists(metrics_path):
        return 0
    last = 0
    with open(metrics_path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "step" in rec:
                last = max(last, int(rec["step"]))
    return last


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, required=True)
    ap.add_argument("--save-every", type=int, default=500)
    ap.add_argument("--stall-seconds", type=float, default=300.0,
                    help="no metrics progress for this long => hung")
    ap.add_argument("--max-restarts", type=int, default=20)
    ap.add_argument("rest", nargs=argparse.REMAINDER,
                    help="extra train_accuracy_campaign args after --")
    args = ap.parse_args()
    extra = [a for a in args.rest if a != "--"]
    metrics = os.path.join(args.out, "metrics.jsonl")

    restarts = 0
    while True:
        resume = (last_logged_step(metrics) // args.save_every
                  ) * args.save_every
        cmd = [sys.executable,
               os.path.join(REPO, "scripts",
                            "train_accuracy_campaign.py"),
               "--steps", str(args.steps), "--out", args.out,
               "--save-every", str(args.save_every)] + extra
        if resume:
            cmd += ["--resume-from-step", str(resume)]
        print(f"[supervisor] launching (resume={resume}): "
              + " ".join(cmd), flush=True)
        proc = subprocess.Popen(cmd, cwd=REPO)
        step0 = last_logged_step(metrics)  # pre-existing log content
        last_step, last_change = step0, time.time()
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            time.sleep(30)
            step = last_logged_step(metrics)
            if step != last_step:
                last_step, last_change = step, time.time()
            # Generous allowance until THIS process logs its first new
            # step (remote compile takes minutes).
            stall_budget = (args.stall_seconds if step > step0
                            else 1200.0)
            if time.time() - last_change > stall_budget:
                print(f"[supervisor] stalled at step {step} "
                      f"({stall_budget:.0f}s without progress); "
                      f"killing pid {proc.pid}", flush=True)
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                rc = -9
                break
        if rc == 0:
            print("[supervisor] run completed", flush=True)
            return 0
        if rc in (3, 4):
            # 3 = NaN tripwire (consecutive skipped updates), 4 =
            # corrupt resume checkpoint.  Resuming would deterministic-
            # ally reproduce the same failure (data keys are step-
            # indexed) — stop and demand a human look instead of
            # zombie-looping (campaign_r7 postmortem).
            print(f"[supervisor] child exited with FATAL code {rc}; "
                  "not restarting", flush=True)
            return 2
        restarts += 1
        if restarts > args.max_restarts:
            print("[supervisor] too many restarts, giving up",
                  flush=True)
            return 1
        print(f"[supervisor] restart {restarts}/{args.max_restarts}",
              flush=True)
        time.sleep(30)


if __name__ == "__main__":
    raise SystemExit(main())
