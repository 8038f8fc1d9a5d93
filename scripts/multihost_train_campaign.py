"""REAL 2+-process data-parallel training CAMPAIGN (gloo, CPU backend).

tests/test_multiprocess.py proved ONE train step executes across an OS
process boundary; this script is the remaining half of the "1 host ->
N hosts" BASELINE capability: a multi-STEP campaign — optimizer state
advancing across hundreds of steps whose global batch is sharded over
processes, metrics logged, and a checkpoint written from process 0 —
i.e. the actual operational loop a multi-host TPU pod would run, with
gloo standing in for ICI (the collective layout is identical; only the
transport differs; parallel/sharding.py).

Reference has no distributed training at all (SURVEY.md §2.5); the
pattern here is the standard JAX multi-host recipe: per-process
host-local batches joined with ``host_local_array_to_global_array``,
replicated state, one jitted step with explicit in/out shardings.

Launcher mode (spawns the workers, waits, checks the summary):

  env PALLAS_AXON_POOL_IPS= python scripts/multihost_train_campaign.py \
      --launch --nproc 2 --steps 150 --out artifacts/multihost_train_r5

Worker mode is internal (--pid given).
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.nproc, process_id=args.pid)

    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from banet_tpu.config import Config, ModelConfig, SolverConfig
    from banet_tpu.parallel.mesh import make_mesh
    from banet_tpu.parallel.sharding import batch_sharding, replicated
    from banet_tpu.train.trainer import (create_train_state,
                                         make_train_step,
                                         synthetic_batch)

    cfg = Config(model=ModelConfig(backbone="drn22",
                                   compute_dtype="float32"),
                 solver=SolverConfig(level_iters=(1, 1, 1, 1)))
    local = jax.local_device_count()
    mesh = make_mesh(data=jax.device_count(), frame=1,
                     devices=jax.devices())
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      image_size=(32, 64),
                                      num_points=16)
    state = multihost_utils.host_local_array_to_global_array(
        jax.tree.map(np.asarray, state), mesh, P())
    step_fn = jax.jit(
        make_train_step(model, cfg),
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
        out_shardings=(replicated(mesh), replicated(mesh)))

    is_zero = args.pid == 0
    os.makedirs(args.out, exist_ok=True)
    metrics_path = os.path.join(args.out, "metrics.jsonl")
    log = open(metrics_path, "w") if is_zero else None
    totals = []
    t0 = time.time()
    for step in range(args.steps):
        # Per-step, per-PROCESS batch seed: the global batch really is
        # different data on each process (fold_in of both indices).
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(7), step), args.pid)
        local_batch = synthetic_batch(key, batch=local, height=32,
                                      width=64, num_points=16)
        batch = multihost_utils.host_local_array_to_global_array(
            jax.tree.map(np.asarray, local_batch), mesh, P("data"))
        state, metrics = step_fn(state, batch)
        total = float(np.asarray(jax.tree.map(
            lambda x: x.addressable_data(0), metrics)["total"]))
        totals.append(total)
        if is_zero and (step % args.log_every == 0
                        or step == args.steps - 1):
            row = {k: float(np.asarray(v.addressable_data(0)))
                   for k, v in metrics.items()}
            row.update(step=step, wall_s=round(time.time() - t0, 1))
            log.write(json.dumps(row) + "\n")
            log.flush()

    # Checkpoint: replicated state -> host np tree.  EVERY process
    # calls the (orbax) save — it runs its own cross-process barriers
    # and writes from the primary host; a pid-0-only call deadlocks
    # against the other workers' final sync.
    host_state = jax.tree.map(
        lambda x: np.asarray(x.addressable_data(0)), state)
    from banet_tpu.utils.checkpoint import save_checkpoint

    save_checkpoint(os.path.join(args.out, "ckpt"),
                    {"params": host_state.params,
                     "batch_stats": host_state.batch_stats})
    if is_zero:
        log.close()
        k = max(len(totals) // 5, 1)
        first, last = (float(np.mean(totals[:k])),
                       float(np.mean(totals[-k:])))
        summary = {
            "processes": jax.process_count(),
            "local_devices_per_process": local,
            "global_devices": jax.device_count(),
            "steps": args.steps,
            "wall_s": round(time.time() - t0, 1),
            "loss_first_fifth_mean": round(first, 6),
            "loss_last_fifth_mean": round(last, 6),
            "loss_decreased": bool(last < first),
            "all_finite": bool(np.all(np.isfinite(totals))),
        }
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        print("RESULT " + json.dumps(summary), flush=True)
    multihost_utils.sync_global_devices("campaign_done")


def launch(args):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count="
                  f"{args.devices_per_proc}",
        JAX_CPU_COLLECTIVES_IMPLEMENTATION="gloo",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--pid", str(pid),
         "--nproc", str(args.nproc), "--port", str(port),
         "--steps", str(args.steps), "--out", args.out,
         "--log-every", str(args.log_every)],
        env=env, cwd=REPO) for pid in range(args.nproc)]
    rc = [p.wait(timeout=args.timeout) for p in procs]
    if any(rc):
        raise SystemExit(f"worker exit codes {rc}")
    with open(os.path.join(args.out, "summary.json")) as f:
        print(f.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--launch", action="store_true")
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--out", default="artifacts/multihost_train_r5")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--devices-per-proc", type=int, default=2)
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()
    if args.launch:
        launch(args)
    else:
        worker(args)


if __name__ == "__main__":
    main()
