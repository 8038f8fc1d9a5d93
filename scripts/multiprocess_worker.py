"""Worker for REAL multi-process execution tests (2+ OS processes).

Every prior multi-"host" artifact in this repo ran single-process on a
virtual device mesh; this worker is the actual `jax.distributed` path:
N processes (CPU backend, gloo collectives) form one global device
mesh and run

  1. the host-parallel eval runner's ``process_allgather`` branch
     (eval/parallel_runner.py — the SURVEY §2.5 component whose
     multi-process branch had never executed anywhere), and
  2. one data-parallel training step of the flagship trainer with the
     global batch sharded across processes (host-local shards joined
     via ``host_local_array_to_global_array`` — the standard multi-host
     JAX input pattern).

Launched by tests/test_multiprocess.py (and usable by hand):

  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      XLA_FLAGS=--xla_force_host_platform_device_count=2 \
      JAX_CPU_COLLECTIVES_IMPLEMENTATION=gloo \
    python scripts/multiprocess_worker.py --pid 0 --nproc 2 --port 29500 &
  ... --pid 1 ... &

Each worker prints one final JSON line with the results; the test
asserts both workers agree.  (Reference has no distributed anything —
SURVEY.md §2.5; this is the BASELINE "1 host -> N hosts" capability's
process-boundary half.)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.nproc, process_id=args.pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    assert jax.process_count() == args.nproc, jax.process_count()
    local = jax.local_device_count()
    out = {"process_id": args.pid,
           "process_count": jax.process_count(),
           "local_devices": local,
           "global_devices": jax.device_count()}

    # ---- 1. eval runner: the real process_allgather branch ----
    from banet_tpu.eval.parallel_runner import run_sharded_eval

    seqs = [f"seq{i}" for i in range(5)]
    calls = []

    def eval_one(seq):
        calls.append(seq)
        i = int(seq[3:])
        return {"ate_rmse": 0.01 * (i + 1), "rpe_trans_rmse": 0.1 * i}

    results = run_sharded_eval(seqs, eval_one)
    # Each sequence must have been evaluated by exactly one process,
    # yet the gathered table is complete on every process.
    out["eval_local_calls"] = sorted(calls)
    out["eval_table"] = {s: float(results[s]["ate_rmse"])
                         for s in seqs}

    # ---- 2. DP train step across the process boundary ----
    from banet_tpu.config import Config, ModelConfig, SolverConfig
    from banet_tpu.parallel.mesh import make_mesh
    from banet_tpu.train.trainer import (create_train_state,
                                         make_train_step,
                                         synthetic_batch)

    cfg = Config(model=ModelConfig(backbone="drn22",
                                   compute_dtype="float32"),
                 solver=SolverConfig(level_iters=(1, 1, 1, 1)))
    n_global = jax.device_count()
    mesh = make_mesh(data=n_global, frame=1, devices=jax.devices())
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      image_size=(32, 64), num_points=16)
    # Same seed everywhere -> identical host-local replicas; join them
    # into global arrays (params/opt replicated, batch data-sharded).
    state = multihost_utils.host_local_array_to_global_array(
        jax.tree.map(np.asarray, state), mesh, P())
    local_batch = synthetic_batch(
        jax.random.PRNGKey(1 + args.pid), batch=local,
        height=32, width=64, num_points=16)
    batch = multihost_utils.host_local_array_to_global_array(
        jax.tree.map(np.asarray, local_batch), mesh, P("data"))

    from banet_tpu.parallel.sharding import batch_sharding, replicated

    step = jax.jit(make_train_step(model, cfg),
                   in_shardings=(replicated(mesh), batch_sharding(mesh)),
                   out_shardings=(replicated(mesh), replicated(mesh)))
    state, metrics = step(state, batch)
    # Replicated outputs are identical on every process; fetching the
    # addressable shard is allowed and must agree across workers.
    total = float(np.asarray(
        jax.tree.map(lambda x: x.addressable_data(0), metrics)["total"]))
    out["train_total_loss"] = round(total, 6)
    out["train_loss_finite"] = bool(np.isfinite(total))

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
