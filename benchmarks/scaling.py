"""Frame-axis scaling harness for the distributed window BA.

BASELINE's north star includes ">= 0.8 scaling efficiency on frames/s
from 1 host to N hosts".  Real multi-chip hardware is not reachable in
this environment (one tunneled chip), so this harness does two things:

1. on ANY device set, measure window-BA steps/s at frame-axis sizes
   1..N with proportionally growing windows (weak scaling — each shard
   keeps F_LOCAL frames) and report efficiency = rate_N / (N * rate_1);
2. verify the communication structure stays O(1) collectives per step
   at every mesh size (the precondition for good scaling on real ICI).

Run on a pod slice:  python benchmarks/scaling.py
Run on the CPU mesh: JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/scaling.py
(CPU numbers measure the harness, not ICI — the collective-count check
is the meaningful part off-hardware.)
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from banet_tpu.config import SolverConfig
from banet_tpu.data.synthetic import smooth_feature_map
from banet_tpu.geometry.camera import Intrinsics, backproject
from banet_tpu.ops.grad2d import append_spatial_gradient
from banet_tpu.parallel.mesh import make_mesh
from banet_tpu.parallel.window_ba import sharded_window_ba_step

F_LOCAL = 2        # frames per device (weak scaling)
H, W, C, N, K = 64, 80, 32, 512, 16


def make_problem(F, seed=0):
    key = jax.random.PRNGKey(seed)
    intr = Intrinsics(jnp.array([0.8 * W]), jnp.array([0.8 * W]),
                      jnp.array([W / 2.0]), jnp.array([H / 2.0]))
    pts = jnp.stack([
        jax.random.uniform(key, (1, N), minval=4.0, maxval=W - 4.0),
        jax.random.uniform(jax.random.fold_in(key, 1), (1, N),
                           minval=4.0, maxval=H - 4.0)], axis=-1)
    rays = backproject(pts, intr, normalized=True)[0]
    field = smooth_feature_map(jax.random.fold_in(key, 2), (F, H, W, C))
    tgt_fg = append_spatial_gradient(field)
    ref = smooth_feature_map(jax.random.fold_in(key, 3),
                             (1, 1, N, C))[0, 0]
    basis = 0.1 * jax.random.normal(jax.random.fold_in(key, 4), (N, K))
    return dict(intr=intr, rays=rays, ref=ref, tgt_fg=tgt_fg,
                basis=basis, depth=jnp.full((N,), 3.0))


def run_size(n_dev, cfg):
    mesh = make_mesh(data=1, frame=n_dev,
                     devices=jax.devices()[:n_dev])
    F = F_LOCAL * n_dev
    p = make_problem(F)
    Rs = jnp.broadcast_to(jnp.eye(3), (F, 3, 3))
    ts = jnp.zeros((F, 3))
    W0 = jnp.zeros((K,))

    fn = jax.jit(lambda Rs, ts, W0: sharded_window_ba_step(
        mesh, p["ref"], p["tgt_fg"], p["rays"], p["depth"], p["basis"],
        Rs, ts, W0, p["intr"], 1e-3, cfg)[0][0, 0, 0])
    lowered = fn.lower(Rs, ts, W0)
    hlo = lowered.compile().as_text()
    collectives = re.findall(
        r"(all-reduce|all-gather|reduce-scatter|collective-permute"
        r"|all-to-all)", hlo) if n_dev > 1 else []
    _ = np.asarray(fn(Rs, ts, W0))  # warmup
    reps = 10
    t0 = time.perf_counter()
    out = None
    for _i in range(reps):
        out = fn(Rs, ts, W0)
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    return dict(devices=n_dev, frames=F, step_ms=round(dt * 1e3, 3),
                frames_per_s=round(F / dt, 1),
                collectives=len(collectives))


def run_multi_size(n_dev, cfg):
    """Collective count + rate for the MULTI-keyframe sharded step
    (parallel/multi_window_ba.py — basis-eliminating Schur, one fused
    psum; added for SCALING_r03 per VERDICT r3 item 4)."""
    from banet_tpu.ba.multi_window_ba import MultiWindowProblem
    from banet_tpu.parallel.multi_window_ba import \
        sharded_multi_window_ba_step

    mesh = make_mesh(data=1, frame=n_dev,
                     devices=jax.devices()[:n_dev])
    M = 2
    F = F_LOCAL * n_dev
    key = jax.random.PRNGKey(1)
    intr = Intrinsics(jnp.array([0.8 * W]), jnp.array([0.8 * W]),
                      jnp.array([W / 2.0]), jnp.array([H / 2.0]))
    pts = jnp.stack([
        jax.random.uniform(key, (M, N), minval=4.0, maxval=W - 4.0),
        jax.random.uniform(jax.random.fold_in(key, 1), (M, N),
                           minval=4.0, maxval=H - 4.0)], axis=-1)
    rays = backproject(pts, intr, normalized=False)
    field = smooth_feature_map(jax.random.fold_in(key, 2), (F, H, W, C))
    prob = MultiWindowProblem(
        ref_feats=smooth_feature_map(jax.random.fold_in(key, 3),
                                     (1, M, N, C))[0],
        rays=rays, init_depth=jnp.full((M, N), 3.0),
        basis=0.1 * jax.random.normal(jax.random.fold_in(key, 4),
                                      (M, N, K)),
        tgt_fg=append_spatial_gradient(field),
        obs_mask=jnp.ones((M, F)))
    Rs_f = jnp.broadcast_to(jnp.eye(3), (F, 3, 3))
    ts_f = jnp.zeros((F, 3))
    Rs_k = jnp.broadcast_to(jnp.eye(3), (M, 3, 3))
    ts_k = jnp.zeros((M, 3))
    Ws = jnp.zeros((M, K))

    def damping_fn(avg_r):
        return jnp.linalg.norm(avg_r, axis=-1) ** 2

    fn = jax.jit(lambda Rs_f, ts_f: sharded_multi_window_ba_step(
        mesh, prob, Rs_f, ts_f, Rs_k, ts_k, Ws, intr, 1e-3, cfg, 10.0,
        damping_fn)[0][0, 0, 0])
    hlo = fn.lower(Rs_f, ts_f).compile().as_text()
    collectives = re.findall(
        r"(all-reduce|all-gather|reduce-scatter|collective-permute"
        r"|all-to-all)", hlo) if n_dev > 1 else []
    _ = np.asarray(fn(Rs_f, ts_f))
    reps = 10
    t0 = time.perf_counter()
    out = None
    for _i in range(reps):
        out = fn(Rs_f, ts_f)
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    return dict(devices=n_dev, frames=F, keyframes=M,
                step_ms=round(dt * 1e3, 3),
                frames_per_s=round(F / dt, 1),
                collectives=len(collectives),
                collective_kinds=sorted(set(collectives)))


def main():
    cfg = SolverConfig()
    n = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8) if s <= n]
    results = [run_size(s, cfg) for s in sizes]
    base = results[0]["frames_per_s"]
    for r in results:
        r["weak_scaling_efficiency"] = round(
            r["frames_per_s"] / (base * r["devices"]), 3)
    multi = [run_multi_size(s, cfg) for s in sizes]
    mbase = multi[0]["frames_per_s"]
    for r in multi:
        r["weak_scaling_efficiency"] = round(
            r["frames_per_s"] / (mbase * r["devices"]), 3)
    print(json.dumps({"scaling": results,
                      "multi_keyframe_scaling": multi,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
