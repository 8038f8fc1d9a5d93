"""Per-component tracking-path profile -> artifacts/PROFILE_r02/.

Closes the round-1 verdict's "profiling partial" finding two ways:

1. MEASURED per-component attribution on the current backend
   (``--components``): the serial-frame slope method from bench.py /
   benchmarks/microbench.py (chained calls inside one fori_loop,
   carry-perturbed so nothing is loop-invariant — see the round-2
   hoisting postmortem in artifacts/PROFILE_r02/README.md), applied to
   the production pieces: target pyramid (encoder+FPN), full cached
   tracked frame (fixed iters and early-exit), and the GN solve
   implied by their difference.  Each component also gets its
   compiled-HLO FLOP/byte counts and roofline SOL
   (utils/profiling.cost_summary), so time shares and efficiency are
   both recorded.

2. An ACTUAL ``jax.profiler`` trace (``--trace``): TensorBoard-loadable
   xplane under <out>/trace/.  The TPU relay hangs the profiler
   (CLAUDE.md), so traces are captured on the CPU backend
   (JAX_PLATFORMS=cpu) — op-level time shares there are not TPU truth
   (that is what the slope numbers are for) but the artifact proves the
   tooling end-to-end and gives an op-name-level decomposition of the
   same compiled graph structure.

The reference has no profiling at all (SURVEY.md §5); this harness is
the "speed-of-light kernels (profiled)" evidence path.

Usage:
  python scripts/profile_report.py --components \
      --out artifacts/PROFILE_r02/tpu_components.json       # on TPU
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/profile_report.py --trace --image-size 128 160 \
      --out artifacts/PROFILE_r02/cpu_trace.json            # on CPU
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(H, W, N):
    from banet_tpu.config import default_config
    from banet_tpu.data.synthetic import make_plane_scene_pair
    from banet_tpu.geometry.camera import Intrinsics
    from banet_tpu.models.banet import BANet

    cfg = default_config()
    model = BANet(cfg)
    model_exit = BANet(dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver,
                                        dynamic_early_exit=True)))

    def inputs(seed):
        pair = make_plane_scene_pair(jax.random.PRNGKey(seed), batch=1,
                                     height=H, width=W,
                                     rot_magnitude=0.01,
                                     trans_magnitude=0.02)
        k = jnp.asarray([[W * 0.9, W * 0.9, W / 2, H / 2]], jnp.float32)
        kp = jax.random.fold_in(jax.random.PRNGKey(seed), 5)
        pts = jnp.stack([
            jax.random.uniform(kp, (1, N), minval=8.0, maxval=W - 8.0),
            jax.random.uniform(jax.random.fold_in(kp, 1), (1, N),
                               minval=8.0, maxval=H - 8.0)], axis=-1)
        d = jax.vmap(lambda dm, p: dm[
            jnp.clip(p[:, 1].astype(jnp.int32), 0, H - 1),
            jnp.clip(p[:, 0].astype(jnp.int32), 0, W - 1)])(
                pair["depth"], pts)
        return pair["image1"], pair["image2"], k, pts, d

    variables = None
    i1, i2, kk, pts, d = inputs(800)
    variables = model.init(jax.random.PRNGKey(0), i1, i2,
                           Intrinsics.from_array(kk), pts)
    return model, model_exit, variables, inputs


def summarize_trace(logdir, top=25):
    """Aggregate the chrome-trace device ops into a top-N table
    (XLA op name -> total us, count).  Host-side bookkeeping events
    (python frames, ThunkExecutor wrappers, pjit spans) are dropped so
    the table is the actual compiled-op decomposition."""
    import collections
    import glob
    import gzip

    paths = glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return []
    data = json.load(gzip.open(sorted(paths)[-1]))
    skip = ("$", "ThunkExecutor", "PjitFunction", "block_until_ready")
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in data.get("traceEvents", []):
        name = e.get("name", "")
        if (e.get("ph") != "X" or "dur" not in e
                or any(s in name for s in skip)):
            continue
        agg[name] += e["dur"]
        cnt[name] += 1
    return [{"op": n, "total_us": round(v, 1), "count": cnt[n]}
            for n, v in agg.most_common(top)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--components", action="store_true")
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--image-size", type=int, nargs=2,
                    default=(256, 320))
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--k-small", type=int, default=2)
    ap.add_argument("--k-big", type=int, default=18)
    ap.add_argument("--out",
                    default="artifacts/PROFILE_r02/components.json")
    args = ap.parse_args()

    H, W = args.image_size
    N = args.num_points
    from banet_tpu.geometry.camera import Intrinsics
    from banet_tpu.utils.profiling import CHIP_SPECS, cost_summary, trace

    model, model_exit, variables, inputs = build(H, W, N)
    platform = jax.devices()[0].platform
    chip = "tpu_v5e" if platform != "cpu" else "cpu"

    @jax.jit
    def keyframe_feats(variables, img, pts):
        feats = model.apply(variables, img, method=model.features)
        return model.apply(variables, feats, pts,
                           method=model.sample_ref_features)

    def chain_track(m):
        """Serial tracked frames; image perturbed through the carry so
        the target pyramid cannot be hoisted out of the loop."""
        @jax.jit
        def chain(variables, reps, ref_sampled, img2, k, pts, depths):
            intr = Intrinsics.from_array(k)

            def body(_, carry):
                t0, img, acc = carry
                R, t, _aux = m.apply(
                    variables, ref_sampled, img, intr, pts, depths,
                    None, t0 * 1e-6, method=m.pose_track_cached)
                s = jnp.sum(t) + jnp.sum(R)
                return (t, img + 1e-9 * s, acc + s)

            _, _, acc = jax.lax.fori_loop(
                0, reps, body,
                (jnp.zeros((1, 3)), img2, jnp.float32(0.0)))
            return acc
        return chain

    @jax.jit
    def chain_pyramid(variables, reps, ref_sampled, img2, k, pts,
                      depths):
        def body(_, carry):
            img, acc = carry
            f = model.apply(variables, img, method=model.features)
            # Consume EVERY level: summing only f[0] lets XLA DCE the
            # finer levels' convs (round-2 hoisting/DCE postmortem).
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in f)
            return (img + 1e-9 * s, acc + s)

        _, acc = jax.lax.fori_loop(0, reps, body,
                                   (img2, jnp.float32(0.0)))
        return acc

    @jax.jit
    def single_track(variables, ref_sampled, img2, k, pts, depths):
        intr = Intrinsics.from_array(k)
        R, t, aux = model.apply(variables, ref_sampled, img2, intr, pts,
                                depths, None, jnp.zeros((1, 3)),
                                method=model.pose_track_cached)
        return R, t, aux.keep_ratio

    def timed(chain, reps):
        i1, i2, kk, pts, d = inputs(800)
        refs = keyframe_feats(variables, i1, pts)
        _ = np.asarray(chain(variables, jnp.int32(reps), refs, i2, kk,
                             pts, d))
        times = []
        for r in range(4):
            i1, i2, kk, pts, d = inputs(810 + r)
            refs = keyframe_feats(variables, i1, pts)
            _ = np.asarray(jnp.sum(refs[0]))
            t0 = time.perf_counter()
            out = chain(variables, jnp.int32(reps), refs, i2, kk, pts,
                        d)
            _ = np.asarray(out)
            times.append(time.perf_counter() - t0)
        return min(times)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    report = {"platform": platform, "image": [H, W], "points": N,
              "method": "serial-chain slope (k_big-k_small), image "
                        "carry-perturbed (hoist-proof)"}

    if args.components:
        comps = {}
        ks, kb = args.k_small, args.k_big
        for name, ch in [
                ("pyramid", chain_pyramid),
                ("frame_fixed_iters", chain_track(model)),
                ("frame_early_exit", chain_track(model_exit))]:
            t = (timed(ch, kb) - timed(ch, ks)) / (kb - ks)
            comps[name] = {"per_call_ms": round(t * 1e3, 4)}
        comps["gn_solve_27_iters"] = {"per_call_ms": round(
            comps["frame_fixed_iters"]["per_call_ms"]
            - comps["pyramid"]["per_call_ms"], 4),
            "note": "frame_fixed_iters - pyramid"}

        s0 = inputs(800)
        refs = keyframe_feats(variables, s0[0], s0[3])
        cs = cost_summary(single_track, variables, refs, s0[1], s0[2],
                          s0[3], s0[4], chip=chip)
        comps["frame_hlo"] = {
            "gflops": round(cs["flops"] / 1e9, 3),
            "gbytes": round(cs["bytes_accessed"] / 1e9, 3),
            "sol_ms": round(cs["sol_s"] * 1e3, 4),
            "compute_bound": bool(cs["compute_bound"]),
            "chip": chip,
            "note": "backend cost analysis; on TPU the FLOPs are "
                    "MXU-lane-padded (layout overhead, not workload). "
                    "The honest algorithmic roofline is the one "
                    "bench.py reports (CPU-backend FLOP count + "
                    "measured executed iterations).",
        }
        if platform != "cpu":
            try:
                from bench import algorithmic_cost
                gf, mb = algorithmic_cost(
                    single_track, variables, refs, s0[1], s0[2], s0[3],
                    s0[4])
                comps["frame_algorithmic"] = {
                    "gflops": round(gf, 3), "mbytes": round(mb, 1)}
            except Exception as e:
                comps["frame_algorithmic"] = {
                    "error": f"{type(e).__name__}: {e}"}
        meas = comps["frame_fixed_iters"]["per_call_ms"]
        comps["fraction_of_sol_fixed_iters"] = round(
            cs["sol_s"] * 1e3 / meas, 4) if meas else None
        report["components"] = comps

    if args.trace:
        logdir = os.path.join(os.path.dirname(args.out), "trace")
        s0 = inputs(800)
        refs = keyframe_feats(variables, s0[0], s0[3])
        _ = jax.block_until_ready(single_track(variables, refs, s0[1],
                                               s0[2], s0[3], s0[4]))
        with trace(logdir):
            _ = jax.block_until_ready(
                single_track(variables, refs, s0[1], s0[2], s0[3],
                             s0[4]))
        files = []
        for root, _dirs, names in os.walk(logdir):
            files += [os.path.relpath(os.path.join(root, n), logdir)
                      for n in names]
        report["trace"] = {"logdir": logdir, "files": sorted(files),
                           "top_ops": summarize_trace(logdir)}

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report.get("components", report.get("trace", {})),
                     indent=1))


if __name__ == "__main__":
    main()
