"""Benchmark: flagship two-view tracking throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "two_view_track_fps", "value": N, "unit": "frames/s",
   "vs_baseline": R, ...}

The reference never measured throughput (SURVEY.md §6: "frames-per-
second: not measured anywhere"), so there is no reference number to
beat; BASELINE.md's north star is "speed-of-light kernels".
``vs_baseline`` therefore reports the fraction of single-chip
speed-of-light achieved, computed from the compiled HLO's own cost
analysis (FLOPs + bytes accessed) against the chip's peak specs — a
roofline ratio, not a guess.

Workload = the reference tracking operating point (BASELINE.md):
256x320 pair, N=1024 points, 4 pyramid levels, GN iters (2, 5, 8, 12),
full pipeline per tracked frame: both feature pyramids + coarse-to-fine
damped GN with step rejection.  (Odometry amortizes the keyframe's
pyramid, so per-frame cost in a sequence is lower; we bench the
conservative two-pyramid variant.)
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# TPU v5e (1 chip): bf16 peak ~197 TFLOP/s, HBM BW ~819 GB/s.
PEAK_FLOPS = 197e12
PEAK_BYTES_PER_S = 819e9

H, W, N, B = 256, 320, 1024, 1


def main():
    from banet_tpu.config import default_config
    from banet_tpu.geometry.camera import Intrinsics
    from banet_tpu.models.banet import BANet

    cfg = default_config()
    model = BANet(cfg)
    rng = jax.random.PRNGKey(0)
    img1 = 255.0 * jax.random.uniform(rng, (B, H, W, 3))
    img2 = 255.0 * jax.random.uniform(jax.random.fold_in(rng, 1),
                                      (B, H, W, 3))
    k = jnp.tile(jnp.asarray([[W * 0.9, W * 0.9, W / 2, H / 2]],
                             jnp.float32), (B, 1))
    pts = jnp.stack([
        jax.random.uniform(rng, (B, N), minval=8.0, maxval=W - 8.0),
        jax.random.uniform(jax.random.fold_in(rng, 2), (B, N),
                           minval=8.0, maxval=H - 8.0)], axis=-1)
    depths = jax.random.uniform(jax.random.fold_in(rng, 3), (B, N),
                                minval=1.0, maxval=4.0)
    intr = Intrinsics.from_array(k)
    variables = model.init(rng, img1, img2, intr, pts)

    @jax.jit
    def track(variables, img1, img2, k, pts, depths):
        intr = Intrinsics.from_array(k)
        R, t, aux = model.apply(variables, img1, img2, intr, pts, depths,
                                method=model.pose_track)
        return R, t, aux.keep_ratio

    # Compile + cost analysis.
    lowered = track.lower(variables, img1, img2, k, pts, depths)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else (cost or {})
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))

    # Warmup then timed runs.
    out = track(variables, img1, img2, k, pts, depths)
    jax.block_until_ready(out)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = track(variables, img1, img2, k, pts, depths)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    fps = B / dt

    # Roofline: time lower bound from whichever resource binds.
    sol_time = max(flops / PEAK_FLOPS, bytes_acc / PEAK_BYTES_PER_S)
    vs_baseline = (sol_time / dt) if sol_time > 0 else 0.0

    print(json.dumps({
        "metric": "two_view_track_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs_baseline, 4),
        "detail": {
            "image": [H, W], "points": N,
            "step_ms": round(dt * 1e3, 3),
            "hlo_gflops": round(flops / 1e9, 2),
            "hlo_gbytes": round(bytes_acc / 1e9, 3),
            "sol_ms": round(sol_time * 1e3, 3),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
