"""Per-component microbenchmarks with roofline ratios.

Produces the "speed-of-light kernels (profiled)" evidence BASELINE.md
asks for: each hot component is timed on the current device and
compared against its compute/bandwidth roofline.

Components (the hot loop of SURVEY.md §3.1/3.2):
  encoder       DRN-38 backbone + FPN on a 256x320 pair
  sampler       bilinear sample-at-points, 4096 pts x 128 ch
  normal_eq     (6+K) normal-equation build, 4096 pts x 128 ch
  gn_iteration  one full pose GN step (warp+sample+solve)
  upsample      fixed 2x bilinear upsampling

Timing uses the batch-slope method (see bench.py) so constant relay/
dispatch overhead cancels.  Run:  python benchmarks/microbench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_FLOPS = 197e12     # v5e bf16
PEAK_BYTES = 819e9      # v5e HBM


def slope_time(fn, make_args, b_small, b_big, repeats=4):
    """Per-unit time via the two-batch slope with host-fetch sync.

    ``fn`` must return something TINY (a scalar): the host fetch that
    forces completion travels through the device relay, so fetching a
    large output measures transfer bandwidth, not kernel time (use
    ``reduced`` to wrap a big-output op)."""

    def timed(b):
        argsets = [make_args(b, seed) for seed in range(repeats)]
        out = fn(*argsets[0])
        _ = np.asarray(jax.tree.leaves(out)[0])  # warmup + compile
        ts = []
        for a in argsets:
            t0 = time.perf_counter()
            out = fn(*a)
            _ = np.asarray(jax.tree.leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = timed(b_small), timed(b_big)
    return max((t2 - t1) / (b_big - b_small), 1e-9)


def reduced(fn):
    """Wrap an op so it returns a scalar checksum (keeps all compute
    live, makes the completion fetch O(1))."""

    def wrapped(*args):
        out = fn(*args)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(out))

    return wrapped


def hlo_cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    c = c[0] if isinstance(c, (list, tuple)) else (c or {})
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def report(name, t_unit, flops, bytes_acc, extra=None):
    sol = max(flops / PEAK_FLOPS, bytes_acc / PEAK_BYTES)
    rec = {
        "component": name,
        "time_ms": round(t_unit * 1e3, 4),
        "gflops": round(flops / 1e9, 3),
        "gbytes": round(bytes_acc / 1e9, 4),
        "sol_ms": round(sol * 1e3, 4),
        "fraction_of_sol": round(sol / t_unit, 4) if t_unit else 0.0,
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec))
    return rec


def bench_sampler():
    H, W, C, N = 128, 160, 384, 4096

    def make(b, seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        f = jax.random.normal(ks[0], (b, H, W, C))
        px = jax.random.uniform(ks[1], (b, N), minval=0.0, maxval=W - 1.0)
        py = jax.random.uniform(ks[2], (b, N), minval=0.0, maxval=H - 1.0)
        return f, px, py

    from banet_tpu.ops.resample import bilinear_sample

    fn = jax.jit(reduced(bilinear_sample))
    t = slope_time(fn, make, 2, 10)
    flops, bytes_acc = hlo_cost(bilinear_sample, *make(1, 0))
    return report("sampler_4096x384", t, flops, bytes_acc)


def bench_normal_eq():
    N, C, P = 4096, 128, 38

    def make(b, seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        J = jax.random.normal(ks[0], (b, N, 2, P))
        G = jax.random.normal(ks[1], (b, N, C, 2))
        r = jax.random.normal(ks[2], (b, N, C))
        return J, G, r

    from banet_tpu.ops.normal_eq import build_normal_equations

    fn = jax.jit(reduced(build_normal_equations))
    t = slope_time(fn, make, 2, 10)
    flops, bytes_acc = hlo_cost(build_normal_equations, *make(1, 0))
    return report("normal_eq_4096x128xP38", t, flops, bytes_acc)


def bench_gn_iteration():
    from banet_tpu.ba.camera_solver import pose_gn_step
    from banet_tpu.config import SolverConfig
    from banet_tpu.data.synthetic import make_two_view_problem
    from banet_tpu.ops.grad2d import append_spatial_gradient

    cfg = SolverConfig()

    def make(b, seed):
        prob = make_two_view_problem(jax.random.PRNGKey(seed), batch=b,
                                     height=128, width=160, channels=128,
                                     num_points=4096)
        tgt = append_spatial_gradient(prob["tgt_feats"])
        R0 = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
        t0 = jnp.zeros((b, 3))
        return (prob["ref_feats"], tgt, prob["rays"], prob["depth"], R0,
                t0, prob["intr"])

    damping = lambda a: jnp.full(a.shape[:-1], 1e-3)  # noqa: E731

    def step(ref, tgt, rays, depth, R, t, intr):
        return pose_gn_step(ref, tgt, rays, depth, R, t, intr, damping,
                            cfg)[0]

    fn = jax.jit(reduced(step))
    t = slope_time(fn, make, 2, 6)
    flops, bytes_acc = hlo_cost(step, *make(1, 0))
    return report("pose_gn_step_4096pts", t, flops, bytes_acc)


def bench_encoder():
    from banet_tpu.config import default_config
    from banet_tpu.models.banet import BANet

    cfg = default_config()
    model = BANet(cfg)
    img = jnp.zeros((1, 256, 320, 3))
    from banet_tpu.geometry.camera import Intrinsics

    intr = Intrinsics(jnp.array([288.0]), jnp.array([288.0]),
                      jnp.array([160.0]), jnp.array([128.0]))
    pts = jnp.full((1, 64, 2), 32.0)
    variables = model.init(jax.random.PRNGKey(0), img, img, intr, pts)

    def feats(img):
        return model.apply(variables, img, method=model.features)

    def make(b, seed):
        return (255.0 * jax.random.uniform(jax.random.PRNGKey(seed),
                                           (b, 256, 320, 3)),)

    fn = jax.jit(reduced(feats))
    t = slope_time(fn, make, 2, 6)
    flops, bytes_acc = hlo_cost(feats, *make(1, 0))
    return report("encoder_fpn_256x320", t, flops, bytes_acc)


def bench_upsample():
    from banet_tpu.ops.upsample import upsample2x_bilinear

    def make(b, seed):
        return (jax.random.normal(jax.random.PRNGKey(seed),
                                  (b, 128, 160, 128)),)

    fn = jax.jit(reduced(upsample2x_bilinear))
    t = slope_time(fn, make, 2, 10)
    flops, bytes_acc = hlo_cost(upsample2x_bilinear, *make(1, 0))
    return report("upsample2x_128ch", t, flops, bytes_acc)


def bench_sampler_block():
    H, W, C, N = 128, 160, 384, 4096

    def make(b, seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        f = jax.random.normal(ks[0], (b, H, W, C))
        px = jax.random.uniform(ks[1], (b, N), minval=0.0, maxval=W - 1.0)
        py = jax.random.uniform(ks[2], (b, N), minval=0.0, maxval=H - 1.0)
        return f, px, py

    from banet_tpu.ops.resample import bilinear_sample_block

    fn = jax.jit(reduced(bilinear_sample_block))
    t = slope_time(fn, make, 2, 10)
    flops, bytes_acc = hlo_cost(bilinear_sample_block, *make(1, 0))
    return report("sampler_block_4096x384", t, flops, bytes_acc)


def bench_gn_breakdown():
    """Sub-op timing of one GN iteration at the bench operating point
    (N=1024, 128ch, 128x160 level map): where do the ~0.15 ms go?"""
    from banet_tpu.ba.residuals import warp_residuals
    from banet_tpu.config import SolverConfig
    from banet_tpu.data.synthetic import make_two_view_problem
    from banet_tpu.geometry.jacobians import camera_jacobian
    from banet_tpu.geometry.se3 import se3_update
    from banet_tpu.models.damping import DampingNet
    from banet_tpu.ops.grad2d import append_spatial_gradient
    from banet_tpu.ops.normal_eq import build_normal_equations
    from banet_tpu.ops.solve import damped_solve

    N, C = 1024, 128
    cfg = SolverConfig()

    def make(b, seed):
        prob = make_two_view_problem(jax.random.PRNGKey(seed), batch=b,
                                     height=128, width=160, channels=C,
                                     num_points=N)
        tgt = append_spatial_gradient(prob["tgt_feats"])
        R0 = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
        t0 = jnp.zeros((b, 3))
        return (prob["ref_feats"], tgt, prob["rays"], prob["depth"], R0,
                t0, prob["intr"])

    dnet = DampingNet(C)
    dvars = dnet.init(jax.random.PRNGKey(0), jnp.zeros((1, C)))

    def warp_only(ref, tgt, rays, depth, R, t, intr):
        return warp_residuals(ref, tgt, rays, depth, R, t, intr)

    def warp_plus_ne(ref, tgt, rays, depth, R, t, intr):
        wr = warp_residuals(ref, tgt, rays, depth, R, t, intr)
        J = camera_jacobian(wr.x, wr.y, wr.z, intr.fx, intr.fy)
        return build_normal_equations(J, wr.G, wr.residual)

    def full_iter(ref, tgt, rays, depth, R, t, intr):
        wr = warp_residuals(ref, tgt, rays, depth, R, t, intr)
        avg_r = wr.avg_abs_residual(False)
        lam = dnet.apply(dvars, avg_r)
        J = camera_jacobian(wr.x, wr.y, wr.z, intr.fx, intr.fy)
        AtA, Atb = build_normal_equations(J, wr.G, wr.residual)
        delta = -damped_solve(AtA, Atb, lam, cfg.diag_floor)
        return se3_update(R, t, delta)

    def damping_only(ref, tgt, rays, depth, R, t, intr):
        return dnet.apply(dvars, jnp.mean(jnp.abs(ref), axis=1))

    for name, fn in [("warp_sample_1024", warp_only),
                     ("warp_ne_1024", warp_plus_ne),
                     ("damping_mlp", damping_only),
                     ("full_gn_iter_1024", full_iter)]:
        jfn = jax.jit(reduced(fn))
        t = slope_time(jfn, make, 4, 20)
        flops, bytes_acc = hlo_cost(fn, *make(1, 0))
        report(name, t, flops, bytes_acc)


def bench_iter_slope():
    """Per-iteration marginal cost at B=1 via the iteration-count slope.

    The batch-slope benches measure the marginal cost per BATCH element,
    which cancels exactly the per-kernel dispatch overhead that
    dominates the B=1 tracking latency (27 sequential GN iterations).
    Here each variant runs the iteration body k times inside ONE
    ``lax.fori_loop`` with a *traced* trip count (one compile per
    variant), serialised through the carry; the (T(k2)-T(k1))/(k2-k1)
    slope is the true per-iteration latency including intra-kernel
    sequencing.  Variants peel off one component at a time.
    """
    from banet_tpu.ba.residuals import warp_residuals
    from banet_tpu.config import SolverConfig
    from banet_tpu.data.synthetic import make_two_view_problem
    from banet_tpu.geometry.jacobians import camera_jacobian
    from banet_tpu.geometry.se3 import se3_update
    from banet_tpu.models.damping import DampingNet
    from banet_tpu.ops.grad2d import append_spatial_gradient
    from banet_tpu.ops.normal_eq import build_normal_equations
    from banet_tpu.ops.pallas_damping import damping_pallas
    from banet_tpu.ops.solve import (apply_lm_damping,
                                     cholesky_solve_unrolled, damped_solve)

    N, C, H, W = 1024, 128, 128, 160
    cfg = SolverConfig()
    dnet = DampingNet(C)
    dvars = dnet.init(jax.random.PRNGKey(0), jnp.zeros((1, C)))
    on_tpu = jax.devices()[0].platform != "cpu"

    from banet_tpu.ops.resample import make_footprint_map

    def make(seed, mode="gradmap"):
        prob = make_two_view_problem(jax.random.PRNGKey(seed), batch=1,
                                     height=H, width=W, channels=C,
                                     num_points=N)
        if mode == "gradmap":
            tgt = append_spatial_gradient(prob["tgt_feats"])
        else:
            tgt = make_footprint_map(prob["tgt_feats"])
            if mode == "fp_bf16":
                tgt = tgt.astype(jnp.bfloat16)
        return (prob["ref_feats"], tgt, prob["rays"], prob["depth"],
                jnp.broadcast_to(jnp.eye(3), (1, 3, 3)),
                jnp.zeros((1, 3)), prob["intr"])

    def solve_lu(AtA, Atb, lam):
        # Pre-Cholesky path: probe + LU (what round 1 shipped).
        A = apply_lm_damping(AtA, lam, cfg.diag_floor, True)
        b = Atb[..., None]
        probe = jnp.linalg.solve(jax.lax.stop_gradient(A),
                                 jax.lax.stop_gradient(b))
        ok = jnp.all(jnp.isfinite(probe), axis=(-2, -1), keepdims=True)
        A_safe = jnp.where(ok, A, jnp.eye(6))
        return jnp.where(ok, jnp.linalg.solve(A_safe, b),
                         jnp.zeros_like(b))[..., 0]

    def solve_chol(AtA, Atb, lam):
        A = apply_lm_damping(AtA, lam, cfg.diag_floor, True)
        return cholesky_solve_unrolled(A, Atb)

    def lam_mlp(avg_r):
        return dnet.apply(dvars, avg_r)

    def lam_pallas(avg_r):
        return damping_pallas(dvars["params"], avg_r,
                              interpret=not on_tpu)

    def variant(use_mlp, solver, reject, fp_hw=None):
        """Returns fn(k, *args) running k serial iterations."""

        def run(k, ref, tgt, rays, depth, R0, t0, intr):
            wr0 = warp_residuals(ref, tgt, rays, depth, R0, t0, intr,
                                 footprint=fp_hw)

            def body(_, carry):
                R, t, wr = carry
                avg_r = wr.avg_abs_residual(False)
                lam = (lam_mlp(avg_r) if use_mlp == "mlp" else
                       lam_pallas(avg_r) if use_mlp == "pallas" else
                       jnp.full((1,), 1e-3))
                J = camera_jacobian(wr.x, wr.y, wr.z, intr.fx, intr.fy)
                AtA, Atb = build_normal_equations(J, wr.G, wr.residual)
                if solver == "lu":
                    delta = -solve_lu(AtA, Atb, lam)
                elif solver == "chol":
                    delta = -solve_chol(AtA, Atb, lam)
                else:
                    delta = -1e-4 * Atb
                R2, t2 = se3_update(R, t, delta)
                wr2 = warp_residuals(ref, tgt, rays, depth, R2, t2, intr,
                                     footprint=fp_hw)
                if reject:
                    res_b = jnp.mean(wr.avg_abs_residual(False), axis=-1)
                    res_a = jnp.mean(wr2.avg_abs_residual(False), axis=-1)
                    take = res_a < res_b
                    R2 = jnp.where(take[:, None, None], R2, R)
                    t2 = jnp.where(take[:, None], t2, t)
                    wr2 = jax.tree.map(
                        lambda n, o: jnp.where(
                            take.reshape((1,) * n.ndim), n, o), wr2, wr)
                return (R2, t2, wr2)

            R, t, _ = jax.lax.fori_loop(0, k, body, (R0, t0, wr0))
            return jnp.sum(R) + jnp.sum(t)

        return run

    def warp_only(k, ref, tgt, rays, depth, R0, t0, intr):
        def body(_, carry):
            t, acc = carry
            wr = warp_residuals(ref, tgt, rays, depth, R0, t, intr)
            s = jnp.sum(wr.residual)
            return (t + 1e-12 * s, acc + s)

        _, acc = jax.lax.fori_loop(0, k, body, (t0, 0.0))
        return acc

    def mlp_only_factory(which):
        def mlp_only(k, ref, tgt, rays, depth, R0, t0, intr):
            avg0 = jnp.mean(jnp.abs(ref), axis=1)

            def body(_, a):
                lam = lam_mlp(a) if which == "mlp" else lam_pallas(a)
                return a + 1e-12 * lam[:, None]

            return jnp.sum(jax.lax.fori_loop(0, k, body, avg0))
        return mlp_only

    def solve_only_factory(which):
        def solve_only(k, ref, tgt, rays, depth, R0, t0, intr):
            A0 = jnp.eye(6)[None] * 4.0
            b0 = jnp.ones((1, 6))

            def body(_, carry):
                A, b = carry
                x = (solve_lu(A, b, jnp.full((1,), 1e-3)) if which == "lu"
                     else solve_chol(A, b, jnp.full((1,), 1e-3)))
                return (A, b + 1e-9 * x)

            _, b = jax.lax.fori_loop(0, k, body, (A0, b0))
            return jnp.sum(b)
        return solve_only

    variants = [
        ("iter_full_lu_mlp", variant("mlp", "lu", True), "gradmap"),
        ("iter_full_chol_mlp", variant("mlp", "chol", True), "gradmap"),
        ("iter_full_chol_pallasmlp", variant("pallas", "chol", True),
         "gradmap"),
        ("iter_chol_nomlp", variant("none", "chol", True), "gradmap"),
        ("iter_nosolve_nomlp", variant("none", "none", True), "gradmap"),
        ("iter_noreject_chol_mlp", variant("mlp", "chol", False),
         "gradmap"),
        ("iter_footprint_chol_mlp",
         variant("mlp", "chol", True, fp_hw=(H, W)), "fp"),
        ("iter_footprint_bf16",
         variant("mlp", "chol", True, fp_hw=(H, W)), "fp_bf16"),
        ("warp_sample_only", warp_only, "gradmap"),
        ("mlp_only_flax", mlp_only_factory("mlp"), "gradmap"),
        ("mlp_only_pallas", mlp_only_factory("pallas"), "gradmap"),
        ("solve_only_lu", solve_only_factory("lu"), "gradmap"),
        ("solve_only_chol", solve_only_factory("chol"), "gradmap"),
    ]
    # Wide k spread: the relay's ~25 ms round-trip jitters by ~1 ms, so
    # the iteration delta must be >> that to resolve ~0.1 ms slopes.
    only = os.environ.get("ITER_SLOPE_ONLY", "")
    if only:
        pats = only.split(",")
        variants = [v for v in variants
                    if any(p in v[0] for p in pats)]
    k1, k2 = 8, 264
    for name, fn, mode in variants:
        jfn = jax.jit(fn)

        def timed(k):
            # Unique inputs per call (the relay dedupes identical
            # queued executions); a tiny checksum fetch drains the
            # queue so arg construction stays outside the timed span.
            args = make(97, mode)
            _ = np.asarray(jfn(jnp.int32(k), *args))  # compile + warm
            ts = []
            for seed in range(1, 5):
                args = make(1000 * k + seed, mode)
                _ = np.asarray(jnp.sum(args[0]))
                t0 = time.perf_counter()
                out = jfn(jnp.int32(k), *args)
                _ = np.asarray(out)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_a, t_b = timed(k1), timed(k2)
        per_iter = max((t_b - t_a) / (k2 - k1), 1e-9)
        print(json.dumps({"component": name,
                          "per_iter_ms": round(per_iter * 1e3, 4),
                          "t_k4_ms": round(t_a * 1e3, 3),
                          "t_k28_ms": round(t_b * 1e3, 3)}))


def bench_frame_slope():
    """Production tracking-path components, timed by chaining k serial
    calls inside one fori_loop (B=1, the odometry operating point).

    Accounts for the full cached-keyframe frame: target pyramid
    (encoder+FPN), per-level sampler-stack builds, and the 4-level
    27-iteration pose solve — the parts iter_slope's synthetic single
    level does not cover.
    """
    from banet_tpu.config import default_config
    from banet_tpu.geometry.camera import Intrinsics
    from banet_tpu.models.banet import BANet

    H, W, N = 256, 320, 1024
    cfg = default_config()
    model = BANet(cfg)
    img0 = jnp.zeros((1, H, W, 3))
    intr_arr = jnp.array([[0.8 * W, 0.8 * W, W / 2.0, H / 2.0]],
                         jnp.float32)
    intr = Intrinsics.from_array(intr_arr)
    pts0 = jnp.stack(
        [jax.random.uniform(jax.random.PRNGKey(0), (1, N), minval=16.0,
                            maxval=W - 16.0),
         jax.random.uniform(jax.random.PRNGKey(1), (1, N), minval=16.0,
                            maxval=H - 16.0)], axis=-1)
    variables = model.init(jax.random.PRNGKey(2), img0, img0, intr, pts0)
    depths = jnp.full((1, N), 2.5)

    def feats_fn(img):
        return model.apply(variables, img, method=model.features)

    ref_sampled = model.apply(
        variables, feats_fn(img0), pts0,
        method=model.sample_ref_features)

    def pyramid_only(k, img):
        # Consume EVERY level: summing only f[0] lets XLA dead-code-
        # eliminate the finer levels' convs (measured 0.55 vs the true
        # 1.6 ms at 256x320 — round-2 hoisting/DCE postmortem,
        # artifacts/PROFILE_r02/README.md).
        def body(i, carry):
            img, acc = carry
            f = feats_fn(img + 1e-6 * acc)
            s = sum(jnp.sum(fl.astype(jnp.float32)) for fl in f)
            return (img, acc + s * 1e-12)
        _, acc = jax.lax.fori_loop(0, k, body, (img, jnp.float32(0)))
        return acc

    def stacks_only(k, img):
        def body(i, carry):
            img, acc = carry
            f = feats_fn(img + 1e-6 * acc)

            def stack(x):
                return model.apply(variables, x,
                                   method=model._target_stack)[0]
            s = sum(jnp.sum(stack(fl).astype(jnp.float32)) for fl in f)
            return (img, acc + s * 1e-12)
        _, acc = jax.lax.fori_loop(0, k, body, (img, jnp.float32(0)))
        return acc

    def track_cached(k, img):
        # Image threaded through the carry: a loop-invariant image lets
        # XLA hoist the whole target pyramid out of the chain and the
        # slope measures only the solve (see pyramid_only note).
        def body(i, carry):
            t0, im, acc = carry
            R, t, aux = model.apply(
                variables, ref_sampled, im, intr, pts0, depths, None,
                t0, method=model.pose_track_cached)
            s = jnp.sum(t)
            return (t * 1e-6, im + 1e-9 * s, acc + s)
        _, _, acc = jax.lax.fori_loop(
            0, k, body, (jnp.zeros((1, 3)), img, jnp.float32(0)))
        return acc

    variants = [("pyramid_only_B1", pyramid_only, 2, 18),
                ("pyramid_stacks_B1", stacks_only, 2, 18),
                ("track_cached_frame_B1", track_cached, 2, 18)]
    for name, fn, k1, k2 in variants:
        jfn = jax.jit(fn)

        def timed(k):
            img = 255.0 * jax.random.uniform(jax.random.PRNGKey(90),
                                             (1, H, W, 3))
            _ = np.asarray(jfn(jnp.int32(k), img))
            ts = []
            for seed in range(1, 4):
                img = 255.0 * jax.random.uniform(
                    jax.random.PRNGKey(1000 * k + seed), (1, H, W, 3))
                _ = np.asarray(jnp.sum(img))
                t0 = time.perf_counter()
                out = jfn(jnp.int32(k), img)
                _ = np.asarray(out)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_a, t_b = timed(k1), timed(k2)
        per = max((t_b - t_a) / (k2 - k1), 1e-9)
        print(json.dumps({"component": name,
                          "per_call_ms": round(per * 1e3, 4),
                          "t_k_small_ms": round(t_a * 1e3, 3),
                          "t_k_big_ms": round(t_b * 1e3, 3)}))


def bench_tail_multi():
    """Decision probe for the multi-iteration fused GN kernel (VERDICT
    r3 item 2): the slope of ``gn_tail_multi`` over its grid length is
    the marginal IN-KERNEL iteration cost — the hard floor any
    gather-included multi-iteration kernel would add to.  Compared
    against chaining the single-step kernel (per-LAUNCH cost) and the
    XLA scan iteration (iter_slope's iter_full_chol_pallasmlp,
    ~0.052 ms).  If the in-kernel marginal is not well below the XLA
    chain's ~0.026 ms solver portion, a multi-iteration kernel cannot
    win even with a free in-kernel gather -> refutation artifact."""
    from banet_tpu.models.damping import DampingNet
    from banet_tpu.ops.pallas_gn_tail import (gn_tail_multi,
                                              gn_tail_step,
                                              initial_state, pack_pose)

    on_tpu = jax.devices()[0].platform != "cpu"
    interp = not on_tpu
    N, C = 1024, 128
    rng = np.random.default_rng(0)

    def make(seed):
        r = np.random.default_rng(seed)
        taps = tuple(jnp.asarray(r.normal(size=(N, C)), jnp.float32)
                     for _ in range(4))
        ref = jnp.asarray(r.normal(size=(N, C)), jnp.float32)
        pw = (jnp.zeros((N, 8), jnp.float32)
              .at[:, 0].set(jnp.asarray(r.uniform(0, 1, N),
                                        jnp.float32))
              .at[:, 1].set(jnp.asarray(r.uniform(0, 1, N),
                                        jnp.float32))
              .at[:, 2].set(1.0))
        juv = jnp.asarray(0.1 * r.normal(size=(N, 16)), jnp.float32)
        juv = juv.at[:, 6:8].set(0).at[:, 14:16].set(0)
        return taps, ref, pw, juv

    dnet = DampingNet(C)
    params = dnet.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, C)))["params"]
    pose0 = pack_pose(jnp.eye(3), jnp.zeros(3))
    st0 = initial_state()

    def multi(K):
        @jax.jit
        def fn(taps, ref, pw, juv):
            p, s = gn_tail_multi(taps, ref, pw, juv, pose0, st0,
                                 params, K, reject=False,
                                 early_term=False, interpret=interp)
            return jnp.sum(p) + jnp.sum(s)
        return fn

    def chain(K):
        @jax.jit
        def fn(taps, ref, pw, juv):
            def body(_, carry):
                p, s = carry
                return gn_tail_step(taps, ref, pw, juv, p, s, params,
                                    reject=False, early_term=False,
                                    interpret=interp)
            p, s = jax.lax.fori_loop(0, K, body, (pose0, st0))
            return jnp.sum(p) + jnp.sum(s)
        return fn

    k1, k2 = (8, 264) if on_tpu else (2, 6)
    for name, maker in (("tail_multi_grid", multi),
                        ("tail_single_chain", chain)):
        def timed(K):
            fn = maker(K)
            args = make(97)
            _ = np.asarray(fn(*args))
            ts = []
            for seed in range(1, 5):
                args = make(1000 * K + seed)
                _ = np.asarray(jnp.sum(args[1]))
                t0 = time.perf_counter()
                out = fn(*args)
                _ = np.asarray(out)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_a, t_b = timed(k1), timed(k2)
        per = max((t_b - t_a) / (k2 - k1), 1e-9)
        print(json.dumps({"component": name,
                          "per_iter_ms": round(per * 1e3, 4),
                          "t_k_small_ms": round(t_a * 1e3, 3),
                          "t_k_big_ms": round(t_b * 1e3, 3)}))


def bench_feature_ab():
    """A/B the round-4 feature-path layout knobs at the shipped
    inference config (B=1, 256x320): conv pad mode (symmetric vs the
    border-corrected symmetric_fast vs zero), folded pyramid
    aggregation, and the B=2 cold-pair batched pass.  All candidates
    are exact or near-exact function-preserving layouts (parity tests
    in tests/test_fast_sym_conv.py / test_pyramid_fold.py); winners get
    flipped in config.inference_config."""
    import dataclasses

    from banet_tpu.config import default_config, inference_config
    from banet_tpu.geometry.camera import Intrinsics
    from banet_tpu.models.banet import BANet

    H, W = 256, 320
    base = inference_config(default_config(), image_size=(H, W))
    img0 = jnp.zeros((1, H, W, 3))
    intr = Intrinsics.from_array(
        jnp.array([[0.8 * W, 0.8 * W, W / 2.0, H / 2.0]], jnp.float32))
    pts0 = jnp.full((1, 64, 2), 32.0)
    variables = None

    def config_variant(**model_over):
        return dataclasses.replace(
            base, model=dataclasses.replace(base.model, **model_over))

    cases = [
        ("feats_symmetric", config_variant(), 1),
        ("feats_symmetric_fast",
         config_variant(conv_pad_mode="symmetric_fast"), 1),
        ("feats_zero", config_variant(conv_pad_mode="zero"), 1),
        ("feats_symfast_foldagg",
         config_variant(conv_pad_mode="symmetric_fast",
                        pyramid_fold_agg=True), 1),
        ("feats_foldagg", config_variant(pyramid_fold_agg=True), 1),
        # Cold pair: two images per call (one B=2 batched pass via
        # pose_track's pair path vs the per-frame B=1 number above).
        ("feats_pair_B2", config_variant(), 2),
    ]
    for name, cfg, B in cases:
        model = BANet(cfg)
        if variables is None:
            variables = model.init(jax.random.PRNGKey(2), img0, img0,
                                   intr, pts0)

        def feats_chain(k, img):
            def body(i, carry):
                im, acc = carry
                f = model.apply(variables, im + 1e-6 * acc,
                                method=model.features)
                s = sum(jnp.sum(fl.astype(jnp.float32)) for fl in f)
                return (im, acc + s * 1e-12)
            _, acc = jax.lax.fori_loop(0, k, body,
                                       (img, jnp.float32(0)))
            return acc

        jfn = jax.jit(feats_chain)

        def timed(k):
            img = 255.0 * jax.random.uniform(jax.random.PRNGKey(90),
                                             (B, H, W, 3))
            _ = np.asarray(jfn(jnp.int32(k), img))
            ts = []
            for seed in range(1, 4):
                img = 255.0 * jax.random.uniform(
                    jax.random.PRNGKey(1000 * k + seed), (B, H, W, 3))
                _ = np.asarray(jnp.sum(img))
                t0 = time.perf_counter()
                out = jfn(jnp.int32(k), img)
                _ = np.asarray(out)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        k1, k2 = 2, 18
        t_a, t_b = timed(k1), timed(k2)
        per = max((t_b - t_a) / (k2 - k1), 1e-9)
        print(json.dumps({
            "component": name, "batch": B,
            "per_pass_ms": round(per * 1e3, 4),
            "per_image_ms": round(per * 1e3 / B, 4)}))


def bench_serving_sweep():
    """Batched-serving cost decomposition (VERDICT r4 item 7): where
    does the ~2 ms/frame batch-marginal go at the serving batch sizes?
    Per-IMAGE feature-pyramid cost and per-FRAME solve cost (target
    pyramid precomputed via pose_track_cached's feats_tgt arg), each
    as a batch slope at B in {1, 4, 8, 12} on the shipped inference
    config.  The serial B=1 frame is latency-bound (PROFILE_r03);
    batching should collapse both components toward their roofline —
    if one doesn't, that's the serving optimization target."""
    import dataclasses

    from banet_tpu.config import default_config, inference_config
    from banet_tpu.geometry.camera import Intrinsics
    from banet_tpu.models.banet import BANet

    H, W, N = 256, 320, 1024
    cfg = inference_config(default_config(), image_size=(H, W))
    model = BANet(cfg)
    img0 = jnp.zeros((1, H, W, 3))
    intr0 = Intrinsics.from_array(
        jnp.array([[0.9 * W, 0.9 * W, W / 2.0, H / 2.0]], jnp.float32))
    pts0 = jnp.full((1, 64, 2), 32.0)
    variables = model.init(jax.random.PRNGKey(0), img0, img0, intr0,
                           pts0)

    def inputs(B, seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 5)
        img = 255.0 * jax.random.uniform(ks[0], (B, H, W, 3))
        k = jnp.tile(jnp.asarray([[W * 0.9, W * 0.9, W / 2, H / 2]],
                                 jnp.float32), (B, 1))
        pts = jnp.stack([
            jax.random.uniform(ks[1], (B, N), minval=8.0,
                               maxval=W - 8.0),
            jax.random.uniform(ks[2], (B, N), minval=8.0,
                               maxval=H - 8.0)], axis=-1)
        d = jax.random.uniform(ks[3], (B, N), minval=1.0, maxval=4.0)
        return img, k, pts, d

    @jax.jit
    def feats_chain(reps, img):
        def body(_, carry):
            im, acc = carry
            f = model.apply(variables, im, method=model.features)
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in f)
            return im + 1e-9 * s, acc + s
        _, acc = jax.lax.fori_loop(0, reps, body,
                                   (img, jnp.float32(0)))
        return acc

    @jax.jit
    def solve_chain(reps, ref_sampled, feats_tgt, k, pts, d):
        intr = Intrinsics.from_array(k)
        B = pts.shape[0]

        def body(_, carry):
            t0, acc = carry
            R, t, aux = model.apply(
                variables, ref_sampled, jnp.zeros((B, H, W, 3)), intr,
                pts, d, None, t0 * 1e-6, feats_tgt=feats_tgt,
                method=model.pose_track_cached)
            s = jnp.sum(t) + jnp.sum(R)
            return t, acc + s
        _, acc = jax.lax.fori_loop(
            0, reps, body, (jnp.zeros((B, 3)), jnp.float32(0)))
        return acc

    @jax.jit
    def prep(img, pts):
        feats = model.apply(variables, img, method=model.features)
        refs = model.apply(variables, feats, pts,
                           method=model.sample_ref_features)
        return refs, feats

    k1, k2 = 2, 10
    for B in (1, 4, 8, 12):
        img, k, pts, d = inputs(B, 11 * B)
        refs, feats = prep(img, pts)

        def slope(fn, *args):
            _ = np.asarray(fn(jnp.int32(k1), *args))
            ts = []
            for kk in (k1, k2):
                best = np.inf
                for r in range(3):
                    t0 = time.perf_counter()
                    out = fn(jnp.int32(kk), *args)
                    _ = np.asarray(out)
                    best = min(best, time.perf_counter() - t0)
                ts.append(best)
            return max((ts[1] - ts[0]) / (k2 - k1), 1e-9)

        t_feat = slope(feats_chain, img)
        t_solve = slope(solve_chain, refs, feats, k, pts, d)
        print(json.dumps({
            "component": "serving_sweep", "batch": B,
            "feats_ms_per_image": round(t_feat * 1e3 / B, 4),
            "solve_ms_per_frame": round(t_solve * 1e3 / B, 4),
            "feats_ms_per_pass": round(t_feat * 1e3, 4),
            "solve_ms_per_pass": round(t_solve * 1e3, 4)}))


BENCHES = {
    "sampler": bench_sampler,
    "serving_sweep": bench_serving_sweep,
    "feature_ab": bench_feature_ab,
    "tail_multi": bench_tail_multi,
    "frame_slope": bench_frame_slope,
    "iter_slope": bench_iter_slope,
    "gn_breakdown": bench_gn_breakdown,
    "sampler_block": bench_sampler_block,
    "normal_eq": bench_normal_eq,
    "gn_iteration": bench_gn_iteration,
    "encoder": bench_encoder,
    "upsample": bench_upsample,
}


def main(names=None):
    import sys

    names = names or sys.argv[1:] or list(BENCHES)
    for n in names:
        BENCHES[n]()


if __name__ == "__main__":
    main()
