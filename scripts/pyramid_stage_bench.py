"""Per-stage pyramid breakdown (slope method, k-chained, hoist/DCE-proof).

Measures, at the tracking operating point, the per-call cost of:
  - the full DRN encoder (all layers consumed),
  - the full feature path (encoder + FPN, every level consumed),
  - the zero-pad ConvBN variant (quantifies the symmetric-pad tax —
    reference-parity symmetric padding is an explicit concat XLA can't
    fold into the conv; see models/drn.ConvBN.pad_mode),
  - bf16 solver-feature maps (halves the fine-level map bytes),
  - the two fixed-bilinear upsampler formulations (separable
    interleave vs the old depthwise+input-dilated conv).

Every chain carry-perturbs its input and consumes every output
(artifacts/PROFILE_r02/README.md postmortem: loop-invariant inputs get
hoisted, unconsumed outputs get DCE'd, and the "measurement" silently
drops the work it claims to time).

Usage (TPU): python scripts/pyramid_stage_bench.py
CPU smoke:   env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
               python scripts/pyramid_stage_bench.py \
               --image-size 64 96 --k-small 1 --k-big 3
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, nargs=2, default=(256, 320))
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--k-small", type=int, default=2)
    ap.add_argument("--k-big", type=int, default=18)
    ap.add_argument("--batch", type=int, default=1,
                    help="batch size (batch-efficiency table)")
    ap.add_argument("--per-stage", action="store_true",
                    help="per-encoder-stage rows via DCE prefixes: a "
                         "chain consuming only layer_k's output lets "
                         "XLA dead-code-eliminate every later stage, "
                         "so prefix differences attribute time per"
                         "stage without touching the model")
    ap.add_argument("--pad-mode", default=None,
                    choices=["symmetric", "symmetric_fast", "zero"])
    ap.add_argument("--fold-agg", action="store_true",
                    help="folded pyramid aggregation "
                         "(ModelConfig.pyramid_fold_agg)")
    ap.add_argument("--feature-dtype", default=None,
                    choices=["float32", "bfloat16"])
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth stem for the BASE config")
    ap.add_argument("--out", default=None,
                    help="optional JSON output path")
    args = ap.parse_args()
    H, W = args.image_size
    N = args.num_points

    from banet_tpu.config import default_config
    from banet_tpu.geometry.camera import Intrinsics
    from banet_tpu.models.banet import BANet
    from banet_tpu.ops.upsample import (upsample2x_bilinear,
                                        upsample2x_bilinear_conv)

    cfg = default_config()
    base_overrides = {}
    if args.pad_mode:
        base_overrides["conv_pad_mode"] = args.pad_mode
    if args.feature_dtype:
        base_overrides["solver_feature_dtype"] = args.feature_dtype
    if args.s2d:
        base_overrides["stem_s2d"] = True
    if args.fold_agg:
        base_overrides["pyramid_fold_agg"] = True
    if base_overrides:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **base_overrides))
    B = args.batch
    model = BANet(cfg)
    img0 = jnp.zeros((B, H, W, 3))
    intr = Intrinsics.from_array(
        jnp.tile(jnp.array([[0.8 * W, 0.8 * W, W / 2, H / 2]],
                           jnp.float32), (B, 1)))
    pts0 = jnp.stack(
        [jax.random.uniform(jax.random.PRNGKey(0), (B, N), minval=16.0,
                            maxval=W - 16.0),
         jax.random.uniform(jax.random.PRNGKey(1), (B, N), minval=16.0,
                            maxval=H - 16.0)], axis=-1)
    variables = model.init(jax.random.PRNGKey(2), img0, img0, intr, pts0)

    def enc_fn(img):
        return model.apply(variables, img,
                           method=lambda m, im: m.encoder(im, False))

    def feats_fn(img):
        return model.apply(variables, img, method=model.features)

    # Config variants share the param tree (pad mode / output dtype do
    # not change parameter shapes).
    cfg_zp = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, conv_pad_mode="zero"))
    model_zp = BANet(cfg_zp)

    def feats_zero_pad(img):
        return model_zp.apply(variables, img, method=model_zp.features)

    cfg_bf = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       solver_feature_dtype="bfloat16"))
    model_bf = BANet(cfg_bf)

    def feats_bf16(img):
        return model_bf.apply(variables, img, method=model_bf.features)

    cfg_s2d = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, stem_s2d=True))
    model_s2d = BANet(cfg_s2d)

    def feats_s2d(img):
        return model_s2d.apply(variables, img, method=model_s2d.features)

    cfg_all = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, stem_s2d=True, conv_pad_mode="zero",
            solver_feature_dtype="bfloat16"))
    model_all = BANet(cfg_all)

    def feats_all_knobs(img):
        return model_all.apply(variables, img, method=model_all.features)

    def chain_sumall(fn):
        def run(k, img):
            def body(i, carry):
                img, acc = carry
                out = fn(img + 1e-9 * acc)
                if not isinstance(out, (list, tuple)):
                    out = [out]
                s = sum(jnp.sum(o.astype(jnp.float32)) for o in out)
                return (img, acc + s * 1e-12)
            _, acc = jax.lax.fori_loop(0, k, body, (img, jnp.float32(0)))
            return acc
        return jax.jit(run)

    # Upsample-only: the FPN's upsamples chained on representative
    # shapes (seed C=256 at 1/16; then 128 at finer levels).
    shapes = [(B, H // 16, W // 16, 256), (B, H // 8, W // 8, 128),
              (B, H // 4, W // 4, 128), (B, H // 2, W // 2, 128)]
    ups_inputs = [jnp.ones(s, jnp.bfloat16) for s in shapes]

    def make_ups(fn):
        def ups_all(k, img):
            def body(i, carry):
                acc = carry
                s = jnp.float32(0)
                for x in ups_inputs:
                    y = fn(x + acc.astype(x.dtype) * 1e-12)
                    s = s + jnp.sum(y.astype(jnp.float32))
                return acc + s * 1e-12
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return jax.jit(ups_all)

    def timed(jfn, reps, img):
        _ = np.asarray(jfn(jnp.int32(reps), img))
        ts = []
        for r in range(4):
            im = img + r * 1e-3
            _ = np.asarray(jnp.sum(im))
            t0 = time.perf_counter()
            _ = np.asarray(jfn(jnp.int32(reps), im))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    img = jax.random.uniform(jax.random.PRNGKey(9), (B, H, W, 3)) * 255.0
    ks, kb = args.k_small, args.k_big
    rows = []

    if args.per_stage:
        # DCE-prefix attribution at the BASE config: consume only
        # out[i]; the encoder is sequential, so XLA drops every later
        # stage and the chain times exactly the prefix through layer_k.
        def enc_prefix(i):
            def fn(im):
                return enc_fn(im)[i]
            return fn

        def dla_fn(im):
            return model.apply(variables, im, method=model.depth_basis)

        # enc_fn returns [layer6, layer5, layer4, layer3, layer2,
        # layer1] (coarse -> fine).
        prefix_names = [("prefix_layer1", 5), ("prefix_layer2", 4),
                        ("prefix_layer3", 3), ("prefix_layer4", 2),
                        ("prefix_layer5", 1), ("prefix_layer6", 0)]
        cases_fns = [(nm, enc_prefix(i)) for nm, i in prefix_names]
        cases_fns += [("encoder_all_layers", enc_fn),
                      ("features_full", feats_fn),
                      ("depth_basis_dla", dla_fn)]
        cases = [(nm, chain_sumall(fn)) for nm, fn in cases_fns]
    else:
        cases = [
            ("encoder_all_layers", chain_sumall(enc_fn)),
            ("features_full", chain_sumall(feats_fn)),
            ("features_zero_pad", chain_sumall(feats_zero_pad)),
            ("features_bf16_maps", chain_sumall(feats_bf16)),
            ("features_s2d_stem", chain_sumall(feats_s2d)),
            ("features_s2d_zero_bf16", chain_sumall(feats_all_knobs)),
            ("upsamples_interleave", make_ups(upsample2x_bilinear)),
            ("upsamples_conv_old", make_ups(upsample2x_bilinear_conv))]

    def algo_gflops(fn):
        """Algorithmic FLOPs of one call from a CPU-backend lowering
        (the TPU compile reports MXU-padded FLOPs; bench.py docstring
        honesty rule #1)."""
        aval = jax.ShapeDtypeStruct(img.shape, img.dtype)
        cpu = jax.devices("cpu")[0]

        def once(im):
            out = fn(im)
            if not isinstance(out, (list, tuple)):
                out = [out]
            return sum(jnp.sum(o.astype(jnp.float32)) for o in out)

        with jax.default_device(cpu):
            c = jax.jit(once).lower(aval).compile().cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else (c or {})
        return float(c.get("flops", 0.0)) / 1e9

    stage_fns = dict(cases_fns) if args.per_stage else {}
    for name, jfn in cases:
        t_s, t_b = timed(jfn, ks, img), timed(jfn, kb, img)
        row = {"stage": name,
               "per_call_ms": round((t_b - t_s) / (kb - ks) * 1e3, 4)}
        if name in stage_fns:
            try:
                row["algo_gflops"] = round(algo_gflops(stage_fns[name]),
                                           3)
            except Exception as e:
                row["algo_gflops_error"] = type(e).__name__
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"image": [H, W], "points": N,
                       "device": str(jax.devices()[0]),
                       "stages": rows}, f, indent=1)


if __name__ == "__main__":
    main()
