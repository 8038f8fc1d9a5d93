"""Train-then-evaluate on synthetic scenes: does learning improve
tracking accuracy end-to-end?

Trains the flagship for N steps on the synthetic renderer, then
measures pose-tracking errors (rotation deg / translation m) on
held-out pairs with (a) the initial random weights and (b) the trained
weights.  Writes a JSON artifact.  This is the round-1 stand-in for the
paper's dataset training (ROADMAP.md item 1) — it validates that the
end-to-end gradient (through warp, sampler, normal equations, damped
solve) actually improves the tracker, not just the loss.

Run:  python scripts/eval_synthetic_accuracy.py [steps] [out.json]
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

from banet_tpu.config import Config, ModelConfig, SolverConfig, \
    TrainConfig
from banet_tpu.data.synthetic import make_synthetic_image_pair
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.geometry.se3 import rotation_geodesic_angle
from banet_tpu.train import create_train_state, make_train_step, \
    synthetic_batch

H, W, NPTS = 128, 160, 256


def make_eval_pairs(n_pairs, seed0=9000):
    pairs = []
    for i in range(n_pairs):
        p = make_synthetic_image_pair(jax.random.PRNGKey(seed0 + i),
                                      batch=1, height=H, width=W)
        k = jax.random.PRNGKey(seed0 + 1000 + i)
        pts = jnp.stack([
            jax.random.uniform(k, (1, NPTS), minval=6.0, maxval=W - 6.0),
            jax.random.uniform(jax.random.fold_in(k, 1), (1, NPTS),
                               minval=6.0, maxval=H - 6.0)], axis=-1)
        # Sensor-depth tracking: sample the GT depth at the points.
        from banet_tpu.ops.resample import bilinear_sample

        d = bilinear_sample(p["depth"][..., None], pts[..., 0],
                            pts[..., 1])[..., 0]
        pairs.append((p, pts, d))
    return pairs


def eval_params(model, params, batch_stats, pairs):
    @jax.jit
    def track(variables, img1, img2, k, pts, depths):
        intr = Intrinsics.from_array(k)
        R, t, aux = model.apply(variables, img1, img2, intr, pts, depths,
                                method=model.pose_track)
        return R, t

    variables = {"params": params, "batch_stats": batch_stats}
    rot_errs, t_errs = [], []
    for p, pts, d in pairs:
        k = p["intr"].as_array()
        R, t = track(variables, p["image1"], p["image2"], k, pts, d)
        rot_errs.append(float(jnp.degrees(
            rotation_geodesic_angle(R, p["R_true"])[0])))
        t_errs.append(float(jnp.linalg.norm(t[0] - p["t_true"][0])))
    return (float(np.median(rot_errs)), float(np.median(t_errs)),
            float(np.mean(rot_errs)), float(np.mean(t_errs)))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out_path = sys.argv[2] if len(sys.argv) > 2 else \
        "artifacts/synthetic_accuracy_r1.json"

    cfg = Config(
        model=ModelConfig(backbone="drn22", compute_dtype="float32"),
        solver=SolverConfig(level_iters=(2, 3, 4, 5)),
        train=TrainConfig(learning_rate=3e-4, loss_depth_weight=0.01,
                          loss_flow_weight=10.0,
                          loss_translation_weight=3.0),
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      image_size=(H, W),
                                      num_points=NPTS)
    init_params = state.params
    init_stats = state.batch_stats
    step = jax.jit(make_train_step(model, cfg), donate_argnums=0)

    pairs = make_eval_pairs(16)
    print("evaluating untrained ...", flush=True)
    before = eval_params(model, init_params, init_stats, pairs)

    print(f"training {steps} steps ...", flush=True)
    t0 = time.time()
    losses = []
    for i in range(steps):
        batch = synthetic_batch(jax.random.PRNGKey(1000 + i), batch=2,
                                height=H, width=W, num_points=NPTS)
        state, metrics = step(state, batch)
        if i % 50 == 0 or i == steps - 1:
            losses.append((i, float(metrics["total"])))
            print(f"  step {i}: total={losses[-1][1]:.3f}", flush=True)
    train_wall = time.time() - t0

    print("evaluating trained ...", flush=True)
    after = eval_params(model, state.params, state.batch_stats, pairs)

    result = {
        "steps": steps,
        "train_wall_s": round(train_wall, 1),
        "loss_curve": losses,
        "untrained": {"rot_med_deg": before[0], "t_med_m": before[1],
                      "rot_mean_deg": before[2], "t_mean_m": before[3]},
        "trained": {"rot_med_deg": after[0], "t_med_m": after[1],
                    "rot_mean_deg": after[2], "t_mean_m": after[3]},
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["untrained"]))
    print(json.dumps(result["trained"]))


if __name__ == "__main__":
    main()
