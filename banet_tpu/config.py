"""Configuration tree for banet_tpu.

The reference has no config system — behavior is controlled by module
globals (reference legacy/ba.py:5-9: ``early_termination``,
``angle_change``, ``translation_change``, ``residual_ratio``, ``qr``) and
hard-coded constants (crop remaps at reference bundlenet.py:286-302,
intrinsics at legacy/seq_example.py:114).  Here every knob lives in one
frozen dataclass tree so a full experiment is a single hashable value
that can be closed over by ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Gauss-Newton / LM solver knobs.

    Defaults mirror the reference operating point (legacy/ba.py:5-9 and
    legacy/example.py:83): per-level max iterations, early-exit
    thresholds on the SE(3) update norm, and step rejection when the
    re-warped residual does not decrease.
    """

    # Max GN iterations per pyramid level, coarse -> fine.  The flagship
    # has 4 levels (the legacy tracker's 3-level point is [5, 8, 12],
    # legacy/example.py:83; the extra coarsest level gets a short
    # budget).
    level_iters: Tuple[int, ...] = (2, 5, 8, 12)
    # Early-termination thresholds (legacy/ba.py:6-7). An iteration whose
    # rotation update is below `angle_change` AND translation update below
    # `translation_change` freezes the remaining iterations of the scan.
    early_termination: bool = True
    angle_change: float = 0.002 * (3.14 / 180.0)
    translation_change: float = 2e-4
    # Accept a step only if new residual < residual_ratio * old residual
    # (legacy/ba.py:8,343-345).
    residual_ratio: float = 1.0
    reject_bad_steps: bool = True
    # Step rejection for the joint pose+depth BUNDLE step (the
    # reference's BundleIteration never checks its step;
    # ba/bundle_solver.py explains why unguarded steps diverge on
    # ill-conditioned small-baseline pairs).  The trainer forces this
    # False: rejected steps pass zero gradient, and the validated
    # training recipe (artifacts/README.md campaign_r4) trains through
    # unguarded steps.
    bundle_reject_bad_steps: bool = True
    # Levenberg-style accept/reject in the WINDOW solvers (round-5,
    # VERDICT r4 item 3b): evaluate each iteration's residual against
    # the last accepted state; a worsening iterate is reverted and the
    # damping scale raised x4 (one evaluation per iteration — the
    # revert spends the iteration, like the camera solver's step
    # rejection), and the best evaluated state is returned.  Without
    # this, 5 applied-no-matter-what coarse-level GN steps could UNDO
    # good tracked warm starts — measured as multi-keyframe window BA
    # scoring WORSE than no window at all (campaign_r6
    # window_ba_summary.json).
    window_reject_bad_steps: bool = True
    # Base multiplier on the learned damping for the joint pose+depth
    # solve (reference bundlenet.py:393 uses 1000.0).
    bundle_damping_base: float = 1000.0
    # Absolute Tikhonov prior on the basis-coefficient block: adds
    # rel * mean(diag(AtA)_W) to the W diagonal, anchoring the refined
    # depth to the depth head's prediction.  LM damping is RELATIVE to
    # the diagonal, so a near-null direction (two-view small-baseline
    # scale gauge: depth -> +-inf barely changes the warp) stays
    # effectively unregularized without this — measured |W| ~ 1e2 steps
    # driving the refined depth negative while the feature residual
    # DECREASES (the step rides the unobservable direction).  The
    # reference has no such prior (its BundleIteration was only ever
    # exercised under training supervision).
    bundle_w_prior_rel: float = 0.01
    # True = damp every diagonal entry of the (6+K) bundle system.
    # False reproduces the reference quirk of leaving the LAST basis
    # coefficient completely unregularized (reference bundlenet.py:266)
    # — measured to explode the refined depth (||W|| ~ 1e8) whenever the
    # last basis channel has near-zero Jacobian energy at the sampled
    # points, so the sane behavior is the default and the quirk stays
    # available for parity studies.
    damp_last_diag: bool = True
    # Small absolute floor added to the diagonal before scaling by the
    # learned lambda (reference bundlenet.py:182,266: diag + 1e-5).
    diag_floor: float = 1e-5
    # Renormalize the damping-net residual input by the valid-point
    # fraction (legacy/ba.py:257,268 does; bundlenet.py:167 does not).
    renormalize_residual: bool = False
    # Inference-only: run each level's iterations in a lax.while_loop
    # that actually stops at the early-exit condition (like the
    # reference's tf.while_loop with back_prop=False, legacy/ba.py:140)
    # instead of the fixed-trip masked scan.  Not differentiable; the
    # trainer keeps this False.
    dynamic_early_exit: bool = False
    # Solve dtype for the (6+K)x(6+K) normal system.
    solve_dtype: str = "float32"
    # Target-map sampling strategy for the GN solvers:
    #   "gradmap"  — 4-tap bilinear sample of [f, df/dx, df/dy] stacks
    #     (3C channels, central-difference maps; reference grad_fixed
    #     semantics, bundlenet.py:92-100) — 3x the gather traffic and a
    #     per-frame 3C-map materialization;
    #   "footprint" — ONE row gather from a per-pixel 2x2-footprint map
    #     (4C channels), gradients from the same taps; the build moves
    #     4x the map per frame (~1.7 ms at 256x320 on v5e);
    #   "direct"   — 4-tap sample of the RAW C-channel pyramid with
    #     gradients from the same taps: no prebuilt stack at all, and
    #     per-iteration bytes identical to "footprint" (4 taps x C).
    #     Fastest end-to-end; gradients are the exact derivative of the
    #     bilinear interpolant the GN objective actually minimizes.
    sampler: str = "direct"
    # Use the fused Pallas iteration kernel (ops/pallas_gn_tail.py) for
    # the pose solve: one program per GN iteration instead of the ~20
    # small XLA kernels of the scan path.  Requires sampler="direct";
    # inference-only (the kernel is not differentiated), so the trainer
    # ignores it.  Off by default until a TPU toolchain is present.
    fused_tail: bool = False
    # Run the damping-net MLP as ONE fused Pallas program
    # (ops/pallas_damping.py, weights resident in VMEM) instead of ~12
    # small XLA ops per GN iteration.  Inference-only (the kernel has
    # no VJP); the trainer ignores it.  Default ON: the on-chip A/B
    # (artifacts/PROFILE_r03/iter_slope_fused_damping.log) measured
    # 0.0522 vs 0.0569 ms per full GN iteration in the real solve
    # chain; exact-parity test in tests/test_pallas_damping.py.
    # On non-TPU backends the flag is a no-op (the numerically
    # identical Flax path runs) unless fused_damping_interpret forces
    # the interpret-mode kernel — that mode is for parity tests only;
    # it is far too slow for real CPU inference.
    fused_damping: bool = True
    fused_damping_interpret: bool = False


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Network architecture knobs.

    Channel plan follows the reference DRN (reference enc.py:145:
    channels (16, 32, 64, 128, 256, 512)), 128-channel pyramid features
    (reference legacy/feat.py:251), and a 32-channel depth basis at 1/2
    resolution (reference dec.py:77,104-108 + enc.py:145).
    """

    backbone: str = "drn38"  # drn22 | drn38 | drn54
    channels: Tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    pyramid_channels: int = 128
    pyramid_levels: int = 4  # scales 1/8, 1/4, 1/2, 1/1 (coarse -> fine)
    # 3x3 convs per pyramid level (legacy pyramid stacks two,
    # legacy/feat.py:251-253; dec.py uses one).
    pyramid_convs_per_level: int = 1
    # TPU-first pyramid shape (models/pyramid.py docstring): fix the
    # 1x1-aggregation width to an MXU-aligned channel count (None =
    # faithful concat width), and override the 3x3-conv count at the
    # FINEST (full-resolution) level (None = pyramid_convs_per_level;
    # 0 drops the 27-GFLOP full-res conv that alone is half the
    # tracking frame's FLOPs).  The flagship defaults to the
    # MXU-aligned shape (measured 1.86x faster feature path on v5e at
    # identical level count/scales/output channels);
    # legacy_tracker_config pins the faithful concat-width shape.
    pyramid_agg_channels: Optional[int] = 128
    pyramid_finest_convs: Optional[int] = 0
    # Compute each pyramid aggregation node in folded form (models/
    # pyramid._FoldedAgg): the 1x1 agg commutes with the fixed
    # upsampler, so the up-path contraction runs at coarse resolution
    # and the wide full-res concat never hits HBM.  Same function and
    # parameter tree as the faithful form (checkpoint-compatible,
    # parity-tested); a layout knob, not a semantic one.
    pyramid_fold_agg: bool = False
    # Conv padding: "symmetric" (reference-parity edge mirror,
    # enc.py:23-41 — an explicit concat before every k>1 conv that XLA
    # cannot fold into the convolution), "symmetric_fast" (the SAME
    # function computed as a zero-pad conv + exact 1-px border
    # corrections, models/drn._FastSymConv3x3 — no padded-map copy;
    # checkpoint-compatible with "symmetric", parity-tested to f32
    # noise), or "zero" (the conv's own SAME padding; values differ in
    # a 1-px border only and weights must be trained with the same
    # mode).
    conv_pad_mode: str = "symmetric"
    # Inference-only space-to-depth stem layout (models/stem_s2d.py):
    # computes the SAME layer0/layer1 function on the 2x2-phase grid
    # (MXU output-lane use 12.5% -> 50%, intermediate lane padding
    # 8x -> 2x).  Parameter tree is identical to the standard stem, so
    # checkpoints restore verbatim; refuses train=True (per-phase BN
    # statistics would differ) — train standard, track with this on.
    stem_s2d: bool = False
    basis_channels: int = 32
    # Depth head basis normalization: instance std (reference dec.py:107-108)
    basis_normalized: bool = True
    # ImageNet statistics applied inside the encoder (reference enc.py:185).
    image_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    image_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    bn_momentum: float = 0.95  # reference enc.py:5 _BATCH_NORM_DECAY
    bn_epsilon: float = 1e-5  # reference enc.py:6
    # Damping-net exponent base: lambda = |r|^(base + tanh); 2.0 in the
    # current BundleNet (bundlenet.py:173), 1.0 legacy (legacy/ba.py:274).
    damping_exponent_base: float = 2.0
    # Compute dtype for conv stacks; params/stats stay float32.
    compute_dtype: str = "bfloat16"
    # Dtype of the feature maps the GN solver samples.  bf16 halves the
    # gather traffic; measured accuracy impact on synthetic problems is
    # ~1e-4 m translation (below the early-exit threshold) — fine for
    # tracking, keep float32 when training.
    solver_feature_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class GeometryConfig:
    """Ray and update conventions.

    The reference mixes two ray conventions: unit-normalized rays
    (reference bundlenet.py:119 l2_normalize) where "depth" is distance
    along the ray, and z=1 rays (reference legacy/ba.py:27-34) where
    depth is plain z-depth. We support both, but every depth source
    this framework consumes (TUM/ScanNet sensor depth, the synthetic
    renderer, the net's depth head supervised against them) is plain
    z-depth, so the default is ``False``; feeding z-depth through the
    normalized-ray convention causes a systematic pose bias growing
    toward the image corners (~7% of motion at TUM FOV).  Set ``True``
    only when every depth entering pose_track/bundle_adjust/losses is
    distance-along-ray (d * ||[(u-cx)/fx, (v-cy)/fy, 1]||).
    """

    normalized_rays: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    image_size: Tuple[int, int] = (256, 320)  # train crop (bundlenet.py:286)
    num_points: int = 1024  # sampled points (legacy/ba.py:441)
    # Border trim used by the reference train-time crop remap
    # (reference bundlenet.py:286-288: x = 320*(x-4)/312).
    crop_border: int = 4
    # Sobel texture threshold for point selection (legacy/seq_example.py:15).
    texture_threshold: float = 120.0
    depth_scale: float = 5000.0  # TUM depth PNG scale (rgbd_sequence.py:362)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_pairs: int = 4  # image pairs per step
    learning_rate: float = 1e-4
    # "constant" | "cosine": constant-LR Adam was measured to drift
    # past its accuracy sweet spot on long runs (artifacts/README.md);
    # cosine decays to lr_final_scale * learning_rate over
    # total_steps after a linear warmup.
    lr_schedule: str = "cosine"
    warmup_steps: int = 100
    total_steps: int = 10000
    lr_final_scale: float = 0.01
    weight_decay: float = 0.0
    loss_rotation_weight: float = 1.0
    loss_translation_weight: float = 1.0
    loss_flow_weight: float = 1.0
    loss_depth_weight: float = 1.0
    # Window-BA training term (round-5: the window solver's learned
    # damping previously only ever saw the two-view bundle
    # distribution; training through window_bundle_adjust on short
    # synthetic windows with noisy warm starts teaches the joint solve
    # to IMPROVE tracked poses — its deployment condition).  0 frames
    # = off (the default two-view curriculum).  Noise magnitudes are
    # the warm-start perturbation applied to the GT poses, calibrated
    # to tracked-pose error at the easy/hard eval operating points.
    window_train_frames: int = 0
    loss_window_weight: float = 0.5
    window_init_rot_noise: float = 0.01
    window_init_trans_noise: float = 0.02
    window_train_iters: int = 5
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Named mesh axes for distribution (new design; reference has no
    distributed backend — SURVEY.md §2.5)."""

    data: int = 1  # data-parallel axis (pairs/windows)
    frame: int = 1  # window-BA frame-sharding axis


@dataclasses.dataclass(frozen=True)
class KeyframeConfig:
    """Sequence-odometry keyframe policy (legacy/seq_example.py:190)."""

    min_keep_ratio: float = 0.8
    max_time_gap: float = 0.1


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    solver: SolverConfig = SolverConfig()
    geometry: GeometryConfig = GeometryConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshConfig = MeshConfig()
    keyframe: KeyframeConfig = KeyframeConfig()


def default_config() -> Config:
    return Config()


def inference_config(cfg: Config,
                     image_size: Optional[Tuple[int, int]] = None) -> Config:
    """Flip inference-only FAST knobs; applied by the bench and the CLI
    inference subcommands (the trainer must NOT use them).

    - space-to-depth stem (``ModelConfig.stem_s2d``, models/stem_s2d.py):
      numerically EXACT (kernels are re-indexed views of the standard
      parameters), checkpoint-compatible, measured 0.25 ms faster per
      256x320 feature pass on v5e
      (artifacts/PROFILE_r02/stage_bench_r2.json).  Needs even H and W
      (skipped otherwise via ``image_size``).
    - bf16 solver feature maps (``ModelConfig.solver_feature_dtype``):
      halves the sampled-map bytes; NOT bit-exact but measured
      accuracy-neutral on an f32-trained checkpoint (campaign_r5c
      held-out trajectory: ATE 0.0117 f32 vs 0.0114 bf16 — within
      run-to-run noise; artifacts/README.md round-3 table).  The CLI
      ``--feature-dtype float32`` restores exact f32 maps.
    - folded pyramid aggregation (``ModelConfig.pyramid_fold_agg``,
      models/pyramid._FoldedAgg): same function, coarse-resolution
      up-path contraction, no full-res concat map in HBM; checkpoint-
      compatible by parameter naming (parity: tests/test_pyramid_fold
      .py).  On-chip A/B at the shipped B=1 256x320 operating point:
      0.754 vs 0.925 ms per feature pass symmetric-pad, 18% faster
      (artifacts/PROFILE_r05_feature_ab.jsonl).  The same A/B REFUTED
      the round-4 ``symmetric_fast`` conv (1.284 ms — slower than the
      plain symmetric pad it was built to beat) and the B=2 cold-pair
      batching (0.958 ms/image vs 0.925 serial), so neither is
      flipped here.
    """
    model_over = dict(solver_feature_dtype="bfloat16",
                      pyramid_fold_agg=True)
    if image_size is None or (image_size[0] % 2 == 0
                              and image_size[1] % 2 == 0):
        model_over["stem_s2d"] = True
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, **model_over))


def legacy_tracker_config() -> Config:
    """Operating point of the legacy two-view tracker
    (legacy/ba.py:441: 1024 points; legacy/example.py:83 iters [5,8,12];
    3 pyramid levels from legacy/feat.py:240-271)."""
    return Config(
        model=ModelConfig(backbone="drn54", pyramid_levels=3,
                          pyramid_convs_per_level=2,
                          pyramid_agg_channels=None,
                          pyramid_finest_convs=None,
                          damping_exponent_base=1.0),
        solver=SolverConfig(level_iters=(5, 8, 12),
                            renormalize_residual=True),
        geometry=GeometryConfig(normalized_rays=False),
    )
