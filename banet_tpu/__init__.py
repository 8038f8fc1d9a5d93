"""banet_tpu — a TPU-native dense bundle-adjustment network framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the BA-Net
reference (frobelbest/BANet: "BA-Net: Dense Bundle Adjustment Network",
arXiv 1806.04807):

- ``geometry``  — SE(3) math, camera models, projection Jacobians
- ``ops``       — bilinear point sampling, normal-equation construction
                  (XLA einsum + Pallas kernels), spatial gradients, fixed
                  bilinear upsampling, damped dense solves
- ``models``    — DRN encoders, DLA depth-basis decoder, feature pyramid,
                  learned-damping MLP, the flagship BANet model
- ``ba``        — differentiable Gauss-Newton / Levenberg-Marquardt layers
                  (pose-only and joint pose+depth), multi-frame window BA
- ``tracking``  — two-view tracker and sequence odometry with keyframing
- ``data``      — TUM RGB-D loading/association, synthetic problem makers
- ``eval``      — ATE / RPE trajectory metrics (TUM benchmark semantics)
- ``train``     — losses, optax trainer, pjit data parallelism
- ``parallel``  — device mesh, sharding rules, distributed Schur reduction

Everything under ``jit`` is static-shape and functional; state lives in
pytrees. Cross-device work is expressed with ``jax.sharding`` +
``shard_map`` over named meshes, never with explicit per-device code.
"""

__version__ = "0.1.0"

from banet_tpu import config as config  # noqa: F401
