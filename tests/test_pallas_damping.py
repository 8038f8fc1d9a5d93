"""Fused Pallas damping MLP vs the Flax module (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.models.damping import DampingNet
from banet_tpu.ops.pallas_damping import damping_pallas


@pytest.mark.parametrize("B,base", [(4, 2.0), (16, 1.0), (3, 2.0)])
def test_matches_flax_module(B, base):
    C = 128
    net = DampingNet(C, exponent_base=base)
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (B, C))) * 0.1
    vars_ = net.init(jax.random.PRNGKey(1), x)
    want = net.apply(vars_, x)
    got = damping_pallas(vars_["params"], x, exponent_base=base,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_zero_residual_guard():
    C = 128
    net = DampingNet(C)
    x = jnp.zeros((2, C))
    vars_ = net.init(jax.random.PRNGKey(0), x)
    got = damping_pallas(vars_["params"], x, interpret=True)
    want = net.apply(vars_, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4)
    assert bool(jnp.all(jnp.isfinite(got)))


def test_vjp_raises_clear_error():
    """Differentiating through the fused kernel must fail with an
    actionable message naming the config knob, not an opaque Pallas
    transpose error (ADVICE r3 #2)."""
    C = 128
    net = DampingNet(C)
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (4, C))) * 0.1
    vars_ = net.init(jax.random.PRNGKey(1), x)

    def loss(x):
        return jnp.sum(damping_pallas(vars_["params"], x,
                                      interpret=True))

    with pytest.raises(NotImplementedError, match="fused_damping=False"):
        jax.grad(loss)(x)


@pytest.mark.tpu
def test_matches_flax_on_tpu():
    """Mosaic-compiled numerics vs the Flax module on the real chip
    (ADVICE r3 #3: interpret-mode parity does not cover the compiled
    kernel).  Skipped unless the process default backend is TPU — the
    CI conftest forces CPU; run manually when the relay is up:
      env -u JAX_PLATFORMS XLA_FLAGS= python -m pytest -m tpu
    """
    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU backend")
    C = 128
    net = DampingNet(C)
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (8, C))) * 0.1
    vars_ = net.init(jax.random.PRNGKey(1), x)
    want = net.apply(vars_, x)
    got = damping_pallas(vars_["params"], x, interpret=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-6)


def test_fused_damping_tracker_equivalence():
    """SolverConfig.fused_damping wired through the flagship: the full
    pose_track output must match the Flax damping path (on CPU the
    kernel runs in interpret mode, so this is exact-math parity of the
    WIRING, not a perf test)."""
    import dataclasses

    from banet_tpu.config import default_config
    from banet_tpu.tracking import TwoViewTracker

    H, W, N = 64, 96, 64
    cfg = dataclasses.replace(default_config(), solver=dataclasses.replace(
        default_config().solver, fused_damping=False))
    tracker = TwoViewTracker.initialize(cfg, image_size=(H, W),
                                        num_points=N)
    cfg_f = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, fused_damping=True, fused_damping_interpret=True))
    tracker_f = TwoViewTracker(cfg_f, tracker.variables)

    rng = np.random.default_rng(0)
    img1 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    k = np.asarray([W * 0.8, W * 0.8, W / 2, H / 2], np.float32)
    pts = np.stack([rng.uniform(4, W - 4, N),
                    rng.uniform(4, H - 4, N)], -1).astype(np.float32)
    d = rng.uniform(1.0, 3.0, N).astype(np.float32)

    R0, t0, keep0 = tracker.track(img1, img2, k, pts, d)
    R1, t1, keep1 = tracker_f.track(img1, img2, k, pts, d)
    np.testing.assert_allclose(R1, R0, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(t1, t0, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(keep1, keep0)
