"""Losses and the training step (smoke: finite losses, flowing grads,
state updates)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.config import Config, ModelConfig, SolverConfig
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.geometry.se3 import exp_so3
from banet_tpu.train import (create_train_state, loss_depth_l1, loss_flow,
                             loss_rotation, loss_translation,
                             loss_translation_angular, make_train_step,
                             synthetic_batch)


class TestLosses:
    def test_rotation_zero_at_identity_pair(self):
        R = exp_so3(jnp.array([[0.3, -0.2, 0.1]]))
        assert float(loss_rotation(R, R)) < 1e-6

    def test_rotation_sign_invariance(self):
        # q and -q encode the same rotation; the loss must not care.
        R1 = exp_so3(jnp.array([[3.0, 0.5, 0.0]]))  # angle > pi/2
        assert float(loss_rotation(R1, R1)) < 1e-5

    def test_rotation_monotone_in_angle(self):
        Rg = exp_so3(jnp.zeros((1, 3)))
        small = float(loss_rotation(exp_so3(jnp.array([[0.1, 0, 0]])), Rg))
        big = float(loss_rotation(exp_so3(jnp.array([[0.5, 0, 0]])), Rg))
        assert 0 < small < big

    def test_translation(self):
        t1 = jnp.array([[1.0, 2.0, 3.0]])
        t2 = jnp.array([[1.0, 2.0, 4.0]])
        np.testing.assert_allclose(float(loss_translation(t1, t2)), 1 / 3,
                                   rtol=1e-6)
        assert float(loss_translation_angular(t1, t1)) < 1e-6

    def test_flow_zero_for_equal_pose(self):
        intr = Intrinsics(jnp.array([50.0]), jnp.array([50.0]),
                          jnp.array([32.0]), jnp.array([24.0]))
        depth = jnp.full((1, 48, 64), 2.0)
        mask = jnp.ones_like(depth)
        R = exp_so3(jnp.array([[0.05, 0.0, 0.0]]))
        t = jnp.array([[0.1, 0.0, 0.0]])
        assert float(loss_flow(intr, depth, mask, R, t, R, t)) < 1e-6
        # And positive when poses differ.
        R2 = exp_so3(jnp.array([[0.06, 0.0, 0.0]]))
        assert float(loss_flow(intr, depth, mask, R2, t, R, t)) > 1e-5

    def test_flow_mask_renormalization(self):
        intr = Intrinsics(jnp.array([50.0]), jnp.array([50.0]),
                          jnp.array([32.0]), jnp.array([24.0]))
        depth = jnp.full((1, 48, 64), 2.0)
        R = exp_so3(jnp.array([[0.02, 0.0, 0.0]]))
        Rg = exp_so3(jnp.zeros((1, 3)))
        t = jnp.zeros((1, 3))
        full = loss_flow(intr, depth, jnp.ones_like(depth), R, t, Rg, t)
        half_mask = jnp.ones_like(depth).at[:, :, 32:].set(0.0)
        half = loss_flow(intr, depth, half_mask, R, t, Rg, t)
        # Renormalization keeps magnitudes comparable (same order).
        assert 0.2 < float(half / full) < 5.0

    def test_depth_l1(self):
        d = jnp.full((1, 4, 4), 2.0)
        assert float(loss_depth_l1(d, d)) < 1e-7
        assert float(loss_depth_l1(d, 2.0 * d)) > 0.1


@pytest.mark.slow
class TestTrainStep:
    def test_two_steps_update_state(self):
        cfg = Config(
            model=ModelConfig(backbone="drn22", compute_dtype="float32"),
            solver=SolverConfig(level_iters=(1, 1, 1, 1)),
        )
        model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                          image_size=(64, 96),
                                          num_points=32)
        step = jax.jit(make_train_step(model, cfg))
        losses = []
        for i in range(2):
            batch = synthetic_batch(jax.random.PRNGKey(i), batch=1,
                                    height=64, width=96, num_points=32)
            state, metrics = step(state, batch)
            losses.append(float(metrics["total"]))
            assert np.isfinite(losses[-1])
            assert float(metrics["grad_norm"]) > 0.0
        assert int(state.step) == 2

    def test_window_train_step(self):
        """Training THROUGH window_bundle_adjust (round-5): the step
        must run, emit finite window terms, and actually move the
        level-2 damping-net parameters (the component the window term
        exists to fit)."""
        import dataclasses

        from banet_tpu.train.trainer import window_batch_extras

        cfg = Config(
            model=ModelConfig(backbone="drn22", compute_dtype="float32"),
            solver=SolverConfig(level_iters=(1, 1, 1, 1)),
        )
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, window_train_frames=2, window_train_iters=2,
            lr_schedule="constant"))
        model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                          image_size=(64, 96),
                                          num_points=32)
        step = jax.jit(make_train_step(model, cfg))
        batch = synthetic_batch(jax.random.PRNGKey(0), batch=1,
                                height=64, width=96, num_points=32)
        batch.update(window_batch_extras(jax.random.PRNGKey(1),
                                         num_frames=2, height=64,
                                         width=96, num_points=32))
        damp_before = jax.tree_util.tree_leaves(
            state.params["damping_2"])[0].copy()
        state, metrics = step(state, batch)
        for k in ("win_rotation", "win_translation", "win_depth"):
            assert k in metrics and np.isfinite(float(metrics[k])), k
        assert np.isfinite(float(metrics["total"]))
        damp_after = jax.tree_util.tree_leaves(
            state.params["damping_2"])[0]
        assert float(jnp.abs(damp_after - damp_before).max()) > 0.0


class TestCropPipeline:
    def test_crop_geometry_is_exact(self):
        # Projecting in source coords then remapping the pixels must
        # equal projecting with the crop-adjusted intrinsics: the crop
        # is affine in pixel space (reference bundlenet.py:286-302).
        from banet_tpu.geometry.camera import (backproject,
                                               crop_adjusted_intrinsics,
                                               crop_remap, warp_points)

        src, dst, b = (60, 92), (64, 96), 4
        intr_src = Intrinsics(jnp.array([70.0]), jnp.array([72.0]),
                              jnp.array([40.0]), jnp.array([30.0]))
        intr_dst = crop_adjusted_intrinsics(intr_src, src, dst, b)
        pts = jnp.array([[[10.0, 12.0], [50.0, 40.0], [70.0, 20.0]]])
        depth = jnp.array([[2.0, 3.0, 2.5]])
        R = exp_so3(jnp.array([[0.02, -0.01, 0.03]]))
        t = jnp.array([[0.05, 0.02, -0.04]])

        rays = backproject(pts, intr_src, normalized=False)
        px_s, py_s, *_ = warp_points(rays, depth, R, t, intr_src)
        warped_then_remapped = crop_remap(
            jnp.stack([px_s, py_s], axis=-1), src, dst, b)

        pts_d = crop_remap(pts, src, dst, b)
        rays_d = backproject(pts_d, intr_dst, normalized=False)
        px_d, py_d, *_ = warp_points(rays_d, depth, R, t, intr_dst)
        np.testing.assert_allclose(
            np.asarray(warped_then_remapped[..., 0]), np.asarray(px_d),
            rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(warped_then_remapped[..., 1]), np.asarray(py_d),
            rtol=1e-4, atol=1e-3)

    def test_train_step_on_cropped_batches(self):
        from banet_tpu.train.trainer import crop_augmented_batch

        cfg = Config(
            model=ModelConfig(backbone="drn22", compute_dtype="float32"),
            solver=SolverConfig(level_iters=(1, 1, 1, 1)),
        )
        model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                          image_size=(64, 96),
                                          num_points=32)
        step = jax.jit(make_train_step(model, cfg))
        for i in range(2):
            batch = crop_augmented_batch(jax.random.PRNGKey(i), batch=1,
                                         src_size=(60, 92),
                                         dst_size=(64, 96), border=4,
                                         num_points=32)
            assert batch["image1"].shape == (1, 64, 96, 3)
            # Remapped points stay inside the training frame.
            assert float(batch["points"][..., 0].min()) >= 0.0
            assert float(batch["points"][..., 0].max()) <= 96.0
            state, metrics = step(state, batch)
            assert np.isfinite(float(metrics["total"]))
            assert float(metrics["grad_norm"]) > 0.0
        assert int(state.step) == 2


def test_depth_loss_survives_nonfinite_pred():
    """A non-finite refined-depth pixel (degenerate bundle solve on a
    low-texture batch — observed in campaign_r7) must poison neither
    the loss value nor its gradient (the 0 * d(log(NaN)) VJP pitfall:
    sanitize BEFORE the log chain)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from banet_tpu.train.losses import loss_depth_l1

    gt = jnp.full((2, 4, 4), 3.0)
    mask = jnp.ones((2, 4, 4))

    def loss(x):
        pred = x.at[0, 0, 0].set(jnp.nan).at[0, 0, 1].set(jnp.inf)
        return loss_depth_l1(pred, gt, mask)

    x = jnp.full((2, 4, 4), 2.0)
    val = loss(x)
    g = jax.grad(loss)(x)
    assert bool(jnp.isfinite(val))
    assert bool(jnp.all(jnp.isfinite(g))), g
    # Clean pixels still supervise.
    assert float(jnp.abs(g[1]).sum()) > 0


def test_nonfinite_grad_step_is_skipped():
    """A batch whose gradients go non-finite must leave the parameters
    UNCHANGED (optax.apply_if_finite) instead of NaN-poisoning every
    leaf through clip_by_global_norm — the silent killer of
    campaign_r7 attempt 1 (artifacts/campaign_r7/
    README_NANPOSTMORTEM.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from banet_tpu.config import default_config
    from banet_tpu.train.trainer import make_optimizer

    import dataclasses

    cfg = default_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, lr_schedule="constant"))  # warmup lr=0 would make
    tx = make_optimizer(cfg)                 # the first update zero
    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    state = tx.init(params)

    good = {"w": jnp.full((3,), 0.1), "b": jnp.full((2,), 0.2)}
    upd, state = tx.update(good, state, params)
    p1 = optax.apply_updates(params, upd)
    assert float(jnp.abs(p1["w"] - params["w"]).sum()) > 0

    bad = {"w": jnp.array([0.1, jnp.nan, 0.1]), "b": jnp.zeros((2,))}
    upd2, state = tx.update(bad, state, p1)
    p2 = optax.apply_updates(p1, upd2)
    np.testing.assert_array_equal(np.asarray(p2["w"]),
                                  np.asarray(p1["w"]))
    assert bool(jnp.all(jnp.isfinite(p2["w"])))

    # And a later good step trains again.
    upd3, state = tx.update(good, state, p2)
    p3 = optax.apply_updates(p2, upd3)
    assert float(jnp.abs(p3["w"] - p2["w"]).sum()) > 0


def test_notfinite_count_tripwire_signal():
    """The consecutive-skip counter must be observable from outside the
    jit (the campaign tripwire aborts on it — a run that skips every
    update otherwise LOOKS alive: finite losses, advancing steps;
    campaign_r7 attempt 2 did exactly that for hours)."""
    import dataclasses

    import jax.numpy as jnp

    from banet_tpu.config import default_config
    from banet_tpu.train.trainer import make_optimizer

    cfg = default_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, lr_schedule="constant"))
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    bad = {"w": jnp.array([0.1, jnp.nan, 0.1])}
    for want in (1, 2, 3):
        _, state = tx.update(bad, state, params)
        assert int(state.notfinite_count) == want
    good = {"w": jnp.full((3,), 0.1)}
    _, state = tx.update(good, state, params)
    assert int(state.notfinite_count) == 0
