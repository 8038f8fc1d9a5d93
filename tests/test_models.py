"""Model wiring tests: shapes, dtypes, and end-to-end forward passes on
tiny inputs.  Spatial dims must be divisible by 32 (5 stride-2 stages,
like the reference operating points 256x320 / 480x640)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.config import Config, ModelConfig, SolverConfig, \
    default_config
from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.models import BANet, DLA, DRN, FeaturePyramid

H, W = 64, 96
B, N = 2, 16


def tiny_config(**solver_kw):
    return Config(
        model=ModelConfig(backbone="drn22", compute_dtype="float32"),
        solver=SolverConfig(level_iters=(1, 1, 1, 1), **solver_kw),
    )


def make_inputs(key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    img1 = 255.0 * jax.random.uniform(ks[0], (B, H, W, 3))
    img2 = 255.0 * jax.random.uniform(ks[1], (B, H, W, 3))
    intr = Intrinsics(jnp.full((B,), 80.0), jnp.full((B,), 80.0),
                      jnp.full((B,), W / 2.0), jnp.full((B,), H / 2.0))
    pts = jnp.stack([
        jax.random.uniform(ks[2], (B, N), minval=8.0, maxval=W - 8.0),
        jax.random.uniform(ks[2], (B, N), minval=8.0, maxval=H - 8.0),
    ], axis=-1)
    return img1, img2, intr, pts


class TestDRN:
    @pytest.mark.parametrize("variant,expansion", [("drn22", 1),
                                                   ("drn54", 4)])
    def test_shapes(self, variant, expansion):
        model = DRN(variant=variant, dtype=jnp.float32)
        img = jnp.zeros((1, H, W, 3))
        vars_ = model.init(jax.random.PRNGKey(0), img)
        outs = model.apply(vars_, img)
        # [layer6, layer5, layer4, layer3, layer2, layer1]
        chans = [512 * expansion, 256 * expansion, 128 * expansion,
                 64 * expansion, 32, 16]
        scales = [32, 16, 8, 4, 2, 1]
        assert len(outs) == 6
        for o, c, s in zip(outs, chans, scales):
            assert o.shape == (1, H // s, W // s, c), (o.shape, c, s)

    def test_bf16_compute_f32_params(self):
        model = DRN(variant="drn22", dtype=jnp.bfloat16)
        img = jnp.zeros((1, H, W, 3))
        vars_ = model.init(jax.random.PRNGKey(0), img)
        leaves = jax.tree.leaves(vars_["params"])
        assert all(l.dtype == jnp.float32 for l in leaves)
        outs = model.apply(vars_, img)
        assert outs[0].dtype == jnp.bfloat16

    def test_pad_mode_zero_same_params_interior_match(self):
        # pad_mode="zero" (conv SAME padding, XLA-foldable) must have
        # the same param tree as "symmetric" and differ only in a
        # k//2-px output border.  Single conv: border 1 px for k=3.
        from banet_tpu.models.drn import ConvBN
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 24, 8))
        sym = ConvBN(8, kernel=3, dtype=jnp.float32,
                     pad_mode="symmetric")
        zer = ConvBN(8, kernel=3, dtype=jnp.float32, pad_mode="zero")
        vs = sym.init(jax.random.PRNGKey(2), img)
        assert jax.tree.structure(vs) == jax.tree.structure(
            zer.init(jax.random.PRNGKey(2), img))
        a = sym.apply(vs, img)
        b = zer.apply(vs, img)
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a[:, 1:-1, 1:-1]),
                                   np.asarray(b[:, 1:-1, 1:-1]),
                                   rtol=1e-5, atol=1e-5)
        assert not np.allclose(np.asarray(a[:, 0]), np.asarray(b[:, 0]))

    def test_pad_mode_zero_full_model_tracks(self):
        import dataclasses
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           conv_pad_mode="zero"))
        model = BANet(cfg)
        img1, img2, intr, pts = make_inputs()
        variables = model.init(jax.random.PRNGKey(0), img1, img2, intr,
                               pts)
        d = jnp.full((B, N), 2.0)
        R, t, aux = model.apply(variables, img1, img2, intr, pts, d,
                                method=model.pose_track)
        assert R.shape == (B, 3, 3) and t.shape == (B, 3)
        assert np.isfinite(np.asarray(t)).all()


class TestDLA:
    def test_depth_basis_shapes(self):
        enc = DRN(variant="drn22", dtype=jnp.float32)
        img = jnp.zeros((1, H, W, 3))
        ev = enc.init(jax.random.PRNGKey(0), img)
        layers = enc.apply(ev, img)
        dec = DLA(dtype=jnp.float32)
        dv = dec.init(jax.random.PRNGKey(1), layers[:5])
        depth, basis = dec.apply(dv, layers[:5])
        assert depth.shape == (1, H // 2, W // 2, 1)
        # Basis channels = layer2 channels = 32 (SURVEY.md C16).
        assert basis.shape == (1, H // 2, W // 2, 32)
        assert bool(jnp.all(depth >= 0))  # ReLU head
        # Instance-std normalization: per-channel variance ~<= 1.
        v = jnp.var(basis, axis=(1, 2))
        assert float(v.max()) < 1.5


class TestFPN:
    def test_level_shapes(self):
        enc = DRN(variant="drn22", dtype=jnp.float32)
        img = jnp.zeros((1, H, W, 3))
        ev = enc.init(jax.random.PRNGKey(0), img)
        layers = enc.apply(ev, img)
        fpn = FeaturePyramid(levels=4, features=128, dtype=jnp.float32)
        fv = fpn.init(jax.random.PRNGKey(1), layers)
        outs = fpn.apply(fv, layers)
        assert [o.shape for o in outs] == [
            (1, H // 8, W // 8, 128), (1, H // 4, W // 4, 128),
            (1, H // 2, W // 2, 128), (1, H, W, 128)]


class TestBANet:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        cfg = tiny_config()
        model = BANet(cfg)
        img1, img2, intr, pts = make_inputs()
        vars_ = model.init(jax.random.PRNGKey(0), img1, img2, intr, pts)
        return model, vars_

    def test_init_collections(self, model_and_vars):
        model, vars_ = model_and_vars
        assert "params" in vars_ and "batch_stats" in vars_

    def test_pose_track_runs(self, model_and_vars):
        model, vars_ = model_and_vars
        img1, img2, intr, pts = make_inputs()
        depths = jnp.full((B, N), 3.0)
        R, t, aux = model.apply(vars_, img1, img2, intr, pts, depths,
                                method=model.pose_track)
        assert R.shape == (B, 3, 3) and t.shape == (B, 3)
        assert bool(jnp.all(jnp.isfinite(R))) and bool(
            jnp.all(jnp.isfinite(t)))
        # Rotations must stay orthonormal through the update chain.
        err = jnp.abs(R @ jnp.swapaxes(R, -1, -2) - jnp.eye(3)).max()
        assert float(err) < 1e-4

    def test_bundle_adjust_runs(self, model_and_vars):
        model, vars_ = model_and_vars
        img1, img2, intr, pts = make_inputs()
        out = model.apply(vars_, img1, img2, intr, pts,
                          method=model.bundle_adjust)
        assert out["R"].shape == (B, 3, 3)
        assert out["W"].shape == (B, 32)
        assert out["refined_depth_map"].shape == (B, H // 2, W // 2, 1)
        assert len(out["per_level"]) == 2
        for v in jax.tree.leaves(out):
            assert bool(jnp.all(jnp.isfinite(v)))

    def test_train_gradients_flow(self, model_and_vars):
        model, vars_ = model_and_vars
        img1, img2, intr, pts = make_inputs()

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": vars_["batch_stats"]},
                img1, img2, intr, pts, train=True,
                method=model.bundle_adjust, mutable=["batch_stats"])
            return jnp.sum(out["t"] ** 2) + jnp.mean(
                out["refined_depth_map"] ** 2)

        g = jax.grad(loss_fn)(vars_["params"])
        flat = jax.tree.leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(x))) for x in flat)
        # Encoder weights must receive gradient through the BA layer.
        gnorm = sum(float(jnp.abs(x).sum()) for x in flat)
        assert gnorm > 0.0
