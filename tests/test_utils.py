import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.utils import (MetricsLogger, cost_summary,
                             optimistic_restore, restore_checkpoint,
                             save_checkpoint, time_jitted)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
        p = str(tmp_path / "ckpt1")
        save_checkpoint(p, tree)
        restored = restore_checkpoint(p, jax.tree.map(jnp.zeros_like, tree))
        for x, y in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    def test_optimistic_restore_partial(self, tmp_path):
        # Saved tree lacks "new" and has a shape-mismatched "changed".
        saved = {"keep": jnp.full((3,), 7.0), "changed": jnp.ones((2, 2))}
        p = str(tmp_path / "ckpt2")
        save_checkpoint(p, saved)
        template = {"keep": jnp.zeros((3,)), "changed": jnp.zeros((4, 4)),
                    "new": jnp.zeros((5,))}
        merged, restored, skipped = optimistic_restore(p, template)
        np.testing.assert_allclose(np.asarray(merged["keep"]), 7.0)
        np.testing.assert_allclose(np.asarray(merged["changed"]), 0.0)
        np.testing.assert_allclose(np.asarray(merged["new"]), 0.0)
        assert len(restored) == 1 and len(skipped) == 2


class TestProfiling:
    def test_time_jitted(self):
        f = jax.jit(lambda x: x * 2 + 1)
        stats = time_jitted(f, jnp.ones((64, 64)), warmup=1, repeats=3)
        assert stats["min_s"] > 0 and stats["median_s"] >= stats["min_s"]

    def test_cost_summary(self):
        f = jax.jit(lambda a, b: a @ b)
        a = jnp.ones((256, 256))
        out = cost_summary(f, a, a, chip="cpu", measured_s=1e-3)
        # 2*M*N*K flops for the matmul.
        assert out["flops"] >= 2 * 256 ** 3 * 0.5
        assert "fraction_of_sol" in out


class TestLogging:
    def test_jsonl(self, tmp_path):
        p = str(tmp_path / "m.jsonl")
        lg = MetricsLogger(p, mirror_stdout=False)
        lg.log(1, loss=0.5, note="hi")
        lg.log(2, loss=jnp.asarray(0.25))
        lg.close()
        import json

        lines = [json.loads(l) for l in open(p)]
        assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
        assert lines[1]["loss"] == 0.25
