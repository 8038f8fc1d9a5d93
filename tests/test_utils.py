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


class TestProfileReport:
    def test_components_and_trace(self, tmp_path):
        """scripts/profile_report.py end-to-end at a tiny operating
        point: slope table, HLO roofline block, and a real
        jax.profiler trace with a parsed top-op table."""
        import json
        import subprocess
        import sys

        out = tmp_path / "prof" / "report.json"
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="",
                   JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "scripts/profile_report.py",
             "--components", "--trace", "--image-size", "64", "96",
             "--num-points", "32", "--k-small", "1", "--k-big", "3",
             "--out", str(out)],
            cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            env=env, capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stderr[-2000:]
        rep = json.loads(out.read_text())
        comps = rep["components"]
        for key in ("pyramid", "frame_fixed_iters", "frame_early_exit",
                    "gn_solve_27_iters", "frame_hlo"):
            assert key in comps
        assert comps["frame_hlo"]["gflops"] > 0
        assert rep["trace"]["top_ops"], "trace parsed to an op table"
        assert (tmp_path / "prof" / "trace").is_dir()
