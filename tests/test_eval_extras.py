import numpy as np
import pytest

from banet_tpu.eval.pair_eval import pair_errors, summarize
from banet_tpu.eval.parallel_runner import run_sharded_eval, \
    shard_for_process


class TestShard:
    def test_strided_partition(self):
        items = list(range(10))
        shards = [shard_for_process(items, p, 3) for p in range(3)]
        assert shards[0] == [0, 3, 6, 9]
        assert shards[1] == [1, 4, 7]
        assert sorted(sum(shards, [])) == items

    def test_single_process_runner(self):
        seqs = ["a", "b", "c"]
        calls = []

        def eval_one(s):
            calls.append(s)
            return {"ate_rmse": ord(s) * 0.01, "rpe_trans_rmse": 1.0}

        out = run_sharded_eval(seqs, eval_one)
        assert calls == seqs
        np.testing.assert_allclose(out["b"]["ate_rmse"], ord("b") * 0.01)


class TestPairErrors:
    def test_exact_match(self):
        R = np.eye(3)
        t = np.array([0.1, 0.0, 0.0])
        e = pair_errors(R, t, R, t)
        assert e["rotation_error_deg"] < 1e-3
        assert e["translation_error_m"] < 1e-9
        np.testing.assert_allclose(e["predicted_translation_m"], 0.1)

    def test_known_rotation_error(self):
        from banet_tpu.eval.trajectory import _quat_to_rot

        # 10-degree rotation about z vs identity.
        ang = np.radians(10.0)
        q = np.array([0, 0, np.sin(ang / 2), np.cos(ang / 2)])
        e = pair_errors(_quat_to_rot(q), np.zeros(3), np.eye(3),
                        np.zeros(3))
        np.testing.assert_allclose(e["rotation_error_deg"], 10.0,
                                   atol=1e-4)
        np.testing.assert_allclose(e["predicted_rotation_deg"], 10.0,
                                   atol=1e-4)

    def test_summarize(self):
        res = [{"a": 1.0}, {"a": 3.0}]
        s = summarize(res)
        assert s["a_mean"] == 2.0 and s["a_median"] == 2.0
        assert s["num_pairs"] == 2
