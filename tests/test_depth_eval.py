import json

import numpy as np
import pytest

from banet_tpu.eval.depth_eval import depth_metrics


class TestDepthMetrics:
    def test_perfect_prediction(self):
        gt = np.random.default_rng(0).uniform(0.5, 4.0, (32, 48))
        m = depth_metrics(gt, gt)
        assert m["abs_rel"] == 0.0
        assert m["rmse"] == 0.0
        assert m["a1"] == 1.0
        assert m["valid_fraction"] == 1.0
        np.testing.assert_allclose(m["median_scale"], 1.0)

    def test_known_scale_error(self):
        gt = np.full((16, 16), 2.0)
        pred = np.full((16, 16), 1.0)  # half-scale everywhere
        m = depth_metrics(pred, gt)
        np.testing.assert_allclose(m["abs_rel"], 0.5)
        np.testing.assert_allclose(m["rmse"], 1.0)
        assert m["a1"] == 0.0  # ratio 2.0 > 1.25
        assert m["a3"] == 0.0  # 2.0 > 1.25^3 ~= 1.95
        # Median scaling fixes a pure scale error completely.
        np.testing.assert_allclose(m["median_scale"], 2.0)
        np.testing.assert_allclose(m["scaled_abs_rel"], 0.0, atol=1e-12)
        assert m["scaled_a1"] == 1.0

    def test_invalid_gt_masked(self):
        gt = np.zeros((8, 8))
        gt[0, :4] = 2.0
        pred = np.full((8, 8), 2.0)
        m = depth_metrics(pred, gt)
        assert m["valid_fraction"] == pytest.approx(4 / 64)
        assert m["abs_rel"] == 0.0

    def test_all_invalid(self):
        m = depth_metrics(np.ones((4, 4)), np.zeros((4, 4)))
        assert m == {"valid_fraction": 0.0}

    def test_range_cap(self):
        gt = np.full((8, 8), 2.0)
        gt[0, 0] = 500.0  # beyond max_depth -> masked
        pred = np.full((8, 8), 2.0)
        m = depth_metrics(pred, gt, max_depth=80.0)
        assert m["valid_fraction"] == pytest.approx(63 / 64)
        assert m["abs_rel"] == 0.0


def test_cli_depth_command(tmp_path, capsys):
    """End-to-end: monocular two-view BA depth metrics through the CLI
    on a fake TUM sequence (reference capability: the BA-Net paper's
    depth evaluation of init_depth + basis @ W, bundlenet.py:397)."""
    from banet_tpu.cli import main
    from banet_tpu.data.tum import write_fake_sequence

    d = str(tmp_path / "seq")
    write_fake_sequence(d, num_frames=3, size=(64, 96))
    rc = main(["depth", d, "--stride", "2", "--num-points", "64",
               "--max-pairs", "1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["num_pairs"] == 1.0
    for key in ("init_abs_rel_mean", "refined_abs_rel_mean",
                "refined_rmse_mean", "refined_a1_mean",
                "refined_valid_fraction_mean"):
        assert key in out and np.isfinite(out[key])
    assert out["refined_valid_fraction_mean"] > 0.5
