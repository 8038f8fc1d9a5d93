import json
import struct

import numpy as np
import pytest

from banet_tpu.data.io import (read_motion_bin, read_pair_list, read_pfm,
                               read_tum_groundtruth, write_pfm)


class TestPFM:
    def test_roundtrip_gray(self, tmp_path):
        d = np.random.default_rng(0).random((6, 8)).astype(np.float32)
        p = str(tmp_path / "x.pfm")
        write_pfm(p, d)
        loaded, scale = read_pfm(p)
        np.testing.assert_allclose(loaded, d, atol=1e-7)
        assert scale == 1.0

    def test_roundtrip_color(self, tmp_path):
        d = np.random.default_rng(1).random((4, 5, 3)).astype(np.float32)
        p = str(tmp_path / "c.pfm")
        write_pfm(p, d, scale=2.0)
        loaded, scale = read_pfm(p)
        np.testing.assert_allclose(loaded, d, atol=1e-7)
        assert scale == 2.0


class TestMotionBin:
    def test_read(self, tmp_path):
        p = tmp_path / "m.bin"
        q = np.array([2.0, 0.0, 0.0, 0.0])  # unnormalized
        t = np.array([0.1, 0.2, 0.3])
        p.write_bytes(struct.pack("f" * 7, *q, *t))
        qr, tr = read_motion_bin(str(p))
        np.testing.assert_allclose(qr, [1, 0, 0, 0], atol=1e-7)
        np.testing.assert_allclose(tr, t, atol=1e-7)


class TestPairList:
    def test_groups(self, tmp_path):
        p = tmp_path / "test.txt"
        p.write_text("a b\nc\n\nd e f\n\n")
        groups = read_pair_list(str(p))
        assert groups == [["a", "b", "c"], ["d", "e", "f"]]

    def test_groundtruth(self, tmp_path):
        p = tmp_path / "samples2.txt"
        p.write_text("123.4 1 2 3 0 0 0 1 567.8\n")
        data = read_tum_groundtruth(str(p))
        assert "123.4" in data
        np.testing.assert_allclose(data["123.4"]["t"], [1, 2, 3])
        assert data["123.4"]["depth"] == "567.8"


@pytest.mark.slow
class TestCLI:
    def test_evaluate_command(self, tmp_path, capsys):
        from banet_tpu.cli import main
        from banet_tpu.eval.trajectory import Trajectory, \
            save_tum_trajectory

        n = 20
        stamps = np.arange(n) * 0.1
        poses = np.tile(np.eye(4), (n, 1, 1))
        poses[:, 0, 3] = 0.05 * np.arange(n)
        gt = Trajectory(stamps, poses)
        gp = str(tmp_path / "gt.txt")
        ep = str(tmp_path / "est.txt")
        save_tum_trajectory(gp, gt)
        est_poses = poses.copy()
        est_poses[:, 1, 3] += 0.01  # constant offset -> ATE ~ 0
        save_tum_trajectory(ep, Trajectory(stamps, est_poses))
        rc = main(["evaluate", gp, ep, "--rpe-delta", "1", "--rpe-unit",
                   "f"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["ate_rmse"] < 1e-6  # Horn alignment removes offset
        assert out["rpe_trans_rmse"] < 1e-6

    def test_odometry_command(self, tmp_path, capsys, monkeypatch):
        from banet_tpu import cli
        from banet_tpu.data.tum import write_fake_sequence

        seq_dir = str(tmp_path / "seq")
        write_fake_sequence(seq_dir, num_frames=3)
        # Patch a tiny config so the untrained model run is fast.
        from banet_tpu.config import Config, ModelConfig, SolverConfig

        tiny = Config(model=ModelConfig(backbone="drn22",
                                        compute_dtype="float32"),
                      solver=SolverConfig(level_iters=(1, 1, 1, 1)))
        monkeypatch.setattr("banet_tpu.config.default_config",
                            lambda: tiny)
        out_file = str(tmp_path / "traj.txt")
        rc = cli.main(["odometry", seq_dir, "--out", out_file,
                       "--num-points", "16", "--max-frames", "3"])
        assert rc == 0
        from banet_tpu.eval.trajectory import load_tum_trajectory

        traj = load_tum_trajectory(out_file)
        assert len(traj) == 3

    def test_odometry_multi_window_ba(self, tmp_path, capsys,
                                      monkeypatch):
        """--window-ba --window-ba-mode multi drives the coupled
        keyframe-chain refinement end-to-end through the CLI (the fake
        sequence's 0.05 s stamps re-key on the 0.1 s gap policy, so
        two windows close and the second couples the previous
        keyframe)."""
        from banet_tpu import cli
        from banet_tpu.config import Config, ModelConfig, SolverConfig
        from banet_tpu.data.tum import write_fake_sequence

        seq_dir = str(tmp_path / "seq")
        write_fake_sequence(seq_dir, num_frames=7)
        tiny = Config(model=ModelConfig(backbone="drn22",
                                        compute_dtype="float32"),
                      solver=SolverConfig(level_iters=(1, 1, 1, 1)))
        monkeypatch.setattr("banet_tpu.config.default_config",
                            lambda: tiny)
        out_file = str(tmp_path / "traj.txt")
        rc = cli.main(["odometry", seq_dir, "--out", out_file,
                       "--num-points", "16", "--max-frames", "7",
                       "--window-ba", "--window-ba-mode", "multi"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["window_refinements"] >= 2
        from banet_tpu.eval.trajectory import load_tum_trajectory

        traj = load_tum_trajectory(out_file)
        assert len(traj) == 7
        assert np.all(np.isfinite(traj.poses))

    def test_train_backbone_npy_seed(self, tmp_path, capsys,
                                     monkeypatch):
        """train --backbone-npy seeds the encoder from an exported
        dict (docs/REAL_DATA.md hand-off; reference enc.py:241)."""
        import jax

        from banet_tpu import cli
        from banet_tpu.config import (Config, ModelConfig, SolverConfig,
                                      TrainConfig)
        from banet_tpu.train.trainer import create_train_state
        from banet_tpu.utils.backbone_init import export_backbone_npy

        tiny = Config(model=ModelConfig(backbone="drn22",
                                        compute_dtype="float32"),
                      solver=SolverConfig(level_iters=(1, 1, 1, 1)),
                      train=TrainConfig(batch_pairs=1))
        monkeypatch.setattr("banet_tpu.config.default_config",
                            lambda: tiny)
        _model, donor = create_train_state(
            tiny, jax.random.PRNGKey(7), image_size=(64, 96),
            num_points=8)
        npy = str(tmp_path / "backbone.npy")
        n = export_backbone_npy(npy, {"params": donor.params,
                                      "batch_stats": donor.batch_stats})
        assert n > 0
        rc = cli.main(["train", "--steps", "1", "--image-size", "64",
                       "96", "--num-points", "8",
                       "--backbone-npy", npy])
        assert rc == 0


class TestCkptModelConfigSidecar:
    def test_overrides_applied_and_absent_sidecar_noop(self, tmp_path):
        from banet_tpu import cli
        from banet_tpu.config import default_config

        cfg = default_config()
        # No checkpoint / no sidecar: unchanged object.
        assert cli._apply_ckpt_model_config(cfg, None) is cfg
        ckpt = tmp_path / "ckpt_ema"
        ckpt.mkdir()
        assert cli._apply_ckpt_model_config(cfg, str(ckpt)) is cfg
        # Sidecar next to the checkpoint dir applies model overrides.
        (tmp_path / "model_config.json").write_text(
            json.dumps({"conv_pad_mode": "zero",
                        "solver_feature_dtype": "bfloat16"}))
        cfg2 = cli._apply_ckpt_model_config(cfg, str(ckpt))
        assert cfg2.model.conv_pad_mode == "zero"
        assert cfg2.model.solver_feature_dtype == "bfloat16"
        assert cfg.model.conv_pad_mode == "symmetric"  # original intact
