import numpy as np
import pytest

from banet_tpu.eval import (Trajectory, associate, ate_rmse, evaluate_ate,
                            evaluate_rpe, horn_align, load_tum_trajectory,
                            save_tum_trajectory)


def random_rotation(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def make_trajectory(rng, n=50, dt=0.05):
    stamps = np.arange(n) * dt
    poses = np.tile(np.eye(4), (n, 1, 1))
    pos = np.cumsum(0.02 * rng.normal(size=(n, 3)), axis=0)
    for i in range(n):
        poses[i, :3, :3] = random_rotation(rng)
        poses[i, :3, 3] = pos[i]
    return Trajectory(stamps, poses)


class TestAssociate:
    def test_exact_and_gated(self):
        a = [0.0, 1.0, 2.0, 3.0]
        b = [0.011, 1.5, 2.005, 10.0]
        m = associate(a, b, max_difference=0.02)
        assert m == [(0, 0), (2, 2)]

    def test_greedy_unique(self):
        a = [0.0, 0.01]
        b = [0.005]
        m = associate(a, b, max_difference=0.05)
        assert len(m) == 1 and m[0][1] == 0

    def test_matches_brute_force(self):
        # The bisect-based enumeration must reproduce the O(A*B)
        # reference semantics exactly, including greedy tie order, on
        # unsorted stamps with offsets.
        rng = np.random.default_rng(7)
        a = list(rng.uniform(0, 10, 200))
        b = list(rng.uniform(0, 10, 230))
        for offset in (0.0, 0.13):
            cands = []
            for ia, ta in enumerate(a):
                for ib, tb in enumerate(b):
                    d = abs(ta - (tb + offset))
                    if d < 0.05:
                        cands.append((d, ia, ib))
            cands.sort()
            used_a, used_b, expected = set(), set(), []
            for d, ia, ib in cands:
                if ia not in used_a and ib not in used_b:
                    used_a.add(ia)
                    used_b.add(ib)
                    expected.append((ia, ib))
            expected.sort()
            assert associate(a, b, offset=offset,
                             max_difference=0.05) == expected


class TestHornATE:
    def test_alignment_exact_under_rigid_transform(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(3, 40))
        R = random_rotation(rng)
        t = rng.normal(size=(3, 1))
        moved = R @ pts + t
        R_est, t_est = horn_align(pts, moved)
        np.testing.assert_allclose(R_est, R, atol=1e-8)
        np.testing.assert_allclose(t_est, t, atol=1e-8)

    def test_ate_zero_for_rigidly_moved_trajectory(self):
        rng = np.random.default_rng(1)
        gt = make_trajectory(rng)
        R = random_rotation(rng)
        t = rng.normal(size=3)
        est_pos = (R @ gt.positions.T).T + t
        assert ate_rmse(gt.positions, est_pos) < 1e-9

    def test_ate_known_noise(self):
        rng = np.random.default_rng(2)
        gt = make_trajectory(rng, n=2000)
        noise = 0.05 * rng.normal(size=gt.positions.shape)
        est_pos = gt.positions + noise
        rmse = ate_rmse(gt.positions, est_pos)
        expected = np.sqrt(np.mean(np.sum(noise ** 2, axis=1)))
        # Alignment can only reduce the error, and only slightly here.
        assert 0.7 * expected < rmse <= expected * 1.001

    def test_evaluate_ate_with_association(self):
        rng = np.random.default_rng(3)
        gt = make_trajectory(rng)
        est = Trajectory(gt.timestamps + 0.001, gt.poses.copy())
        out = evaluate_ate(gt, est)
        assert out["compared_pose_pairs"] == len(gt)
        assert out["ate_rmse"] < 1e-9


class TestRPE:
    def test_zero_for_identical(self):
        rng = np.random.default_rng(4)
        gt = make_trajectory(rng)
        out = evaluate_rpe(gt, Trajectory(gt.timestamps, gt.poses.copy()),
                           delta=1, delta_unit="f")
        assert out["rpe_trans_rmse"] < 1e-9
        # arccos near 1.0 bottoms out around sqrt(eps); ~1e-5 deg noise.
        assert out["rpe_rot_rmse_deg"] < 1e-4

    def test_constant_drift_per_frame(self):
        # Estimated trajectory drifts 1 cm per frame along x in the
        # frame of each pose => RPE(1 frame) = 1 cm.
        n = 20
        stamps = np.arange(n) * 0.1
        gt_poses = np.tile(np.eye(4), (n, 1, 1))
        est_poses = np.tile(np.eye(4), (n, 1, 1))
        for i in range(n):
            est_poses[i, 0, 3] = 0.01 * i
        gt = Trajectory(stamps, gt_poses)
        est = Trajectory(stamps, est_poses)
        out = evaluate_rpe(gt, est, delta=1, delta_unit="f")
        np.testing.assert_allclose(out["rpe_trans_rmse"], 0.01, rtol=1e-6)
        # Per-second: 0.01 m per 0.1 s = 0.1 m/s.
        out_s = evaluate_rpe(gt, est, delta=0.1, delta_unit="s")
        np.testing.assert_allclose(out_s["rpe_trans_rmse"], 0.1, rtol=1e-5)


class TestTrajectoryIO:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(5)
        traj = make_trajectory(rng, n=10)
        p = str(tmp_path / "traj.txt")
        save_tum_trajectory(p, traj)
        loaded = load_tum_trajectory(p)
        np.testing.assert_allclose(loaded.timestamps, traj.timestamps,
                                   atol=1e-6)
        np.testing.assert_allclose(loaded.poses, traj.poses, atol=1e-5)

    def test_skips_comments(self, tmp_path):
        p = tmp_path / "t.txt"
        p.write_text("# comment\n\n1.0 0 0 0 0 0 0 1\n")
        loaded = load_tum_trajectory(str(p))
        assert len(loaded) == 1
        np.testing.assert_allclose(loaded.poses[0], np.eye(4), atol=1e-8)
