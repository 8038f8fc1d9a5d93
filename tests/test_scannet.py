import numpy as np

from banet_tpu.data.scannet import ScanNetScene, write_fake_scannet_scene


def test_fake_scene_roundtrip(tmp_path):
    scene = write_fake_scannet_scene(str(tmp_path / "scene"),
                                     num_frames=5)
    assert len(scene) == 5
    np.testing.assert_allclose(scene.intrinsics, [80, 80, 48, 32])
    f = scene[1]
    rgb = f.load_rgb()
    depth = f.load_depth()
    assert rgb.shape == (64, 96, 3)
    assert depth.shape == (64, 96)
    assert 0.9 < depth.min() and depth.max() < 4.1  # mm scaling
    assert f.gt_pose is not None and f.gt_pose[0, 3] == 0.01
    gt = scene.groundtruth_trajectory()
    assert len(gt) == 5
    np.testing.assert_allclose(np.diff(gt.positions[:, 0]), 0.01,
                               atol=1e-7)
    # 30 fps synthesized timestamps.
    np.testing.assert_allclose(np.diff(gt.timestamps), 1 / 30.0,
                               atol=1e-9)


def test_stride_and_untracked(tmp_path):
    d = str(tmp_path / "scene2")
    scene = write_fake_scannet_scene(d, num_frames=6)
    # Mark frame 2 untracked (-inf pose, the ScanNet convention).
    import os
    np.savetxt(os.path.join(d, "pose", "2.txt"),
               np.full((4, 4), -np.inf))
    scene = ScanNetScene(d, stride=2)
    assert [f.index for f in scene.frames] == [0, 2, 4]
    assert scene[1].gt_pose is None  # untracked scrubbed
