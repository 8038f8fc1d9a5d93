"""ScanNet-style exported-sequence loading.

BASELINE configs #1-#3 reference ScanNet snippets; the standard
"exported" layout (from ScanNet's SensReader) is

    scene_dir/
      color/<i>.jpg          RGB frames
      depth/<i>.png          16-bit depth, millimeters
      pose/<i>.txt           4x4 camera-to-world matrices
      intrinsic/intrinsic_depth.txt (or intrinsic_color.txt)   4x4 K

This loader presents it through the same Frame/sequence interface as
data/tum.py so the odometry runner, pair evaluator, and CLI work
unchanged.  (No ScanNet data exists in this zero-egress environment;
tests use ``write_fake_scannet_scene``.)
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Iterator, List, Optional, Tuple

import numpy as np

DEPTH_SCALE_MM = 1000.0


@dataclasses.dataclass
class ScanNetFrame:
    index: int
    color_path: str
    depth_path: str
    pose: Optional[np.ndarray]  # 4x4 camera-to-world, or None
    # Working resolution = the depth grid (SensReader exports 1296x968
    # color vs 640x480 depth; intrinsic_depth.txt matches the latter).
    # Color is resized here so rgb/depth/intrinsics agree.
    size: Optional[Tuple[int, int]] = None  # (H, W) of the depth grid

    @property
    def timestamp(self) -> float:
        # ScanNet exports are ~30 Hz frame streams without timestamps;
        # synthesize at 30 fps for the keyframe policy's time gate.
        return self.index / 30.0

    def load_rgb(self) -> np.ndarray:
        from PIL import Image

        img = Image.open(self.color_path).convert("RGB")
        if self.size is not None and img.size != (self.size[1],
                                                  self.size[0]):
            img = img.resize((self.size[1], self.size[0]),
                             Image.BILINEAR)
        return np.asarray(img, np.float32)

    def load_depth(self) -> np.ndarray:
        from PIL import Image

        d = np.asarray(Image.open(self.depth_path), np.float32)
        return d / DEPTH_SCALE_MM

    @property
    def gt_pose(self):
        return self.pose


def _frame_index(name: str) -> int:
    m = re.match(r"(\d+)\.", name)
    return int(m.group(1)) if m else -1


class ScanNetScene:
    def __init__(self, scene_dir: str, stride: int = 1):
        self.scene_dir = scene_dir
        color_dir = os.path.join(scene_dir, "color")
        depth_dir = os.path.join(scene_dir, "depth")
        pose_dir = os.path.join(scene_dir, "pose")
        names = sorted(os.listdir(color_dir), key=_frame_index)
        frames: List[ScanNetFrame] = []
        for name in names[::stride]:
            idx = _frame_index(name)
            if idx < 0:
                continue
            dp = os.path.join(depth_dir, f"{idx}.png")
            if not os.path.exists(dp):
                continue
            pose = None
            pp = os.path.join(pose_dir, f"{idx}.txt")
            if os.path.exists(pp):
                pose = np.loadtxt(pp).reshape(4, 4)
                if not np.all(np.isfinite(pose)):
                    pose = None  # ScanNet marks untracked frames -inf
            frames.append(ScanNetFrame(
                index=idx, color_path=os.path.join(color_dir, name),
                depth_path=dp, pose=pose))
        self.frames = frames
        self.intrinsics = self._load_intrinsics()
        if frames:
            from PIL import Image

            with Image.open(frames[0].depth_path) as im:
                w, h = im.size
            self.size = (h, w)
            for f in frames:
                f.size = self.size

    def _load_intrinsics(self) -> np.ndarray:
        for name in ("intrinsic_depth.txt", "intrinsic_color.txt"):
            p = os.path.join(self.scene_dir, "intrinsic", name)
            if os.path.exists(p):
                K = np.loadtxt(p).reshape(4, 4)
                return np.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]],
                                  np.float32)
        raise FileNotFoundError(
            f"no intrinsic/intrinsic_*.txt under {self.scene_dir}")

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, i: int) -> ScanNetFrame:
        return self.frames[i]

    def __iter__(self) -> Iterator[ScanNetFrame]:
        return iter(self.frames)

    def groundtruth_trajectory(self):
        from banet_tpu.eval.trajectory import Trajectory

        stamps, poses = [], []
        for f in self.frames:
            if f.pose is not None:
                stamps.append(f.timestamp)
                poses.append(f.pose)
        return Trajectory(np.asarray(stamps), np.asarray(poses))


def write_fake_scannet_scene(scene_dir: str, num_frames: int = 6,
                             size: Tuple[int, int] = (64, 96),
                             seed: int = 0,
                             color_size: Optional[Tuple[int, int]] = None
                             ) -> "ScanNetScene":
    """Materialize a tiny ScanNet-layout scene for tests.

    ``size`` is the depth (= working) resolution; ``color_size``
    defaults to 1.5x it, mimicking real SensReader exports where color
    frames are larger than the depth grid."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    H, W = size
    cH, cW = color_size if color_size is not None else (H * 3 // 2,
                                                        W * 3 // 2)
    for sub in ("color", "depth", "pose", "intrinsic"):
        os.makedirs(os.path.join(scene_dir, sub), exist_ok=True)
    K = np.eye(4)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 80.0, 80.0, W / 2, H / 2
    np.savetxt(os.path.join(scene_dir, "intrinsic",
                            "intrinsic_depth.txt"), K)
    for i in range(num_frames):
        img = rng.integers(0, 255, (cH, cW, 3), dtype=np.uint8)
        d16 = (rng.uniform(1.0, 4.0, (H, W)) * DEPTH_SCALE_MM).astype(
            np.uint16)
        Image.fromarray(img).save(
            os.path.join(scene_dir, "color", f"{i}.jpg"))
        Image.fromarray(d16).save(
            os.path.join(scene_dir, "depth", f"{i}.png"))
        pose = np.eye(4)
        pose[0, 3] = 0.01 * i
        np.savetxt(os.path.join(scene_dir, "pose", f"{i}.txt"), pose)
    return ScanNetScene(scene_dir)
