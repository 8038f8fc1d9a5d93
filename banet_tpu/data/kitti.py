"""KITTI odometry-benchmark sequence loading.

BASELINE config #5 names KITTI odometry sequences as the multi-host
workload; the reference has no KITTI support at all (its loaders are
TUM-only, reference legacy/deeptam/python/deeptam_tracker/evaluation/
rgbd_sequence.py:14), so this is a new capability with the standard
KITTI layout:

    dataset/
      sequences/<seq>/
        image_2/000000.png ...   left color frames (or image_0 gray)
        calib.txt                P0..P3 3x4 projections (+ Tr)
        times.txt                per-frame timestamps [s]
        depth/000000.png ...     OPTIONAL uint16 depth, meters*256
                                 (the KITTI depth-benchmark encoding;
                                 produced by the depth-annotation kit
                                 or any stereo/completion method)
      poses/<seq>.txt            GT 3x4 row-major cam0-to-world poses
                                 (sequences 00-10 only)

The feature-metric tracker needs metric depth at the sampled points, and
raw KITTI odometry ships none (only velodyne scans) — so depth frames
are looked up in ``depth/`` (or ``proj_depth/groundtruth/image_02/``,
the annotated-depth layout) and a sequence without either still loads
for GT/timestamp tooling but raises a clear error from ``load_depth``.

Exposes the same Frame/sequence interface as data/tum.py and
data/scannet.py so the odometry runner, pair evaluator, and CLI work
unchanged.  (Zero-egress environment: tests use
``write_fake_kitti_sequence``.)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

# KITTI depth-benchmark PNG encoding: uint16, meters * 256, 0 = invalid.
DEPTH_SCALE = 256.0


@dataclasses.dataclass
class KittiFrame:
    index: int
    timestamp: float
    color_path: str
    depth_path: Optional[str]
    pose: Optional[np.ndarray]  # 4x4 cam0-to-world, or None

    def load_rgb(self) -> np.ndarray:
        from PIL import Image

        return np.asarray(Image.open(self.color_path).convert("RGB"),
                          np.float32)

    def load_depth(self) -> np.ndarray:
        if self.depth_path is None:
            raise FileNotFoundError(
                "KITTI odometry ships no per-pixel depth; provide a "
                "depth/ (or proj_depth/groundtruth/image_02/) directory "
                "of uint16 meters*256 PNGs next to the image folder "
                "(banet_tpu/data/kitti.py docstring)")
        from PIL import Image

        d = np.asarray(Image.open(self.depth_path), np.float32)
        return d / DEPTH_SCALE

    @property
    def gt_pose(self):
        return self.pose


def _parse_calib(path: str) -> np.ndarray:
    """fx, fy, cx, cy of the camera actually used (P2 if color frames
    exist, else P0).  KITTI calib lines: ``P2: <12 floats>`` row-major
    3x4."""
    entries = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, vals = line.split(":", 1)
            try:
                entries[key.strip()] = np.asarray(
                    [float(v) for v in vals.split()])
            except ValueError:
                continue
    for key in ("P2", "P0"):
        if key in entries and entries[key].size == 12:
            P = entries[key].reshape(3, 4)
            return np.asarray([P[0, 0], P[1, 1], P[0, 2], P[1, 2]],
                              np.float32)
    raise ValueError(f"no P2/P0 projection in {path}")


class KittiOdometrySequence:
    """One ``sequences/<seq>`` directory (optionally with GT poses)."""

    def __init__(self, seq_dir: str, stride: int = 1):
        self.seq_dir = seq_dir
        img_dir = None
        for cand in ("image_2", "image_0", "image_3", "image_1"):
            p = os.path.join(seq_dir, cand)
            if os.path.isdir(p):
                img_dir = p
                break
        if img_dir is None:
            raise FileNotFoundError(
                f"no image_[0-3] directory under {seq_dir}")
        names = sorted(n for n in os.listdir(img_dir)
                       if n.endswith(".png") or n.endswith(".jpg"))

        times_path = os.path.join(seq_dir, "times.txt")
        times = (np.loadtxt(times_path).reshape(-1)
                 if os.path.exists(times_path) else None)

        poses = self._load_poses(seq_dir)

        cam = os.path.basename(img_dir).split("_")[1]
        depth_dirs = [os.path.join(seq_dir, "depth"),
                      os.path.join(seq_dir, "proj_depth", "groundtruth",
                                   f"image_0{cam}")]
        depth_dir = next((d for d in depth_dirs if os.path.isdir(d)),
                         None)

        frames: List[KittiFrame] = []
        for name in names[::stride]:
            idx = int(os.path.splitext(name)[0])
            dp = None
            if depth_dir is not None:
                cand = os.path.join(depth_dir, f"{idx:06d}.png")
                dp = cand if os.path.exists(cand) else None
            frames.append(KittiFrame(
                index=idx,
                # KITTI is a 10 Hz stream; synthesize stamps if
                # times.txt is absent.
                timestamp=(float(times[idx]) if times is not None
                           and idx < len(times) else idx / 10.0),
                color_path=os.path.join(img_dir, name),
                depth_path=dp,
                pose=(poses[idx] if poses is not None
                      and idx < len(poses) else None)))
        self.frames = frames
        self.intrinsics = _parse_calib(os.path.join(seq_dir, "calib.txt"))

    @staticmethod
    def _load_poses(seq_dir: str) -> Optional[np.ndarray]:
        seq_name = os.path.basename(os.path.normpath(seq_dir))
        candidates = [
            os.path.join(seq_dir, "poses.txt"),
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.normpath(seq_dir))), "poses",
                f"{seq_name}.txt"),
        ]
        for path in candidates:
            if os.path.exists(path):
                rows = np.loadtxt(path).reshape(-1, 12)
                poses = np.tile(np.eye(4), (rows.shape[0], 1, 1))
                poses[:, :3, :] = rows.reshape(-1, 3, 4)
                return poses
        return None

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, i: int) -> KittiFrame:
        return self.frames[i]

    def __iter__(self) -> Iterator[KittiFrame]:
        return iter(self.frames)

    def groundtruth_trajectory(self):
        from banet_tpu.eval.trajectory import Trajectory

        stamps, poses = [], []
        for f in self.frames:
            if f.pose is not None:
                stamps.append(f.timestamp)
                poses.append(f.pose)
        return Trajectory(np.asarray(stamps), np.asarray(poses))


def write_fake_kitti_sequence(root: str, seq: str = "00",
                              num_frames: int = 6,
                              size: Tuple[int, int] = (64, 96),
                              seed: int = 0,
                              with_depth: bool = True,
                              with_poses: bool = True
                              ) -> KittiOdometrySequence:
    """Materialize a tiny KITTI-layout dataset for tests (standard
    sequences/<seq> + poses/<seq>.txt tree)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    H, W = size
    seq_dir = os.path.join(root, "sequences", seq)
    os.makedirs(os.path.join(seq_dir, "image_2"), exist_ok=True)
    if with_depth:
        os.makedirs(os.path.join(seq_dir, "depth"), exist_ok=True)
    if with_poses:
        os.makedirs(os.path.join(root, "poses"), exist_ok=True)

    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        fx = fy = 80.0
        for key in ("P0", "P1", "P2", "P3"):
            P = [fx, 0.0, W / 2, 0.0, 0.0, fy, H / 2, 0.0,
                 0.0, 0.0, 1.0, 0.0]
            f.write(key + ": " + " ".join(f"{v:.6e}" for v in P) + "\n")
        f.write("Tr: " + " ".join(["0.0"] * 12) + "\n")
    np.savetxt(os.path.join(seq_dir, "times.txt"),
               np.arange(num_frames) / 10.0)

    pose_rows = []
    for i in range(num_frames):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            os.path.join(seq_dir, "image_2", f"{i:06d}.png"))
        if with_depth:
            d16 = (rng.uniform(2.0, 20.0, (H, W)) * DEPTH_SCALE).astype(
                np.uint16)
            Image.fromarray(d16).save(
                os.path.join(seq_dir, "depth", f"{i:06d}.png"))
        pose = np.eye(4)
        pose[0, 3] = 0.05 * i
        pose_rows.append(pose[:3, :].reshape(-1))
    if with_poses:
        np.savetxt(os.path.join(root, "poses", f"{seq}.txt"),
                   np.asarray(pose_rows))
    return KittiOdometrySequence(seq_dir)
