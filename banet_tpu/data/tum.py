"""TUM RGB-D sequence loading.

Capability-equivalent of the DeepTAM harness's dataset layer the
reference vendors (reference evaluation/rgbd_sequence.py:14-397):

- parse a TUM sequence directory (``rgb.txt``, ``depth.txt``,
  ``groundtruth.txt``) and associate the three streams by timestamp;
- per-freiburg intrinsics table (rgbd_sequence.py:16-21);
- 16-bit depth PNGs scaled by 1/5000 m (rgbd_sequence.py:362,
  also legacy/seq_example.py:145);
- ground-truth poses as world-from-camera matrices.

Host-side: PIL + numpy.  (The C++ prefetching pipeline in
banet_tpu/runtime feeds decoded frames from this index.)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from banet_tpu.eval.associate import associate
from banet_tpu.eval.trajectory import pose_matrix

# fx, fy, cx, cy per freiburg camera (reference rgbd_sequence.py:16-21
# and the fr3 constants at legacy/seq_example.py:114).
TUM_INTRINSICS: Dict[str, Tuple[float, float, float, float]] = {
    "freiburg1": (517.3, 516.5, 318.6, 255.3),
    "freiburg2": (520.9, 521.0, 325.1, 249.7),
    "freiburg3": (535.4, 539.2, 320.1, 247.6),
}

DEPTH_SCALE = 5000.0


def intrinsics_for_sequence(path_or_name: str) -> np.ndarray:
    """[fx, fy, cx, cy]: an ``intrinsics.txt`` in the sequence directory
    (one line, 4 floats — written by our synthetic renderer and usable
    for calibrated rigs) wins; otherwise guessed from the freiburg
    sequence name (the benchmark's own convention — real TUM dirs carry
    no calibration file, reference rgbd_sequence.py:16-21)."""
    cal = os.path.join(path_or_name, "intrinsics.txt")
    if os.path.isdir(path_or_name) and os.path.exists(cal):
        with open(cal) as f:
            vals = [float(v) for v in f.read().split()[:4]]
        if len(vals) == 4:
            return np.asarray(vals, np.float32)
    name = os.path.basename(os.path.normpath(path_or_name)).lower()
    for key, vals in TUM_INTRINSICS.items():
        if key in name:
            return np.asarray(vals, np.float32)
    return np.asarray(TUM_INTRINSICS["freiburg3"], np.float32)


def _read_file_list(path: str) -> List[Tuple[float, List[str]]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1:]))
    return out


@dataclasses.dataclass
class Frame:
    timestamp: float
    rgb_path: str
    depth_path: str
    gt_pose: Optional[np.ndarray]  # 4x4 world-from-camera, or None

    def load_rgb(self) -> np.ndarray:
        from PIL import Image

        return np.asarray(Image.open(self.rgb_path).convert("RGB"),
                          np.float32)

    def load_depth(self) -> np.ndarray:
        from PIL import Image

        d = np.asarray(Image.open(self.depth_path), np.float32)
        return d / DEPTH_SCALE


class TumSequence:
    """Associated (rgb, depth[, groundtruth]) frame index for a TUM
    sequence directory."""

    def __init__(self, seq_dir: str, max_difference: float = 0.02):
        self.seq_dir = seq_dir
        self.intrinsics = intrinsics_for_sequence(seq_dir)
        rgb = _read_file_list(os.path.join(seq_dir, "rgb.txt"))
        depth = _read_file_list(os.path.join(seq_dir, "depth.txt"))
        gt_path = os.path.join(seq_dir, "groundtruth.txt")
        gt = _read_file_list(gt_path) if os.path.exists(gt_path) else []

        rd = associate([t for t, _ in rgb], [t for t, _ in depth],
                       max_difference=max_difference)
        frames: List[Frame] = []
        gt_stamps = [t for t, _ in gt]
        if gt:
            rg = dict(associate([rgb[ia][0] for ia, _ in rd], gt_stamps,
                                max_difference=max_difference))
        else:
            rg = {}
        for k, (ia, ib) in enumerate(rd):
            pose = None
            if k in rg:
                vals = [float(v) for v in gt[rg[k]][1]]
                pose = pose_matrix(np.array(vals[0:3]), np.array(vals[3:7]))
            frames.append(Frame(
                timestamp=rgb[ia][0],
                rgb_path=os.path.join(seq_dir, rgb[ia][1][0]),
                depth_path=os.path.join(seq_dir, depth[ib][1][0]),
                gt_pose=pose,
            ))
        self.frames = frames

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, i: int) -> Frame:
        return self.frames[i]

    def __iter__(self) -> Iterator[Frame]:
        return iter(self.frames)

    def groundtruth_trajectory(self):
        from banet_tpu.eval.trajectory import Trajectory

        stamps, poses = [], []
        for f in self.frames:
            if f.gt_pose is not None:
                stamps.append(f.timestamp)
                poses.append(f.gt_pose)
        return Trajectory(np.asarray(stamps), np.asarray(poses))


def write_fake_sequence(seq_dir: str, num_frames: int = 8,
                        size: Tuple[int, int] = (64, 96),
                        seed: int = 0) -> "TumSequence":
    """Materialize a tiny synthetic TUM-format sequence on disk (for
    tests and CI: no dataset downloads are possible in this
    environment).  Returns the loaded TumSequence."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    H, W = size
    os.makedirs(os.path.join(seq_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "depth"), exist_ok=True)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(num_frames):
        ts = 1000.0 + 0.05 * i
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        d16 = (rng.uniform(1.0, 4.0, (H, W)) * DEPTH_SCALE).astype(
            np.uint16)
        rp = f"rgb/{ts:.6f}.png"
        dp = f"depth/{ts:.6f}.png"
        Image.fromarray(img).save(os.path.join(seq_dir, rp))
        Image.fromarray(d16).save(os.path.join(seq_dir, dp))
        rgb_lines.append(f"{ts:.6f} {rp}")
        depth_lines.append(f"{ts:.6f} {dp}")
        gt_lines.append(f"{ts:.6f} {0.01*i:.6f} 0 0 0 0 0 1")
    for name, lines in [("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                        ("groundtruth.txt", gt_lines)]:
        with open(os.path.join(seq_dir, name), "w") as f:
            f.write("# fake sequence\n" + "\n".join(lines) + "\n")
    return TumSequence(seq_dir)
