"""File-format readers used by the evaluation drivers.

Equivalents of the reference's ad-hoc loaders:
- ``read_pfm``: PFM depth maps (reference legacy/example.py:35-70 —
  header, little/big-endian scale, vertically flipped payload);
- ``read_motion_bin``: 7-float binary (quaternion wxyz + translation)
  ground-truth motion files (legacy/example.py:103-107), quaternion
  normalized like the reference;
- ``read_pair_list``/``read_tum_groundtruth``: the pair-evaluation
  inputs (legacy/eval.py:36-63 ``load_pair``/``load_data`` over
  test.txt / samples2.txt).
"""

from __future__ import annotations

import re
import struct
from typing import Dict, List, Tuple

import numpy as np


def read_pfm(path: str) -> Tuple[np.ndarray, float]:
    """Returns (data, scale); data is (H, W) or (H, W, 3) float32,
    flipped to row-0-on-top like the reference."""
    with open(path, "rb") as f:
        header = f.readline().rstrip().decode("ascii")
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError(f"{path}: not a PFM file")
        m = re.match(r"^(\d+)\s(\d+)\s*$",
                     f.readline().decode("ascii"))
        if not m:
            raise ValueError(f"{path}: malformed PFM header")
        width, height = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().decode("ascii").rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    data = np.flipud(data.reshape(shape)).astype(np.float32)
    return np.ascontiguousarray(data), scale


def write_pfm(path: str, data: np.ndarray, scale: float = 1.0) -> None:
    data = np.asarray(data, np.float32)
    color = data.ndim == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        f.write(f"{-scale:.6f}\n".encode())  # little-endian
        np.flipud(data).astype("<f").tofile(f)


def read_motion_bin(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (quaternion wxyz (4,), translation (3,)), quaternion
    normalized (legacy/example.py:103-107)."""
    with open(path, "rb") as f:
        vals = struct.unpack("f" * 7, f.read(28))
    m = np.asarray(vals, np.float64)
    q = m[:4] / np.linalg.norm(m[:4])
    return q.astype(np.float32), m[4:].astype(np.float32)


def read_pair_list(path: str) -> List[List[str]]:
    """test.txt format: image-timestamp tokens grouped into
    mini-sequences separated by blank lines (legacy/eval.py:36-47)."""
    groups: List[List[str]] = [[]]
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                if groups[-1]:
                    groups.append([])
                continue
            groups[-1].extend(line.split())
    if groups and not groups[-1]:
        groups.pop()
    return groups


def read_tum_groundtruth(path: str) -> Dict[str, Dict]:
    """samples2.txt format: "timestamp tx ty tz qx qy qz qw depth_ts"
    (legacy/eval.py:49-63).  Keyed by the timestamp string."""
    out: Dict[str, Dict] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 8 or parts[0].startswith("#"):
                continue
            rec = {
                "t": np.asarray([float(v) for v in parts[1:4]]),
                "q": np.asarray([float(v) for v in parts[4:8]]),  # xyzw
            }
            if len(parts) > 8:
                rec["depth"] = parts[8]
            out[parts[0]] = rec
    return out
