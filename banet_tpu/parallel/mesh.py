"""Device-mesh construction for the named axes ``data`` and ``frame``.

All distribution in this framework is expressed against these two axes
(SURVEY.md §2.5 — the reference has no distributed backend at all):

- ``data``: independent pairs/windows (pure data parallelism; psum of
  loss gradients is inserted by the SPMD partitioner);
- ``frame``: keyframe-window sharding for window BA — the CP analogue
  for this CNN+GN workload (per-frame normal-equation blocks computed
  locally, tiny Schur terms psum'd over ICI).

On multi-host systems ``jax.devices()`` already enumerates the global
device set and ``Mesh`` lays axes out so that the fastest-varying axis
rides ICI; DCN-crossing axes should be the ``data`` axis (gradient
psum amortizes over a whole step).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: Optional[int] = None, frame: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes ("data", "frame"); data defaults to n_dev/frame."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % frame == 0, (n, frame)
        data = n // frame
    assert data * frame <= n, (data, frame, n)
    arr = np.asarray(devices[: data * frame]).reshape(data, frame)
    return Mesh(arr, ("data", "frame"))


def local_mesh() -> Mesh:
    """Single-process mesh over whatever devices exist (1 TPU chip in
    the bench environment; 8 virtual CPUs under the test conftest)."""
    return make_mesh(frame=1)
