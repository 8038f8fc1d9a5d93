"""Structured metrics logging.

The reference's only observability is print statements (SURVEY.md §5;
trajectories go to stdout at seq_example.py:180).  Here: a tiny JSONL
metrics logger — append-only, host-side, crash-safe (line-buffered) —
plus stdout mirroring.  Deliberately dependency-free.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, mirror_stdout: bool = True):
        self._f = open(path, "a", buffering=1) if path else None
        self._mirror = mirror_stdout
        self._t0 = time.time()

    def log(self, step: int, **metrics: Any) -> None:
        rec: Dict[str, Any] = {"step": int(step),
                               "wall_s": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        line = json.dumps(rec)
        if self._f:
            self._f.write(line + "\n")
        if self._mirror:
            print(line, file=sys.stdout, flush=True)

    def close(self) -> None:
        if self._f:
            self._f.close()
