"""Timestamp association between asynchronous sensor streams.

Equivalent of the TUM benchmark's ``associate`` vendored by the
reference (reference legacy/deeptam/python/deeptam_tracker/evaluation/
rgbd_benchmark/associate.py:71): greedily match two timestamp lists by
minimal |t_a - (t_b + offset)| under a max-difference gate, each element
used at most once.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple


def associate(stamps_a: Sequence[float], stamps_b: Sequence[float],
              offset: float = 0.0,
              max_difference: float = 0.02) -> List[Tuple[int, int]]:
    """Return index pairs (ia, ib) of matched timestamps.

    Matches are chosen greedily in order of increasing time difference
    (the TUM benchmark's semantics).
    """
    candidates = []
    for ia, ta in enumerate(stamps_a):
        for ib, tb in enumerate(stamps_b):
            d = abs(ta - (tb + offset))
            if d < max_difference:
                candidates.append((d, ia, ib))
    candidates.sort()
    used_a, used_b = set(), set()
    matches = []
    for d, ia, ib in candidates:
        if ia not in used_a and ib not in used_b:
            used_a.add(ia)
            used_b.add(ib)
            matches.append((ia, ib))
    matches.sort()
    return matches
