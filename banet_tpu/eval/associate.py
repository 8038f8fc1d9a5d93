"""Timestamp association between asynchronous sensor streams.

Equivalent of the TUM benchmark's ``associate`` vendored by the
reference (reference legacy/deeptam/python/deeptam_tracker/evaluation/
rgbd_benchmark/associate.py:71): greedily match two timestamp lists by
minimal |t_a - (t_b + offset)| under a max-difference gate, each element
used at most once.

Unlike the reference (an O(A*B) double loop — ~10^7 Python iterations
on a full TUM sequence), candidates are enumerated by bisecting each
``a`` stamp into the sorted ``b`` stamps and walking only the entries
inside the gate, so cost is O(A log B + M) for M gated candidate pairs
(a handful per stamp at TUM rates).  The greedy selection order — and
therefore the output — is identical.
"""

from __future__ import annotations

import bisect
from typing import List, Sequence, Tuple


def associate(stamps_a: Sequence[float], stamps_b: Sequence[float],
              offset: float = 0.0,
              max_difference: float = 0.02) -> List[Tuple[int, int]]:
    """Return index pairs (ia, ib) of matched timestamps.

    Matches are chosen greedily in order of increasing time difference
    (the TUM benchmark's semantics).
    """
    # Sort b once; keep original indices for the output.
    b_sorted = sorted((tb + offset, ib) for ib, tb in enumerate(stamps_b))
    b_keys = [t for t, _ in b_sorted]
    candidates = []
    for ia, ta in enumerate(stamps_a):
        lo = bisect.bisect_left(b_keys, ta - max_difference)
        hi = bisect.bisect_right(b_keys, ta + max_difference)
        for k in range(lo, hi):
            d = abs(ta - b_keys[k])
            if d < max_difference:
                candidates.append((d, ia, b_sorted[k][1]))
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
