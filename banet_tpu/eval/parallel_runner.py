"""Host-parallel sequence evaluation.

SURVEY.md §2.5's "host-parallel eval runner": shard a list of sequences
across JAX processes (one shard per host, keyed by
``jax.process_index()``), run odometry + metrics per sequence locally,
and gather the per-sequence results via ``jax.experimental.
multihost_utils``-style allgather of a fixed-size metrics array.

Single-process, the runner degrades to a plain loop; the multi-process
allgather branch runs for real in tests/test_multiprocess.py (2 OS
processes via ``jax.distributed`` + gloo CPU collectives) and the
sharding arithmetic is unit-tested with synthetic process ids.
Preserves ``seq_example.py`` loop semantics per sequence (the odometry
runner does).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import numpy as np


def shard_for_process(items: Sequence, process_index: int,
                      process_count: int) -> List:
    """Deterministic strided shard: item i -> process (i % count).

    Strided (not blocked) so long sequences interleave across hosts."""
    return [x for i, x in enumerate(items)
            if i % process_count == process_index]


def run_sharded_eval(
        sequences: Sequence[str],
        eval_one: Callable[[str], Dict[str, float]],
        metric_keys: Sequence[str] = ("ate_rmse", "rpe_trans_rmse"),
) -> Dict[str, Dict[str, float]]:
    """Evaluate ``sequences`` sharded over hosts; return
    {sequence: metrics} (complete on every host).

    ``eval_one`` runs entirely host-side (odometry + metrics); only the
    fixed-size result matrix crosses hosts, via an allgather when
    multi-process (psum of a one-hot-rowed matrix — each sequence's row
    is filled by exactly one host, zeros elsewhere).
    """
    pi = jax.process_index()
    pc = jax.process_count()
    mine = shard_for_process(list(range(len(sequences))), pi, pc)

    S, M = len(sequences), len(metric_keys)
    local = np.zeros((S, M), np.float64)
    filled = np.zeros((S,), np.float64)
    for i in mine:
        res = eval_one(sequences[i])
        local[i] = [float(res.get(k, np.nan)) for k in metric_keys]
        filled[i] = 1.0

    if pc > 1:  # exercised for real by tests/test_multiprocess.py
        # (2 OS processes over jax.distributed + gloo CPU collectives)
        from jax.experimental import multihost_utils

        total = multihost_utils.process_allgather(local).sum(axis=0)
        filled = multihost_utils.process_allgather(filled).sum(axis=0)
        local = total
    assert np.all(filled >= 1.0), "some sequences were not evaluated"

    return {seq: {k: local[i, j] for j, k in enumerate(metric_keys)}
            for i, seq in enumerate(sequences)}
