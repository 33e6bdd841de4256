"""Shared lazy-state helpers for the driver's compact continuation.

Both BucketedLccEngine (engine/lcc_bucketed.py) and ShardedLccEngine
(parallel/sharded.py) hold between-iteration states as pure host data:
``tv_np`` + sorted original CSR edge ids (the alive set) + TP-mark edge
ids. These helpers centralize the id normalization and TP-mark merge so
the two engines cannot drift apart semantically (the engine-vs-oracle
contract requires them to match exactly).
"""

from __future__ import annotations

import numpy as np


def normalized_edge_ids(edge_ids) -> np.ndarray:
    """Sorted int64 edge ids — ascending ids == CSR row-major pair order."""
    return np.sort(np.asarray(edge_ids, dtype=np.int64))


def normalized_flag_ids(flag_ids):
    return None if flag_ids is None else np.asarray(flag_ids, dtype=np.int64)


def merged_flag_ids(prev, tp_marks) -> np.ndarray:
    """Union of a lazy state's TP-mark ids with freshly marked edge ids."""
    base = prev if prev is not None else np.empty(0, dtype=np.int64)
    if not tp_marks:
        return base
    return np.union1d(base, np.asarray(list(tp_marks), dtype=np.int64))
