"""Edge-list file ingest.

Replaces parallel_edge_list_reader.hpp: files may have 2 columns
(``src dst``) or 3 (``src dst edge_data``) — the reference sniffs the column
count from the first file and broadcasts it
(parallel_edge_list_reader.hpp:184-198). ``undirected=True`` mirrors the
ingest driver's ``-u`` flag (src/ingest_edge_list.cpp) by emitting both
directions of every entry.
"""

from __future__ import annotations

import numpy as np


def read_edge_lists(
    paths: list[str], undirected: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Returns (src, dst, edge_data|None) as the concatenated directed
    stream in file order."""
    srcs, dsts, datas = [], [], []
    has_data = None
    for path in paths:
        arr = np.loadtxt(path, dtype=np.int64, ndmin=2)
        if arr.size == 0:
            continue
        cols = arr.shape[1]
        if has_data is None:
            has_data = cols >= 3
        srcs.append(arr[:, 0])
        dsts.append(arr[:, 1])
        if has_data:
            datas.append(arr[:, 2])
    if not srcs:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            None,
        )
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    data = np.concatenate(datas) if has_data else None
    if undirected:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
        if data is not None:
            data = np.concatenate([data, data])
    return src, dst, data
