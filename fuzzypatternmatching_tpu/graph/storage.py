"""Persistent sharded graph storage — the distributed_db equivalent.

The reference persists the graph as one mmap file per rank with a validated
header (uuid, rank, size, clean_close; reference:
include/havoqgt/distributed_db.hpp:88-93, 258-286, 353-359) plus a
``transfer`` utility that copies the rank files to/from backup storage
(distributed_db.hpp:106-186). Here each shard is a .npz of contiguous
vertex-block CSR slices plus a JSON header with the same validation fields.
The graph is the checkpoint: a search reopens the stored shards
(run_pattern_matching_beta.cpp:213).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid as uuid_mod

import numpy as np

from .csr import Graph

_FORMAT_VERSION = 1


def _meta_path(base: str) -> str:
    return os.path.join(base, "meta.json")


def _shard_path(base: str, r: int, n: int) -> str:
    # mirrors the reference's "<base>_<rank>_of_<size>" naming
    return os.path.join(base, f"shard_{r}_of_{n}.npz")


def save(
    graph: Graph,
    base: str,
    num_shards: int = 1,
    labels: np.ndarray | None = None,
    edge_data: np.ndarray | None = None,
) -> None:
    """Partition the graph into ``num_shards`` contiguous vertex blocks and
    write one file per shard plus the validated header."""
    os.makedirs(base, exist_ok=True)
    v = graph.num_vertices
    block = -(-v // num_shards)
    meta = {
        "uuid": str(uuid_mod.uuid4()),
        "version": _FORMAT_VERSION,
        "num_shards": num_shards,
        "num_vertices": v,
        "num_edges": graph.num_edges,
        "block_size": block,
        "has_labels": labels is not None,
        "has_edge_data": edge_data is not None,
        "clean_close": False,
    }
    with open(_meta_path(base), "w") as f:
        json.dump(meta, f)

    for r in range(num_shards):
        lo, hi = r * block, min((r + 1) * block, v)
        e_lo, e_hi = int(graph.row_ptr[lo]), int(graph.row_ptr[hi])
        arrays = {
            "row_ptr": graph.row_ptr[lo : hi + 1] - graph.row_ptr[lo],
            "cols": graph.cols[e_lo:e_hi],
            "rev_edge": graph.rev_edge[e_lo:e_hi],
            "raw_degree": graph.raw_degree[lo:hi],
            "edge_start": np.int64(e_lo),
        }
        if labels is not None:
            arrays["labels"] = labels[lo:hi]
        if edge_data is not None:
            arrays["edge_data"] = edge_data[e_lo:e_hi]
        np.savez(_shard_path(base, r, num_shards), **arrays)

    meta["clean_close"] = True
    with open(_meta_path(base), "w") as f:
        json.dump(meta, f)


def load(base: str) -> tuple[Graph, np.ndarray | None, np.ndarray | None]:
    """Reassemble the global graph from shard files, validating the header
    like db_open (distributed_db.hpp:258-286)."""
    with open(_meta_path(base)) as f:
        meta = json.load(f)
    if meta.get("version") != _FORMAT_VERSION:
        raise ValueError(f"graph DB version mismatch: {meta.get('version')}")
    if not meta.get("clean_close", False):
        raise ValueError("graph DB corrupt: not closed cleanly")
    n = meta["num_shards"]
    v = meta["num_vertices"]

    row_parts, col_parts, rev_parts, deg_parts = [], [], [], []
    lab_parts, ed_parts = [], []
    for r in range(n):
        path = _shard_path(base, r, n)
        if not os.path.exists(path):
            raise ValueError(f"graph DB corrupt: missing shard {r} of {n}")
        z = np.load(path)
        e_lo = int(z["edge_start"])
        row_parts.append(z["row_ptr"][:-1] + e_lo)
        col_parts.append(z["cols"])
        rev_parts.append(z["rev_edge"])
        deg_parts.append(z["raw_degree"])
        if meta["has_labels"]:
            lab_parts.append(z["labels"])
        if meta["has_edge_data"]:
            ed_parts.append(z["edge_data"])

    cols = np.concatenate(col_parts)
    row_ptr = np.concatenate(row_parts + [np.array([cols.shape[0]], dtype=np.int64)])
    edge_row = np.repeat(np.arange(v, dtype=np.int64), np.diff(row_ptr))
    graph = Graph(
        num_vertices=v,
        row_ptr=row_ptr,
        cols=cols,
        rev_edge=np.concatenate(rev_parts),
        raw_degree=np.concatenate(deg_parts),
        edge_row=edge_row,
    )
    labels = np.concatenate(lab_parts) if meta["has_labels"] else None
    edge_data = np.concatenate(ed_parts) if meta["has_edge_data"] else None
    return graph, labels, edge_data


def transfer(src_base: str, dst_base: str) -> None:
    """Copy a graph DB directory (distributed_db::transfer,
    distributed_db.hpp:106-186), validating the source header first."""
    with open(_meta_path(src_base)) as f:
        meta = json.load(f)
    if not meta.get("clean_close", False):
        raise ValueError("refusing to transfer a dirty graph DB")
    os.makedirs(dst_base, exist_ok=True)
    for name in os.listdir(src_base):
        shutil.copyfile(os.path.join(src_base, name), os.path.join(dst_base, name))
