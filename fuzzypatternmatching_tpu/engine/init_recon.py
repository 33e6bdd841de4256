"""Host-side reconstruction of the global init superstep's results.

After the INIT superstep alone (n_steps=1, no edge-metadata / counting
constraints) every quantity the LCC acceptance rule needs is a pure
function of (labels, graph, surviving-row set):

* the per-slot message is the sender's label bitset (tv == label_tv at
  init, nonunique_ee.hpp:552-624 fan-out with the initial candidates);
* a slot (v, u) is alive iff it was ACCEPTED — ``(label_tv[u] &
  or_over_bits(label_tv[v])) != 0`` — and its row v survived;
* a row survives iff it had >= 1 accepted slot and a nonzero keep mask,
  so tn(v) = OR of label_tv[u] over v's alive slots and
  tv(v) = label_tv[v] & keep_mask(tn(v)).

Walking the surviving rows' CSR ranges on the host therefore reproduces
the device's post-init (tv, alive) EXACTLY while only a V-bit live-row
bitmap crosses the device boundary (262 KB at s21 instead of the
V-sized tv + S-bit alive arrays, ~12 MB). Shared by the bucketed-ELL
engine (engine/lcc_bucketed.py) and the mesh data plane
(parallel/sharded.py) — one implementation, one contract.
"""

from __future__ import annotations

import numpy as np


def popcount_np(x: np.ndarray) -> np.ndarray:
    """uint32 population count (np.bitwise_count is numpy>=2-only)."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x)
    x = x - ((x >> np.uint32(1)) & np.uint32(0x55555555))
    x = (x & np.uint32(0x33333333)) + (
        (x >> np.uint32(2)) & np.uint32(0x33333333)
    )
    x = (x + (x >> np.uint32(4))) & np.uint32(0x0F0F0F0F)
    return (x * np.uint32(0x01010101)) >> np.uint32(24)


def keep_mask_np(pattern, tn: np.ndarray) -> np.ndarray:
    """Host (numpy) mirror of the engines' _keep_mask: fuzzy acceptance
    against mandatory + optional/min-count neighbor-class bitsets
    (local_constraint_checking.hpp:1062-1113)."""
    mand = np.asarray(pattern.edges_bitset, dtype=np.uint32)
    opt = np.asarray(pattern.edges_bitset_optional, dtype=np.uint32)
    opt_min = np.asarray(pattern.min_optional_edge_count)
    keep = np.zeros_like(tn)
    for i in range(pattern.vertex_count):
        ok = (mand[i] & ~tn) == 0
        if opt_min[i] > 0:
            t = opt[i] & tn
            ok = ok & (t == opt[i]) & (
                popcount_np(t) >= np.uint32(opt_min[i])
            )
        keep = keep | np.where(ok, np.uint32(1 << i), np.uint32(0))
    return keep


def or_over_bits_np(pattern, tv: np.ndarray) -> np.ndarray:
    """Host mirror of _or_over_bits: OR of per-template-vertex adjacency
    bitsets over the set bits of tv."""
    adj_all = np.asarray(pattern.edges_bitset_all, dtype=np.uint32)
    m = np.zeros_like(tv)
    for i in range(pattern.vertex_count):
        m = m | np.where((tv >> i) & 1 != 0, adj_all[i], np.uint32(0))
    return m


def recon_pairs(graph, pattern, label_tv: np.ndarray, live: np.ndarray):
    """Rebuild the post-init alive set from the V-bit live-row bitmap.

    Returns ``(rows, cols, edge_ids)`` in CSR row-major order (the
    alive_pairs contract of every engine), or ``None`` when the
    surviving adjacency is too large for a cheap host pass (the caller
    then falls back to the packed bitmap download).
    """
    rows = np.nonzero(live)[0]
    e0 = np.empty(0, np.int64)
    if len(rows) == 0:
        return e0, e0, e0
    rp = graph.row_ptr
    starts = rp[rows].astype(np.int64)
    lens = (rp[rows + 1] - rp[rows]).astype(np.int64)
    total = int(lens.sum())
    # native fast path: one threaded pass over the CSR ranges instead of
    # ~7 numpy passes (needs materialized contiguous int64 arrays — a
    # memmap-backed GraphDb uses the numpy accessor path below)
    cols_arr = getattr(graph, "cols", None)
    native_ok = (
        isinstance(cols_arr, np.ndarray)
        and cols_arr.dtype == np.int64
        and cols_arr.flags.c_contiguous
        and isinstance(rp, np.ndarray)
        and rp.dtype == np.int64
        and rp.flags.c_contiguous
    )
    if native_ok:
        from .. import native

        native_ok = native.available()
    # Bailout threshold: the host pass must beat the fallback (an
    # _ensure_alive device dispatch + tunnel round trip + S/8-byte packed
    # download + a full S-slot unpack/nonzero on the host — ~1.3 s at
    # s22). The native pass measures ~6 ms per M survivor edges (0.10 s
    # over the 17.5 M-edge s22 survivor set), so even a full-E pass wins;
    # the 7-pass numpy path keeps the conservative E/8 cut. Round 5: the
    # s22 scaling outlier (1.84 s vs 29 M edges/s at s21/s23) was exactly
    # this threshold — s22's survivor adjacency (17.49 M) sits 10% past
    # E/8 (15.91 M), tripping the fallback (docs/ROOFLINE.md round-5
    # scaling decomposition).
    limit = (
        graph.num_edges
        if native_ok
        else max(graph.num_edges // 8, 1 << 22)
    )
    if total > limit:
        return None  # weak pruning: the packed download is cheaper
    if native_ok:
        am = or_over_bits_np(pattern, label_tv[rows])
        return native.recon_pairs_native(
            rp, cols_arr,
            np.ascontiguousarray(label_tv, dtype=np.uint32),
            np.ascontiguousarray(am, dtype=np.uint32),
            rows.astype(np.int64), total,
        )
    csum = np.cumsum(lens)
    idx = np.arange(total, dtype=np.int64) + np.repeat(
        starts - np.concatenate(([0], csum[:-1])), lens
    )
    cols = graph.cols_at(idx).astype(np.int64)
    pb = label_tv[cols]
    am = or_over_bits_np(pattern, label_tv[rows])
    acc = (pb & np.repeat(am, lens)) != 0
    return np.repeat(rows.astype(np.int64), lens)[acc], cols[acc], idx[acc]


def recon_tv(
    pattern,
    label_tv: np.ndarray,
    num_vertices: int,
    arow: np.ndarray,
    acol: np.ndarray,
) -> np.ndarray:
    """Rebuild post-init tv from the alive pairs (see module docstring);
    ``arow`` must be row-sorted (every engine's alive_pairs contract)."""
    tv = np.zeros(num_vertices, dtype=np.uint32)
    if len(arow) == 0:
        return tv
    uniq, starts = np.unique(arow, return_index=True)  # arow is sorted
    tn = np.bitwise_or.reduceat(label_tv[acol], starts)
    tv[uniq] = label_tv[uniq] & keep_mask_np(pattern, tn)
    return tv
