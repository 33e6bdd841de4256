"""Regression: the init-recon bailout threshold (round-5 s22 outlier).

At s22 the post-init survivor adjacency (17.49M edges) sat 10% past the
old E/8 bailout, tripping the expensive fallback (an _ensure_alive device
dispatch + packed S-bit download + full-slot-space host unpack) and
producing the non-monotone s21/s22/s23 scaling datum the round-4 verdict
flagged (#4). The native host pass costs ~6 ms per M survivor edges, so
with the native library present recon must engage all the way to
total == E; only the multi-pass numpy fallback keeps the E/8 cut.
"""

import numpy as np
import pytest

from fuzzypatternmatching_tpu import native
from fuzzypatternmatching_tpu.engine import init_recon
from fuzzypatternmatching_tpu.graph.csr import from_edges
from fuzzypatternmatching_tpu.pattern.pattern_graph import load_pattern_graph

from test_pattern import write_tree_pattern


def _tree_tiles(n_copies=256):
    """Graph = disjoint copies of the 7-vertex pattern tree with the
    pattern's own labels: every vertex survives the init superstep, so the
    survivor adjacency is exactly E (maximally past the old E/8 cut)."""
    e = np.array(
        [[0, 1], [1, 0], [1, 2], [1, 3], [2, 1], [3, 1], [3, 5], [4, 5],
         [5, 3], [5, 4], [5, 6], [6, 5]], dtype=np.int64
    )
    offs = 7 * np.arange(n_copies, dtype=np.int64)
    src = (e[:, 0][None, :] + offs[:, None]).ravel()
    dst = (e[:, 1][None, :] + offs[:, None]).ravel()
    g = from_edges(src, dst, num_vertices=7 * n_copies)
    labels = np.tile(np.array([3, 4, 7, 2, 3, 5, 7], np.int64), n_copies)
    return g, labels


def _live_and_pairs(g, labels, pattern):
    """Host-truth: post-init live rows + the accepted (row, col, edge)."""
    lab_tv = pattern.label_match_bitset(np.asarray(labels)).astype(np.uint32)
    am = init_recon.or_over_bits_np(pattern, lab_tv)
    cols = np.asarray(g.cols)
    er = np.asarray(g.edge_row)
    acc = (lab_tv[cols] & am[er]) != 0
    tn = np.zeros(g.num_vertices, dtype=np.uint32)
    rows_e = er[acc]
    if len(rows_e):
        uniq, starts = np.unique(rows_e, return_index=True)
        tn[uniq] = np.bitwise_or.reduceat(lab_tv[cols][acc], starts)
    tv = lab_tv & init_recon.keep_mask_np(pattern, tn)
    live = tv != 0
    keep = acc & live[er]
    idx = np.nonzero(keep)[0]
    return live, (er[idx].astype(np.int64), cols[idx].astype(np.int64), idx)


def test_recon_engages_past_eighth_threshold(tmp_path):
    # A workload where every row survives init, so the survivor adjacency
    # is E — far past the old E/8 bailout.
    g, labels = _tree_tiles()
    pattern = load_pattern_graph(write_tree_pattern(tmp_path))
    live, want = _live_and_pairs(g, labels, pattern)
    deg = np.diff(g.row_ptr)
    total = int(deg[live].sum())
    assert total > g.num_edges // 8, "fixture must exceed the numpy cut"

    lab_tv = pattern.label_match_bitset(np.asarray(labels)).astype(np.uint32)
    out = init_recon.recon_pairs(g, pattern, lab_tv, live)
    if not native.available():
        pytest.skip("native library unavailable: numpy path keeps E/8 cut")
    assert out is not None, (
        "recon bailed out below E with the native path available "
        "(the round-5 s22 regression)"
    )
    for got, exp in zip(out, want):
        assert np.array_equal(got, exp)


def test_numpy_path_matches_native(tmp_path, monkeypatch):
    # Below the numpy path's absolute floor (1 << 22) the multi-pass numpy
    # recon still runs; it must produce the identical pairs.
    g, labels = _tree_tiles()
    pattern = load_pattern_graph(write_tree_pattern(tmp_path))
    live, want = _live_and_pairs(g, labels, pattern)
    monkeypatch.setattr(native, "available", lambda: False)
    lab_tv = pattern.label_match_bitset(np.asarray(labels)).astype(np.uint32)
    out = init_recon.recon_pairs(g, pattern, lab_tv, live)
    assert out is not None
    for got, exp in zip(out, want):
        assert np.array_equal(got, exp)
