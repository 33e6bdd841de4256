import os

import numpy as np
import pytest

from fuzzypatternmatching_tpu.pattern.nonlocal_constraint import load_nonlocal_constraints
from fuzzypatternmatching_tpu.pattern.pattern_graph import load_pattern_graph

REF_PATTERN = "/root/reference/examples/rmat_log2_tree_pattern/0/pattern"


def write_tree_pattern(tmp_path):
    """The rmat_log2_tree_pattern corpus (7-vertex tree, diameter 8)."""
    (tmp_path / "pattern_edge").write_text(
        "0 1\n1 0\n1 2\n1 3\n2 1\n3 1\n3 5\n4 5\n5 3\n5 4\n5 6\n6 5\n"
    )
    (tmp_path / "pattern_vertex_data").write_text(
        "0 3\n1 4\n2 7\n3 2\n4 3\n5 5\n6 7\n"
    )
    (tmp_path / "pattern_stat").write_text("diameter : 8\n")
    (tmp_path / "pattern_nlc").write_text(
        "3 5 2 4 3 : 4 5 3 1 0 : 3 : 0 : 1 : 0\n"
        "3 4 2 5 3 : 0 1 3 5 4 : 3 : 0 : 1 : 0\n"
        "7 4 2 5 7 : 2 1 3 5 6 : 3 : 0 : 1 : 0\n"
        "7 5 2 4 7 : 6 5 3 1 2 : 3 : 0 : 1 : 0\n"
        "3 4 7 4 2 5 3 5 7 : 0 1 2 1 3 5 4 5 6 : 7 : 0 : 1 : 0\n"
    )
    (tmp_path / "pattern_non_local_constraint").write_text(
        "4 5 3 1 0 : 0 1 2 3 4 : 0 0 0 0 0\n"
        "0 1 3 5 4 : 0 1 2 3 4 : 0 0 0 0 0\n"
        "2 1 3 5 6 : 0 1 2 3 4 : 0 0 0 0 0\n"
        "6 5 3 1 2 : 0 1 2 3 4 : 0 0 0 0 0\n"
        "0 1 2 1 3 5 4 5 6 : 0 1 2 1 4 5 6 5 8 : 0 1 1 1 1 1 1 1 1\n"
    )
    return str(tmp_path / "pattern")


def test_tree_pattern_graph(tmp_path):
    prefix = write_tree_pattern(tmp_path)
    p = load_pattern_graph(prefix)
    assert p.vertex_count == 7
    assert p.edge_count == 12
    assert p.diameter == 8
    assert list(p.vertex_data) == [3, 4, 7, 2, 3, 5, 7]
    assert list(p.neighbors(1)) == [0, 2, 3]
    assert list(p.neighbors(5)) == [3, 4, 6]
    # all-mandatory template: bitset == union bitset
    assert np.array_equal(p.edges_bitset, p.edges_bitset_all)
    assert p.edges_bitset[1] == (1 << 0) | (1 << 2) | (1 << 3)
    assert np.all(p.min_optional_edge_count == -1)


def test_tree_nlc(tmp_path):
    prefix = write_tree_pattern(tmp_path)
    cs = load_nonlocal_constraints(prefix)
    assert len(cs) == 5
    c0 = cs[0]
    assert list(c0.labels) == [3, 5, 2, 4, 3]
    assert list(c0.indices) == [4, 5, 3, 1, 0]
    assert c0.cycle_length == 3
    assert not c0.valid_cycle
    assert c0.interleave_lcc
    assert not c0.selected_vertices
    assert not c0.is_tds
    c4 = cs[4]
    assert c4.is_tds  # enumeration indices revisit position 1
    assert list(c4.enumeration) == [0, 1, 2, 1, 4, 5, 6, 5, 8]
    assert c4.cycle_length == 7


def test_label_match_bitset(tmp_path):
    prefix = write_tree_pattern(tmp_path)
    p = load_pattern_graph(prefix)
    labels = np.array([3, 4, 7, 9], dtype=np.uint64)
    tv = p.label_match_bitset(labels)
    assert tv[0] == (1 << 0) | (1 << 4)  # label 3 matches template 0 and 4
    assert tv[1] == (1 << 1)
    assert tv[2] == (1 << 2) | (1 << 6)
    assert tv[3] == 0


@pytest.mark.skipif(
    not os.path.exists(REF_PATTERN + "_edge"), reason="reference corpus absent"
)
def test_reference_corpus_parses_identically(tmp_path):
    ours = load_pattern_graph(write_tree_pattern(tmp_path))
    ref = load_pattern_graph(REF_PATTERN)
    assert np.array_equal(ours.row_ptr, ref.row_ptr)
    assert np.array_equal(ours.cols, ref.cols)
    assert np.array_equal(ours.vertex_data, ref.vertex_data)
    assert ours.diameter == ref.diameter
    ours_c = load_nonlocal_constraints(write_tree_pattern(tmp_path))
    ref_c = load_nonlocal_constraints(REF_PATTERN)
    assert len(ours_c) == len(ref_c)
    for a, b in zip(ours_c, ref_c):
        assert np.array_equal(a.labels, b.labels)
        assert np.array_equal(a.indices, b.indices)
        assert np.array_equal(a.enumeration, b.enumeration)
        assert (a.cycle_length, a.valid_cycle, a.is_tds) == (
            b.cycle_length,
            b.valid_cycle,
            b.is_tds,
        )
