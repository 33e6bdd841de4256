import numpy as np

from fuzzypatternmatching_tpu.graph import storage
from fuzzypatternmatching_tpu.graph.csr import (
    degree_labels,
    from_edges,
    grid_graph,
)


def test_grid_graph_structure():
    # 3x5 grid mirrors the reference's static fixture
    # (test/include/input_graph.hpp:1-68)
    src, dst = grid_graph(3, 5)
    g = from_edges(src, dst)
    assert g.num_vertices == 15
    assert g.num_edges == 2 * (3 * 4 + 2 * 5)  # 22 undirected edges
    # corner degree 2, edge degree 3, interior degree 4
    assert g.degree(0) == 2
    assert g.degree(1) == 3
    assert g.degree(7) == 4
    assert sorted(g.neighbors(7).tolist()) == [2, 6, 8, 12]


def test_rev_edge_involution():
    src, dst = grid_graph(4, 4)
    g = from_edges(src, dst)
    assert np.all(g.rev_edge >= 0)
    # rev(rev(e)) == e and endpoints swap
    assert np.array_equal(g.rev_edge[g.rev_edge], np.arange(g.num_edges))
    assert np.array_equal(g.edge_row[g.rev_edge], g.cols)
    assert np.array_equal(g.cols[g.rev_edge], g.edge_row)


def test_duplicates_and_self_loops():
    src = np.array([0, 1, 0, 1, 2, 2, 2, 2])
    dst = np.array([1, 0, 1, 0, 2, 2, 0, 0])
    g = from_edges(src, dst, num_vertices=3)
    # raw degree keeps duplicates (matches reference degree semantics)
    assert g.degree(0) == 2
    assert g.degree(2) == 4
    # adjacency deduplicates
    assert list(g.neighbors(0)) == [1]
    assert sorted(g.neighbors(2).tolist()) == [0, 2]
    # self loop reverses to itself
    e_self = int(np.where((g.edge_row == 2) & (g.cols == 2))[0][0])
    assert g.rev_edge[e_self] == e_self
    # (2,0) has no reverse (0,2) in this directed stream
    e20 = int(np.where((g.edge_row == 2) & (g.cols == 0))[0][0])
    assert g.rev_edge[e20] == -1


def test_degree_labels():
    src, dst = grid_graph(3, 5)
    g = from_edges(src, dst)
    lab = degree_labels(g)
    # ceil(log2(d+1)): d=2 -> 2, d=3 -> 2, d=4 -> 3
    assert lab[0] == 2
    assert lab[1] == 2
    assert lab[7] == 3


def test_storage_roundtrip(tmp_path):
    src, dst = grid_graph(3, 5)
    g = from_edges(src, dst)
    labels = degree_labels(g)
    base = str(tmp_path / "db")
    storage.save(g, base, num_shards=4, labels=labels)
    g2, labels2, _ = storage.load(base)
    assert g2.num_vertices == g.num_vertices
    assert np.array_equal(g2.row_ptr, g.row_ptr)
    assert np.array_equal(g2.cols, g.cols)
    assert np.array_equal(g2.rev_edge, g.rev_edge)
    assert np.array_equal(g2.raw_degree, g.raw_degree)
    assert np.array_equal(g2.edge_row, g.edge_row)
    assert np.array_equal(labels2, labels)
    # transfer copies and preserves validity
    dst_base = str(tmp_path / "backup")
    storage.transfer(base, dst_base)
    g3, _, _ = storage.load(dst_base)
    assert np.array_equal(g3.cols, g.cols)
