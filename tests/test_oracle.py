"""Hand-verifiable unit tests for the conformance oracle."""

import numpy as np

from fuzzypatternmatching_tpu.engine.oracle import MatchOracle
from fuzzypatternmatching_tpu.graph.csr import from_edges
from fuzzypatternmatching_tpu.pattern.nonlocal_constraint import NonLocalConstraint
from fuzzypatternmatching_tpu.pattern.pattern_graph import PatternGraph


def make_pattern(edges, labels, diameter):
    srcs = np.array([e[0] for e in edges], dtype=np.int64)
    dsts = np.array([e[1] for e in edges], dtype=np.int64)
    k = int(max(srcs.max(), dsts.max())) + 1
    order = np.argsort(srcs, kind="stable")
    row_ptr = np.zeros(k + 1, dtype=np.int64)
    np.add.at(row_ptr, srcs + 1, 1)
    return PatternGraph(
        vertex_count=k,
        edge_count=len(edges),
        row_ptr=np.cumsum(row_ptr),
        cols=dsts[order],
        vertex_data=np.array(labels, dtype=np.uint64),
        diameter=diameter,
    )


def undirected(pairs):
    src, dst = [], []
    for u, v in pairs:
        src += [u, v]
        dst += [v, u]
    return np.array(src), np.array(dst)


EDGE_PATTERN = make_pattern([(0, 1), (1, 0)], [1, 2], diameter=2)


def test_lcc_single_edge_all_survive():
    src, dst = undirected([(0, 1)])
    g = from_edges(src, dst, num_vertices=2)
    o = MatchOracle(g, np.array([1, 2], dtype=np.uint64), EDGE_PATTERN, [])
    r = o.run()
    assert set(r.active_vertices) == {0, 1}
    assert r.active_vertices[0] == 0b01
    assert r.active_vertices[1] == 0b10
    assert r.active_edges == {(0, 1), (1, 0)}
    assert r.iterations == 1


def test_lcc_prunes_unmatched_and_isolated():
    # 0-1 match; 2(label 2) only neighbors 3(label 9): both pruned
    src, dst = undirected([(0, 1), (2, 3)])
    g = from_edges(src, dst, num_vertices=4)
    o = MatchOracle(g, np.array([1, 2, 2, 9], dtype=np.uint64), EDGE_PATTERN, [])
    r = o.run()
    assert set(r.active_vertices) == {0, 1}
    # convergence trace: superstep 0 drops v2 (no valid parent) and v3
    lp0 = [row for row in r.rows if row.phase == "LP" and row.step == 0][0]
    assert lp0.active_vertices == 2


def test_lcc_cascade_pruning():
    # chain 0-1-2 labels 1,2,1; triangle-ish pattern needs both template
    # classes adjacent; add vertex 3 label 2 hanging off 2: template is a
    # path 0(1)-1(2); everything with a valid neighbor survives
    src, dst = undirected([(0, 1), (1, 2), (2, 3)])
    g = from_edges(src, dst, num_vertices=4)
    o = MatchOracle(g, np.array([1, 2, 1, 2], dtype=np.uint64), EDGE_PATTERN, [])
    r = o.run()
    assert set(r.active_vertices) == {0, 1, 2, 3}


TRI_PATTERN = make_pattern(
    [(0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1)], [1, 2, 3], diameter=2
)


def cycle_constraint():
    return NonLocalConstraint(
        labels=np.array([1, 2, 3, 1], dtype=np.uint64),
        indices=np.array([0, 1, 2, 0], dtype=np.int64),
        cycle_length=2,
        valid_cycle=True,
        interleave_lcc=True,
        selected_vertices=False,
    )


def test_nlcc_cycle_found_on_triangle():
    src, dst = undirected([(0, 1), (1, 2), (2, 0)])
    g = from_edges(src, dst, num_vertices=3)
    o = MatchOracle(
        g, np.array([1, 2, 3], dtype=np.uint64), TRI_PATTERN, [cycle_constraint()]
    )
    r = o.run()
    assert r.pattern_found == [True]
    assert set(r.active_vertices) == {0, 1, 2}


def test_nlcc_cycle_fails_on_path_graph():
    # path 0-1-2 has the labels but no cycle: source 0 invalidated, then the
    # interleaved LCC wipes everything
    src, dst = undirected([(0, 1), (1, 2)])
    g = from_edges(src, dst, num_vertices=3)
    o = MatchOracle(
        g, np.array([1, 2, 3], dtype=np.uint64), TRI_PATTERN, [cycle_constraint()]
    )
    r = o.run()
    assert r.pattern_found == [False]
    assert r.active_vertices == {}
    assert r.active_edges == set()


PATH_PATTERN = make_pattern([(0, 1), (1, 0)], [1, 2], diameter=2)


def path_constraint():
    # distinct same-label endpoints: walk template 0 -> 1 -> 0, must NOT
    # return to the source instance
    return NonLocalConstraint(
        labels=np.array([1, 2, 1], dtype=np.uint64),
        indices=np.array([0, 1, 0], dtype=np.int64),
        cycle_length=1,
        valid_cycle=False,
        interleave_lcc=True,
        selected_vertices=False,
    )


def test_nlcc_path_found_on_square():
    src, dst = undirected([(0, 1), (1, 2), (2, 3), (3, 0)])
    g = from_edges(src, dst, num_vertices=4)
    o = MatchOracle(
        g, np.array([1, 2, 1, 2], dtype=np.uint64), PATH_PATTERN, [path_constraint()]
    )
    r = o.run()
    assert r.pattern_found == [True]
    assert set(r.active_vertices) == {0, 1, 2, 3}


def test_nlcc_path_fails_on_single_edge():
    src, dst = undirected([(0, 1)])
    g = from_edges(src, dst, num_vertices=2)
    o = MatchOracle(
        g, np.array([1, 2], dtype=np.uint64), PATH_PATTERN, [path_constraint()]
    )
    r = o.run()
    assert r.pattern_found == [False]
    assert r.active_vertices == {}


def tds_constraint():
    # same walk as path_constraint but run through the TDS engine with
    # enumeration: all positions distinct
    return NonLocalConstraint(
        labels=np.array([1, 2, 1], dtype=np.uint64),
        indices=np.array([0, 1, 0], dtype=np.int64),
        cycle_length=1,
        valid_cycle=False,
        interleave_lcc=True,
        selected_vertices=False,
        enumeration=np.array([0, 1, 2], dtype=np.int64),
        is_tds=True,
    )


def test_tds_enumerates_subgraphs_on_square():
    src, dst = undirected([(0, 1), (1, 2), (2, 3), (3, 0)])
    g = from_edges(src, dst, num_vertices=4)
    o = MatchOracle(
        g, np.array([1, 2, 1, 2], dtype=np.uint64), PATH_PATTERN, [tds_constraint()]
    )
    r = o.run()
    assert r.pattern_found == [True]
    # walks: 0-1-2, 0-3-2, 2-1-0, 2-3-0 (the final vertex is repeated in the
    # tuple per the reference's output format semantics)
    walks = {t[:3] for t in r.subgraphs[0]}
    assert walks == {(0, 1, 2), (0, 3, 2), (2, 1, 0), (2, 3, 0)}
    for t in r.subgraphs[0]:
        assert t[3] == t[2]  # trailing "[final]" repeats the last vertex


def test_tds_dedup_free_counts_all_walks():
    # two parallel middles: 0-1-2 and 0-3-2 plus 0-5-2 -> 3 walks per
    # direction, 6 total
    src, dst = undirected([(0, 1), (1, 2), (0, 3), (3, 2), (0, 5), (5, 2)])
    g = from_edges(src, dst, num_vertices=6)
    labels = np.array([1, 2, 1, 2, 9, 2], dtype=np.uint64)
    o = MatchOracle(g, labels, PATH_PATTERN, [tds_constraint()])
    r = o.run()
    assert len(r.subgraphs[0]) == 6
