"""Fuzzy (APM) matching: optional edges + min-count thresholds
(approximate_pattern_matching/pattern_graph.hpp:588-623,
local_constraint_checking.hpp:1062-1113), end to end through the file
format, oracle, and engine."""

import numpy as np

from fuzzypatternmatching_tpu.engine.driver import MatchEngine
from fuzzypatternmatching_tpu.engine.oracle import MatchOracle
from fuzzypatternmatching_tpu.pattern.nonlocal_constraint import (
    load_nonlocal_constraints,
)
from fuzzypatternmatching_tpu.pattern.pattern_graph import load_pattern_graph
from fuzzypatternmatching_tpu.graph.csr import from_edges

from test_oracle import undirected


def write_fuzzy_pattern(tmp_path, require_optional: bool):
    """Template: 0(l1)=1(l2) mandatory; 0~2(l3) optional. With
    require_optional, vertex 0 needs >=1 optional neighbor class."""
    (tmp_path / "pattern_edge").write_text(
        "0 1 1\n0 2 0\n1 0 1\n2 0 0\n"
    )
    (tmp_path / "pattern_vertex_data").write_text("0 1\n1 2\n2 3\n")
    (tmp_path / "pattern_stat").write_text("diameter : 2\n")
    (tmp_path / "pattern_vertex_local_constraints").write_text(
        ("0 : 1\n" if require_optional else "0 : -1\n") + "1 : -1\n2 : 1\n"
    )
    # APM single-file NLC format: no non-local constraints
    (tmp_path / "pattern_non_local_constraints").write_text("")
    return str(tmp_path / "pattern")


def _run(prefix, g, labels):
    pattern = load_pattern_graph(prefix)
    constraints = load_nonlocal_constraints(prefix, pattern.vertex_data)
    oracle_r = MatchOracle(g, labels, pattern, constraints).run()
    engine_r = MatchEngine(g, labels, pattern, constraints).run()
    assert oracle_r.trace() == engine_r.trace()
    assert oracle_r.active_vertices == engine_r.active_vertices
    return engine_r


def test_fuzzy_parse(tmp_path):
    p = load_pattern_graph(write_fuzzy_pattern(tmp_path, True))
    assert p.edges_bitset[0] == 0b010  # mandatory: template 1
    assert p.edges_bitset_optional[0] == 0b100  # optional: template 2
    assert p.edges_bitset[2] == 0
    assert p.edges_bitset_optional[2] == 0b001
    assert list(p.min_optional_edge_count) == [1, -1, 1]


def test_optional_edge_not_required(tmp_path):
    # graph lacks the label-3 neighbor; with min_opt=-1 vertex 0 survives
    prefix = write_fuzzy_pattern(tmp_path, require_optional=False)
    src, dst = undirected([(0, 1)])
    g = from_edges(src, dst, num_vertices=2)
    r = _run(prefix, g, np.array([1, 2], dtype=np.uint64))
    assert set(r.active_vertices) == {0, 1}


def test_optional_edge_required_prunes(tmp_path):
    # same graph but vertex 0 requires >=1 optional neighbor -> prune out
    prefix = write_fuzzy_pattern(tmp_path, require_optional=True)
    src, dst = undirected([(0, 1)])
    g = from_edges(src, dst, num_vertices=2)
    r = _run(prefix, g, np.array([1, 2], dtype=np.uint64))
    assert r.active_vertices == {}


def test_optional_edge_required_satisfied(tmp_path):
    # add the label-3 neighbor: the fuzzy requirement is satisfiable
    prefix = write_fuzzy_pattern(tmp_path, require_optional=True)
    src, dst = undirected([(0, 1), (0, 2)])
    g = from_edges(src, dst, num_vertices=3)
    r = _run(prefix, g, np.array([1, 2, 3], dtype=np.uint64))
    assert set(r.active_vertices) == {0, 1, 2}
