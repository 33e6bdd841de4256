"""Counting-LCC mode (label_propagation_pattern_matching_nonunique_
counting_ee.hpp): per-neighbor-label-class count thresholds."""

import numpy as np
import pytest

from fuzzypatternmatching_tpu.engine.driver import MatchEngine
from fuzzypatternmatching_tpu.engine.oracle import MatchOracle
from fuzzypatternmatching_tpu.graph.csr import from_edges
from fuzzypatternmatching_tpu.pattern.pattern_graph import PatternGraph

from test_engine_vs_oracle import _random_graph
from test_nlcc_device import _results_equal
from test_oracle import PATH_PATTERN, path_constraint, undirected


def _path_121():
    """Template 0-1-2 with labels 1-2-1: the middle vertex needs TWO
    distinct label-1 neighbors under counting, one class under base."""
    return PatternGraph(
        vertex_count=3,
        edge_count=4,
        row_ptr=np.array([0, 1, 3, 4]),
        cols=np.array([1, 0, 2, 1]),
        vertex_data=np.array([1, 2, 1], dtype=np.uint64),
        diameter=2,
    )


def test_neighbor_label_counts_table():
    classes, req = _path_121().neighbor_label_counts()
    assert list(classes) == [1, 2]
    # vertex 1 has two label-1 neighbors; vertices 0/2 one label-2 neighbor
    assert req[1, 0] == 2 and req[1, 1] == 0
    assert req[0, 1] == 1 and req[2, 1] == 1


ENGINES = ["flat", "bucketed", "sharded"]


@pytest.mark.parametrize("engine", ENGINES)
def test_counting_prunes_single_class_instance(engine):
    # path a(1)-b(2): base LCC keeps b (heard class 1); counting kills it
    # (needs 2 distinct label-1 neighbors), which then kills a too
    src, dst = undirected([(0, 1)])
    g = from_edges(src, dst, num_vertices=2)
    labels = np.array([1, 2], dtype=np.uint64)
    pat = _path_121()
    base = MatchEngine(g, labels, pat, [], lcc_engine=engine).run()
    cnt = MatchEngine(
        g, labels, pat, [], lcc_engine=engine, counting=True
    ).run()
    assert len(base.active_vertices) == 2
    assert len(cnt.active_vertices) == 0

    # a(1)-b(2)-c(1): both modes keep everything
    src, dst = undirected([(0, 1), (1, 2)])
    g3 = from_edges(src, dst, num_vertices=3)
    labels3 = np.array([1, 2, 1], dtype=np.uint64)
    cnt3 = MatchEngine(
        g3, labels3, pat, [], lcc_engine=engine, counting=True
    ).run()
    assert len(cnt3.active_vertices) == 3


@pytest.mark.parametrize("engine", ENGINES)
@pytest.mark.parametrize("seed", [0, 1, 4])
def test_counting_engine_matches_counting_oracle(seed, engine):
    g = _random_graph(seed, v=48, e=200)
    rng = np.random.RandomState(seed + 3)
    labels = rng.randint(1, 3, size=48).astype(np.uint64)
    cs = [path_constraint()]
    o = MatchOracle(g, labels, PATH_PATTERN, cs, counting=True).run()
    e = MatchEngine(
        g, labels, PATH_PATTERN, cs, lcc_engine=engine, counting=True,
        nlcc_mode="host",
    ).run()
    _results_equal(o, e)
    # and counting must prune at least as hard as base mode
    b = MatchEngine(g, labels, PATH_PATTERN, cs, lcc_engine=engine).run()
    assert set(e.active_vertices) <= set(b.active_vertices)


def test_counting_with_metadata_matches_oracle():
    """Counting composed with edge-metadata constraints (the acc_i gate is
    the per-(p, i, value) allow mask): all engines track the oracle."""
    from test_edge_metadata import graph_meta, meta_pattern

    src, dst = undirected([(0, 1), (1, 2), (1, 3), (3, 4)])
    g = from_edges(src, dst, num_vertices=5)
    labels = np.array([1, 2, 1, 1, 2], dtype=np.uint64)
    pat = meta_pattern(
        [(0, 1), (1, 0), (1, 2), (2, 1)], [1, 2, 1], [5, 5, 5, 5], diameter=2
    )
    ed = graph_meta(g, {(0, 1): 5, (1, 2): 5, (1, 3): 6, (3, 4): 5})
    o = MatchOracle(
        g, labels, pat, [], counting=True, edge_data=ed
    ).run()
    for engine in ENGINES:
        e = MatchEngine(
            g, labels, pat, [], lcc_engine=engine, counting=True,
            edge_data=ed,
        ).run()
        _results_equal(o, e)
