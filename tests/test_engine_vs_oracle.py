"""Equivalence: the JAX/vectorized engine must reproduce the oracle's
convergence trace, final active sets, found flags, and enumerated subgraphs
exactly."""

import numpy as np
import pytest

from fuzzypatternmatching_tpu.engine.driver import MatchEngine
from fuzzypatternmatching_tpu.engine.oracle import MatchOracle
from fuzzypatternmatching_tpu.generators.rmat import RmatParams, generate_edges
from fuzzypatternmatching_tpu.graph.csr import degree_labels, from_edges
from fuzzypatternmatching_tpu.pattern.nonlocal_constraint import (
    NonLocalConstraint,
    load_nonlocal_constraints,
)
from fuzzypatternmatching_tpu.pattern.pattern_graph import load_pattern_graph

from test_oracle import (
    EDGE_PATTERN,
    PATH_PATTERN,
    TRI_PATTERN,
    cycle_constraint,
    path_constraint,
    tds_constraint,
    undirected,
)
from test_pattern import write_tree_pattern


def assert_equivalent(g, labels, pattern, constraints, check_msgs=True):
    oracle_r = MatchOracle(g, labels, pattern, constraints).run()
    engine_r = MatchEngine(g, labels, pattern, constraints).run()
    o_rows = [(r.itr, r.phase, r.step, r.active_vertices, r.active_edges)
              for r in oracle_r.rows]
    e_rows = [(r.itr, r.phase, r.step, r.active_vertices, r.active_edges)
              for r in engine_r.rows]
    assert o_rows == e_rows
    if check_msgs:
        assert [r.messages for r in oracle_r.rows] == [
            r.messages for r in engine_r.rows
        ]
    assert oracle_r.pattern_found == engine_r.pattern_found
    assert oracle_r.iterations == engine_r.iterations
    assert oracle_r.active_vertices == engine_r.active_vertices
    assert oracle_r.active_edges == engine_r.active_edges
    o_subs = {k: sorted(v) for k, v in oracle_r.subgraphs.items()}
    e_subs = {k: sorted(v) for k, v in engine_r.subgraphs.items()}
    assert o_subs == e_subs
    return engine_r


def test_single_edge():
    src, dst = undirected([(0, 1)])
    g = from_edges(src, dst, num_vertices=2)
    assert_equivalent(g, np.array([1, 2], dtype=np.uint64), EDGE_PATTERN, [])


def test_pruning():
    src, dst = undirected([(0, 1), (2, 3)])
    g = from_edges(src, dst, num_vertices=4)
    assert_equivalent(g, np.array([1, 2, 2, 9], dtype=np.uint64), EDGE_PATTERN, [])


def test_cycle_triangle():
    src, dst = undirected([(0, 1), (1, 2), (2, 0)])
    g = from_edges(src, dst, num_vertices=3)
    assert_equivalent(
        g, np.array([1, 2, 3], dtype=np.uint64), TRI_PATTERN, [cycle_constraint()]
    )


def test_cycle_fails_on_path():
    src, dst = undirected([(0, 1), (1, 2)])
    g = from_edges(src, dst, num_vertices=3)
    assert_equivalent(
        g, np.array([1, 2, 3], dtype=np.uint64), TRI_PATTERN, [cycle_constraint()]
    )


def test_path_square():
    src, dst = undirected([(0, 1), (1, 2), (2, 3), (3, 0)])
    g = from_edges(src, dst, num_vertices=4)
    assert_equivalent(
        g, np.array([1, 2, 1, 2], dtype=np.uint64), PATH_PATTERN, [path_constraint()]
    )


def test_tds_square():
    src, dst = undirected([(0, 1), (1, 2), (2, 3), (3, 0)])
    g = from_edges(src, dst, num_vertices=4)
    assert_equivalent(
        g, np.array([1, 2, 1, 2], dtype=np.uint64), PATH_PATTERN, [tds_constraint()]
    )


def _random_graph(seed, v=64, e=200):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, v, size=e)
    w = rng.randint(0, v, size=e)
    src = np.concatenate([u, w])
    dst = np.concatenate([w, u])
    return from_edges(src, dst, num_vertices=v)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_random_graphs_with_tree_pattern(seed, tmp_path):
    prefix = write_tree_pattern(tmp_path)
    pattern = load_pattern_graph(prefix)
    constraints = load_nonlocal_constraints(prefix)
    g = _random_graph(seed, v=96, e=400)
    labels = degree_labels(g)
    assert_equivalent(g, labels, pattern, constraints)


@pytest.mark.parametrize("seed", [10, 11])
def test_random_labels_cycle_and_path(seed):
    g = _random_graph(seed, v=48, e=160)
    rng = np.random.RandomState(seed + 100)
    labels = rng.randint(1, 4, size=48).astype(np.uint64)
    assert_equivalent(g, labels, TRI_PATTERN, [cycle_constraint()])
    assert_equivalent(g, labels, PATH_PATTERN, [path_constraint(), tds_constraint()])


def test_rmat_s11_tree_corpus(tmp_path):
    parts = [
        generate_edges(
            RmatParams(seed=5489 + 3 * r, vertex_scale=11,
                       edge_count=(16 << 11) // 4, scramble=False)
        )
        for r in range(4)
    ]
    src = np.concatenate([p[0] for p in parts])
    dst = np.concatenate([p[1] for p in parts])
    g = from_edges(src, dst, num_vertices=1 << 11)
    prefix = write_tree_pattern(tmp_path)
    pattern = load_pattern_graph(prefix)
    constraints = load_nonlocal_constraints(prefix)
    assert_equivalent(g, degree_labels(g), pattern, constraints)


def selected_constraint():
    # aggregation mode: validates label-2 destinations that forwarded a
    # token during an earlier constraint run
    return NonLocalConstraint(
        labels=np.array([1, 2], dtype=np.uint64),
        indices=np.array([0, 1], dtype=np.int64),
        cycle_length=0,
        valid_cycle=False,
        interleave_lcc=True,
        selected_vertices=True,
    )


def test_selected_vertices_aggregation_validates():
    # constraint 0 (path) makes middles 1,3 forward sources 0,2; the
    # selected constraint then validates those destinations -> no pruning
    src, dst = undirected([(0, 1), (1, 2), (2, 3), (3, 0)])
    g = from_edges(src, dst, num_vertices=4)
    labels = np.array([1, 2, 1, 2], dtype=np.uint64)
    r = assert_equivalent(
        g, labels, PATH_PATTERN, [path_constraint(), selected_constraint()]
    )
    assert r.pattern_found == [True, True]
    assert len(r.active_vertices) == 4


def test_selected_vertices_without_prior_forwarding_prunes():
    # selected constraint alone: empty aggregation sets -> all destinations
    # fail -> full prune-out
    src, dst = undirected([(0, 1), (1, 2), (2, 3), (3, 0)])
    g = from_edges(src, dst, num_vertices=4)
    labels = np.array([1, 2, 1, 2], dtype=np.uint64)
    r = assert_equivalent(g, labels, PATH_PATTERN, [selected_constraint()])
    assert r.pattern_found == [False]
    assert r.active_vertices == {}


UNI_PATTERN = None  # built lazily (make_pattern imported from test_oracle)


def _uni_pattern():
    global UNI_PATTERN
    if UNI_PATTERN is None:
        from test_oracle import make_pattern

        UNI_PATTERN = make_pattern([(0, 1), (1, 0)], [1, 1], diameter=2)
    return UNI_PATTERN


def uniform_path_nem():
    return NonLocalConstraint(
        labels=np.array([1, 1, 1], dtype=np.uint64),
        indices=np.array([0, 1, 0], dtype=np.int64),
        cycle_length=1,
        valid_cycle=False,
        interleave_lcc=True,
        selected_vertices=False,
    )


def tds_selected_constraint(valid_cycle=False, cycle_length=1):
    # selected-vertices TDS: walks start at sources holding forwarded keys,
    # one token per remembered original source as the expected target
    return NonLocalConstraint(
        labels=np.array([1] * (cycle_length + 2), dtype=np.uint64),
        indices=np.array(
            [0] + list(range(1, cycle_length + 1)) + [0], dtype=np.int64
        ),
        cycle_length=cycle_length,
        valid_cycle=valid_cycle,
        interleave_lcc=True,
        selected_vertices=True,
        enumeration=np.arange(cycle_length + 2, dtype=np.int64),
        is_tds=True,
    )


def test_tds_selected_path_on_square():
    # uniform labels: the nem path run makes every vertex forward every
    # neighbor's token; the selected TDS then walks from each (holder,
    # remembered source) pair and validates the remembered sources
    src, dst = undirected([(0, 1), (1, 2), (2, 3), (3, 0)])
    g = from_edges(src, dst, num_vertices=4)
    labels = np.ones(4, dtype=np.uint64)
    pat = _uni_pattern()
    r = assert_equivalent(
        g, labels, pat, [uniform_path_nem(), tds_selected_constraint()]
    )
    assert r.pattern_found == [True, True]
    assert len(r.subgraphs[1]) > 0


def test_tds_selected_cycle_never_self_validates():
    # a vertex never forwards its own token, so (v, v) keys do not exist
    # and cycle acceptance (final == target == walk start) cannot fire:
    # the selected cycle TDS prunes everything, identically in both engines
    src, dst = undirected([(0, 1), (1, 2), (2, 0)])
    g = from_edges(src, dst, num_vertices=3)
    labels = np.ones(3, dtype=np.uint64)
    pat = _uni_pattern()
    r = assert_equivalent(
        g,
        labels,
        pat,
        [uniform_path_nem(), tds_selected_constraint(valid_cycle=True, cycle_length=2)],
    )
    assert r.pattern_found[1] is False


def test_nonselected_tds_clears_forwarded_sets():
    # [nem, tds, selected]: the non-selected TDS run must wipe the
    # forwarded sets (beta.cpp:791-793), so the trailing selected
    # constraint sees nothing and prunes — engine must track the oracle
    src, dst = undirected([(0, 1), (1, 2), (2, 3), (3, 0)])
    g = from_edges(src, dst, num_vertices=4)
    labels = np.array([1, 2, 1, 2], dtype=np.uint64)
    r = assert_equivalent(
        g,
        labels,
        PATH_PATTERN,
        [path_constraint(), tds_constraint(), selected_constraint()],
    )
    assert r.pattern_found[2] is False
    assert r.active_vertices == {}


@pytest.mark.parametrize("seed", [20, 21, 22])
def test_tds_selected_random_graphs(seed):
    g = _random_graph(seed, v=32, e=96)
    labels = np.ones(32, dtype=np.uint64)
    pat = _uni_pattern()
    assert_equivalent(
        g, labels, pat, [uniform_path_nem(), tds_selected_constraint()]
    )


def test_rmat_cyclic_pattern():
    """BASELINE config 3: cyclic pattern with NLCC token passing on RMAT.
    Triangle template over degree labels with a cycle-closure constraint."""
    g = _rmat_s11()
    labels = degree_labels(g)
    tri = make_pattern_tri()
    c = NonLocalConstraint(
        labels=np.array([4, 5, 6, 4], dtype=np.uint64),
        indices=np.array([0, 1, 2, 0], dtype=np.int64),
        cycle_length=2,
        valid_cycle=True,
        interleave_lcc=True,
        selected_vertices=False,
    )
    r = assert_equivalent(g, labels, tri, [c])
    # the constraint actually prunes and validates at this scale
    assert r.iterations >= 1


def _rmat_s11():
    parts = [
        generate_edges(
            RmatParams(seed=5489 + 3 * r, vertex_scale=11,
                       edge_count=(16 << 11) // 4, scramble=False)
        )
        for r in range(4)
    ]
    src = np.concatenate([p[0] for p in parts])
    dst = np.concatenate([p[1] for p in parts])
    return from_edges(src, dst, num_vertices=1 << 11)


def make_pattern_tri():
    from test_oracle import make_pattern

    return make_pattern(
        [(0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1)],
        [4, 5, 6],
        diameter=2,
    )
