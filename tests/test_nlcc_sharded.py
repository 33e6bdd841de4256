"""Sharded NLCC (parallel/nlcc_sharded.py) must be bit-identical to the
host vectorized engine (engine/nlcc.py) at 1/2/8 mesh devices: same
validated sets, message counts, per-rank arrival counts, edge marks,
subgraphs, forwarded-key sets — and the full sharded driver (sharded LCC +
sharded NLCC) must reproduce the host driver's result end to end."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from fuzzypatternmatching_tpu.engine.driver import MatchEngine
from fuzzypatternmatching_tpu.engine.nlcc import (
    AliveCsr,
    ForwardedSets,
    run_nem,
    run_tds,
)
from fuzzypatternmatching_tpu.graph.csr import degree_labels, from_edges
from fuzzypatternmatching_tpu.parallel.nlcc_sharded import ShardedNlcc
from fuzzypatternmatching_tpu.pattern.nonlocal_constraint import (
    load_nonlocal_constraints,
)
from fuzzypatternmatching_tpu.pattern.pattern_graph import load_pattern_graph

from test_engine_vs_oracle import (
    _random_graph,
    _uni_pattern,
    selected_constraint,
    tds_selected_constraint,
    uniform_path_nem,
)
from test_nlcc_device import (
    _assert_outcome_equal,
    _full_acsr,
    _results_equal,
    _tv_for,
)
from test_oracle import (
    PATH_PATTERN,
    TRI_PATTERN,
    cycle_constraint,
    path_constraint,
    tds_constraint,
    undirected,
)
from test_pattern import write_tree_pattern


def _mesh(ndev):
    devs = jax.devices()[:ndev]
    assert len(devs) == ndev
    return Mesh(np.array(devs), ("x",))


@pytest.mark.parametrize("ndev", [1, 2, 8])
@pytest.mark.parametrize("seed", [0, 2])
def test_nem_cycle_matches_host(seed, ndev):
    g = _random_graph(seed, v=48, e=160)
    rng = np.random.RandomState(seed + 7)
    labels = rng.randint(1, 4, size=48).astype(np.uint64)
    c = cycle_constraint()
    tv = _tv_for(labels, [c], 48)
    acsr = _full_acsr(g)
    f_h, f_d = ForwardedSets.empty(), ForwardedSets.empty()
    host = run_nem(acsr, labels, tv, c, 48, num_ranks=4, forwarded=f_h)
    dev = ShardedNlcc(48, _mesh(ndev), num_ranks=4).run_nem(
        acsr, labels, tv, c, 48, forwarded=f_d
    )
    _assert_outcome_equal(host, dev)
    assert np.array_equal(f_h.keys, f_d.keys)


@pytest.mark.parametrize("ndev", [2, 8])
def test_nem_path_matches_host(ndev):
    seed = 3
    g = _random_graph(seed, v=48, e=160)
    rng = np.random.RandomState(seed + 7)
    labels = rng.randint(1, 3, size=48).astype(np.uint64)
    c = path_constraint()
    tv = _tv_for(labels, [c], 48)
    acsr = _full_acsr(g)
    f_h, f_d = ForwardedSets.empty(), ForwardedSets.empty()
    host = run_nem(acsr, labels, tv, c, 48, num_ranks=4, forwarded=f_h)
    dev = ShardedNlcc(48, _mesh(ndev), num_ranks=4).run_nem(
        acsr, labels, tv, c, 48, forwarded=f_d
    )
    _assert_outcome_equal(host, dev)
    assert np.array_equal(f_h.keys, f_d.keys)


@pytest.mark.parametrize("ndev", [2, 8])
def test_tds_matches_host(ndev):
    seed = 5
    g = _random_graph(seed, v=48, e=160)
    rng = np.random.RandomState(seed + 7)
    labels = rng.randint(1, 3, size=48).astype(np.uint64)
    c = tds_constraint()
    tv = _tv_for(labels, [c], 48)
    acsr = _full_acsr(g)
    host = run_tds(acsr, labels, tv, c, 48, num_ranks=4)
    dev = ShardedNlcc(48, _mesh(ndev), num_ranks=4).run_tds(
        acsr, labels, tv, c, 48
    )
    _assert_outcome_equal(host, dev)


@pytest.mark.parametrize("ndev", [2, 8])
def test_selected_vertices_aggregation_matches_host(ndev):
    src, dst = undirected([(0, 1), (1, 2), (2, 3), (3, 0)])
    g = from_edges(src, dst, num_vertices=4)
    labels = np.array([1, 2, 1, 2], dtype=np.uint64)
    cs = [path_constraint(), selected_constraint()]
    tv = _tv_for(labels, cs, 4)
    acsr = _full_acsr(g)
    f_h, f_d = ForwardedSets.empty(), ForwardedSets.empty()
    devn = ShardedNlcc(4, _mesh(ndev), num_ranks=2)
    for c in cs:
        f_h.reset_for(c, labels, tv, 4)
        f_d.reset_for(c, labels, tv, 4)
        host = run_nem(acsr, labels, tv, c, 4, num_ranks=2, forwarded=f_h)
        dev = devn.run_nem(acsr, labels, tv, c, 4, forwarded=f_d)
        _assert_outcome_equal(host, dev)
        assert np.array_equal(f_h.keys, f_d.keys)


@pytest.mark.parametrize("ndev", [2, 8])
def test_tds_selected_matches_host(ndev):
    seed = 7
    g = _random_graph(seed, v=32, e=96)
    labels = np.ones(32, dtype=np.uint64)
    c0, c1 = uniform_path_nem(), tds_selected_constraint()
    tv = _tv_for(labels, [c0], 32)
    acsr = _full_acsr(g)
    f_h, f_d = ForwardedSets.empty(), ForwardedSets.empty()
    devn = ShardedNlcc(32, _mesh(ndev), num_ranks=2)
    host0 = run_nem(acsr, labels, tv, c0, 32, num_ranks=2, forwarded=f_h)
    dev0 = devn.run_nem(acsr, labels, tv, c0, 32, forwarded=f_d)
    _assert_outcome_equal(host0, dev0)
    f_h.reset_for(c1, labels, tv, 32)
    f_d.reset_for(c1, labels, tv, 32)
    host1 = run_tds(acsr, labels, tv, c1, 32, num_ranks=2, forwarded=f_h)
    dev1 = devn.run_tds(acsr, labels, tv, c1, 32, forwarded=f_d)
    assert host1.validated.any()
    _assert_outcome_equal(host1, dev1)


def test_capacity_overflow_retry_is_exact():
    # force a tiny initial capacity so the overflow-and-double path runs
    g = _random_graph(9, v=48, e=300)
    rng = np.random.RandomState(16)
    labels = rng.randint(1, 4, size=48).astype(np.uint64)
    c = cycle_constraint()
    tv = _tv_for(labels, [c], 48)
    acsr = _full_acsr(g)
    devn = ShardedNlcc(48, _mesh(4), num_ranks=1)
    devn._first_expansion = lambda acsr_, sources_: 2
    host = run_nem(
        acsr, labels, tv, c, 48, num_ranks=1,
        forwarded=ForwardedSets.empty(),
    )
    dev = devn.run_nem(
        acsr, labels, tv, c, 48, forwarded=ForwardedSets.empty()
    )
    _assert_outcome_equal(host, dev)


@pytest.mark.parametrize("ndev", [2, 8])
def test_driver_full_search_on_mesh_tree_corpus(tmp_path, ndev):
    """The complete prune-to-fixpoint search — sharded LCC AND sharded
    NLCC/TDS — on a mesh must reproduce the host driver exactly."""
    prefix = write_tree_pattern(tmp_path)
    pattern = load_pattern_graph(prefix)
    constraints = load_nonlocal_constraints(prefix)
    g = _random_graph(2, v=96, e=400)
    labels = degree_labels(g)
    host_r = MatchEngine(
        g, labels, pattern, constraints, nlcc_mode="host"
    ).run()
    mesh_r = MatchEngine(
        g, labels, pattern, constraints, lcc_engine="sharded",
        mesh=_mesh(ndev), nlcc_mode="device",
    ).run()
    _results_equal(host_r, mesh_r)


def test_driver_full_search_on_mesh_cycle_path():
    g = _random_graph(11, v=48, e=160)
    rng = np.random.RandomState(111)
    labels = rng.randint(1, 4, size=48).astype(np.uint64)
    for pattern, cs in (
        (TRI_PATTERN, [cycle_constraint()]),
        (PATH_PATTERN, [path_constraint(), tds_constraint()]),
    ):
        host_r = MatchEngine(g, labels, pattern, cs, nlcc_mode="host").run()
        mesh_r = MatchEngine(
            g, labels, pattern, cs, lcc_engine="sharded", mesh=_mesh(8),
            nlcc_mode="device",
        ).run()
        _results_equal(host_r, mesh_r)


def test_driver_mesh_tds_selected():
    g = _random_graph(23, v=32, e=96)
    labels = np.ones(32, dtype=np.uint64)
    pat = _uni_pattern()
    cs = [uniform_path_nem(), tds_selected_constraint()]
    host_r = MatchEngine(g, labels, pat, cs, nlcc_mode="host").run()
    mesh_r = MatchEngine(
        g, labels, pat, cs, lcc_engine="sharded", mesh=_mesh(8),
        nlcc_mode="device",
    ).run()
    _results_equal(host_r, mesh_r)


@pytest.mark.parametrize("batch", [1, 3])
@pytest.mark.parametrize("ndev", [2, 8])
def test_source_batching_matches_unbatched(ndev, batch):
    """Token-source batching on the mesh (the -x machinery,
    tds_batch_1.hpp:1149-1303): chunked runs must reproduce the
    all-at-once outcome exactly — validated sets, messages, per-rank
    counts, subgraphs, forwarded keys."""
    seed = 5
    g = _random_graph(seed, v=48, e=160)
    rng = np.random.RandomState(seed + 7)
    labels = rng.randint(1, 3, size=48).astype(np.uint64)
    devn = ShardedNlcc(48, _mesh(ndev), num_ranks=4)

    c = tds_constraint()
    tv = _tv_for(labels, [c], 48)
    acsr = _full_acsr(g)
    host = run_tds(acsr, labels, tv, c, 48, num_ranks=4)
    dev_b = devn.run_tds(acsr, labels, tv, c, 48, source_batch=batch)
    _assert_outcome_equal(host, dev_b)

    c2 = cycle_constraint()
    tv2 = _tv_for(labels, [c2], 48)
    f_h, f_d = ForwardedSets.empty(), ForwardedSets.empty()
    host2 = run_nem(acsr, labels, tv2, c2, 48, num_ranks=4, forwarded=f_h)
    dev2 = devn.run_nem(
        acsr, labels, tv2, c2, 48, forwarded=f_d, source_batch=batch
    )
    _assert_outcome_equal(host2, dev2)
    assert np.array_equal(f_h.keys, f_d.keys)


def test_overflow_past_cap_raises_and_driver_falls_back(tmp_path):
    """Past MAX_CAP_DOUBLINGS the mesh engines raise FrontierOverflow
    (bounded compile cost) and the DRIVER falls back to the host engine
    with identical results (nlcc_sharded capacity policy)."""
    from fuzzypatternmatching_tpu.engine.nlcc import FrontierOverflow
    from fuzzypatternmatching_tpu.pattern.pattern_graph import PatternGraph

    g = _random_graph(9, v=48, e=300)
    rng = np.random.RandomState(16)
    labels = rng.randint(1, 4, size=48).astype(np.uint64)
    c = cycle_constraint()
    tv = _tv_for(labels, [c], 48)
    acsr = _full_acsr(g)
    devn = ShardedNlcc(48, _mesh(4), num_ranks=1)
    devn._first_expansion = lambda acsr_, sources_: 1
    devn.MAX_CAP_DOUBLINGS = 0
    with pytest.raises(FrontierOverflow):
        devn.run_nem(acsr, labels, tv, c, 48, forwarded=ForwardedSets.empty())

    # driver level: force the same overflow inside a full mesh search and
    # require the host fallback to reproduce the host-NLCC driver exactly
    from test_oracle import TRI_PATTERN

    src, dst = undirected([(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2)])
    g2 = from_edges(src, dst, num_vertices=5)
    labels2 = np.array([1, 2, 3, 1, 2], dtype=np.uint64)
    host_r = MatchEngine(
        g2, labels2, TRI_PATTERN, [cycle_constraint()],
        lcc_engine="sharded", nlcc_mode="host",
    ).run()
    eng = MatchEngine(
        g2, labels2, TRI_PATTERN, [cycle_constraint()],
        lcc_engine="sharded", nlcc_mode="device",
    )
    eng._dev_nlcc._first_expansion = lambda acsr_, sources_: 1
    eng._dev_nlcc.MAX_CAP_DOUBLINGS = 0
    mesh_r = eng.run()
    _results_equal(host_r, mesh_r)


def test_driver_mesh_compact_continuation_matches_full_plane():
    # The driver's compact continuation (lazy host states + CPU sub-engine)
    # now covers the mesh engine too; rows, sets, and subgraphs must be
    # identical between compact (default), forced full-plane
    # (compact=False), and the host engine.
    g = _random_graph(11, v=48, e=160)
    rng = np.random.RandomState(111)
    labels = rng.randint(1, 4, size=48).astype(np.uint64)
    for pattern, cs in (
        (TRI_PATTERN, [cycle_constraint()]),
        (PATH_PATTERN, [path_constraint(), tds_constraint()]),
    ):
        host_r = MatchEngine(g, labels, pattern, cs, nlcc_mode="host").run()
        for compact in (True, False):
            mesh_r = MatchEngine(
                g, labels, pattern, cs, lcc_engine="sharded", mesh=_mesh(8),
                nlcc_mode="device", compact=compact,
            ).run()
            _results_equal(host_r, mesh_r)
