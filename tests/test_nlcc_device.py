"""Device NLCC (engine/nlcc_device.py) must be bit-identical to the host
vectorized engine (engine/nlcc.py): same validated sets, message counts,
per-rank arrival counts, edge marks, subgraphs, and forwarded-key sets —
and end-to-end the device-forced driver must reproduce the host driver's
full result (rows, found flags, active sets, enumerations)."""

import numpy as np
import pytest

from fuzzypatternmatching_tpu.engine.driver import MatchEngine
from fuzzypatternmatching_tpu.engine.nlcc import (
    AliveCsr,
    ForwardedSets,
    run_nem,
    run_tds,
)
from fuzzypatternmatching_tpu.engine.nlcc_device import DeviceNlcc
from fuzzypatternmatching_tpu.graph.csr import degree_labels, from_edges
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
from test_oracle import (
    PATH_PATTERN,
    TRI_PATTERN,
    cycle_constraint,
    path_constraint,
    tds_constraint,
    undirected,
)
from test_pattern import write_tree_pattern


def _tv_for(labels, constraints, num_vertices):
    """Template-vertex bits as an LCC pass would leave them for label-exact
    matching: bit i set wherever the label equals any constraint's hop-i
    label."""
    tv = np.zeros(num_vertices, dtype=np.uint32)
    for c in constraints:
        for h in range(c.walk_len):
            bit = np.uint32(1) << np.uint32(int(c.indices[h]))
            tv |= np.where(labels == c.labels[h], bit, np.uint32(0))
    return tv


def _full_acsr(g):
    return AliveCsr.build(
        g,
        np.ones(g.num_edges, dtype=bool),
        np.ones(g.num_vertices, dtype=bool),
    )


def _assert_outcome_equal(host, dev):
    assert np.array_equal(host.sources, dev.sources)
    assert np.array_equal(host.validated, dev.validated)
    assert host.messages == dev.messages
    assert np.array_equal(host.msg_per_rank, dev.msg_per_rank)
    assert sorted(host.edge_marks) == sorted(dev.edge_marks)
    if host.subgraphs is None:
        assert dev.subgraphs is None or len(dev.subgraphs) == 0
    else:
        assert sorted(map(tuple, host.subgraphs.tolist())) == sorted(
            map(tuple, dev.subgraphs.tolist())
        )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nem_cycle_matches_host(seed):
    g = _random_graph(seed, v=48, e=160)
    rng = np.random.RandomState(seed + 7)
    labels = rng.randint(1, 4, size=48).astype(np.uint64)
    c = cycle_constraint()
    tv = _tv_for(labels, [c], 48)
    acsr = _full_acsr(g)
    f_h, f_d = ForwardedSets.empty(), ForwardedSets.empty()
    host = run_nem(acsr, labels, tv, c, 48, num_ranks=4, forwarded=f_h)
    dev = DeviceNlcc(48, num_ranks=4).run_nem(
        acsr, labels, tv, c, 48, forwarded=f_d
    )
    _assert_outcome_equal(host, dev)
    assert np.array_equal(f_h.keys, f_d.keys)


@pytest.mark.parametrize("seed", [3, 4])
def test_nem_path_matches_host(seed):
    g = _random_graph(seed, v=48, e=160)
    rng = np.random.RandomState(seed + 7)
    labels = rng.randint(1, 3, size=48).astype(np.uint64)
    c = path_constraint()
    tv = _tv_for(labels, [c], 48)
    acsr = _full_acsr(g)
    f_h, f_d = ForwardedSets.empty(), ForwardedSets.empty()
    host = run_nem(acsr, labels, tv, c, 48, num_ranks=4, forwarded=f_h)
    dev = DeviceNlcc(48, num_ranks=4).run_nem(
        acsr, labels, tv, c, 48, forwarded=f_d
    )
    _assert_outcome_equal(host, dev)
    assert np.array_equal(f_h.keys, f_d.keys)


@pytest.mark.parametrize("seed", [5, 6])
def test_tds_matches_host(seed):
    g = _random_graph(seed, v=48, e=160)
    rng = np.random.RandomState(seed + 7)
    labels = rng.randint(1, 3, size=48).astype(np.uint64)
    c = tds_constraint()
    tv = _tv_for(labels, [c], 48)
    acsr = _full_acsr(g)
    host = run_tds(acsr, labels, tv, c, 48, num_ranks=4)
    dev = DeviceNlcc(48, num_ranks=4).run_tds(acsr, labels, tv, c, 48)
    _assert_outcome_equal(host, dev)


def test_selected_vertices_aggregation_matches_host():
    # constraint run 1 (path) populates the forwarded sets; the selected
    # constraint then validates destinations — both runs on device must
    # track the host exactly, sharing one ForwardedSets object each
    src, dst = undirected([(0, 1), (1, 2), (2, 3), (3, 0)])
    g = from_edges(src, dst, num_vertices=4)
    labels = np.array([1, 2, 1, 2], dtype=np.uint64)
    cs = [path_constraint(), selected_constraint()]
    tv = _tv_for(labels, cs, 4)
    acsr = _full_acsr(g)
    f_h, f_d = ForwardedSets.empty(), ForwardedSets.empty()
    devn = DeviceNlcc(4, num_ranks=2)
    for c in cs:
        f_h.reset_for(c, labels, tv, 4)
        f_d.reset_for(c, labels, tv, 4)
        host = run_nem(acsr, labels, tv, c, 4, num_ranks=2, forwarded=f_h)
        dev = devn.run_nem(acsr, labels, tv, c, 4, forwarded=f_d)
        _assert_outcome_equal(host, dev)
        assert np.array_equal(f_h.keys, f_d.keys)


@pytest.mark.parametrize("seed", [7, 8])
def test_tds_selected_matches_host(seed):
    # populate forwarded sets with a uniform-label nem run, then cross-check
    # the selected TDS walk device vs host with the same sets
    g = _random_graph(seed, v=32, e=96)
    labels = np.ones(32, dtype=np.uint64)
    c0, c1 = uniform_path_nem(), tds_selected_constraint()
    tv = _tv_for(labels, [c0], 32)
    acsr = _full_acsr(g)
    f_h, f_d = ForwardedSets.empty(), ForwardedSets.empty()
    devn = DeviceNlcc(32, num_ranks=2)
    host0 = run_nem(acsr, labels, tv, c0, 32, num_ranks=2, forwarded=f_h)
    dev0 = devn.run_nem(acsr, labels, tv, c0, 32, forwarded=f_d)
    _assert_outcome_equal(host0, dev0)
    f_h.reset_for(c1, labels, tv, 32)
    f_d.reset_for(c1, labels, tv, 32)
    host1 = run_tds(acsr, labels, tv, c1, 32, num_ranks=2, forwarded=f_h)
    dev1 = devn.run_tds(acsr, labels, tv, c1, 32, forwarded=f_d)
    assert host1.validated.any()  # the mode actually validates here
    _assert_outcome_equal(host1, dev1)


def test_driver_device_mode_tds_selected():
    g = _random_graph(23, v=32, e=96)
    labels = np.ones(32, dtype=np.uint64)
    pat = _uni_pattern()
    cs = [uniform_path_nem(), tds_selected_constraint()]
    host_r = MatchEngine(g, labels, pat, cs, nlcc_mode="host").run()
    dev_r = MatchEngine(g, labels, pat, cs, nlcc_mode="device").run()
    _results_equal(host_r, dev_r)


def test_capacity_overflow_retry_is_exact():
    # force a tiny initial capacity so the overflow-and-double path runs
    g = _random_graph(9, v=48, e=300)
    rng = np.random.RandomState(16)
    labels = rng.randint(1, 4, size=48).astype(np.uint64)
    c = cycle_constraint()
    tv = _tv_for(labels, [c], 48)
    acsr = _full_acsr(g)
    devn = DeviceNlcc(48, num_ranks=1)
    shrunk = {"n": 0}
    orig = devn._first_expansion

    def tiny(acsr_, sources_):
        shrunk["n"] += 1
        return 2  # -> cap 256 floor; hop fan-out will overflow it

    devn._first_expansion = tiny
    host = run_nem(
        acsr, labels, tv, c, 48, num_ranks=1,
        forwarded=ForwardedSets.empty(),
    )
    dev = devn.run_nem(
        acsr, labels, tv, c, 48, forwarded=ForwardedSets.empty()
    )
    devn._first_expansion = orig
    assert shrunk["n"] == 1
    _assert_outcome_equal(host, dev)


def _results_equal(a, b):
    ra = [(r.itr, r.phase, r.step, r.active_vertices, r.active_edges,
           r.messages) for r in a.rows]
    rb = [(r.itr, r.phase, r.step, r.active_vertices, r.active_edges,
           r.messages) for r in b.rows]
    assert ra == rb
    for x, y in zip(a.rows, b.rows):
        if x.per_rank is not None and y.per_rank is not None:
            assert list(x.per_rank) == list(y.per_rank)
    assert a.pattern_found == b.pattern_found
    assert a.iterations == b.iterations
    assert a.active_vertices == b.active_vertices
    assert a.active_edges == b.active_edges
    assert {k: sorted(v) for k, v in a.subgraphs.items()} == {
        k: sorted(v) for k, v in b.subgraphs.items()
    }


def test_driver_device_mode_tree_corpus(tmp_path):
    prefix = write_tree_pattern(tmp_path)
    pattern = load_pattern_graph(prefix)
    constraints = load_nonlocal_constraints(prefix)
    g = _random_graph(2, v=96, e=400)
    labels = degree_labels(g)
    host_r = MatchEngine(
        g, labels, pattern, constraints, nlcc_mode="host"
    ).run()
    dev_r = MatchEngine(
        g, labels, pattern, constraints, nlcc_mode="device"
    ).run()
    _results_equal(host_r, dev_r)


def test_driver_device_mode_cycle_and_path():
    g = _random_graph(11, v=48, e=160)
    rng = np.random.RandomState(111)
    labels = rng.randint(1, 4, size=48).astype(np.uint64)
    for pattern, cs in (
        (TRI_PATTERN, [cycle_constraint()]),
        (PATH_PATTERN, [path_constraint(), tds_constraint()]),
    ):
        host_r = MatchEngine(g, labels, pattern, cs, nlcc_mode="host").run()
        dev_r = MatchEngine(g, labels, pattern, cs, nlcc_mode="device").run()
        _results_equal(host_r, dev_r)


def test_auto_mode_gates_on_first_expansion():
    g = _random_graph(12, v=48, e=160)
    labels = np.random.RandomState(13).randint(1, 4, size=48).astype(
        np.uint64
    )
    eng = MatchEngine(
        g, labels, TRI_PATTERN, [cycle_constraint()], nlcc_mode="auto",
        nlcc_device_min=1 << 30,
    )
    acsr = _full_acsr(g)
    tv = _tv_for(labels, [cycle_constraint()], 48)
    assert not eng._nlcc_on_device(acsr, cycle_constraint(), tv)
    eng.nlcc_device_min = 1
    assert eng._nlcc_on_device(acsr, cycle_constraint(), tv)
