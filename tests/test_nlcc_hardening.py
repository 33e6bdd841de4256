"""NLCC hardening: malformed selected+cycle constraints must not crash
(reference drops such tokens with an error message, nem_1.hpp:750-755), and
per-hop chunked expansion must be exact at any chunk size (the round-1
MemoryError abort is gone)."""

import numpy as np
import pytest

from fuzzypatternmatching_tpu.engine.nlcc import (
    AliveCsr,
    ForwardedSets,
    run_nem,
    run_tds,
)
from fuzzypatternmatching_tpu.engine.nlcc_device import DeviceNlcc
from fuzzypatternmatching_tpu.pattern.nonlocal_constraint import (
    NonLocalConstraint,
)

from test_engine_vs_oracle import _random_graph
from test_nlcc_device import (
    _assert_outcome_equal,
    _full_acsr,
    _tv_for,
)
from test_oracle import cycle_constraint, tds_constraint


def selected_cycle_constraint():
    """Malformed combination: valid_cycle with selected_vertices and a
    final label differing from the source label — cycle tokens return to
    sources that are NOT in the (destination-keyed) map."""
    return NonLocalConstraint(
        labels=np.array([1, 2, 1, 2], dtype=np.uint64),
        indices=np.array([0, 1, 0, 1], dtype=np.int64),
        cycle_length=2,
        valid_cycle=True,
        interleave_lcc=False,
        selected_vertices=True,
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_selected_cycle_no_keyerror_and_engines_agree(seed):
    g = _random_graph(seed, v=32, e=120)
    rng = np.random.RandomState(seed + 5)
    labels = rng.randint(1, 3, size=32).astype(np.uint64)
    c = selected_cycle_constraint()
    tv = _tv_for(labels, [c], 32)
    acsr = _full_acsr(g)
    host = run_nem(
        acsr, labels, tv, c, 32, num_ranks=2, forwarded=ForwardedSets.empty()
    )  # must not raise KeyError
    dev = DeviceNlcc(32, num_ranks=2).run_nem(
        acsr, labels, tv, c, 32, forwarded=ForwardedSets.empty()
    )
    _assert_outcome_equal(host, dev)
    # sources (label 1) are never map keys (label 2) -> nothing validated,
    # no edge marks (reference drops the token with an error message)
    assert not host.validated.any()
    assert host.edge_marks == []


def test_selected_cycle_sharded_agrees():
    import jax
    from jax.sharding import Mesh

    from fuzzypatternmatching_tpu.parallel.nlcc_sharded import ShardedNlcc

    g = _random_graph(3, v=32, e=120)
    rng = np.random.RandomState(8)
    labels = rng.randint(1, 3, size=32).astype(np.uint64)
    c = selected_cycle_constraint()
    tv = _tv_for(labels, [c], 32)
    acsr = _full_acsr(g)
    host = run_nem(
        acsr, labels, tv, c, 32, num_ranks=2, forwarded=ForwardedSets.empty()
    )
    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    sh = ShardedNlcc(32, mesh, num_ranks=2).run_nem(
        acsr, labels, tv, c, 32, forwarded=ForwardedSets.empty()
    )
    _assert_outcome_equal(host, sh)


@pytest.mark.parametrize("chunk", [1, 7, 64])
def test_chunked_expansion_exact_nem(chunk, monkeypatch):
    g = _random_graph(4, v=48, e=200)
    rng = np.random.RandomState(9)
    labels = rng.randint(1, 4, size=48).astype(np.uint64)
    c = cycle_constraint()
    tv = _tv_for(labels, [c], 48)
    acsr = _full_acsr(g)
    base = run_nem(
        acsr, labels, tv, c, 48, num_ranks=3, forwarded=ForwardedSets.empty()
    )
    monkeypatch.setattr(AliveCsr, "EXPAND_CHUNK", chunk)
    tiny = run_nem(
        acsr, labels, tv, c, 48, num_ranks=3, forwarded=ForwardedSets.empty()
    )
    _assert_outcome_equal(base, tiny)


@pytest.mark.parametrize("chunk", [1, 16])
def test_chunked_expansion_exact_tds(chunk, monkeypatch):
    g = _random_graph(5, v=48, e=200)
    rng = np.random.RandomState(10)
    labels = rng.randint(1, 3, size=48).astype(np.uint64)
    c = tds_constraint()
    tv = _tv_for(labels, [c], 48)
    acsr = _full_acsr(g)
    base = run_tds(acsr, labels, tv, c, 48, num_ranks=3)
    monkeypatch.setattr(AliveCsr, "EXPAND_CHUNK", chunk)
    tiny = run_tds(acsr, labels, tv, c, 48, num_ranks=3)
    _assert_outcome_equal(base, tiny)


def test_filtered_frontier_cap_still_guards(monkeypatch):
    g = _random_graph(6, v=48, e=300)
    labels = np.ones(48, dtype=np.uint64)
    c = NonLocalConstraint(
        labels=np.ones(5, dtype=np.uint64),
        indices=np.zeros(5, dtype=np.int64),
        cycle_length=3,
        valid_cycle=False,
        interleave_lcc=False,
        selected_vertices=False,
    )
    tv = _tv_for(labels, [c], 48)
    acsr = _full_acsr(g)
    monkeypatch.setattr(AliveCsr, "MAX_FRONTIER", 8)
    with pytest.raises(MemoryError):
        run_nem(
            acsr, labels, tv, c, 48, forwarded=ForwardedSets.empty()
        )


def test_max_iterations_truncation_is_loud():
    """A search stopped at max_iterations before the fixpoint must set
    MatchResult.truncated and emit a RuntimeWarning (the reference loops
    unconditionally, beta.cpp:1351 — truncation is this framework's
    memory-bound escape hatch and must never be silent)."""
    import warnings

    from fuzzypatternmatching_tpu.engine.driver import MatchEngine
    from fuzzypatternmatching_tpu.graph.csr import from_edges

    from test_oracle import TRI_PATTERN, undirected

    # hexagon with labels 1,2,3,1,2,3: LCC-stable (every vertex sees both
    # other classes) but triangle-free, so the cycle constraint invalidates
    # its sources at itr 0 and the fixpoint needs a second iteration
    src, dst = undirected(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0)]
    )
    g = from_edges(src, dst, num_vertices=6)
    labels = np.array([1, 2, 3, 1, 2, 3], dtype=np.uint64)
    from test_oracle import cycle_constraint as _cyc

    full = MatchEngine(g, labels, TRI_PATTERN, [_cyc()]).run()
    assert full.iterations >= 2 and not full.truncated
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        r = MatchEngine(g, labels, TRI_PATTERN, [_cyc()]).run(
            max_iterations=1
        )
    assert r.truncated
    assert any("truncated" in str(x.message) for x in w)
