"""Legacy walk-clone prototype (algorithms/fuzzy_walk.py) vs hand counts
and a brute-force walker."""

import numpy as np
import pytest

from fuzzypatternmatching_tpu.algorithms.fuzzy_walk import fuzzy_walk_ranks
from fuzzypatternmatching_tpu.graph.csr import from_edges

from test_engine_vs_oracle import _random_graph
from test_oracle import undirected


def brute_ranks(g, labels, wl, wi):
    v = g.num_vertices
    rank = np.zeros(v, dtype=np.int64)
    L = len(wl)

    def go(history):
        p = len(history)
        if p == L:
            for x in history:
                rank[x] += 1
            return
        for nbr in g.neighbors(history[-1]):
            k = int(wi[p])
            if k == p:
                if nbr in history:
                    continue
            elif k < p:
                if history[k] != nbr:
                    continue
            else:
                continue
            if labels[nbr] != wl[p]:
                continue
            go(history + [int(nbr)])

    for s in np.nonzero(labels == wl[0])[0]:
        go([int(s)])
    return rank


def test_path_walk_counts():
    src, dst = undirected([(0, 1), (1, 2)])
    g = from_edges(src, dst, num_vertices=3)
    labels = np.array([1, 2, 1], dtype=np.uint64)
    r = fuzzy_walk_ranks(g, labels, np.array([1, 2, 1]), np.array([0, 1, 2]))
    # walks 0-1-2 and 2-1-0: every vertex on two matched walks
    assert r.tolist() == [2, 2, 2]


def test_loop_closing_rule():
    src, dst = undirected([(0, 1)])
    g = from_edges(src, dst, num_vertices=2)
    labels = np.array([1, 2], dtype=np.uint64)
    # indices [0,1,0]: position 2 must return to position 0
    r = fuzzy_walk_ranks(g, labels, np.array([1, 2, 1]), np.array([0, 1, 0]))
    # single walk 0-1-0: vertex 0 appears twice in the history
    assert r.tolist() == [2, 1]


def test_walk_cap_enforced():
    g = from_edges(np.array([0]), np.array([1]), num_vertices=2)
    with pytest.raises(ValueError):
        fuzzy_walk_ranks(
            g, np.ones(2, dtype=np.uint64), np.ones(16), np.arange(16)
        )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_brute_force(seed):
    g = _random_graph(seed, v=24, e=60)
    rng = np.random.RandomState(seed + 50)
    labels = rng.randint(1, 4, size=24).astype(np.uint64)
    for wl, wi in (
        ([1, 2, 3], [0, 1, 2]),
        ([1, 2, 1, 2], [0, 1, 2, 3]),
        ([2, 3, 2], [0, 1, 0]),
    ):
        got = fuzzy_walk_ranks(g, labels, np.array(wl), np.array(wi))
        want = brute_ranks(g, labels, np.array(wl), np.array(wi))
        assert got.tolist() == want.tolist(), (wl, wi)
