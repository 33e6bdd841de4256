import numpy as np
import pytest

from fuzzypatternmatching_tpu.algorithms.frontier import (
    breadth_first_search,
    connected_components,
    kth_core,
    pagerank,
    sssp,
    triangle_count,
)
from fuzzypatternmatching_tpu.graph.csr import from_edges, grid_graph


def undirected(pairs):
    src, dst = [], []
    for u, v in pairs:
        src += [u, v]
        dst += [v, u]
    return np.array(src), np.array(dst)


@pytest.fixture
def grid():
    src, dst = grid_graph(3, 5)
    return from_edges(src, dst)


def test_bfs_grid(grid):
    level, parent = breadth_first_search(grid, 0)
    # Manhattan distances on the grid
    for r in range(3):
        for c in range(5):
            assert level[r * 5 + c] == r + c
    assert parent[0] == 0
    # parent is the smallest-id shortest-path predecessor
    assert parent[6] == 1  # predecessors of (1,1): 1 and 5 -> 1
    assert parent[14] == 9


def test_bfs_disconnected():
    src, dst = undirected([(0, 1), (2, 3)])
    g = from_edges(src, dst, num_vertices=4)
    level, parent = breadth_first_search(g, 0)
    assert level[1] == 1
    assert level[2] == 2**31 - 1  # unreachable
    assert parent[2] == -1


def test_connected_components():
    src, dst = undirected([(0, 1), (1, 2), (3, 4), (5, 5)])
    g = from_edges(src, dst, num_vertices=7)
    comp = connected_components(g)
    assert comp[0] == comp[1] == comp[2] == 0
    assert comp[3] == comp[4] == 3
    assert comp[5] == 5
    assert comp[6] == 6


def test_pagerank_uniform_on_cycle():
    src, dst = undirected([(0, 1), (1, 2), (2, 0)])
    g = from_edges(src, dst, num_vertices=3)
    pr = pagerank(g)
    assert np.allclose(pr, 1 / 3, atol=1e-5)
    assert np.isclose(pr.sum(), 1.0, atol=1e-4)


def test_pagerank_star_center_highest():
    src, dst = undirected([(0, 1), (0, 2), (0, 3), (0, 4)])
    g = from_edges(src, dst, num_vertices=5)
    pr = pagerank(g)
    assert pr[0] > pr[1]
    assert np.allclose(pr[1:], pr[1], atol=1e-6)


def test_kth_core():
    # triangle + pendant: 2-core is the triangle
    src, dst = undirected([(0, 1), (1, 2), (2, 0), (2, 3)])
    g = from_edges(src, dst, num_vertices=4)
    core2 = kth_core(g, 2)
    assert list(core2) == [True, True, True, False]
    assert not kth_core(g, 3).any()


def test_sssp_weighted():
    pairs = [(0, 1), (1, 2), (0, 2)]
    src, dst = undirected(pairs)
    g = from_edges(src, dst, num_vertices=3)
    # weight per directed edge slot, symmetric: 0-1:1, 1-2:1, 0-2:5
    w = np.zeros(g.num_edges)
    for e in range(g.num_edges):
        u, v = int(g.edge_row[e]), int(g.cols[e])
        w[e] = 5.0 if {u, v} == {0, 2} else 1.0
    dist = sssp(g, 0, w)
    assert dist[0] == 0
    assert dist[1] == 1
    assert dist[2] == 2  # via 1, not the direct weight-5 edge


def test_triangle_count():
    src, dst = undirected([(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2)])
    g = from_edges(src, dst, num_vertices=5)
    assert triangle_count(g) == 2
    src, dst = grid_graph(3, 5)
    assert triangle_count(from_edges(src, dst)) == 0


def test_triangle_count_k4():
    src, dst = undirected(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    )
    g = from_edges(src, dst, num_vertices=4)
    assert triangle_count(g) == 4


def test_triangle_count_random_vs_bruteforce():
    # the degree-oriented wedge-check (device membership) must equal a
    # brute-force count, including with tiny wedge chunks
    for seed in range(3):
        rng = np.random.RandomState(seed)
        v = 40
        pairs = set()
        for _ in range(150):
            a, b = rng.randint(0, v, 2)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        src = np.array([p[0] for p in pairs] + [p[1] for p in pairs])
        dst = np.array([p[1] for p in pairs] + [p[0] for p in pairs])
        g = from_edges(src, dst, num_vertices=v)
        adj = [set() for _ in range(v)]
        for a, b in pairs:
            adj[a].add(b)
            adj[b].add(a)
        brute = sum(
            1
            for a in range(v)
            for b in adj[a]
            if b > a
            for c in adj[a] & adj[b]
            if c > b
        )
        assert triangle_count(g, wedge_chunk=97) == brute
        assert triangle_count(g) == brute


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_sharded_algorithms_match_single_device(ndev):
    """The distributed classics (algorithms/frontier_sharded.py — the
    analog of the reference's all-rank MPI drivers, run_bfs.cpp:186,
    connected_components.hpp:121) must reproduce the single-device
    fixpoints bit-for-bit on an R-MAT stream with isolated vertices."""
    import jax

    from fuzzypatternmatching_tpu.algorithms import frontier_sharded as fs
    from fuzzypatternmatching_tpu.generators.rmat import (
        RmatParams,
        generate_edges,
    )

    assert len(jax.devices()) >= 8
    parts = [
        generate_edges(
            RmatParams(seed=5489 + 3 * r, vertex_scale=10,
                       edge_count=(16 << 10) // 4, scramble=False)
        )
        for r in range(4)
    ]
    src = np.concatenate([p[0] for p in parts])
    dst = np.concatenate([p[1] for p in parts])
    g = from_edges(src, dst, num_vertices=1 << 10)
    w = np.random.default_rng(7).random(g.num_edges).astype(np.float32)

    l1, p1 = breadth_first_search(g, 0)
    l2, p2 = fs.breadth_first_search(g, 0, num_devices=ndev)
    assert np.array_equal(l1, l2) and np.array_equal(p1, p2)
    assert np.array_equal(
        connected_components(g), fs.connected_components(g, num_devices=ndev)
    )
    assert np.allclose(
        pagerank(g), fs.pagerank(g, num_devices=ndev), atol=1e-6
    )
    assert np.array_equal(
        kth_core(g, 4), fs.kth_core(g, 4, num_devices=ndev)
    )
    assert np.allclose(
        sssp(g, 0, w), fs.sssp(g, 0, w, num_devices=ndev),
        rtol=1e-6, equal_nan=True,
    )
