import numpy as np

from fuzzypatternmatching_tpu.generators.rmat import (
    RmatParams,
    generate_edges,
    rmat_all_ranks,
)


def test_stream_shape_and_interleave():
    p = RmatParams(seed=5489, vertex_scale=17, edge_count=1000)
    src, dst = generate_edges(p)
    assert src.shape == (2000,)
    # undirected stream: (u,v) then (v,u) interleaved
    assert np.array_equal(src[0::2], dst[1::2])
    assert np.array_equal(dst[0::2], src[1::2])
    assert src.max() <= p.max_vertex_id
    assert dst.max() <= p.max_vertex_id


def test_deterministic_and_chunk_invariant():
    p = RmatParams(seed=5495, vertex_scale=18, edge_count=3000)
    a = generate_edges(p, chunk_edges=512)
    b = generate_edges(p, chunk_edges=3000)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_skew_present():
    # RMAT with a=0.57 must produce heavy-tailed degrees
    p = RmatParams(seed=5489, vertex_scale=17, edge_count=20000)
    src, _ = generate_edges(p)
    deg = np.bincount(src.astype(np.int64), minlength=1 << 17)
    assert deg.max() > 20 * max(1, int(deg[deg > 0].mean()))


def test_all_ranks_layout():
    src, dst = rmat_all_ranks(scale=17, n_ranks=4, edges_per_vertex=2)
    per_rank = (2 << 17) // 4
    assert src.shape == (4 * 2 * per_rank,)
    # rank streams differ (different seeds)
    r0 = src[: 2 * per_rank]
    r1 = src[2 * per_rank : 4 * per_rank]
    assert not np.array_equal(r0, r1)


def test_mt19937_stream_parity():
    # numpy RandomState.randint(0, 2**32) must equal the canonical mt19937
    # output stream (init_genrand seeding) that boost::mt19937 produces.
    draws = np.random.RandomState(5489).randint(0, 2**32, size=5, dtype=np.uint32)
    assert list(draws) == [3499211612, 581869302, 3890346734, 3586334585, 545404204]
