"""Sharded LCC on an 8-device virtual CPU mesh must match the single-device
engine superstep-for-superstep."""

import jax
import numpy as np
import pytest

from fuzzypatternmatching_tpu.engine.lcc import LccEngine
from fuzzypatternmatching_tpu.generators.rmat import RmatParams, generate_edges
from fuzzypatternmatching_tpu.graph.csr import degree_labels, from_edges, grid_graph
from fuzzypatternmatching_tpu.parallel.sharded import ShardedLccEngine
from fuzzypatternmatching_tpu.pattern.pattern_graph import load_pattern_graph

from test_pattern import write_tree_pattern


@pytest.fixture(scope="module")
def tree_pattern(tmp_path_factory):
    return load_pattern_graph(write_tree_pattern(tmp_path_factory.mktemp("pat")))


def _rmat_graph(scale):
    parts = [
        generate_edges(
            RmatParams(seed=5489 + 3 * r, vertex_scale=scale,
                       edge_count=(16 << scale) // 4, scramble=False)
        )
        for r in range(4)
    ]
    src = np.concatenate([p[0] for p in parts])
    dst = np.concatenate([p[1] for p in parts])
    return from_edges(src, dst, num_vertices=1 << scale)


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_sharded_matches_single_device(ndev, tree_pattern):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    g = _rmat_graph(11)
    labels = degree_labels(g)
    single = LccEngine(g, labels, tree_pattern)
    sharded = ShardedLccEngine(g, labels, tree_pattern, num_devices=ndev)

    st1, rows1, died1 = single.lcc_call(single.init_state(), True)
    st2, rows2, died2 = sharded.lcc_call(sharded.init_state(), True)
    assert [r[:3] for r in rows1] == [r[:3] for r in rows2]
    assert died1 == died2

    tv1 = np.asarray(st1.tv)
    alive1 = np.asarray(st1.edge_alive)
    tv2, alive2 = sharded.state_to_global(st2)
    assert np.array_equal(tv1, tv2)
    assert np.array_equal(alive1, alive2)

    # continue from repacked state: second call (non-init) also matches
    st1b, rows1b, _ = single.lcc_call(st1, False)
    st2b, rows2b, _ = sharded.lcc_call(
        sharded.state_from_global(tv1, alive1, np.zeros(g.num_edges, bool)), False
    )
    assert [r[:3] for r in rows1b] == [r[:3] for r in rows2b]
    tv2b, alive2b = sharded.state_to_global(st2b)
    assert np.array_equal(np.asarray(st1b.tv), tv2b)
    assert np.array_equal(np.asarray(st1b.edge_alive), alive2b)


def test_sharded_grid(tree_pattern):
    src, dst = grid_graph(8, 8)
    g = from_edges(src, dst)
    labels = degree_labels(g)
    single = LccEngine(g, labels, tree_pattern)
    sharded = ShardedLccEngine(g, labels, tree_pattern, num_devices=8)
    _, rows1, _ = single.lcc_call(single.init_state(), True)
    _, rows2, _ = sharded.lcc_call(sharded.init_state(), True)
    assert [r[:3] for r in rows1] == [r[:3] for r in rows2]


def test_per_device_memory_scales(tree_pattern):
    """The halo data plane must hold O((V+E)/n + cut) elements per device,
    not O(V+E): distributing the graph, not replicating it (VERDICT item 2;
    reference delegate partitioning, delegate_partitioned_graph.ipp:316-379)."""
    g = _rmat_graph(11)
    labels = degree_labels(g)
    e1 = ShardedLccEngine(g, labels, tree_pattern, num_devices=1)
    e8 = ShardedLccEngine(g, labels, tree_pattern, num_devices=8)
    # a replicated plane keeps the same footprint at any mesh size; the
    # halo plane must shrink with n (s11 R-MAT is near-worst-case: random
    # columns make the halo ~V and nearly every edge a cut edge)
    assert e8.per_device_elems() < 0.3 * e1.per_device_elems()
    # the chunk-local arrays (the E-proportional part) shrink exactly n-fold
    assert e8.ec <= -(-e1.ec // 8) + 1


def test_hub_rows_split_across_chunks(tree_pattern):
    """A hub vertex with more edges than E/n must have its row span several
    devices (the delegate-splitting analog) and still produce exact counts."""
    # star graph: vertex 0 joined to all others (both directions)
    v = 64
    hub_deg = v - 1
    src = np.concatenate([np.zeros(hub_deg), np.arange(1, v)]).astype(np.int64)
    dst = np.concatenate([np.arange(1, v), np.zeros(hub_deg)]).astype(np.int64)
    g = from_edges(src, dst, num_vertices=v)
    labels = degree_labels(g)
    single = LccEngine(g, labels, tree_pattern)
    sharded = ShardedLccEngine(g, labels, tree_pattern, num_devices=8)
    # hub row 0 has 63 of 126 edges: it must span multiple 16-edge chunks
    assert g.row_ptr[1] > sharded.ec
    _, rows1, _ = single.lcc_call(single.init_state(), True)
    _, rows2, _ = sharded.lcc_call(sharded.init_state(), True)
    assert [r[:3] for r in rows1] == [r[:3] for r in rows2]


def test_full_search_on_mesh(tree_pattern, tmp_path):
    """The complete LCC+NLCC search driven with the sharded engine on an
    8-device mesh must match the oracle."""
    from fuzzypatternmatching_tpu.engine.driver import MatchEngine
    from fuzzypatternmatching_tpu.engine.oracle import MatchOracle
    from fuzzypatternmatching_tpu.pattern.nonlocal_constraint import (
        load_nonlocal_constraints,
    )

    g = _rmat_graph(11)
    labels = degree_labels(g)
    constraints = load_nonlocal_constraints(
        write_tree_pattern(tmp_path), tree_pattern.vertex_data
    )
    oracle_r = MatchOracle(g, labels, tree_pattern, constraints).run()
    engine_r = MatchEngine(
        g, labels, tree_pattern, constraints, lcc_engine="sharded"
    ).run()
    assert oracle_r.trace() == engine_r.trace()
    assert oracle_r.active_vertices == engine_r.active_vertices
    assert oracle_r.active_edges == engine_r.active_edges
    assert oracle_r.pattern_found == engine_r.pattern_found


def test_sharded_per_rank_attribution_matches_flat(tree_pattern, tmp_path):
    """Exact per-output-rank av/ae/msg attribution from the mesh engine
    (beta.cpp:1112-1125): every PhaseRow's per_rank arrays must equal the
    flat engine's, rank by rank, at num_ranks=4 over an 8-device mesh."""
    from fuzzypatternmatching_tpu.engine.driver import MatchEngine
    from fuzzypatternmatching_tpu.pattern.nonlocal_constraint import (
        load_nonlocal_constraints,
    )

    g = _rmat_graph(11)
    labels = degree_labels(g)
    constraints = load_nonlocal_constraints(
        write_tree_pattern(tmp_path), tree_pattern.vertex_data
    )
    flat_r = MatchEngine(
        g, labels, tree_pattern, constraints, lcc_engine="flat", num_ranks=4
    ).run()
    shard_r = MatchEngine(
        g, labels, tree_pattern, constraints, lcc_engine="sharded",
        num_ranks=4,
    ).run()
    assert flat_r.trace() == shard_r.trace()
    assert len(flat_r.rows) == len(shard_r.rows)
    for fr, sr in zip(flat_r.rows, shard_r.rows):
        assert fr.per_rank is not None and sr.per_rank is not None
        for key in ("av", "ae", "msg"):
            assert (
                np.asarray(fr.per_rank[key]) == np.asarray(sr.per_rank[key])
            ).all(), (fr.itr, fr.phase, fr.step, key)


@pytest.mark.parametrize("ndev", [1, 8])
def test_sharded_init_host_reconstruction(ndev, tree_pattern):
    # After the global init superstep (n_steps=1), tv_host and alive_pairs
    # must REBUILD both on the host from the per-shard V-bit live-row
    # bitmap (engine/init_recon.py shared path) and match the device
    # arrays bit-for-bit — including rows split across chunk boundaries.
    from fuzzypatternmatching_tpu.parallel.sharded import ShardedState

    g = _rmat_graph(10)
    labels = degree_labels(g)
    eng = ShardedLccEngine(g, labels, tree_pattern, num_devices=ndev)
    st, _rows, _d = eng.lcc_call(eng.init_state(), True, n_steps=1)
    assert st.recon_init
    assert st.tv_np is None

    # reference: the packed-download path on a state without recon_init
    ref = ShardedState(
        st.tv, st.edge_alive, st.tp_flag, packed=st.packed, tv16=st.tv16
    )
    ref_rows, ref_cols = eng.alive_pairs(ref)
    ref_ids = eng.alive_edge_ids(ref)
    got_rows, got_cols = eng.alive_pairs(st)
    got_ids = eng.alive_edge_ids(st)
    assert np.array_equal(got_rows, ref_rows)
    assert np.array_equal(got_cols, ref_cols)
    assert np.array_equal(got_ids, ref_ids)

    recon_tv = eng.tv_host(st)
    dev_tv = (
        np.asarray(st.tv).reshape(-1)[: g.num_vertices].astype(np.uint32)
    )
    assert np.array_equal(recon_tv, dev_tv)

    # multi-step and continuation calls must NOT claim reconstructable
    st2, _r, _d = eng.lcc_call(st, False, n_steps=2)
    assert not st2.recon_init


@pytest.mark.parametrize("ndev", [1, 2])
def test_isolated_lowest_vertex(ndev, tree_pattern):
    """Vertex 0 with no edges (rowstart[0] != 0) must not break the n=1
    row-tv identity fast path: the continuation superstep previously read
    tv shifted by rowstart[0] and reported silently wrong matches
    (advisor round-4 high finding)."""
    parts = [
        generate_edges(
            RmatParams(seed=5489 + 3 * r, vertex_scale=13,
                       edge_count=(16 << 13) // 4, scramble=False)
        )
        for r in range(4)
    ]
    src = np.concatenate([p[0] for p in parts]) + 1  # shift: vertex 0 isolated
    dst = np.concatenate([p[1] for p in parts]) + 1
    g = from_edges(src, dst, num_vertices=(1 << 13) + 1)
    assert g.row_ptr[1] == 0  # vertex 0 genuinely edge-free
    labels = degree_labels(g)
    single = LccEngine(g, labels, tree_pattern)
    sharded = ShardedLccEngine(g, labels, tree_pattern, num_devices=ndev)

    st1, rows1, died1 = single.lcc_call(single.init_state(), True)
    st2, rows2, died2 = sharded.lcc_call(sharded.init_state(), True)
    assert [r[:3] for r in rows1] == [r[:3] for r in rows2]
    assert died1 == died2
    tv1 = np.asarray(st1.tv)
    alive1 = np.asarray(st1.edge_alive)

    # the bug was in the CONTINUATION superstep's row-tv path
    st1b, rows1b, _ = single.lcc_call(st1, False)
    st2b, rows2b, _ = sharded.lcc_call(
        sharded.state_from_global(tv1, alive1, np.zeros(g.num_edges, bool)),
        False,
    )
    assert [r[:3] for r in rows1b] == [r[:3] for r in rows2b]
    tv2b, alive2b = sharded.state_to_global(st2b)
    assert np.array_equal(np.asarray(st1b.tv), tv2b)
    assert np.array_equal(np.asarray(st1b.edge_alive), alive2b)
    # the active counts must be non-trivial for the test to mean anything
    assert rows1b and rows1b[-1][1] > 0
