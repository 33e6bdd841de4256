"""Bucketed-ELL LCC must match the flat-CSR engine superstep-for-superstep."""

import numpy as np

from fuzzypatternmatching_tpu.engine.lcc import LccEngine
from fuzzypatternmatching_tpu.engine.lcc_bucketed import BucketedLccEngine
from fuzzypatternmatching_tpu.generators.rmat import RmatParams, generate_edges
from fuzzypatternmatching_tpu.graph.csr import degree_labels, from_edges, grid_graph
from fuzzypatternmatching_tpu.pattern.pattern_graph import load_pattern_graph

from test_pattern import write_tree_pattern


def _rmat(scale):
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


def _compare(g, labels, pattern, num_ranks=4):
    flat = LccEngine(g, labels, pattern, num_ranks=num_ranks)
    ell = BucketedLccEngine(g, labels, pattern, num_ranks=num_ranks)

    st1, rows1, died1 = flat.lcc_call(flat.init_state(), True)
    st2, rows2, died2 = ell.lcc_call(ell.init_state(), True)
    assert [r[:3] for r in rows1] == [r[:3] for r in rows2]
    for r1, r2 in zip(rows1, rows2):
        for key in ("av", "ae", "msg"):
            assert np.array_equal(r1[3][key], r2[3][key])
    assert died1 == died2

    tv1 = np.asarray(st1.tv)
    alive1 = np.asarray(st1.edge_alive)
    tv2, alive2 = ell.state_to_global(st2)
    assert np.array_equal(tv1, tv2)
    assert np.array_equal(alive1, alive2)

    # continuation call from repacked state (incl. a tp_flag mark)
    flag = np.zeros(g.num_edges, dtype=bool)
    live_edges = np.nonzero(alive1)[0]
    if len(live_edges):
        flag[live_edges[0]] = True
    import jax.numpy as jnp
    from fuzzypatternmatching_tpu.engine.lcc import LccState

    st1b, rows1b, _ = flat.lcc_call(
        LccState(jnp.asarray(tv1), jnp.asarray(alive1), jnp.asarray(flag)), False
    )
    st2b, rows2b, _ = ell.lcc_call(
        ell.state_from_global(tv1, alive1, flag), False
    )
    assert [r[:3] for r in rows1b] == [r[:3] for r in rows2b]
    tv2b, alive2b = ell.state_to_global(st2b)
    assert np.array_equal(np.asarray(st1b.tv), tv2b)
    assert np.array_equal(np.asarray(st1b.edge_alive), alive2b)


def test_bucketed_matches_flat_rmat(tmp_path):
    pattern = load_pattern_graph(write_tree_pattern(tmp_path))
    g = _rmat(11)
    _compare(g, degree_labels(g), pattern)


def test_bucketed_matches_flat_grid(tmp_path):
    pattern = load_pattern_graph(write_tree_pattern(tmp_path))
    src, dst = grid_graph(9, 7)
    g = from_edges(src, dst)
    _compare(g, degree_labels(g), pattern, num_ranks=2)


def test_bucketed_split_hub(tmp_path):
    # force hub splitting with a tiny max_width: star hub of degree 40
    pattern = load_pattern_graph(write_tree_pattern(tmp_path))
    import numpy as np

    hub_edges = [(0, i) for i in range(1, 41)] + [(1, 2), (2, 3)]
    src = np.array([e[0] for e in hub_edges] + [e[1] for e in hub_edges])
    dst = np.array([e[1] for e in hub_edges] + [e[0] for e in hub_edges])
    g = from_edges(src, dst, num_vertices=41)
    labels = degree_labels(g)
    flat = LccEngine(g, labels, pattern, num_ranks=2)
    ell = BucketedLccEngine(g, labels, pattern, num_ranks=2, min_width=4, max_width=8)
    assert any(len(b.seg_rows) != len(b.rows) for b in ell.buckets)
    st1, rows1, d1 = flat.lcc_call(flat.init_state(), True)
    st2, rows2, d2 = ell.lcc_call(ell.init_state(), True)
    assert [r[:3] for r in rows1] == [r[:3] for r in rows2]
    tv2, alive2 = ell.state_to_global(st2)
    assert np.array_equal(np.asarray(st1.tv), tv2)
    assert np.array_equal(np.asarray(st1.edge_alive), alive2)


def test_init_tv_host_reconstruction(tmp_path):
    # After the global init superstep (n_steps=1), tv_host must REBUILD tv
    # on the host from alive pairs + labels (recon_init fast path) and match
    # the device array bit-for-bit — incl. split hubs and fuzzy
    # optional-edge acceptance.
    from test_fuzzy import write_fuzzy_pattern

    (tmp_path / "t").mkdir()
    (tmp_path / "f").mkdir()
    tree = load_pattern_graph(write_tree_pattern(tmp_path / "t"))
    fuzzy = load_pattern_graph(
        write_fuzzy_pattern(tmp_path / "f", require_optional=True)
    )
    gr = _rmat(10)
    src, dst = grid_graph(9, 7)
    gg = from_edges(src, dst)
    cases = [
        (gr, degree_labels(gr), tree, {}),
        (gg, degree_labels(gg), tree, {}),
        # split hubs: degree-40 star with a tiny max_width
        (gr, degree_labels(gr), tree, {"min_width": 4, "max_width": 8}),
        (gr, np.minimum(degree_labels(gr), 3), fuzzy, {}),
    ]
    for g, labels, pattern, kw in cases:
        ell = BucketedLccEngine(g, labels, pattern, **kw)
        st, _rows, _d = ell.lcc_call(ell.init_state(), True, n_steps=1)
        assert st.recon_init
        assert st.tv_np is None
        recon = ell.tv_host(st)
        # recon-init states carry tv in SEG space (the inv_perm exit
        # gather is skipped); _tv_device materializes vertex order lazily
        assert st.tv is None and st.tv_segs is not None
        assert np.array_equal(recon, np.asarray(ell._tv_device(st)))
        # alive pairs rebuilt from the live-row bitmap == device alive set
        from fuzzypatternmatching_tpu.engine.lcc_bucketed import BucketedState

        got = ell.alive_pairs(st)
        # recon-init states defer the S-sized alive materialization
        # entirely (alive_from_init); _ensure_alive rebuilds it on device
        # for the reference comparison
        assert st.alive_from_init and st.alive is None
        ell._ensure_alive(st)
        ref = ell.alive_pairs(
            BucketedState(
                ell._tv_device(st), st.alive, st.tp_flag, packed=st.packed
            )
        )
        assert np.array_equal(got[0], ref[0])
        assert np.array_equal(got[1], ref[1])
        # multi-step and continuation calls must NOT claim reconstructable;
        # the continuation consumes the DEFERRED alive arrays
        # (_ensure_alive) and must match a continuation from an explicitly
        # repacked global state
        st2, r2, _d = ell.lcc_call(st, False, n_steps=2)
        assert not st2.recon_init
        tv_g, alive_g = ell.state_to_global(st)
        ref_st = ell.state_from_global(
            tv_g, alive_g, np.zeros(g.num_edges, bool)
        )
        ref2, rr2, _d2 = ell.lcc_call(ref_st, False, n_steps=2)
        assert [x[:3] for x in r2] == [x[:3] for x in rr2]
        tva, ala = ell.state_to_global(st2)
        tvb, alb = ell.state_to_global(ref2)
        assert np.array_equal(tva, tvb) and np.array_equal(ala, alb)
