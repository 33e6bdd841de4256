"""Edge-metadata-constrained matching.

The reference stores per-edge metadata (edge_data_db.hpp, -e in
run_pattern_matching_beta.cpp:114-115) and per-pattern-edge values
(pattern_edge_data, graph.hpp:209-222) but its shipped drivers never enforce
them (beta.cpp:575 passes edge_metadata commented out). This framework adds
opt-in enforcement: a data edge carrying metadata m can map onto pattern
edge (p, q) only when the pattern requires m there — exactly, per receiver
bit in LCC and per traversed hop in NLCC/TDS. These tests pin the semantics
on the oracle, prove the flat engine + host NLCC reproduce it bit-exactly,
and cover the CLI wiring.
"""

import numpy as np
import pytest

from fuzzypatternmatching_tpu.engine.driver import MatchEngine
from fuzzypatternmatching_tpu.engine.nlcc import AliveCsr, run_nem
from fuzzypatternmatching_tpu.engine.oracle import MatchOracle
from fuzzypatternmatching_tpu.graph.csr import from_edges
from fuzzypatternmatching_tpu.pattern.nonlocal_constraint import (
    NonLocalConstraint,
)
from fuzzypatternmatching_tpu.pattern.pattern_graph import load_pattern_graph

from test_oracle import (
    make_pattern,
    path_constraint,
    tds_constraint,
    undirected,
)


def meta_pattern(edges, labels, values, diameter):
    """make_pattern + per-edge metadata values (same file order)."""
    p = make_pattern(edges, labels, diameter)
    srcs = np.array([e[0] for e in edges], dtype=np.int64)
    order = np.argsort(srcs, kind="stable")
    p.edge_data = np.array(values, dtype=np.int64)[order]
    return p


def graph_meta(g, val_of, default=0):
    """Per-CSR-edge metadata from a {(u, v): value} dict (symmetric: each
    undirected pair should be listed once; both directions get the value)."""
    sym = {}
    for (u, v), w in val_of.items():
        sym[(u, v)] = w
        sym[(v, u)] = w
    out = np.full(g.num_edges, default, dtype=np.int64)
    for e in range(g.num_edges):
        key = (int(g.edge_row[e]), int(g.cols[e]))
        if key in sym:
            out[e] = sym[key]
    return out


def assert_meta_equivalent(g, labels, pattern, constraints, edge_data):
    """Oracle, flat-engine, and bucketed-engine runs with metadata must all
    agree exactly (trace rows, messages, sets, found flags, subgraphs)."""
    o = MatchOracle(g, labels, pattern, constraints, edge_data=edge_data).run()
    o_rows = [(r.itr, r.phase, r.step, r.active_vertices, r.active_edges,
               r.messages) for r in o.rows]
    o_subs = {k: sorted(v) for k, v in o.subgraphs.items()}
    # sharded runs twice: host NLCC (auto) and mesh NLCC (device) — the
    # latter exercises ShardedNlcc's metadata hop filters
    combos = [("flat", "auto"), ("bucketed", "auto"), ("sharded", "auto"),
              ("sharded", "device")]
    for eng, nlcc_mode in combos:
        e = MatchEngine(
            g, labels, pattern, constraints, lcc_engine=eng,
            edge_data=edge_data, nlcc_mode=nlcc_mode,
        ).run()
        e_rows = [(r.itr, r.phase, r.step, r.active_vertices, r.active_edges,
                   r.messages) for r in e.rows]
        assert o_rows == e_rows, eng
        assert o.pattern_found == e.pattern_found, eng
        assert o.iterations == e.iterations, eng
        assert o.active_vertices == e.active_vertices, eng
        assert o.active_edges == e.active_edges, eng
        e_subs = {k: sorted(v) for k, v in e.subgraphs.items()}
        assert o_subs == e_subs, eng
    return e


# --------------------------------------------------------------- parsing


def test_reference_corpus_edge_data_parses():
    pat = load_pattern_graph(
        "/root/reference/examples/rmat_log2_tree_pattern/0/pattern"
    )
    assert pat.edge_data is not None
    assert len(pat.edge_data) == pat.edge_count
    assert set(pat.edge_data.tolist()) == {55}
    vals, allow = pat.edge_meta_tables()
    assert vals.tolist() == [55]
    # a single value: row 0 must equal the plain adjacency bitsets
    assert (allow[0] == pat.edges_bitset_all.astype(np.uint32)).all()
    # the unmatched-value row is all-zero
    assert (allow[1] == 0).all()
    hops = pat.hop_edge_values(np.array([0, 1, 2]))
    assert hops.tolist() == [55, 55]


# ---------------------------------------------------------- LCC semantics


EDGE_META_PATTERN = meta_pattern([(0, 1), (1, 0)], [1, 2], [5, 5], diameter=2)


def test_uniform_metadata_is_noop():
    src, dst = undirected([(0, 1), (1, 2), (2, 3), (3, 0)])
    g = from_edges(src, dst, num_vertices=4)
    labels = np.array([1, 2, 1, 2], dtype=np.uint64)
    pat = meta_pattern([(0, 1), (1, 0)], [1, 2], [5, 5], diameter=2)
    ed = np.full(g.num_edges, 5, dtype=np.int64)
    cons = [path_constraint(), tds_constraint()]
    r_meta = assert_meta_equivalent(g, labels, pat, cons, ed)
    r_plain = MatchOracle(g, labels, pat, cons).run()
    assert r_meta.active_vertices == r_plain.active_vertices
    assert r_meta.active_edges == r_plain.active_edges
    assert r_meta.pattern_found == r_plain.pattern_found
    assert {k: sorted(v) for k, v in r_meta.subgraphs.items()} == {
        k: sorted(v) for k, v in r_plain.subgraphs.items()
    }


def test_wrong_value_prunes_everything():
    src, dst = undirected([(0, 1)])
    g = from_edges(src, dst, num_vertices=2)
    labels = np.array([1, 2], dtype=np.uint64)
    ed = np.full(g.num_edges, 6, dtype=np.int64)  # pattern requires 5
    r = assert_meta_equivalent(g, labels, EDGE_META_PATTERN, [], ed)
    assert r.active_vertices == {}
    ed5 = np.full(g.num_edges, 5, dtype=np.int64)
    r5 = assert_meta_equivalent(g, labels, EDGE_META_PATTERN, [], ed5)
    assert set(r5.active_vertices) == {0, 1}


def test_per_receiver_bit_exactness():
    """A star where each spoke's value selects WHICH template edge it can
    serve: b (via the 5-edge) may only be template 1, c (via the 6-edge)
    only template 2 — a single union-tn LCC could not distinguish them."""
    src, dst = undirected([(0, 1), (0, 2)])
    g = from_edges(src, dst, num_vertices=3)
    labels = np.array([1, 2, 2], dtype=np.uint64)
    pat = meta_pattern(
        [(0, 1), (0, 2), (1, 0), (2, 0)], [1, 2, 2], [5, 6, 5, 6], diameter=2
    )
    ed = graph_meta(g, {(0, 1): 5, (0, 2): 6})
    r = assert_meta_equivalent(g, labels, pat, [], ed)
    assert r.active_vertices == {0: 0b001, 1: 0b010, 2: 0b100}
    # swap the values: b/c swap template identities
    ed_sw = graph_meta(g, {(0, 1): 6, (0, 2): 5})
    r2 = assert_meta_equivalent(g, labels, pat, [], ed_sw)
    assert r2.active_vertices == {0: 0b001, 1: 0b100, 2: 0b010}
    # one spoke with an unknown value: its vertex dies, and template 0
    # (missing a mandatory neighbor class) collapses everything
    ed_bad = graph_meta(g, {(0, 1): 5, (0, 2): 9})
    r3 = assert_meta_equivalent(g, labels, pat, [], ed_bad)
    assert r3.active_vertices == {}


# --------------------------------------------------------- NLCC semantics


def test_nlcc_hop_filter_blocks_wrong_edge():
    """Unit-level: run_nem over a hand-built pruned adjacency. The square's
    walks 0->1->2 and 0->3->2 both satisfy labels/bits; metadata poisons the
    (1, 2) edge, so only sources whose surviving walk avoids it validate."""
    src, dst = undirected([(0, 1), (1, 2), (2, 3), (3, 0)])
    g = from_edges(src, dst, num_vertices=4)
    labels = np.array([1, 2, 1, 2], dtype=np.uint64)
    tv = np.array([0b001, 0b010, 0b001, 0b010], dtype=np.uint32)
    c = path_constraint()  # walk 0 -> 1 -> 0 over labels 1,2,1
    meta_codes = graph_meta(g, {(1, 2): 1}, default=0)  # code 1 = wrong
    acsr = AliveCsr.build(
        g, np.ones(g.num_edges, dtype=bool), tv != 0, meta=meta_codes
    )
    hopc = np.array([0, 0])  # both hops require code 0
    out = run_nem(acsr, labels, tv, c, 4, hopc=hopc)
    ok = dict(zip(out.sources.tolist(), out.validated.tolist()))
    # 0 and 2 still reach each other around the 3 side; 1 cannot relay
    # through its poisoned edge to 2, but 0-1-0 needs distinct endpoints:
    # source 0 can go 0->1? hop (0,1) fine, then 1->2 poisoned, 1->0 is the
    # parent return; via 3: 0->3->2 validates. Source 2: 2->1 poisoned at
    # arrival? hop (2,1) uses the (2,1)=code1 edge -> blocked; 2->3->0 ok.
    assert ok[0] and ok[2]
    out_nofilter = run_nem(acsr, labels, tv, c, 4)
    assert out_nofilter.validated.all()
    assert out_nofilter.messages > out.messages


def test_tds_metadata_restricts_enumeration():
    """TDS on the square with one poisoned edge: enumerated walks must all
    avoid it, and the subgraph set shrinks accordingly (engine == oracle)."""
    src, dst = undirected([(0, 1), (1, 2), (2, 3), (3, 0)])
    g = from_edges(src, dst, num_vertices=4)
    labels = np.array([1, 2, 1, 2], dtype=np.uint64)
    pat = meta_pattern([(0, 1), (1, 0)], [1, 2], [5, 5], diameter=2)
    cons = [tds_constraint()]
    ed_all5 = np.full(g.num_edges, 5, dtype=np.int64)
    r_all = assert_meta_equivalent(g, labels, pat, cons, ed_all5)
    n_all = len(r_all.subgraphs.get(0, []))
    assert n_all > 0
    ed_poison = graph_meta(g, {(1, 2): 6}, default=5)
    r_p = assert_meta_equivalent(g, labels, pat, cons, ed_poison)
    for walk in r_p.subgraphs.get(0, []):
        for a, b in zip(walk, walk[1:]):
            assert {a, b} != {1, 2}, f"walk {walk} used the poisoned edge"
    assert len(r_p.subgraphs.get(0, [])) < n_all


# ----------------------------------------------------- random equivalence


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_graphs_random_metadata(seed):
    rng = np.random.RandomState(seed)
    v, e = 40, 120
    u = rng.randint(0, v, size=e)
    w = rng.randint(0, v, size=e)
    g = from_edges(
        np.concatenate([u, w]), np.concatenate([w, u]), num_vertices=v
    )
    labels = rng.randint(1, 3, size=v).astype(np.uint64)
    pat = meta_pattern(
        [(0, 1), (1, 0), (1, 2), (2, 1)], [1, 2, 1], [5, 5, 6, 6], diameter=2
    )
    # symmetric random metadata over {5, 6, 7}
    val_of = {}
    for i in range(g.num_edges):
        a, b = int(g.edge_row[i]), int(g.cols[i])
        val_of.setdefault((min(a, b), max(a, b)), int(rng.choice([5, 6, 7])))
    ed = graph_meta(g, val_of)
    cons = [path_constraint(), tds_constraint()]
    assert_meta_equivalent(g, labels, pat, cons, ed)


# ------------------------------------------------------------------- CLI


def test_cli_edge_metadata(tmp_path):
    import subprocess
    import sys

    from fuzzypatternmatching_tpu.graph import storage

    src, dst = undirected([(0, 1), (1, 2), (2, 3), (3, 0)])
    g = from_edges(src, dst, num_vertices=4)
    labels = np.array([1, 2, 1, 2], dtype=np.uint64)
    ed = graph_meta(g, {(0, 1): 5, (1, 2): 5, (2, 3): 5, (3, 0): 6})
    db = str(tmp_path / "db")
    storage.save(g, db, num_shards=2, labels=labels, edge_data=ed)

    pdir = tmp_path / "patterns" / "0"
    pdir.mkdir(parents=True)
    (pdir / "pattern_edge").write_text("0 1\n1 0\n")
    (pdir / "pattern_edge_data").write_text("0 1 0 5\n1 0 0 5\n")
    (pdir / "pattern_vertex_data").write_text("0 1\n1 2\n")
    (pdir / "pattern_stat").write_text("diameter : 2\n")
    (pdir / "pattern_nlc").write_text("")
    (pdir / "pattern_non_local_constraint").write_text("")
    out = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "-m",
         "fuzzypatternmatching_tpu.cli.run_pattern_matching",
         "-i", db, "-p", str(tmp_path / "patterns"), "-o", out,
         "-e", "db", "--lcc-engine", "flat"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    # the 6-valued edge (3, 0) dies; 1-2-3 remains a valid 1-2-1 chain and
    # 0 keeps its 5-edge to 1: all four vertices survive, 6 alive edges
    eng = MatchEngine(
        g, labels,
        load_pattern_graph(str(pdir / "pattern")), [],
        lcc_engine="flat", edge_data=ed,
    ).run()
    assert (3, 0) not in eng.active_edges
    assert (0, 3) not in eng.active_edges
    ora = MatchOracle(
        g, labels, load_pattern_graph(str(pdir / "pattern")), [],
        edge_data=ed,
    ).run()
    assert eng.active_edges == ora.active_edges
    assert eng.active_vertices == ora.active_vertices


# ------------------------------------------------- lazy bucketed state


def test_lazy_bucketed_state_roundtrip():
    """Lazy host-side BucketedState: tv_host/alive_pairs/state_to_global
    answer from host data, with_updates keeps it lazy, and a full lcc_call
    materializes it to the same result as the eager construction."""
    from fuzzypatternmatching_tpu.engine.lcc_bucketed import BucketedLccEngine

    src, dst = undirected([(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)])
    g = from_edges(src, dst, num_vertices=4)
    labels = np.array([1, 2, 1, 2], dtype=np.uint64)
    pat = make_pattern([(0, 1), (1, 0)], [1, 2], diameter=2)
    eng = BucketedLccEngine(g, labels, pat)

    eids = np.arange(g.num_edges, dtype=np.int64)[::2]  # every other edge
    tv = pat.label_match_bitset(labels).astype(np.uint32)
    lazy = eng.state_from_edge_ids(tv, eids, lazy=True)
    eager = eng.state_from_edge_ids(tv, eids)

    assert lazy.alive is None
    assert (eng.tv_host(lazy) == eng.tv_host(eager)).all()
    lr, lc = eng.alive_pairs(lazy)
    er, ec = eng.alive_pairs(eager)
    assert (lr == er).all() and (lc == ec).all()
    tvg_l, alive_l = eng.state_to_global(lazy)
    tvg_e, alive_e = eng.state_to_global(eager)
    assert (tvg_l == tvg_e).all() and (alive_l == alive_e).all()

    # with_updates stays lazy and accumulates marks
    tv2 = tv.copy()
    tv2[3] = 0
    lazy2 = eng.with_updates(lazy, tv2, [int(eids[0])])
    assert lazy2.alive is None
    assert int(eids[0]) in lazy2.lazy_flag_ids.tolist()

    # a full call materializes: identical supersteps from both forms
    eager2 = eng.with_updates(eager, tv2, [int(eids[0])])
    sl, rl, dl = eng.lcc_call(lazy2, False, n_steps=2)
    se, re, de = eng.lcc_call(eager2, False, n_steps=2)
    assert rl == re and dl == de
    assert (np.asarray(sl.tv) == np.asarray(se.tv)).all()
    pl_ = eng.alive_pairs(sl)
    pe_ = eng.alive_pairs(se)
    assert (pl_[0] == pe_[0]).all() and (pl_[1] == pe_[1]).all()
    # the call's state carries the in-program packed bitmap
    assert sl.packed is not None


def test_bucketed_compact_path_with_metadata(tmp_path):
    """R-MAT s11 + the tree corpus (whose pattern_edge_data is uniform 55):
    pruning leaves alive << E/4, so the bucketed engine's compact
    continuation runs WITH translated metadata codes. Uniform-55 graph
    metadata must reproduce the no-metadata result; poisoning one edge of
    an enumerated walk changes it — and every engine tracks the oracle."""
    from fuzzypatternmatching_tpu.generators.rmat import (
        RmatParams,
        generate_edges,
    )
    from fuzzypatternmatching_tpu.graph.csr import degree_labels
    from fuzzypatternmatching_tpu.pattern.nonlocal_constraint import (
        load_nonlocal_constraints,
    )

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
    labels = degree_labels(g)
    prefix = "/root/reference/examples/rmat_log2_tree_pattern/0/pattern"
    pat = load_pattern_graph(prefix)
    cons = load_nonlocal_constraints(prefix)

    ed55 = np.full(g.num_edges, 55, dtype=np.int64)
    r55 = assert_meta_equivalent(g, labels, pat, cons, ed55)
    plain = MatchEngine(g, labels, pat, cons).run()
    assert r55.active_vertices == plain.active_vertices
    assert {k: sorted(v) for k, v in r55.subgraphs.items()} == {
        k: sorted(v) for k, v in plain.subgraphs.items()
    }

    walks = [w for v in r55.subgraphs.values() for w in v]
    if walks:  # poison the first hop of one enumerated walk
        a, b = int(walks[0][0]), int(walks[0][1])
        ed_p = ed55.copy()
        for e in range(g.num_edges):
            if {int(g.edge_row[e]), int(g.cols[e])} == {a, b}:
                ed_p[e] = 99
        r_p = assert_meta_equivalent(g, labels, pat, cons, ed_p)
        n_p = sum(len(v) for v in r_p.subgraphs.values())
        assert n_p < len(walks)
