"""Independent semantic audit of the NLCC edge cases (VERDICT r03 #4).

Every expected value in this file was derived BY HAND-EXECUTING the
REFERENCE C++ on paper — not by running the oracle — so these fixtures
check the oracle itself (every engine is already proven equal to the
oracle by tests/test_engine_vs_oracle.py). The relevant reference logic,
by file:line (all under /root/reference/include/havoqgt/ unless noted):

nem_1 = token_passing_pattern_matching_nonunique_nem_1.hpp
tds   = token_passing_pattern_matching_nonunique_tds_batch_1.hpp
beta  = ../src/run_pattern_matching_beta.cpp

* nem_1.hpp:9  static enable_vertex_token_source = true — the
  per-(vertex, source) forwarded-token cache IS active in nem_1:
  pre_visit drops an arriving token when the vertex already forwarded
  one from the same source (nem_1.hpp:133-139), and the cache insert
  happens only on an INTERMEDIATE forward (do_pass_token &&
  max_itr_count > itr_count, nem_1.hpp:270-286). The final-hop arrival
  (max_itr_count == itr_count) is therefore NOT deduplicated.
* tds.hpp:11  static enable_vertex_token_source_cache = false — TDS has
  NO dedup cache: all walks are enumerated.
* nem_1.hpp:435-448: for a PATH constraint (not valid cycle, not
  selected vertices) a source must hold BOTH endpoint bits —
  template_vertices.test(pattern_indices[0]) AND
  .test(pattern_indices[last]).
* tds.hpp:1067-1100: TDS source collection checks only pattern[0] and
  pattern_indices[0] (path_checking_filter is false at tds.hpp:12).
* nem_1.hpp:544-548 / 193-196: the target (source) vertex cannot RELAY
  its own token at an intermediate hop. The same clause is commented
  out in TDS (tds.hpp:191-193).
* nem_1.hpp:833-841: a vertex never forwards a token back to the
  immediate parent it received it from (only the parent — earlier walk
  vertices are NOT excluded; nem_1 carries no history).
* nem_1.hpp:684-700 (path acceptance): at the final hop, landing on the
  source itself is INVALID for a path; landing elsewhere sends an
  ack_success visitor to the source, whose visit sets
  token_source_map[source] = 1 (nem_1.hpp:330-360).
* nem_1.hpp:736-770 (cycle acceptance): valid only if the final vertex
  IS the source; sets token_source_map[v] = 1 and marks the edge the
  winning token arrived on: vertex_active_edges_map[v][parent] = 1.
  No such edge mark exists on the path-acceptance branch, and none in
  TDS acceptance (tds.hpp:684-760).
* tds.hpp:620-639 (enumeration): at hop h, if enumeration[h] == h the
  vertex must be NEW (differ from visited_vertices[0..h-1]); if
  enumeration[h] < h it must EQUAL visited_vertices[enumeration[h]].
* tds.hpp:706-712 (TDS cycle acceptance): requires vertex == target AND
  vertex == visited_vertices[0].
* beta.cpp:964-1016 (source invalidation, after the TP run): for every
  token_source_map entry still false, reset ONLY the source template
  bit (pattern_indices[0]); the vertex becomes inactive only if its
  bitset is then empty; global_not_finished/token_source_deleted are
  set by ANY failed source.
* beta.cpp:1043-1071: a failed source is erased from vertex_state_map
  only when it became inactive.
* beta.cpp:791-803: token_source_map and vertex_token_source_set are
  cleared before every constraint run (non-selected mode).
* beta.cpp:1163-1184: token_source_deleted && constraint.interleave
  re-runs LCC before the next constraint.
"""

import numpy as np

from fuzzypatternmatching_tpu.engine.driver import MatchEngine
from fuzzypatternmatching_tpu.engine.oracle import MatchOracle
from fuzzypatternmatching_tpu.engine.result import MatchResult
from fuzzypatternmatching_tpu.graph.csr import from_edges
from fuzzypatternmatching_tpu.pattern.nonlocal_constraint import (
    NonLocalConstraint,
)

from test_oracle import make_pattern, undirected

A, B, C = 10, 20, 30  # vertex labels


def _oracle_after_lcc(edges, labels, pattern, constraints):
    src, dst = undirected(edges)
    g = from_edges(src, dst, num_vertices=len(labels))
    o = MatchOracle(g, np.array(labels, dtype=np.uint64), pattern, constraints)
    res = MatchResult()
    o.lcc_call(True, 0, res)
    return o, res


# ---------------------------------------------------------------------------
# Fixture 1: the per-(vertex, source) dedup cache blocks a cycle whose only
# closing walk needs one vertex to forward the same source's token twice.
#
# Graph:  s0(A) — w1(B) — x2(C),  w1 — y3(C),  x2 — y3
# Template: chain t0(A)-t1(B)-t2(C)-t3(C).
# Constraint: cycle, walk labels [A,B,C,C,B,A], indices [0,1,2,3,1,0],
# cycle_length 4.
#
# Hand-execution of nem_1 (BSP-equivalent; the outcome is arrival-order
# independent here because every hop has exactly one candidate vertex):
#   sources: s0 only (label A, bit0; cycle => no endpoint-pair gate).
#   h1: token at w1 (label B, bit1, parent chain ok). w1 forwards,
#       cache := {(w1, s0)} (nem_1.hpp:270-286). Sent to x2, y3 (not back
#       to parent s0).
#   h2: x2 (C, bit2) forwards -> y3 (y3 != parent w1); y3 arrives with
#       label C but position 2 needs bit2 — y3 has bits {2,3} so it also
#       forwards -> x2. Both branches continue.
#   h3: position 3 (C, bit3): x2 <- y3 and y3 <- x2 arrive; both forward
#       to w1 (w1 != immediate parent).
#   h4: position 4 (B): w1 receives — but (w1, s0) is in the cache:
#       pre_visit DROPS both arrivals (nem_1.hpp:133-139). Nothing
#       reaches h5.
#   => token_source_map {s0: false}. Without the dedup cache the walk
#      s0-w1-x2-y3-w1-s0 would close and the map would read true — this
#      fixture discriminates.
# ---------------------------------------------------------------------------

CHAIN4 = make_pattern(
    [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)],
    [A, B, C, C],
    diameter=3,
)


def _cycle4():
    return NonLocalConstraint(
        labels=np.array([A, B, C, C, B, A], dtype=np.uint64),
        indices=np.array([0, 1, 2, 3, 1, 0], dtype=np.int64),
        cycle_length=4,
        valid_cycle=True,
        interleave_lcc=True,
        selected_vertices=False,
    )


def test_dedup_cache_blocks_revisit_cycle():
    edges = [(0, 1), (1, 2), (1, 3), (2, 3)]
    labels = [A, B, C, C]
    o, res = _oracle_after_lcc(edges, labels, CHAIN4, [_cycle4()])
    # LCC survivors (hand-checked): s0 {t0}, w1 {t1}, x2/y3 {t2,t3}
    assert o.tv[0] == 0b0001
    assert o.tv[1] == 0b0010
    assert o.tv[2] == 0b1100 and o.tv[3] == 0b1100
    tsm, _msgs, _ = o.nlcc_call(_cycle4(), 0, res)
    assert tsm == {0: False}


def test_without_revisit_the_same_shape_cycle_closes():
    # Control for fixture 1: a 5-cycle with a FRESH vertex at every
    # position closes. Note the labels must be position-distinct to make
    # the outcome schedule-independent in the reference: with labels
    # [A,B,C,C,B,A] the closing B vertex receives BOTH the position-1
    # init token (it is a neighbor of the source) and the position-4
    # token, and whichever the async engine processes first decides
    # whether the cycle closes — a genuine nondeterminism in nem_1
    # (dedup cache keyed on (vertex, source) only, nem_1.hpp:131-139).
    # With a distinct label D at position 4 the init token dies at the
    # closing vertex (label check, nem_1.hpp:556-560) and no dedup entry
    # is ever created there: single deterministic walk
    # 0->1->2->3->4->0, accepted, edge (0<-4) marked.
    D = 40
    cyc5 = make_pattern(
        [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3),
         (4, 0), (0, 4)],
        [A, B, C, C, D],
        diameter=3,
    )
    c = NonLocalConstraint(
        labels=np.array([A, B, C, C, D, A], dtype=np.uint64),
        indices=np.array([0, 1, 2, 3, 4, 0], dtype=np.int64),
        cycle_length=4,
        valid_cycle=True,
        interleave_lcc=True,
        selected_vertices=False,
    )
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]
    labels = [A, B, C, C, D]
    o, res = _oracle_after_lcc(edges, labels, cyc5, [c])
    tsm, msgs, _ = o.nlcc_call(c, 0, res)
    assert tsm == {0: True}
    # h1: 2 sends (to 1 and 4); h2..h5: one each (single surviving walk)
    assert msgs == 6
    assert o.alive[0][4] == 1 and o.alive[0][1] == 0


# ---------------------------------------------------------------------------
# Fixture 2: cycle acceptance marks EXACTLY the winning incoming edge.
#
# Triangle 0(A)-1(B)-2(C); template triangle t0(A)-t1(B)-t2(C);
# constraint cycle [A,B,C,A] indices [0,1,2,0], cycle_length 2.
#
# Hand-execution: source 0 sends to both neighbors 1 and 2 (position-0
# send goes along ALL active edges, nem_1.hpp:479-525). The token at 2
# dies (position 1 expects label B). Walk 0->1->2->0 closes: acceptance
# at 0 sets token_source_map[0]=1 AND vertex_active_edges_map[0][2]=1
# (parent==2, nem_1.hpp:762-770). The 0->1 edge must stay UNmarked.
# ---------------------------------------------------------------------------

TRI = make_pattern(
    [(0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1)],
    [A, B, C],
    diameter=2,
)


def _tri_cycle():
    return NonLocalConstraint(
        labels=np.array([A, B, C, A], dtype=np.uint64),
        indices=np.array([0, 1, 2, 0], dtype=np.int64),
        cycle_length=2,
        valid_cycle=True,
        interleave_lcc=True,
        selected_vertices=False,
    )


def test_cycle_acceptance_marks_winning_edge_only():
    o, res = _oracle_after_lcc(
        [(0, 1), (1, 2), (2, 0)], [A, B, C], TRI, [_tri_cycle()]
    )
    tsm, msgs, _ = o.nlcc_call(_tri_cycle(), 0, res)
    assert tsm == {0: True}
    # messages: h1 = 2 (to 1 and 2), h2 = 1 (1->2), h3 = 1 (2->0)
    assert msgs == 4
    assert o.alive[0][2] == 1  # the winning token's incoming edge
    assert o.alive[0][1] == 0  # position-0 send direction: NOT marked
    assert o.alive[1][0] == 0 and o.alive[2][1] == 0  # forward path unmarked


# ---------------------------------------------------------------------------
# Fixture 3: paths — dedup does NOT apply to the final hop; the source
# itself is an invalid final vertex; failed sources lose only bit
# indices[0]; interleaved LCC runs after deletion.
#
# Graph: 0(A)-1(B), 1-2(A), 1-4(A), 2-3(B), 4-3.   Template chain
# t0(A)-t1(B)-t2(A); path constraint walk [A,B,A,B,A], indices
# [0,1,2,1,0], cycle_length 3.
#
# LCC survivors (hand-checked): every A vertex holds {t0,t2} (any B
# neighbor serves both), B vertices hold {t1}.
# Sources (nem_1.hpp:435-448, path => needs bit0 AND bit(indices[-1]=0)):
# all of 0, 2, 4.
#
# Source 0 walk (BSP, min-parent tie-break — outcome order-independent):
#   h1: at 1 (forward; cache {(1,s0)}); sent to 2 and 4.
#   h2: at 2 and 4 (both position-2 A, forward; sent to 3 from each).
#   h3: at 3, two same-superstep arrivals (parents 2 and 4): ONE forward
#       per (vertex, source) — winner parent 2 under the deterministic
#       tie-break (either choice accepts). Forward to 4 (not to parent 2).
#   h4 FINAL at 4: 4 forwarded s0's token at h2, but the final hop skips
#       the cache check (nem_1.hpp:133-139 guarded by max_itr > itr), and
#       4 != source => valid path: ack -> token_source_map[0] = true.
# Source 2: both its walks land back on 2 itself at the final hop
#   (2-1-{0 dead-ends, 4-3-...-2}, 2-3-4-1-{0,2}: the 0 branch dies at h2
#   — wait, hand-trace: init sends to 1 and 3.
#   Via 1: h1 at 1 forwards to {0,4}; h2: 0 has only neighbor 1 (parent)
#     => dead; 4 forwards to 3; h3: 3 forwards (cache (3,s2)) to {2}?
#     no: parent is 4, neighbors {2,4} => to 2 only; h4 FINAL at 2 ==
#     source => INVALID (nem_1.hpp:684-688).
#   Via 3: h1 at 3 forwards to {2 is parent — excluded, 4} => 4; h2 at 4
#     forwards to 1 (parent 3 excluded); h3 at 1: (1, s2) already in the
#     cache from h1 of the other branch? NO — via-1 branch put (1,s2) at
#     h1. So this arrival is DROPPED.
#   => no valid final arrival: token_source_map[2] = false.
# Source 4 (symmetric to 2): false.
#
# Invalidation (beta.cpp:964-1016): 2 and 4 lose bit0 ONLY => tv {t2},
# still active, still in the map; token_source_deleted => interleave
# re-runs LCC (beta.cpp:1163-1184): vertex 3's t1 bit requires hearing
# bit0 AND bit2 (mandatory set of t1), but its only A-neighbors 2 and 4
# now carry just {t2} => 3 DIES in the interleaved LCC; everything else
# is stable (1 still hears bit0 from 0).
# Iteration 1: the LCC call kills nothing further, and the reference's
# do-while gates the TP phase on the LCC having invalidated something
# (global_not_finished, beta.cpp:609-614, 691-710) => token passing is
# NOT re-run and the search converges. Consequence (faithful quirk):
# source 0 RETAINS bit0 even though a fresh walk would now fail (its
# position-3 B vertex 3 is gone) — the fixpoint is LCC-stable, not
# NLCC-stable.
# Final state: 0 {t0,t2}, 1 {t1}, 2 {t2}, 4 {t2}; vertex 3 inactive.
# ---------------------------------------------------------------------------

CHAIN_ABA = make_pattern(
    [(0, 1), (1, 0), (1, 2), (2, 1)], [A, B, A], diameter=2
)


def _path5():
    return NonLocalConstraint(
        labels=np.array([A, B, A, B, A], dtype=np.uint64),
        indices=np.array([0, 1, 2, 1, 0], dtype=np.int64),
        cycle_length=3,
        valid_cycle=False,
        interleave_lcc=True,
        selected_vertices=False,
    )


PATH_EDGES = [(0, 1), (1, 2), (1, 4), (2, 3), (4, 3)]
PATH_LABELS = [A, B, A, B, A]


def test_path_final_hop_skips_dedup_and_source_is_invalid_final():
    o, res = _oracle_after_lcc(PATH_EDGES, PATH_LABELS, CHAIN_ABA, [_path5()])
    for v in (0, 2, 4):
        assert o.tv[v] == 0b101
    for v in (1, 3):
        assert o.tv[v] == 0b010
    tsm, _msgs, _ = o.nlcc_call(_path5(), 0, res)
    assert tsm == {0: True, 2: False, 4: False}


def test_failed_source_loses_only_source_bit_and_stays_active():
    o, res = _oracle_after_lcc(PATH_EDGES, PATH_LABELS, CHAIN_ABA, [_path5()])
    c = _path5()
    tsm, _msgs, _ = o.nlcc_call(c, 0, res)
    deleted = o.invalidate_sources(c, tsm)
    assert deleted is True
    assert o.tv[2] == 0b100 and o.active[2]  # bit0 reset, t2 kept
    assert o.tv[4] == 0b100 and o.active[4]
    assert o.tv[0] == 0b101  # the valid source is untouched


def test_path_fixture_full_run_reaches_documented_fixpoint():
    src, dst = undirected(PATH_EDGES)
    g = from_edges(src, dst, num_vertices=5)
    labels = np.array(PATH_LABELS, dtype=np.uint64)
    expected_tv = {0: 0b101, 1: 0b010, 2: 0b100, 4: 0b100}
    for engine in (
        MatchOracle(g, labels, CHAIN_ABA, [_path5()]),
        MatchEngine(g, labels, CHAIN_ABA, [_path5()]),
    ):
        r = engine.run()
        assert r.pattern_found == [True]
        assert dict(r.active_vertices) == expected_tv
        phases = [row.phase for row in r.rows]
        # exactly one TP phase: iteration 1's LCC kills nothing, and the
        # do-while gates token passing on LCC invalidation
        # (beta.cpp:609-614, 691-710)
        assert phases.count("TP") == 1
        # three LCC calls (init, interleave, iteration-1), diameter
        # supersteps each
        assert phases.count("LP") == 3 * CHAIN_ABA.diameter


# ---------------------------------------------------------------------------
# Fixture 4: the source cannot RELAY its own token (nem_1.hpp:544-548).
#
# Square 0(A)-1(B)-2(A)-3(B)-0 with the cycle constraint walk
# [A,B,A,B,A], indices [0,1,2,1,0], cycle_length 3: the only closing
# walks are 0->1->2->3->0 and 0->3->2->1->0. Both exist and close.
# But with the SELF-RELAY graph — triangle-with-tail — a walk that must
# pass through the source mid-way dies:
#   Graph: 0(A)-1(B)-2(A)-3(B)-0 BUT remove vertex 2's A role:
# Simpler discriminator: path constraint on the square, walk
# [A,B,A,B,A]: from source 0 the candidate final vertices are A vertices
# != 0 reachable in 4 hops; the walk 0->1->2->3->0 lands on the source
# (invalid), and 0->1->2->1.. is parent-blocked. The only OTHER A vertex
# is 2, reachable as 0->1->0->3->2 ONLY by relaying through the source
# at hop 2 — forbidden (and parent-blocked anyway at hop 2: 1 cannot
# return to 0... so make 0 adjacent to BOTH B's and have the h2 arrival
# at 0 come from the OTHER B): 0->1 then 1's neighbors {0,2}: to 2;
# 2->3; 3->{0}: final h4 at 0 INVALID. And 0->3->2->1->0 same. For the
# relay check we need an arrival AT the source at an INTERMEDIATE hop:
# position 2 is A: walk 0->1->0(h2!)->3->2: h2 arrival at vertex 0 from
# parent 1 — vertex 0 IS the target => nem_1.hpp:544-548 returns false
# (without that clause, 0 would forward to 3 and the walk would reach 2,
# validating source 0).
# => token_source_map[0] stays false; 2 is a source too, symmetric.
# ---------------------------------------------------------------------------


def test_source_cannot_relay_its_own_token():
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    labels = [A, B, A, B]
    o, res = _oracle_after_lcc(edges, labels, CHAIN_ABA, [_path5()])
    tsm, _msgs, _ = o.nlcc_call(_path5(), 0, res)
    # both A vertices source; every 4-hop walk either returns to its own
    # source (invalid final) or needs the source to relay (dropped)
    assert tsm == {0: False, 2: False}


# ---------------------------------------------------------------------------
# Fixture 5: TDS enumeration rules (tds.hpp:620-639), TDS cycle
# acceptance (tds.hpp:706-712), no dedup cache (tds.hpp:11), and —
# crucially — NO parent exclusion in the TDS forwarding loop: the
# `neighbour == parent -> continue` clause nem_1 has (nem_1.hpp:833-841)
# is COMMENTED OUT in tds_batch_1 (tds.hpp:796-799). Immediate
# back-tracking (v1 -> v2 -> v1) is legal in TDS and is exactly how the
# tree corpus's enumeration "0 1 2 1 ..." (position 3 revisits
# visited[1]) is realized; the enumeration indices, not the parent
# rule, police the walk shape.
# ---------------------------------------------------------------------------


def test_tds_forwarding_has_no_parent_exclusion():
    """tds_batch_1.hpp's forwarding loop (:833-870) iterates over
    vertex_active_edges_map WITHOUT the `neighbour == parent -> continue`
    clause nem_1 has (nem_1.hpp:833-841) — immediate back-tracking is
    legal in TDS and is exactly how the tree corpus's walk
    "0 1 2 1 ..." (revisit via enumeration[3]=1) realizes. Hand-derived
    expectation on the minimal graph:

    Graph 0(A)-1(B)-2(C), 1-3(A); TDS path, walk [A,B,C,B,A], indices
    [0,1,2,1,0], enumeration [0,1,2,1,4]:
      h1: 0->1 (new). h2: 1->2 (new; also 1->... 2 only C).
      h3: 2->1 (back along the parent edge — ALLOWED in TDS), enum[3]=1
          => must equal visited[1]=1: yes.
      h4 FINAL: 1 forwards to {0, 3}: 0 == target => for a path the
          penultimate hop never forwards INTO the target
          (tds.hpp:806-846); 3 is new (enum[4]=4) and != target
          => subgraph (0, 1, 2, 1, 3) accepted, source 0 validated.
    """
    p = make_pattern(
        [(0, 1), (1, 0), (1, 2), (2, 1)], [A, B, C], diameter=2
    )
    c = NonLocalConstraint(
        labels=np.array([A, B, C, B, A], dtype=np.uint64),
        indices=np.array([0, 1, 2, 1, 0], dtype=np.int64),
        cycle_length=3,
        valid_cycle=False,
        interleave_lcc=True,
        selected_vertices=False,
        enumeration=np.array([0, 1, 2, 1, 4], dtype=np.int64),
        is_tds=True,
    )
    o, res = _oracle_after_lcc(
        [(0, 1), (1, 2), (1, 3)], [A, B, C, A], p, [c]
    )
    tsm, _msgs, _ = o.nlcc_call(c, 0, res)
    assert tsm == {0: True, 3: True}
    subs = set(res.subgraphs[0])
    # walk tuple layout: visited + (final, final) — see oracle.nlcc_call
    assert (0, 1, 2, 1, 3, 3) in subs
    # the enum[3]=1 rule must BAR a fresh B at position 3: no tuple may
    # place any vertex other than the position-1 binding at position 3
    assert all(t[3] == t[1] for t in subs)


def test_tds_new_position_rejects_duplicates():
    """enumeration[h] == h => the vertex must differ from ALL earlier
    walk vertices (tds.hpp:620-627). Square 0(A)-1(B)-2(A)-3(B) with
    walk [A,B,A,B,A] all-new enumeration [0,1,2,3,4]: from source 0 the
    only 4-hop all-new walk would need a 5th distinct vertex — the
    square has none, and walks re-entering 0 or 2 are barred by the
    enum rule (position 4 final: new AND != target). Expected: no
    subgraphs, all sources fail."""
    c = NonLocalConstraint(
        labels=np.array([A, B, A, B, A], dtype=np.uint64),
        indices=np.array([0, 1, 2, 1, 0], dtype=np.int64),
        cycle_length=3,
        valid_cycle=False,
        interleave_lcc=True,
        selected_vertices=False,
        enumeration=np.array([0, 1, 2, 3, 4], dtype=np.int64),
        is_tds=True,
    )
    o, res = _oracle_after_lcc(
        [(0, 1), (1, 2), (2, 3), (3, 0)], [A, B, A, B], CHAIN_ABA, [c]
    )
    tsm, _msgs, _ = o.nlcc_call(c, 0, res)
    assert tsm == {0: False, 2: False}
    assert res.subgraphs.get(0, []) == []


def test_tds_cycle_requires_target_equals_first_visited():
    """TDS cycle acceptance (tds.hpp:706-712): final vertex == target ==
    visited[0]; token_source_map set; NO edge mark (the nem_1 edge mark
    nem_1.hpp:762-770 has no TDS counterpart). Triangle fixture."""
    c = NonLocalConstraint(
        labels=np.array([A, B, C, A], dtype=np.uint64),
        indices=np.array([0, 1, 2, 0], dtype=np.int64),
        cycle_length=2,
        valid_cycle=True,
        interleave_lcc=True,
        selected_vertices=False,
        enumeration=np.array([0, 1, 2, 0], dtype=np.int64),
        is_tds=True,
    )
    o, res = _oracle_after_lcc(
        [(0, 1), (1, 2), (2, 0)], [A, B, C], TRI, [c]
    )
    tsm, _msgs, _ = o.nlcc_call(c, 0, res)
    assert tsm == {0: True}
    assert set(res.subgraphs[0]) == {(0, 1, 2, 0, 0)}
    assert o.alive[0][2] == 0  # no TDS edge mark


# ---------------------------------------------------------------------------
# Fixture 6: path-constraint sources need BOTH endpoint bits
# (nem_1.hpp:435-448) — a vertex holding only the source bit never
# launches a token.
#
# Template: chain t0(A)-t1(B)-t2(A) where t2 additionally requires a C
# neighbor: extend template with t3(C) adjacent to t2. Then an A vertex
# with a B neighbor but NO C-adjacent-B... simpler: t2's mandatory set
# {t1, t3}: A vertices with a B neighbor whose own neighborhood lacks
# C... LCC bits: bit2 requires hearing from t1 AND t3: an A vertex with
# B and C neighbors gets {0, 2}; with only B gets {0}.
# Graph: 0(A)-1(B), 0-4(C), 4-? ; 1-2(A): vertex 2 has only the B
# neighbor => tv[2] = {0}; vertex 0 has B and C => {0, 2}.
# Path walk [A,B,A] indices [0,1,2], cycle_length 1: sources must hold
# bit0 AND bit2 => ONLY vertex 0. Its walk 0->1->2 accepts (2 != 0,
# label A, bit2? — NO: acceptance at the final hop also requires the
# final vertex to hold bit indices[2]=2 (nem_1.hpp:556-566 bitset
# check), and tv[2]={0} lacks it => walk fails, source 0 invalidated.
# Also LCC: t3 (C) requires t2: vertex 4's C bit3 requires an A
# neighbor with... mandatory bitset of t3 = {2}: hearing bit2 from 0.
# Hand-checked survivors: 0 {0,2}, 1 {1}, 2 {0}, 4 {3}.
# The DISCRIMINATING assertion: messages — only ONE initial token (from
# 0), none from 2 even though 2 holds the source bit0.
# ---------------------------------------------------------------------------


def test_path_sources_require_both_endpoint_bits():
    p = make_pattern(
        [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)],
        [A, B, A, C],
        diameter=3,
    )
    c = NonLocalConstraint(
        labels=np.array([A, B, A], dtype=np.uint64),
        indices=np.array([0, 1, 2], dtype=np.int64),
        cycle_length=1,
        valid_cycle=False,
        interleave_lcc=True,
        selected_vertices=False,
    )
    o, res = _oracle_after_lcc(
        [(0, 1), (0, 4), (1, 2)], [A, B, A, 99, C], p, [c]
    )
    assert o.tv[0] == 0b0101 and o.tv[2] == 0b0001
    assert o.tv[1] == 0b0010 and o.tv[4] == 0b1000
    tsm, msgs, _ = o.nlcc_call(c, 0, res)
    # only vertex 0 launches (vertex 2 lacks bit2). The position-0 send
    # goes along ALL of the source's active edges (nem_1.hpp:479-525):
    # h1 = 2 messages (0->1 and 0->4; the one at 4 dies on the label
    # check), h2 = 1 (1->2, not back to parent 0); final at 2 rejected
    # (no bit2) => source 0 fails
    assert tsm == {0: False}
    assert msgs == 3
