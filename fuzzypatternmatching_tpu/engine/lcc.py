"""LCC — local constraint checking as dense JAX supersteps.

This is the TPU-native re-expression of the reference's label-propagation
kernel (label_propagation_pattern_matching_nonunique_ee.hpp:1033-1155, with
the APM fuzzy acceptance of local_constraint_checking.hpp:1062-1113).

The asynchronous visitor protocol becomes one bulk superstep over
receiver-centric edge arrays:

  * each directed edge e = (v, u) in v's CSR row is an inbox slot: the
    message is the sender's candidate bitset ``tv[u]``, gated on the
    sender-side edge-active flag of the *reverse* edge (replacing the
    mailbox; visitor_queue.hpp:395-434),
  * acceptance = "the sender's bits intersect the pattern adjacency of any
    of my candidate bits" (the valid-parent scan, nonunique_ee.hpp:682-716),
  * ``template_neighbors`` accumulation = a segment-OR over each row,
    computed as 16 bit-plane segment-sums,
  * the per-vertex constraint check and edge elimination
    (verify_and_update_vertex_state, nonunique_ee.hpp:829-1027) are
    elementwise uint16 bit math.

State invariant: ``tv[v] != 0  <=>  v active  <=>  v in the vertex_state_map``
(the reference maintains these as three separate structures and keeps them
synchronized via delegate reductions; dense arrays make the invariant free).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import Graph
from ..pattern.pattern_graph import PatternGraph


@dataclass
class LccState:
    """Device-resident match state (one shard = whole graph, single chip)."""

    tv: jax.Array  # uint32 [V] template_vertices bitsets
    edge_alive: jax.Array  # bool [E]
    tp_flag: jax.Array  # bool [E] token-passing success marks (nem_1.hpp:762-770)


class LccEngine:
    def __init__(
        self,
        graph: Graph,
        labels: np.ndarray,
        pattern: PatternGraph,
        num_ranks: int = 1,
        counting: bool = False,
        edge_meta: tuple[np.ndarray, np.ndarray] | None = None,
    ):
        self.graph = graph
        self.p = pattern
        self.num_vertices = graph.num_vertices
        # output-rank attribution: cyclic owner like the reference's
        # non-delegate partitioning (impl/delegate_partitioned_graph.ipp:366)
        self.num_ranks = num_ranks
        self.owner = jnp.asarray(
            np.arange(graph.num_vertices, dtype=np.int64) % num_ranks,
            dtype=jnp.int32,
        )
        self.col = jnp.asarray(graph.cols, dtype=jnp.int32)
        self.erow = jnp.asarray(graph.edge_row, dtype=jnp.int32)
        rev = graph.rev_edge
        self.rev = jnp.asarray(np.where(rev < 0, 0, rev), dtype=jnp.int32)
        self.rev_valid = jnp.asarray(rev >= 0)
        self.k = pattern.vertex_count
        self.adj_all = jnp.asarray(pattern.edges_bitset_all, dtype=jnp.uint32)
        self.mand = jnp.asarray(pattern.edges_bitset, dtype=jnp.uint32)
        self.opt = jnp.asarray(pattern.edges_bitset_optional, dtype=jnp.uint32)
        self.opt_min = np.asarray(pattern.min_optional_edge_count)
        self.label_tv = jnp.asarray(
            pattern.label_match_bitset(np.asarray(labels)), dtype=jnp.uint32
        )
        # counting-LCC mode (label_propagation_pattern_matching_nonunique_
        # counting_ee.hpp): candidate i additionally requires >=
        # required[i, j] distinct valid-parent neighbors of label class j —
        # dense count segment-sums next to the bit-OR. The deduplicated
        # adjacency makes every accepted slot a distinct neighbor.
        self.counting = counting
        if counting:
            class_labels, self.required = pattern.neighbor_label_counts()
            lab = np.asarray(labels)
            sender_class = np.zeros(graph.num_edges, dtype=np.uint8)
            for j, cl in enumerate(class_labels):
                sender_class[lab[graph.cols] == cl] = j + 1
            self.col_class = jnp.asarray(sender_class)
        else:
            self.required = None
            self.col_class = jnp.zeros(graph.num_edges, dtype=jnp.uint8)
        # edge-metadata-constrained matching (opt-in; the reference stores
        # edge metadata — edge_data_db.hpp — but never enforces it,
        # beta.cpp:575): ``edge_meta`` = (allow [M+1, K] uint32 tables from
        # PatternGraph.edge_meta_tables, per-slot metadata codes [E]).
        # Messages then accumulate per receiver bit i only the parents
        # deliverable through an edge whose metadata pattern edge (p, i)
        # requires — an exact per-(pattern-edge, value) gate.
        if edge_meta is not None:
            allow, code = edge_meta
            self.meta_allow = jnp.asarray(allow, dtype=jnp.uint32)
            self.meta_code = jnp.asarray(code, dtype=jnp.int32)
        else:
            self.meta_allow = None
            self.meta_code = jnp.zeros(graph.num_edges, dtype=jnp.int32)
        self._step = jax.jit(partial(self._superstep), static_argnames=("init",))

    # -- helpers -----------------------------------------------------------

    def _or_over_bits(self, tv: jax.Array) -> jax.Array:
        """OR of pattern adjacency bitsets over each vertex's candidate bits
        — acceptance mask for incoming messages."""
        m = jnp.zeros_like(tv)
        for i in range(self.k):
            has = (tv >> i) & 1
            m = m | jnp.where(has != 0, self.adj_all[i], jnp.uint32(0))
        return m

    def _keep_mask(self, tn: jax.Array) -> jax.Array:
        """Per-template-vertex acceptance (fuzzy rule,
        local_constraint_checking.hpp:1062-1113) packed into a uint32 mask."""
        keep = jnp.zeros_like(tn)
        for i in range(self.k):
            ok_mand = (self.mand[i] & ~tn) == 0
            if self.opt_min[i] > 0:
                t = self.opt[i] & tn
                ok_opt = (t == self.opt[i]) & (
                    jax.lax.population_count(t) >= jnp.uint32(self.opt_min[i])
                )
                ok = ok_mand & ok_opt
            else:
                ok = ok_mand
            keep = keep | jnp.where(ok, jnp.uint32(1 << i), jnp.uint32(0))
        return keep

    def _keep_mask_per_i(self, tn_list: list) -> jax.Array:
        """Per-template-vertex acceptance with a SEPARATE tn per receiver
        bit (metadata mode: tn_list[i] holds only parents deliverable toward
        i through correctly-labeled edges)."""
        keep = jnp.zeros_like(tn_list[0])
        for i in range(self.k):
            tn_i = tn_list[i]
            ok = (self.mand[i] & ~tn_i) == 0
            if self.opt_min[i] > 0:
                t = self.opt[i] & tn_i
                ok = ok & (t == self.opt[i]) & (
                    jax.lax.population_count(t) >= jnp.uint32(self.opt_min[i])
                )
            keep = keep | jnp.where(ok, jnp.uint32(1 << i), jnp.uint32(0))
        return keep

    # -- one superstep -----------------------------------------------------

    def _superstep(
        self, tv, edge_alive, tp_flag, col, erow, rev, rev_valid, owner,
        col_class=None, meta_code=None, *, init: bool,
    ):
        # graph arrays arrive as jit ARGUMENTS: closing over them would
        # embed hundreds of MB of constants in the serialized HLO
        v = self.num_vertices
        meta = self.meta_allow is not None
        p_bits = tv[col]  # sender candidate bitsets per inbox slot
        if init:
            send_ok = p_bits != 0
        else:
            rev_alive = edge_alive[rev] & rev_valid
            send_ok = (p_bits != 0) & rev_alive
        p_bits = jnp.where(send_ok, p_bits, jnp.uint32(0))

        weights = (1 << jnp.arange(self.k, dtype=jnp.uint32))[None, :]

        def seg_or(bits):
            """Segment-OR of uint32 bitsets over rows, via bit planes."""
            planes = (
                (bits[:, None] >> jnp.arange(self.k, dtype=jnp.uint32)[None, :]) & 1
            ).astype(jnp.uint8)
            pl = jax.ops.segment_max(planes, erow, num_segments=v) > 0
            return jnp.sum(pl.astype(jnp.uint32) * weights, axis=1, dtype=jnp.uint32)

        def allow_of(i):
            """Per-slot allowed-parent mask toward receiver bit i, given
            each slot's metadata code."""
            return jnp.take(self.meta_allow[:, i], meta_code)

        if meta:
            # metadata mode: accept through per-slot allowed masks and
            # accumulate tn per receiver bit (exact per-(p, i, value) gate)
            tv_e = tv[erow]
            mask = jnp.zeros_like(p_bits)
            tn_list = []
            for i in range(self.k):
                allow_i = allow_of(i)
                has = ((tv_e >> i) & 1) != 0
                mask = mask | jnp.where(has, allow_i, jnp.uint32(0))
                tn_list.append(seg_or(p_bits & allow_i))
            accept = (p_bits & mask) != 0
            pa = jnp.where(accept, p_bits, jnp.uint32(0))
            in_map = (
                jax.ops.segment_max(
                    accept.astype(jnp.uint8), erow, num_segments=v
                )
                > 0
            )
            new_tv = tv & self._keep_mask_per_i(tn_list)
        else:
            adj_mask = self._or_over_bits(tv)
            accept = (p_bits & adj_mask[erow]) != 0
            pa = jnp.where(accept, p_bits, jnp.uint32(0))

            # segment-OR via bit planes: tn[v] = OR of accepted sender bitsets
            tn = seg_or(pa)

            in_map = tn != 0  # received at least one valid-parent message
            new_tv = tv & self._keep_mask(tn)
        if self.counting:
            keep_cnt = jnp.zeros(v, dtype=jnp.uint32)
            for i in range(self.k):
                if meta:
                    acc_i = (p_bits & allow_of(i)) != 0
                else:
                    acc_i = (pa & self.adj_all[i]) != 0
                ok_i = jnp.ones(v, dtype=bool)
                for j in range(self.required.shape[1]):
                    req = int(self.required[i, j])
                    if req <= 0:
                        continue
                    cnt = jax.ops.segment_sum(
                        (acc_i & (col_class == j + 1)).astype(jnp.int32),
                        erow, num_segments=v,
                    )
                    ok_i = ok_i & (cnt >= req)
                keep_cnt = keep_cnt | jnp.where(
                    ok_i, jnp.uint32(1 << i), jnp.uint32(0)
                )
            new_tv = new_tv & keep_cnt
        if init:
            new_tv = jnp.where(in_map, new_tv, jnp.uint32(0))
            died_from_map = in_map & (new_tv == 0)
        else:
            died_from_map = (tv != 0) & (new_tv == 0)

        row_live = new_tv[erow] != 0
        if init:
            new_alive = accept & row_live
        else:
            new_alive = edge_alive & (accept | tp_flag) & row_live

        eowner = owner[erow]
        av_r = jax.ops.segment_sum(
            (new_tv != 0).astype(jnp.int32), owner, num_segments=self.num_ranks
        )
        ae_r = jax.ops.segment_sum(
            new_alive.astype(jnp.int32), eowner, num_segments=self.num_ranks
        )
        msg_r = jax.ops.segment_sum(
            send_ok.astype(jnp.int32), eowner, num_segments=self.num_ranks
        )
        stats = (av_r, ae_r, msg_r, jnp.any(died_from_map))
        return new_tv, new_alive, jnp.zeros_like(tp_flag), stats

    # -- public API --------------------------------------------------------

    def init_state(self) -> LccState:
        e = self.graph.num_edges
        return LccState(
            tv=jnp.zeros(self.num_vertices, dtype=jnp.uint32),
            edge_alive=jnp.zeros(e, dtype=bool),
            tp_flag=jnp.zeros(e, dtype=bool),
        )

    def state_from_global(self, tv, edge_alive, tp_flag) -> LccState:
        return LccState(
            tv=jnp.asarray(tv.astype(np.uint32)),
            edge_alive=jnp.asarray(edge_alive),
            tp_flag=jnp.asarray(tp_flag),
        )

    def state_to_global(self, state: LccState):
        return np.asarray(state.tv), np.asarray(state.edge_alive)

    def lcc_call(
        self, state: LccState, global_init_step: bool,
        n_steps: int | None = None,
    ) -> tuple[LccState, list[tuple], bool]:
        """One label_propagation_pattern_matching_bsp call: ``diameter``
        supersteps. Returns (state, per-superstep
        (av, ae, msgs, per_rank_dict), any_died)."""
        tv, alive, flag = state.tv, state.edge_alive, state.tp_flag
        rows = []
        any_died = False
        for s in range(self.p.diameter if n_steps is None else n_steps):
            init = s == 0 and global_init_step
            if init:
                tv = self.label_tv  # all vertices start active (beta.cpp:491)
            tv, alive, flag, stats = self._step(
                tv, alive, flag, self.col, self.erow, self.rev,
                self.rev_valid, self.owner, self.col_class, self.meta_code,
                init=init,
            )
            av_r, ae_r, msg_r, died = stats
            av_r = np.asarray(av_r)
            ae_r = np.asarray(ae_r)
            msg_r = np.asarray(msg_r)
            rows.append(
                (
                    int(av_r.sum()),
                    int(ae_r.sum()),
                    int(msg_r.sum()),
                    {"av": av_r, "ae": ae_r, "msg": msg_r},
                )
            )
            any_died = any_died or bool(died)
        return LccState(tv, alive, flag), rows, any_died
