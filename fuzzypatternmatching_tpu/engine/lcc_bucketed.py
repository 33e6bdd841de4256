"""Bucketed-ELL LCC engine — the TPU-optimized layout for the hot kernel.

The flat-CSR engine (engine/lcc.py) spends its time in irregular segment
reductions — a poor fit for the VPU. This engine re-lays the adjacency into
degree buckets: vertices with similar (deduplicated) degree share a dense
``[rows, width]`` neighbor matrix padded to a power-of-two width. Each
superstep is then, per bucket:

  gather candidate bitsets -> elementwise accept -> bitwise-OR reduce along
  the width axis -> constraint check -> scatter back,

i.e. dense, statically-shaped vector work with no segment ops. Power-law
hubs land in their own wide buckets (a handful of rows, huge width) so the
reduction stays balanced — the same skew the reference handles with delegate
replication (impl/delegate_partitioned_graph.ipp:274-379).

Semantics are identical to LccEngine (tested); only the layout differs.
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
class Bucket:
    rows: np.ndarray  # vertex ids [n]
    adj: np.ndarray  # neighbor ids [n, w], sentinel V for padding
    rev: np.ndarray  # flat slot index of the reverse edge [n, w] (S = dead)
    valid: np.ndarray  # real-slot mask [n, w]
    slot_base: int  # flat offset of this bucket's slots
    edge_ids: np.ndarray  # original CSR edge index per slot [n, w], -1 pad


@dataclass
class BucketedState:
    tv: jax.Array  # uint32 [V]
    alive: jax.Array  # bool [S+1] flat slot-space (last slot always dead)
    tp_flag: jax.Array  # bool [S+1]


class BucketedLccEngine:
    """Drop-in replacement for LccEngine with the ELL layout."""

    def __init__(
        self,
        graph: Graph,
        labels: np.ndarray,
        pattern: PatternGraph,
        num_ranks: int = 1,
        min_width: int = 8,
    ):
        self.graph = graph
        self.p = pattern
        self.num_ranks = num_ranks
        v = graph.num_vertices
        self.num_vertices = v
        deg = np.diff(graph.row_ptr)

        # --- assign vertices to power-of-two width buckets ----------------
        widths: dict[int, list[int]] = {}
        for vertex in range(v):
            d = int(deg[vertex])
            if d == 0:
                continue
            w = max(min_width, 1 << int(np.ceil(np.log2(d))))
            widths.setdefault(w, []).append(vertex)

        self.buckets: list[Bucket] = []
        slot_base = 0
        for w in sorted(widths):
            rows = np.array(widths[w], dtype=np.int64)
            n = len(rows)
            adj = np.full((n, w), v, dtype=np.int32)
            eids = np.full((n, w), -1, dtype=np.int64)
            for i, vertex in enumerate(rows):
                lo, hi = int(graph.row_ptr[vertex]), int(graph.row_ptr[vertex + 1])
                adj[i, : hi - lo] = graph.cols[lo:hi]
                eids[i, : hi - lo] = np.arange(lo, hi)
            valid = eids >= 0
            self.buckets.append(
                Bucket(rows, adj, None, valid, slot_base, eids)
            )
            slot_base += n * w
        self.num_slots = slot_base

        # original edge id -> flat slot
        edge_to_slot = np.full(graph.num_edges, slot_base, dtype=np.int64)
        for b in self.buckets:
            flat_ids = b.edge_ids.reshape(-1)
            mask = flat_ids >= 0
            edge_to_slot[flat_ids[mask]] = (
                b.slot_base + np.nonzero(mask)[0]
            )
        self._edge_to_slot = edge_to_slot

        # reverse-edge slot per (row, width) cell; S = always-dead slot
        for b in self.buckets:
            rv = np.full(b.adj.shape, slot_base, dtype=np.int64)
            flat_ids = b.edge_ids.reshape(-1)
            mask = flat_ids >= 0
            rev_edges = graph.rev_edge[flat_ids[mask]]
            ok = rev_edges >= 0
            tmp = np.full(mask.sum(), slot_base, dtype=np.int64)
            tmp[ok] = edge_to_slot[rev_edges[ok]]
            rv.reshape(-1)[np.nonzero(mask)[0]] = tmp
            b.rev = rv

        # --- device constants ---------------------------------------------
        self.k = pattern.vertex_count
        self.adj_all = jnp.asarray(pattern.edges_bitset_all, dtype=jnp.uint32)
        self.mand = jnp.asarray(pattern.edges_bitset, dtype=jnp.uint32)
        self.opt = jnp.asarray(pattern.edges_bitset_optional, dtype=jnp.uint32)
        self.opt_min = np.asarray(pattern.min_optional_edge_count)
        lab_tv = pattern.label_match_bitset(np.asarray(labels)).astype(np.uint32)
        self.label_tv = jnp.asarray(lab_tv)
        self.owner = jnp.asarray(
            np.arange(v, dtype=np.int64) % num_ranks, dtype=jnp.int32
        )
        self._dev = [
            (
                jnp.asarray(b.rows, dtype=jnp.int32),
                jnp.asarray(b.adj),
                jnp.asarray(b.rev, dtype=jnp.int32),
                jnp.asarray(b.valid),
            )
            for b in self.buckets
        ]
        self._step = jax.jit(
            partial(self._superstep), static_argnames=("init",)
        )
        self._call_init = jax.jit(partial(self._call_impl, init=True))
        self._call_cont = jax.jit(partial(self._call_impl, init=False))

    # ------------------------------------------------------------------

    def _or_over_bits(self, tv):
        m = jnp.zeros_like(tv)
        for i in range(self.k):
            m = m | jnp.where((tv >> i) & 1 != 0, self.adj_all[i], jnp.uint32(0))
        return m

    def _keep_mask(self, tn):
        keep = jnp.zeros_like(tn)
        for i in range(self.k):
            ok = (self.mand[i] & ~tn) == 0
            if self.opt_min[i] > 0:
                t = self.opt[i] & tn
                ok = ok & (t == self.opt[i]) & (
                    jax.lax.population_count(t) >= jnp.uint32(self.opt_min[i])
                )
            keep = keep | jnp.where(ok, jnp.uint32(1 << i), jnp.uint32(0))
        return keep

    def _superstep(self, tv, alive, tp_flag, bucket_arrays, *, init: bool):
        v = self.num_vertices
        tv_pad = jnp.concatenate([tv, jnp.zeros(1, dtype=jnp.uint32)])
        new_tv = jnp.zeros_like(tv)
        new_alive_parts = []
        av = ae = msgs = jnp.int32(0)
        av_r = jnp.zeros(self.num_ranks, dtype=jnp.int32)
        ae_r = jnp.zeros(self.num_ranks, dtype=jnp.int32)
        msg_r = jnp.zeros(self.num_ranks, dtype=jnp.int32)
        died = jnp.bool_(False)

        for bkt, (rows, adj, rev, valid) in zip(self.buckets, bucket_arrays):
            n, w = adj.shape
            base = bkt.slot_base  # static python int
            p_bits = tv_pad[adj]
            if init:
                send_ok = (p_bits != 0) & valid
            else:
                send_ok = (p_bits != 0) & alive[rev]
            p_bits = jnp.where(send_ok, p_bits, jnp.uint32(0))

            tvb = tv[rows]
            adj_mask = self._or_over_bits(tvb)
            accept = (p_bits & adj_mask[:, None]) != 0
            pa = jnp.where(accept, p_bits, jnp.uint32(0))
            tn = jax.lax.reduce(
                pa, np.uint32(0), jax.lax.bitwise_or, dimensions=[1]
            )

            in_map = tn != 0
            new_tvb = tvb & self._keep_mask(tn)
            if init:
                new_tvb = jnp.where(in_map, new_tvb, jnp.uint32(0))
                died_b = in_map & (new_tvb == 0)
            else:
                died_b = (tvb != 0) & (new_tvb == 0)
            died = died | jnp.any(died_b)

            row_live = new_tvb != 0
            if init:
                new_alive_b = accept & row_live[:, None]
            else:
                own_alive = alive[base : base + n * w].reshape(n, w)
                own_flag = tp_flag[base : base + n * w].reshape(n, w)
                new_alive_b = own_alive & (accept | own_flag) & row_live[:, None]
            new_alive_parts.append(new_alive_b.reshape(-1))
            new_tv = new_tv.at[rows].set(new_tvb)

            ownb = self.owner[rows]
            av_r = av_r + jax.ops.segment_sum(
                (new_tvb != 0).astype(jnp.int32), ownb,
                num_segments=self.num_ranks,
            )
            ae_r = ae_r + jax.ops.segment_sum(
                jnp.sum(new_alive_b, axis=1).astype(jnp.int32), ownb,
                num_segments=self.num_ranks,
            )
            msg_r = msg_r + jax.ops.segment_sum(
                jnp.sum(send_ok, axis=1).astype(jnp.int32), ownb,
                num_segments=self.num_ranks,
            )

        new_alive_flat = jnp.concatenate(
            new_alive_parts + [jnp.zeros(1, dtype=bool)]
        )
        return (
            new_tv,
            new_alive_flat,
            jnp.zeros_like(tp_flag),
            (av_r, ae_r, msg_r, died),
        )

    # ------------------------------------------------------------------

    def init_state(self) -> BucketedState:
        return BucketedState(
            tv=jnp.zeros(self.num_vertices, dtype=jnp.uint32),
            alive=jnp.zeros(self.num_slots + 1, dtype=bool),
            tp_flag=jnp.zeros(self.num_slots + 1, dtype=bool),
        )

    def state_from_global(self, tv, edge_alive, tp_flag) -> BucketedState:
        al = np.zeros(self.num_slots + 1, dtype=bool)
        fl = np.zeros(self.num_slots + 1, dtype=bool)
        al[self._edge_to_slot] = edge_alive
        fl[self._edge_to_slot] = tp_flag
        al[-1] = False
        fl[-1] = False
        return BucketedState(
            tv=jnp.asarray(tv.astype(np.uint32)),
            alive=jnp.asarray(al),
            tp_flag=jnp.asarray(fl),
        )

    def state_to_global(self, state: BucketedState):
        tv = np.asarray(state.tv)
        al_flat = np.asarray(state.alive)
        edge_alive = al_flat[self._edge_to_slot]
        return tv, edge_alive

    def _call_impl(self, tv, alive, flag, bucket_arrays, *, init: bool):
        """All ``diameter`` supersteps in one traced program: one host
        round-trip per LCC call instead of one per superstep (the remote-TPU
        latency otherwise dominates the whole search)."""
        n_steps = self.p.diameter
        stats_list = []
        if init:
            tv = self.label_tv
            tv, alive, flag, st = self._superstep(
                tv, alive, flag, bucket_arrays, init=True
            )
            stats_list.append(st)
            n_steps -= 1

        def body(carry, _):
            tv, alive, flag = carry
            tv, alive, flag, st = self._superstep(
                tv, alive, flag, bucket_arrays, init=False
            )
            return (tv, alive, flag), st

        if n_steps > 0:
            (tv, alive, flag), st_scan = jax.lax.scan(
                body, (tv, alive, flag), None, length=n_steps
            )
        else:
            st_scan = None
        return tv, alive, flag, stats_list, st_scan

    def lcc_call(self, state: BucketedState, global_init_step: bool):
        call = self._call_init if global_init_step else self._call_cont
        tv, alive, flag, head, st_scan = call(
            state.tv, state.alive, state.tp_flag, self._dev
        )
        rows = []
        any_died = False

        def emit(av_r, ae_r, msg_r, died):
            nonlocal any_died
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

        for st in head:
            emit(*st)
        if st_scan is not None:
            av_s, ae_s, msg_s, died_s = (np.asarray(x) for x in st_scan)
            for i in range(av_s.shape[0]):
                emit(av_s[i], ae_s[i], msg_s[i], died_s[i])
        return BucketedState(tv, alive, flag), rows, any_died
