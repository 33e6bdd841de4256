"""Bucketed-ELL LCC engine — the TPU-optimized layout for the hot kernel.

The flat-CSR engine (engine/lcc.py) spends its time in irregular segment
reductions — a poor fit for the VPU. This engine re-lays the adjacency into
degree buckets: vertices with similar (deduplicated) degree share a dense
``[rows, width]`` neighbor matrix padded to a power-of-two width. Each
superstep is then, per bucket:

  gather candidate bitsets -> elementwise accept -> bitwise-OR reduce along
  the width axis -> constraint check -> scatter back,

i.e. dense, statically-shaped vector work with no large segment ops.
Power-law hubs beyond ``max_width`` are *split* across multiple rows of the
widest bucket (their partial ORs are combined with a tiny segment reduce) —
the same skew the reference handles with delegate replication
(impl/delegate_partitioned_graph.ipp:274-379), done here with row splitting
instead of cross-rank replication. The bucket count stays small (~9), which
keeps the unrolled program compact for the compiler.

All supersteps of an LCC call run in a single jitted init+scan program —
one host round trip per call (n_steps-parametrized for the driver's
compact-continuation splitting).

Semantics are identical to LccEngine (cross-tested); only the layout
differs.
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
    rows: np.ndarray  # vertex id per row [n] (repeats for split hubs)
    adj: np.ndarray  # neighbor ids [n, w], sentinel V for padding
    rev: np.ndarray  # flat slot index of the reverse edge [n, w] (S = dead)
    valid: np.ndarray  # real-slot mask [n, w]
    slot_base: int  # flat offset of this bucket's slots
    edge_ids: np.ndarray  # original CSR edge index per slot [n, w], -1 pad
    # split-hub support (only the widest bucket can have multi-row vertices)
    seg_id: np.ndarray  # row -> compact vertex segment id [n]
    seg_rows: np.ndarray  # segment id -> vertex id [n_seg]


@dataclass
class BucketedState:
    tv: jax.Array  # uint32 [V]
    alive: jax.Array  # bool [S+1] flat slot-space (last slot always dead)
    tp_flag: jax.Array  # bool [S+1]
    # memo for alive_pairs (the driver asks several times per phase)
    pairs_cache: tuple | None = None
    # host copy of tv when it was uploaded from the host (avoids an
    # immediate V-sized download through the device tunnel)
    tv_np: np.ndarray | None = None
    # LAZY representation: once the search lives on the compact pruned
    # subgraph, the full-engine state is only read back on the host
    # (tv_host / alive_pairs / state_to_global); holding it as original
    # edge ids avoids every per-iteration device upload. Device arrays
    # (tv/alive/tp_flag above are None then) materialize only if a full
    # lcc_call actually runs.
    lazy_edge_ids: np.ndarray | None = None  # sorted original edge ids
    lazy_flag_ids: np.ndarray | None = None  # TP-marked original edge ids
    # bit-packed alive, produced INSIDE the lcc_call program: alive_pairs
    # then only downloads (no extra pack dispatch through the tunnel)
    packed: jax.Array | None = None
    # True when this state is the result of the GLOBAL INIT superstep alone
    # (n_steps=1, no metadata/counting constraints): tv AND the alive pairs
    # are then exact functions of (labels, graph, live-row set), so tv_host
    # and alive_pairs REBUILD both on the host from the V-bit live_packed
    # bitmap instead of pulling the V-sized tv and S-bit alive arrays
    # through the tunnel (see BucketedLccEngine._recon_tv / _recon_pairs)
    recon_init: bool = False
    # bit-packed (tv != 0), produced in-program — the only download the
    # production init superstep needs (V/8 bytes)
    live_packed: jax.Array | None = None
    # recon-eligible init calls return tv as per-bucket SEG-ordered parts
    # (tv is None then): the V-sized seg_all[inv_perm] exit gather — a
    # measured 16 ms at s21 (BENCH_INIT_DECOMPOSE.json) — is skipped and
    # paid lazily only if a later full call actually consumes vertex-
    # ordered tv. live_packed is then in seg order too.
    tv_segs: tuple | None = None
    live_seg_order: bool = False
    # recon-eligible init calls do NOT materialize the S-sized alive/flag
    # arrays at all (alive/tp_flag are None): at the global init step the
    # alive set is a pure function of (labels, graph, new tv), so the
    # production path (host reconstruction + compact continuation) never
    # consumes them — the ~22 ms write+concat is skipped
    # (BENCH_INIT_DECOMPOSE.json no_alive_path) and a later full call
    # rebuilds them on device via _ensure_alive (no host transfer)
    alive_from_init: bool = False


class BucketedLccEngine:
    """Drop-in replacement for LccEngine with the ELL layout."""

    def __init__(
        self,
        graph: Graph,
        labels: np.ndarray,
        pattern: PatternGraph,
        num_ranks: int = 1,
        min_width: int = 8,
        max_width: int = 8192,
        use_pallas: bool = False,
        pallas_interpret: bool = False,
        edge_meta: tuple[np.ndarray, np.ndarray] | None = None,
        counting: bool = False,
    ):
        self.graph = graph
        self.p = pattern
        self.num_ranks = num_ranks
        # Pallas fused superstep (ops/lcc_superstep.py): VMEM-resident
        # uint16 tv table + bit-packed alive flags; the two random HBM
        # gathers of the XLA path become VMEM lookups. Opt-in — measured
        # A/B by tools/pallas_ab_bench.py.
        self.use_pallas = use_pallas
        self.pallas_interpret = pallas_interpret
        v = graph.num_vertices
        self.num_vertices = v
        deg = np.diff(graph.row_ptr)

        # --- vectorized bucket assignment ---------------------------------
        nz = np.nonzero(deg > 0)[0]
        dnz = deg[nz]
        wexp = np.maximum(
            int(np.log2(min_width)),
            np.ceil(np.log2(np.maximum(dnz, 1))).astype(np.int64),
        )
        wexp = np.minimum(wexp, int(np.log2(max_width)))
        widths_present = np.unique(wexp)

        self.buckets: list[Bucket] = []
        slot_base = 0
        cap_exp = int(np.log2(max_width))
        for we in widths_present:
            w = 1 << int(we)
            vs = nz[wexp == we]
            if we == cap_exp:
                # split rows: vertex occupies ceil(d/w) rows
                n_rows_per = -(-deg[vs] // w)
                rows = np.repeat(vs, n_rows_per)
                seg_id = np.repeat(
                    np.arange(len(vs), dtype=np.int64), n_rows_per
                )
                chunk = (
                    np.arange(len(rows), dtype=np.int64)
                    - np.repeat(np.cumsum(n_rows_per) - n_rows_per, n_rows_per)
                )
                starts = graph.row_ptr[rows] + chunk * w
                lens = np.minimum(graph.row_ptr[rows + 1] - starts, w)
                seg_rows = vs
            else:
                rows = vs
                seg_id = np.arange(len(vs), dtype=np.int64)
                seg_rows = vs
                starts = graph.row_ptr[rows]
                lens = deg[rows]
            n = len(rows)
            offs = np.arange(w, dtype=np.int64)[None, :]
            valid = offs < lens[:, None]
            eidx = np.minimum(starts[:, None] + offs, graph.num_edges - 1)
            adj = np.where(valid, graph.cols[eidx], v).astype(np.int32)
            eids = np.where(valid, eidx, -1)
            self.buckets.append(
                Bucket(rows, adj, None, valid, slot_base, eids, seg_id, seg_rows)
            )
            slot_base += n * w
        self.num_slots = slot_base

        # original edge id <-> flat slot
        edge_to_slot = np.full(graph.num_edges, slot_base, dtype=np.int64)
        for b in self.buckets:
            flat_ids = b.edge_ids.reshape(-1)
            mask = flat_ids >= 0
            edge_to_slot[flat_ids[mask]] = b.slot_base + np.nonzero(mask)[0]
        self._edge_to_slot = edge_to_slot

        for b in self.buckets:
            flat_ids = b.edge_ids.reshape(-1)
            mask = flat_ids >= 0
            rv_flat = np.full(flat_ids.shape, slot_base, dtype=np.int64)
            rev_edges = graph.rev_edge[flat_ids[mask]]
            ok = rev_edges >= 0
            tmp = np.full(int(mask.sum()), slot_base, dtype=np.int64)
            tmp[ok] = edge_to_slot[rev_edges[ok]]
            rv_flat[np.nonzero(mask)[0]] = tmp
            b.rev = rv_flat.reshape(b.adj.shape)

        # --- init-superstep label codes -------------------------------------
        # At the global init superstep tv == label_match_bitset(labels), so
        # the E-sized random gather tv_pad[adj] is a pure function of the
        # neighbor's label. Precompute a small-int label index per slot
        # (pattern-independent graph metadata, like the reference's
        # vertex_data_db) and replay it at init as one vectorized select per
        # distinct template label — streaming HBM reads, no random access.
        uniq_labels, inv_lab = np.unique(np.asarray(labels), return_inverse=True)
        code_dtype = np.uint8 if len(uniq_labels) <= 255 else np.uint16
        code_pad = np.zeros(v + 1, dtype=code_dtype)
        code_pad[:v] = (inv_lab + 1).astype(code_dtype)
        self._adj_codes = [code_pad[b.adj] for b in self.buckets]
        lab_tv_uniq = pattern.label_match_bitset(uniq_labels)
        self._init_pairs = [
            (code_dtype(j + 1), np.uint32(bits))
            for j, bits in enumerate(lab_tv_uniq)
            if bits
        ]

        # --- device constants ---------------------------------------------
        self.k = pattern.vertex_count
        self.adj_all = jnp.asarray(pattern.edges_bitset_all, dtype=jnp.uint32)
        self.mand = jnp.asarray(pattern.edges_bitset, dtype=jnp.uint32)
        self.opt = jnp.asarray(pattern.edges_bitset_optional, dtype=jnp.uint32)
        self.opt_min = np.asarray(pattern.min_optional_edge_count)
        lab_tv = pattern.label_match_bitset(np.asarray(labels)).astype(np.uint32)
        self._label_tv_np = lab_tv  # host copy for tv_host reconstruction
        self.label_tv = jnp.asarray(lab_tv)
        self.owner = jnp.asarray(
            np.arange(v, dtype=np.int64) % num_ranks, dtype=jnp.int32
        )
        seg_concat = np.concatenate([b.seg_rows for b in self.buckets]) if self.buckets else np.empty(0, np.int64)
        inv = np.full(v, len(seg_concat), dtype=np.int64)
        inv[seg_concat] = np.arange(len(seg_concat))
        self._inv_perm = jnp.asarray(inv, dtype=jnp.int32)
        self._seg_concat = seg_concat  # host map: seg position -> vertex
        # init-superstep seg-space constants: at the global init step
        # tv == label_tv, so tv[seg_rows] and its valid-parent OR mask
        # are pure functions of the labels — precomputed here, they
        # remove the V-sized entry gather from the init superstep
        # (measured 9 ms at s21, BENCH_INIT_DECOMPOSE.json)
        adj_all_np = np.asarray(pattern.edges_bitset_all, dtype=np.uint32)

        def _or_bits_np(tv_np):
            m = np.zeros_like(tv_np)
            for i in range(pattern.vertex_count):
                m |= np.where((tv_np >> i) & 1 != 0, adj_all_np[i], 0).astype(
                    np.uint32
                )
            return m

        lab_tv_np = pattern.label_match_bitset(np.asarray(labels)).astype(
            np.uint32
        )
        self._init_tv_seg = [
            jnp.asarray(lab_tv_np[b.seg_rows]) for b in self.buckets
        ]
        self._init_adjmask_seg = [
            jnp.asarray(_or_bits_np(lab_tv_np[b.seg_rows]))
            for b in self.buckets
        ]
        # lazy seg -> vertex-order materializer (the skipped exit gather)
        self._seg2v = jax.jit(
            lambda parts: jnp.concatenate(
                list(parts) + [jnp.zeros(1, dtype=jnp.uint32)]
            )[self._inv_perm]
        )
        # lane-packed device planes: see _lane_group — [n, w<128] buckets
        # upload as [ceil(n/g), g*w] so physical (tiled) bytes equal
        # logical bytes; padded rows carry dead values (adj=V sentinel,
        # rev=S dead slot, valid=False, code=0 non-matching)
        self._groups = [
            self._lane_group(b.adj.shape[1]) for b in self.buckets
        ]
        self._dev = [
            (
                jnp.asarray(b.rows, dtype=jnp.int32),
                jnp.asarray(self._pack2d_np(b.adj, g, v)),
                jnp.asarray(
                    self._pack2d_np(b.rev, g, self.num_slots),
                    dtype=jnp.int32,
                ),
                # the per-slot validity plane is no longer consumed by any
                # program (the gate was dropped with the half-step widths);
                # a 1-element placeholder keeps the tuple arity without
                # holding an S-sized bool plane in HBM (~0.76 GB at s24)
                jnp.zeros(1, dtype=bool),
                jnp.asarray(b.seg_id, dtype=jnp.int32),
                jnp.asarray(b.seg_rows, dtype=jnp.int32),
                jnp.asarray(self._pack2d_np(code, g, 0)),
            )
            for b, code, g in zip(
                self.buckets, self._adj_codes, self._groups
            )
        ]
        # edge-metadata-constrained matching (see LccEngine): ``edge_meta``
        # = (allow [M+1, K] uint32 tables, per-original-edge codes [E]).
        # Slot codes live in the ELL layout (padding -> the all-zero row M);
        # the superstep then accumulates tn per receiver bit through
        # per-slot allowed-parent masks.
        if edge_meta is not None:
            if use_pallas:
                raise ValueError(
                    "edge-metadata matching is not supported with the "
                    "Pallas superstep"
                )
            allow, ecode = edge_meta
            ecode = np.asarray(ecode, dtype=np.int64)
            mzero = allow.shape[0] - 1  # the all-zero allow row
            self.meta_allow = jnp.asarray(allow, dtype=jnp.uint32)
            self._meta_dev = [
                jnp.asarray(
                    self._pack2d_np(
                        np.where(
                            b.edge_ids >= 0,
                            ecode[np.maximum(b.edge_ids, 0)],
                            mzero,
                        ).astype(np.int32),
                        g, mzero,
                    )
                )
                for b, g in zip(self.buckets, self._groups)
            ]
        else:
            self.meta_allow = None
            self._meta_dev = None
        # counting-LCC mode (see LccEngine: nonunique_counting_ee.hpp,
        # counting_ee.hpp:784-790): candidate i additionally requires >=
        # required[i, j] distinct valid-parent neighbors of label class j.
        # Per-bucket sender-class codes ride the ELL layout (padding -> 0);
        # counts are row sums, split hubs combine partials by segment_sum.
        self.counting = counting
        if counting:
            if use_pallas:
                raise ValueError(
                    "counting mode is not supported with the Pallas superstep"
                )
            class_labels, self.required = pattern.neighbor_label_counts()
            lab = np.asarray(labels)
            class_pad = np.zeros(v + 1, dtype=np.uint8)
            for j, cl in enumerate(class_labels):
                class_pad[:v][lab == cl] = j + 1
            self._class_dev = [
                jnp.asarray(self._pack2d_np(class_pad[b.adj], g, 0))
                for b, g in zip(self.buckets, self._groups)
            ]
        else:
            self.required = None
            self._class_dev = None
        self._call_cache = {}
        self._deferred_alive = None  # jit cache for _ensure_alive
        # bit-packed transfers: the flat alive array is ~S bytes as bool;
        # packing on device cuts the host<->device tunnel traffic 8x
        self._pack = jax.jit(lambda b: jnp.packbits(b))
        self._unpack = jax.jit(
            lambda p: jnp.unpackbits(p, count=self.num_slots + 1).astype(bool)
        )

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

    def _tv_device(self, state: "BucketedState"):
        """Vertex-ordered device tv; materializes lazily from the
        seg-space parts a recon-init call returned (paying the skipped
        inv_perm gather only when actually consumed)."""
        if state.tv is None and state.tv_segs is not None:
            state.tv = self._seg2v(state.tv_segs)
        return state.tv

    def _live_host(self, state: "BucketedState") -> np.ndarray:
        """V-bool live-row bitmap from the packed download; recon-init
        states carry it in seg order (position = bucket seg slot), so
        scatter through the seg->vertex map. Vertices outside every
        bucket (degree 0) are never live after the init superstep."""
        if state.live_seg_order:
            bits = np.unpackbits(
                np.asarray(state.live_packed), count=len(self._seg_concat)
            ).view(bool)
            live = np.zeros(self.num_vertices, dtype=bool)
            live[self._seg_concat] = bits
            return live
        return np.unpackbits(
            np.asarray(state.live_packed), count=self.num_vertices
        ).view(bool)

    def _recon_pairs(self, state: "BucketedState"):
        """Rebuild the alive (row, col) pairs after the global init
        superstep from the V-bit live-row bitmap (engine/init_recon.py,
        shared with the mesh plane). Returns None when the surviving
        adjacency is too large for a cheap host pass (caller then falls
        back to the packed download)."""
        from .init_recon import recon_pairs

        live = self._live_host(state)
        out = recon_pairs(self.graph, self.p, self._label_tv_np, live)
        return None if out is None else out[:2]

    def _recon_tv(self, state: "BucketedState") -> np.ndarray:
        """Rebuild tv after the global init superstep from alive pairs
        (engine/init_recon.py: tv is a pure function of labels + the
        surviving slots at init). Saves the V-sized device pull on the
        production search path (only the packed alive bitmap crosses).
        Requires: no edge-metadata / counting constraints (checked by the
        recon_init flag set in lcc_call)."""
        from .init_recon import recon_tv

        arow, acol = self.alive_pairs(state)
        return recon_tv(
            self.p, self._label_tv_np, self.num_vertices, arow, acol
        )

    def _keep_mask_per_i(self, tn_list):
        """Acceptance with a SEPARATE tn per receiver bit (metadata mode)."""
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

    # -- lane packing of narrow buckets -------------------------------
    # TPU tiles the two minormost dims to (8, 128) (32-bit types), so a
    # 2-D [n, w<128] array physically occupies 128 lanes per row — 16x
    # inflation for the w=8 bucket, which is what put s24's statics at
    # 16.81 GiB > 16 GiB HBM (BENCH_HBM_S24.json, docs/ROOFLINE.md
    # round-5 s24 section). Packing g = 128/w logical rows per physical
    # row makes physical == logical bytes. A row-major reshape
    # [n, w] -> [N, g*w] preserves the FLAT slot order, so slot_base,
    # edge_to_slot, rev targets and the alive bitmap layout are all
    # unchanged — only the device-side 2-D view and the in-kernel
    # reduce/broadcast shapes differ.

    def _lane_group(self, w: int) -> int:
        if self.use_pallas:  # pallas kernels expect the [n, w] view
            return 1
        return max(1, 128 // w)

    @staticmethod
    def _pack2d_np(a: np.ndarray, g: int, fill):
        """Host-side: pad rows to a multiple of g, reshape to [N, g*w]."""
        if g == 1:
            return a
        n, w = a.shape
        n_pad = -(-n // g) * g
        if n_pad != n:
            a = np.concatenate(
                [a, np.full((n_pad - n, w), fill, dtype=a.dtype)], axis=0
            )
        return a.reshape(n_pad // g, g * w)

    @staticmethod
    def _slot2d(flat, base: int, n: int, w: int, g: int):
        """Device view of a flat slot-space slice as the packed 2-D
        bucket plane (padded lanes carry the flat array's dead value)."""
        seg = flat[base : base + n * w]
        if g == 1:
            return seg.reshape(n, w)
        n_pad = -(-n // g) * g
        seg = jnp.pad(seg, (0, (n_pad - n) * w))
        return seg.reshape(n_pad // g, g * w)

    @staticmethod
    def _rowbc(vals, n: int, w: int, g: int):
        """Per-logical-row [n] values broadcast to the packed plane
        ([n, 1] when unpacked — the old broadcasting shape)."""
        if g == 1:
            return vals[:, None]
        n_pad = -(-n // g) * g
        v = jnp.pad(vals, (0, n_pad - n))
        return jnp.repeat(v.reshape(n_pad // g, g), w, axis=1)

    @staticmethod
    def _fold(mat, op, n: int, w: int):
        """Per-logical-row reduce of a packed plane via pairwise lane
        folds (blocks of w stay contiguous at every fold level)."""
        x = mat
        ww = w
        while ww > 1:
            x = op(x[:, 0::2], x[:, 1::2])
            ww //= 2
        return x.reshape(-1)[:n]

    def _red_or(self, mat, n, w, g):
        if g == 1:
            return jax.lax.reduce(
                mat, np.uint32(0), jax.lax.bitwise_or, dimensions=[1]
            )
        return self._fold(mat, jnp.bitwise_or, n, w)

    def _red_sum(self, mat, n, w, g):
        if g == 1:
            return jnp.sum(mat, axis=1)
        return self._fold(mat, jnp.add, n, w)

    def _red_any(self, mat, n, w, g):
        if g == 1:
            return jnp.any(mat, axis=1)
        return self._fold(mat, jnp.logical_or, n, w)

    @staticmethod
    def _segment_or(values, seg_id, n_seg):
        """OR-combine uint32 values per segment (tiny: split-hub partials)."""
        planes = (
            (values[:, None] >> jnp.arange(16, dtype=jnp.uint32)[None, :]) & 1
        ).astype(jnp.uint8)
        seg = jax.ops.segment_max(planes, seg_id, num_segments=n_seg) > 0
        weights = (1 << jnp.arange(16, dtype=jnp.uint32))[None, :]
        return jnp.sum(seg.astype(jnp.uint32) * weights, axis=1, dtype=jnp.uint32)

    def _superstep(self, tv, alive, tp_flag, bucket_arrays, consts, *,
                   init: bool, seg_out: bool = False):
        owner, inv_perm = consts["owner"], consts["inv_perm"]
        new_tv_parts = []  # per-bucket seg outputs; combined by one gather
        new_alive_parts = []
        av_r = jnp.zeros(self.num_ranks, dtype=jnp.int32)
        ae_r = jnp.zeros(self.num_ranks, dtype=jnp.int32)
        msg_r = jnp.zeros(self.num_ranks, dtype=jnp.int32)
        died = jnp.bool_(False)

        use_pallas = self.use_pallas and not init
        if use_pallas:
            from ..ops.lcc_superstep import pack_alive

            tv_pad = jnp.concatenate([tv, jnp.zeros(1, dtype=jnp.uint32)])
            tv_table = tv_pad.astype(jnp.uint16)
            alive_bits = pack_alive(alive)
        elif not init:
            # ONE random gather per slot instead of two. The superstep needs
            # tv_pad[adj] (sender candidates) and alive[rev] (sender-side
            # flag); but tv_pad[adj[s]] == tv[row(rev[s])], so a per-slot
            # payload (alive << 31 | tv-of-owning-row), built with streaming
            # segment broadcasts, makes payload[rev] deliver both. The two
            # ~S-element random HBM gathers (the dominant superstep cost,
            # docs/ROOFLINE.md) collapse into one.
            parts = []
            for bkt, g, (rows, adj, rev, valid, seg_id, seg_rows, _c) in zip(
                self.buckets, self._groups, bucket_arrays
            ):
                n, w = bkt.adj.shape  # logical shape; device is packed
                base = bkt.slot_base
                tv_rows = tv[seg_rows][seg_id]  # [n] broadcast per row
                own_alive = self._slot2d(alive, base, n, w, g)
                parts.append(
                    (
                        jnp.where(
                            own_alive,
                            jnp.uint32(0x80000000),
                            jnp.uint32(0),
                        )
                        | self._rowbc(tv_rows, n, w, g)
                    ).reshape(-1)[: n * w]
                )
            payload_pad = jnp.concatenate(
                parts + [jnp.zeros(1, dtype=jnp.uint32)]
            )

        metas = consts.get("meta")
        for bi, (bkt, (rows, adj, rev, valid, seg_id, seg_rows, adj_code)) in (
            enumerate(zip(self.buckets, bucket_arrays))
        ):
            n, w = bkt.adj.shape  # logical; device planes are lane-packed
            g = self._groups[bi]
            n_seg = len(bkt.seg_rows)
            split = n_seg != n
            base = bkt.slot_base  # static python int
            if init and "init_tv_seg" in consts:
                # tv == label_tv at the global init step: both the seg
                # gather and its OR mask are precomputed constants
                tv_seg = consts["init_tv_seg"][bi]
                adj_mask_seg = consts["init_adjmask_seg"][bi]
            else:
                tv_seg = tv[seg_rows]  # per-vertex candidates [n_seg]
                adj_mask_seg = self._or_over_bits(tv_seg)
            if init:
                # tv == label_tv at init: rebuild the neighbor bitsets from
                # the precomputed label codes (a few selects; padding and
                # non-template labels are code-mismatches -> 0) instead of
                # the E-sized random gather
                p_bits = jnp.zeros(adj_code.shape, dtype=jnp.uint32)
                for cidx, bits in self._init_pairs:
                    p_bits = p_bits | jnp.where(
                        adj_code == cidx, bits, jnp.uint32(0)
                    )
                send_ok = p_bits != 0
            elif use_pallas:
                from ..ops.lcc_superstep import (
                    gather_accept_or,
                    rev_alive_lookup,
                )

                alive_rev = rev_alive_lookup(
                    rev, alive_bits, interpret=self.pallas_interpret
                )
                tn16, accept, sendok_rows = gather_accept_or(
                    adj, alive_rev,
                    adj_mask_seg[seg_id].astype(jnp.uint16),
                    tv_table, interpret=self.pallas_interpret,
                )
                tn_rows = tn16.astype(jnp.uint32)
            else:
                p = payload_pad[rev]
                p_bits = p & jnp.uint32(0x7FFFFFFF)
                send_ok = (p_bits != 0) & (p >= jnp.uint32(0x80000000))
                p_bits = jnp.where(send_ok, p_bits, jnp.uint32(0))

            if self.meta_allow is not None:
                # metadata mode: per-slot allowed-parent masks (the slot's
                # static edge-metadata code selects the allow row) and a
                # SEPARATE tn per receiver bit — exact per (p, i, value)
                mc = metas[bi]  # packed-plane int32 codes
                mask = jnp.zeros(mc.shape, dtype=jnp.uint32)
                tn_list = []
                for i in range(self.k):
                    allow_i = jnp.take(self.meta_allow[:, i], mc)
                    has_i = (((tv_seg >> i) & 1) != 0)[seg_id]  # [n]
                    mask = mask | jnp.where(
                        self._rowbc(has_i, n, w, g), allow_i, jnp.uint32(0)
                    )
                    tn_i_rows = self._red_or(p_bits & allow_i, n, w, g)
                    tn_list.append(
                        self._segment_or(tn_i_rows, seg_id, n_seg)
                        if split
                        else tn_i_rows
                    )
                accept = (p_bits & mask) != 0
                row_any = self._red_any(accept, n, w, g)
                if split:
                    in_map = (
                        jax.ops.segment_max(
                            row_any.astype(jnp.uint8), seg_id,
                            num_segments=n_seg,
                        )
                        > 0
                    )
                else:
                    in_map = row_any
                new_tv_seg = tv_seg & self._keep_mask_per_i(tn_list)
            else:
                if not use_pallas:
                    accept = (
                        p_bits & self._rowbc(adj_mask_seg[seg_id], n, w, g)
                    ) != 0
                    pa = jnp.where(accept, p_bits, jnp.uint32(0))
                    tn_rows = self._red_or(pa, n, w, g)
                if split:
                    tn = self._segment_or(tn_rows, seg_id, n_seg)
                else:
                    tn = tn_rows

                in_map = tn != 0
                new_tv_seg = tv_seg & self._keep_mask(tn)
            if self.counting:
                # per-(template-vertex, label-class) count thresholds
                # (counting_ee.hpp:784-790): row sums of accepted valid-
                # parent slots by sender class; split hubs sum partials
                cls = consts["cls"][bi]
                keep_cnt = jnp.zeros(n_seg, dtype=jnp.uint32)
                for i in range(self.k):
                    if self.meta_allow is not None:
                        acc_i = (
                            p_bits & jnp.take(self.meta_allow[:, i], metas[bi])
                        ) != 0
                    else:
                        acc_i = (pa & self.adj_all[i]) != 0
                    ok_i = jnp.ones(n_seg, dtype=bool)
                    for j in range(self.required.shape[1]):
                        req = int(self.required[i, j])
                        if req <= 0:
                            continue
                        cnt = self._red_sum(
                            (acc_i & (cls == j + 1)).astype(jnp.int32),
                            n, w, g,
                        )
                        if split:
                            cnt = jax.ops.segment_sum(
                                cnt, seg_id, num_segments=n_seg
                            )
                        ok_i = ok_i & (cnt >= req)
                    keep_cnt = keep_cnt | jnp.where(
                        ok_i, jnp.uint32(1 << i), jnp.uint32(0)
                    )
                new_tv_seg = new_tv_seg & keep_cnt
            if init:
                new_tv_seg = jnp.where(in_map, new_tv_seg, jnp.uint32(0))
                died_b = in_map & (new_tv_seg == 0)
            else:
                died_b = (tv_seg != 0) & (new_tv_seg == 0)
            died = died | jnp.any(died_b)

            row_live_bc = self._rowbc((new_tv_seg != 0)[seg_id], n, w, g)
            if init:
                new_alive_b = accept & row_live_bc
            else:
                own_alive = self._slot2d(alive, base, n, w, g)
                own_flag = self._slot2d(tp_flag, base, n, w, g)
                new_alive_b = own_alive & (accept | own_flag) & row_live_bc
            new_alive_parts.append(new_alive_b.reshape(-1)[: n * w])
            new_tv_parts.append(new_tv_seg)

            sendok_per_row = (
                sendok_rows if use_pallas
                else self._red_sum(send_ok.astype(jnp.int32), n, w, g)
            )
            if self.num_ranks == 1:
                av_r = av_r + jnp.sum(new_tv_seg != 0, dtype=jnp.int32)[None]
                ae_r = ae_r + jnp.sum(new_alive_b, dtype=jnp.int32)[None]
                msg_r = msg_r + jnp.sum(sendok_per_row, dtype=jnp.int32)[None]
            else:
                own_seg = owner[seg_rows]
                av_r = av_r + jax.ops.segment_sum(
                    (new_tv_seg != 0).astype(jnp.int32), own_seg,
                    num_segments=self.num_ranks,
                )
                own_rows = owner[rows]
                ae_r = ae_r + jax.ops.segment_sum(
                    self._red_sum(new_alive_b.astype(jnp.int32), n, w, g),
                    own_rows,
                    num_segments=self.num_ranks,
                )
                msg_r = msg_r + jax.ops.segment_sum(
                    sendok_per_row.astype(jnp.int32), own_rows,
                    num_segments=self.num_ranks,
                )

        new_alive_flat = jnp.concatenate(
            new_alive_parts + [jnp.zeros(1, dtype=bool)]
        )
        if seg_out:
            # caller keeps the result in seg space; the inv_perm gather
            # is paid lazily only if vertex order is actually consumed
            return (
                tuple(new_tv_parts),
                new_alive_flat,
                jnp.zeros_like(tp_flag),
                (av_r, ae_r, msg_r, died),
            )
        # single inverse-permutation gather instead of per-bucket scatters
        # (TPU scatters serialize; gathers vectorize)
        seg_all = jnp.concatenate(
            new_tv_parts + [jnp.zeros(1, dtype=jnp.uint32)]
        )
        new_tv = seg_all[inv_perm]
        return (
            new_tv,
            new_alive_flat,
            jnp.zeros_like(tp_flag),
            (av_r, ae_r, msg_r, died),
        )

    # ------------------------------------------------------------------

    def _get_call(self, init: bool, n_steps: int, seg_out: bool = False):
        key = (init, n_steps, seg_out)
        if key not in self._call_cache:
            fn = (
                partial(self._call_init1_seg)
                if seg_out
                else partial(self._call_impl, init=init, n_steps=n_steps)
            )
            self._call_cache[key] = jax.jit(fn)
        return self._call_cache[key]

    def _call_init1_seg(self, tv, alive, flag, bucket_arrays, consts):
        """The production init call (global init superstep, n_steps=1,
        recon-eligible): result stays in SEG space and only the
        seg-ordered live bitmap + counters are prepared for download.
        Removes, vs the generic program (BENCH_INIT_DECOMPOSE.json): the
        V-sized entry gather (precomputed constants), the V-sized
        inv_perm exit gather, the S-bit packbits(alive) transfer mirror,
        AND (round 5) the S-sized alive/flag output arrays themselves —
        the per-bucket alive planes still feed the ae counters, but their
        concat + HBM materialization is dead code XLA eliminates; a later
        full call rebuilds alive on device via _ensure_alive."""
        tv_parts, _alive2, _flag2, st = self._superstep(
            tv, alive, flag, bucket_arrays, consts, init=True, seg_out=True
        )
        av, ae, msg, died = st
        stats = jnp.concatenate(
            [av, ae, msg, died.astype(jnp.int32).reshape(1)]
        )
        s = stats.reshape(-1)
        stat_bytes = jnp.stack(
            [((s >> (8 * k)) & 0xFF).astype(jnp.uint8) for k in range(4)],
            axis=1,
        ).reshape(-1)
        seg_all = (
            jnp.concatenate(tv_parts)
            if tv_parts
            else jnp.zeros(0, jnp.uint32)
        )
        combo = jnp.concatenate([stat_bytes, jnp.packbits(seg_all != 0)])
        return tv_parts, combo

    def _call_impl(
        self, tv, alive, flag, bucket_arrays, consts, *, init: bool,
        n_steps: int,
    ):
        """``n_steps`` supersteps in one traced program: one host round
        trip per LCC call instead of one per superstep (the remote-TPU
        latency otherwise dominates the whole search)."""
        stats_list = []
        if init:
            tv = consts["label_tv"]
            tv, alive, flag, st = self._superstep(
                tv, alive, flag, bucket_arrays, consts, init=True
            )
            stats_list.append(st)
            n_steps -= 1

        def body(carry, _):
            tv, alive, flag = carry
            tv, alive, flag, st = self._superstep(
                tv, alive, flag, bucket_arrays, consts, init=False
            )
            return (tv, alive, flag), st

        if n_steps > 0:
            (tv, alive, flag), st_scan = jax.lax.scan(
                body, (tv, alive, flag), None, length=n_steps
            )
        else:
            st_scan = None
        # pack every superstep's counters into ONE int32 matrix
        # [steps, 3R+1] (av | ae | msg | died): the caller downloads a
        # single buffer instead of 3-4 per-array pulls through the tunnel
        rows_parts = [
            jnp.concatenate(
                [av, ae, msg, d.astype(jnp.int32).reshape(1)]
            )[None, :]
            for (av, ae, msg, d) in stats_list
        ]
        if st_scan is not None:
            av_s, ae_s, msg_s, died_s = st_scan
            rows_parts.append(
                jnp.concatenate(
                    [av_s, ae_s, msg_s, died_s.astype(jnp.int32)[:, None]],
                    axis=1,
                )
            )
        stats = jnp.concatenate(rows_parts, axis=0)
        # pack the final alive bitmap in-program: the caller's alive_pairs
        # becomes a pure download instead of a second dispatch round trip.
        # live rows (tv != 0) packed too: after an init call that V/8-byte
        # bitmap is the ONLY transfer the host reconstruction path needs.
        # The counters and the live bitmap ride ONE uint8 buffer (explicit
        # little-endian bytes, no bitcast) — a remote-attached pull pays
        # per-buffer round-trip latency, so two tiny pulls cost two trips
        # while one combined pull costs one.
        s = stats.reshape(-1)
        stat_bytes = jnp.stack(
            [((s >> (8 * k)) & 0xFF).astype(jnp.uint8) for k in range(4)],
            axis=1,
        ).reshape(-1)
        combo = jnp.concatenate([stat_bytes, jnp.packbits(tv != 0)])
        return tv, alive, flag, jnp.packbits(alive), combo

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
            alive=self._unpack(jnp.asarray(np.packbits(al))),
            tp_flag=self._unpack(jnp.asarray(np.packbits(fl))),
        )

    def state_to_global(self, state: BucketedState):
        if state.alive is None and state.alive_from_init:
            self._ensure_alive(state)
        if state.alive is None:
            edge_alive = np.zeros(self.graph.num_edges, dtype=bool)
            edge_alive[state.lazy_edge_ids] = True
            return state.tv_np.copy(), edge_alive
        tv = np.asarray(self._tv_device(state))
        packed = np.asarray(
            state.packed if state.packed is not None else self._pack(state.alive)
        )
        al_flat = np.unpackbits(packed, count=self.num_slots + 1).view(bool)
        edge_alive = al_flat[self._edge_to_slot]
        return tv, edge_alive

    # -- slot-space fast path (avoids all E-sized host remaps) -------------

    def tv_host(self, state: BucketedState) -> np.ndarray:
        if state.tv_np is not None:
            return state.tv_np
        if state.recon_init:
            state.tv_np = self._recon_tv(state)
            return state.tv_np
        return np.asarray(self._tv_device(state))

    def alive_pairs(self, state: BucketedState):
        """(row, col) arrays of currently-alive slots, in CSR order within
        each row — typically a tiny fraction of E after the first call."""
        if state.pairs_cache is not None:
            return state.pairs_cache
        if state.alive is None and state.lazy_edge_ids is not None:
            # lazy state: edge ids ARE the pairs (ascending ids == CSR
            # row-major order) — zero device traffic
            eids = state.lazy_edge_ids
            state.pairs_cache = (
                self.graph.edge_row[eids].astype(np.int64),
                self.graph.cols[eids].astype(np.int64),
            )
            return state.pairs_cache
        if state.recon_init and state.live_packed is not None:
            pairs = self._recon_pairs(state)
            if pairs is not None:
                state.pairs_cache = pairs
                return pairs
        self._ensure_alive(state)
        packed = np.asarray(
            state.packed if state.packed is not None else self._pack(state.alive)
        )
        flat = np.unpackbits(packed, count=self.num_slots + 1).view(bool)
        rows_parts, cols_parts = [], []
        for b in self.buckets:
            n, w = b.adj.shape
            m = flat[b.slot_base : b.slot_base + n * w]
            sel = np.nonzero(m)[0]
            rows_parts.append(b.rows[sel // w])
            cols_parts.append(b.adj.reshape(-1)[sel].astype(np.int64))
        arow = np.concatenate(rows_parts) if rows_parts else np.empty(0, np.int64)
        acol = np.concatenate(cols_parts) if cols_parts else np.empty(0, np.int64)
        order = np.argsort(arow, kind="stable")
        state.pairs_cache = (arow[order], acol[order])
        return state.pairs_cache

    def state_from_edge_ids(
        self, tv: np.ndarray, edge_ids: np.ndarray, flag_ids=None,
        lazy: bool = False,
    ) -> BucketedState:
        """State whose alive set is exactly the given original edge ids;
        ``flag_ids`` optionally sets TP success marks on those edges (lets
        the driver's compact continuation carry marks into the subgraph).
        ``lazy=True`` keeps the state host-side (see BucketedState): no
        device upload happens unless a full lcc_call consumes it."""
        from .lazy_state import normalized_edge_ids, normalized_flag_ids

        eids = normalized_edge_ids(edge_ids)
        tv32 = tv.astype(np.uint32)
        if lazy:
            return BucketedState(
                tv=None, alive=None, tp_flag=None, tv_np=tv32,
                lazy_edge_ids=eids,
                lazy_flag_ids=normalized_flag_ids(flag_ids),
            )
        al = np.zeros(self.num_slots + 1, dtype=bool)
        al[self._edge_to_slot[eids]] = True
        al[-1] = False
        if flag_ids is not None and len(flag_ids):
            fl = np.zeros(self.num_slots + 1, dtype=bool)
            fl[self._edge_to_slot[np.asarray(flag_ids, dtype=np.int64)]] = True
            fl[-1] = False
            tp_flag = self._unpack(jnp.asarray(np.packbits(fl)))
        else:
            tp_flag = jnp.zeros(self.num_slots + 1, dtype=bool)
        return BucketedState(
            tv=jnp.asarray(tv32),
            alive=self._unpack(jnp.asarray(np.packbits(al))),
            tp_flag=tp_flag,
            tv_np=tv32,
        )

    def _deferred_alive_fn(self, tv_parts, bucket_arrays):
        """Recompute the post-init alive flags ON DEVICE from the init
        tv (seg parts): alive = init-accept & row-live, both pure
        functions of (labels, graph, tv) at the global init step — the
        same planes the init superstep computed but did not materialize
        (see _call_init1_seg). No host transfer."""
        parts = []
        for bi, (rows, adj, rev, valid, seg_id, seg_rows, adj_code) in (
            enumerate(bucket_arrays)
        ):
            n, w = self.buckets[bi].adj.shape
            g = self._groups[bi]
            p_bits = jnp.zeros(adj_code.shape, dtype=jnp.uint32)
            for cidx, bits in self._init_pairs:
                p_bits = p_bits | jnp.where(
                    adj_code == cidx, bits, jnp.uint32(0)
                )
            adj_mask_seg = self._init_adjmask_seg[bi]
            accept = (
                p_bits & self._rowbc(adj_mask_seg[seg_id], n, w, g)
            ) != 0
            row_live_bc = self._rowbc((tv_parts[bi] != 0)[seg_id], n, w, g)
            parts.append((accept & row_live_bc).reshape(-1)[: n * w])
        return jnp.concatenate(parts + [jnp.zeros(1, bool)])

    def _ensure_alive(self, state: BucketedState) -> None:
        """Materialize the alive/flag arrays a recon-init call skipped."""
        if state.alive is not None or not state.alive_from_init:
            return
        if self._deferred_alive is None:
            self._deferred_alive = jax.jit(self._deferred_alive_fn)
        state.alive = self._deferred_alive(state.tv_segs, self._dev)
        state.tp_flag = jnp.zeros(self.num_slots + 1, dtype=bool)

    def _materialize(self, state: BucketedState) -> BucketedState:
        """Device arrays for a lazy state (no-op otherwise)."""
        if state.alive_from_init and state.alive is None:
            self._ensure_alive(state)
        if state.alive is not None:
            return state
        s = self.state_from_edge_ids(
            state.tv_np, state.lazy_edge_ids, flag_ids=state.lazy_flag_ids
        )
        s.pairs_cache = state.pairs_cache
        return s

    def with_updates(self, state: BucketedState, tv: np.ndarray, tp_marks):
        """Replace tv and set token-passing success marks (slot flags)."""
        tv32 = tv.astype(np.uint32)
        if state.alive is None and state.alive_from_init:
            self._ensure_alive(state)
        if state.alive is None:
            from .lazy_state import merged_flag_ids

            return BucketedState(
                tv=None, alive=None, tp_flag=None, tv_np=tv32,
                pairs_cache=state.pairs_cache,
                lazy_edge_ids=state.lazy_edge_ids,
                lazy_flag_ids=merged_flag_ids(state.lazy_flag_ids, tp_marks),
            )
        flag = state.tp_flag
        if tp_marks:
            idx = np.array(
                [self._edge_to_slot[e] for e in tp_marks], dtype=np.int64
            )
            flag = flag.at[jnp.asarray(idx)].set(True)
        return BucketedState(
            tv=jnp.asarray(tv32),
            alive=state.alive,
            tp_flag=flag,
            # alive is unchanged: the (possibly expensive) pairs transfer
            # and the in-program packed bitmap stay valid
            pairs_cache=state.pairs_cache,
            tv_np=tv32,
            packed=state.packed,
        )

    def lcc_call(
        self, state: BucketedState, global_init_step: bool,
        n_steps: int | None = None,
    ):
        if n_steps is None:
            n_steps = self.p.diameter
        state = self._materialize(state)
        recon_ok = (
            global_init_step
            and n_steps == 1
            and self.meta_allow is None
            and not self.counting
        )
        call = self._get_call(global_init_step, n_steps, seg_out=recon_ok)
        consts = {
            "owner": self.owner,
            "inv_perm": self._inv_perm,
            "label_tv": self.label_tv,
            "init_tv_seg": self._init_tv_seg,
            "init_adjmask_seg": self._init_adjmask_seg,
        }
        if self._meta_dev is not None:
            consts["meta"] = self._meta_dev
        if self._class_dev is not None:
            consts["cls"] = self._class_dev
        if recon_ok:
            tv_segs, combo = call(
                state.tv if state.tv is not None else self.label_tv,
                state.alive, state.tp_flag, self._dev, consts,
            )
            tv, alive, flag, packed = None, None, None, None
        else:
            tv, alive, flag, packed, combo = call(
                self._tv_device(state), state.alive, state.tp_flag,
                self._dev, consts,
            )
            tv_segs = None
        # ONE D2H pull: the call's counters + the packed live-row bitmap
        rr = self.num_ranks
        combo_np = np.asarray(combo)
        nstat = n_steps * (3 * rr + 1)
        sb = combo_np[: 4 * nstat].reshape(nstat, 4).astype(np.uint32)
        st = (
            (sb[:, 0] | sb[:, 1] << 8 | sb[:, 2] << 16 | sb[:, 3] << 24)
            .astype(np.int32)
            .reshape(n_steps, 3 * rr + 1)
        )
        live_packed = combo_np[4 * nstat :]
        rows = []
        for r in st:
            av_r = r[0:rr].copy()
            ae_r = r[rr : 2 * rr].copy()
            msg_r = r[2 * rr : 3 * rr].copy()
            rows.append(
                (
                    int(av_r.sum()),
                    int(ae_r.sum()),
                    int(msg_r.sum()),
                    {"av": av_r, "ae": ae_r, "msg": msg_r},
                )
            )
        any_died = bool((st[:, -1] != 0).any())
        out = BucketedState(tv, alive, flag, packed=packed,
                            live_packed=live_packed,
                            tv_segs=tv_segs, live_seg_order=recon_ok,
                            alive_from_init=recon_ok)
        out.recon_init = recon_ok
        return out, rows, any_died
