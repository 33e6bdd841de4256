"""Multi-device LCC — the superstep kernel sharded over a 1-D device mesh.

The reference distributes the graph over MPI ranks (1-D cyclic vertex
partition + delegate replication for hubs, delegate_partitioned_graph.ipp:
274-379) and exchanges visitor messages through a two-level mailbox
(new_mailbox.hpp). Here the layout is TPU-first:

* **Balanced edge partition with hub splitting.** Edges are partitioned
  into n contiguous CSR chunks of ~E/n; a hub row whose adjacency spans
  chunk boundaries is thereby SPLIT across devices (the delegate-
  replication analog): each device computes a partial neighbor-bitset OR
  for its slice and the partials are combined at the vertex owner.
* **Vertex-block ownership.** tv (candidate bitsets) is block-partitioned
  (owner = v // block) — the same owner function the distributed NLCC
  router uses.
* **Boundary (halo) exchange, not replication.** Each superstep moves only
  (i) the tv of this device's own (contiguous) row range, (ii) a
  per-slot PAYLOAD word (alive bit | row tv) of this device's reverse
  edges — the bucketed plane's one-gather trick in distributed form:
  payload[rev(s)] delivers both the sender's candidates tv[col(s)] and
  the sender-side alive flag through a single permutation gather — and
  (iii) the per-row partial ORs to/from vertex owners. All via
  ``all_to_all`` with send/recv index lists precomputed at construction
  (static shapes). Per-device memory and ICI traffic are
  O((V+E)/n + cut), not O(V+E) as a full ``all_gather`` of tv and edge
  flags would be. At n=1 the identity-permutation exchanges collapse to
  pads, leaving ONE E-sized gather per superstep (payload[rev]) — the
  measured issue-rate floor of this stack (docs/ROOFLINE.md).
* **ELL-bucketed slot space (round 5).** Each chunk's row fragments are
  grouped into power-of-two width buckets (the bucketed plane's layout,
  engine/lcc_bucketed.py, applied per shard): every segment OR/sum/
  broadcast is a dense per-bucket reduction the VPU vectorizes, replacing
  the round-4 cummax-scan formulation whose ~8-22 log-depth passes per
  superstep were the mesh plane's measured n=1 tax
  (BENCH_SHARDED_CHIP.json round 4: init 390 ms vs bucketed 48 ms).
* convergence counters are ``psum``s (replacing the MPI tree termination
  detection, termination_detection.hpp:96-233).

Padded slots are inert by construction: pad gather lanes read sentinel
zeros, pad scatter lanes drop out of bounds.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.csr import Graph
from ..pattern.pattern_graph import PatternGraph


def _pow2(n: int, lo: int = 8) -> int:
    return max(lo, 1 << int(np.ceil(np.log2(max(n, 1)))))


@dataclass
class ShardedState:
    tv: jax.Array  # uint32 [n, B] block-partitioned candidates
    edge_alive: jax.Array  # bool [n, EC] edge-chunk partitioned flags
    tp_flag: jax.Array  # bool [n, EC]
    # memo for alive_pairs (the driver asks several times per phase)
    pairs_cache: tuple | None = None
    # host copy of tv when it was uploaded from the host (avoids an
    # immediate V-sized download through the device tunnel)
    tv_np: np.ndarray | None = None
    # compact transfer mirrors produced INSIDE the lcc_call program:
    # per-shard bit-packed alive flags (E/8 bytes instead of E bool bytes)
    # and uint16 tv (template bitsets fit 16 bits) — device->host traffic
    # for a phase crossing drops 8x / 2x on a pod, more through a tunnel
    packed: jax.Array | None = None
    tv16: jax.Array | None = None
    # per-shard bit-packed live rows (tv != 0), produced in-program: after
    # a pure init call (recon_init) this V-bit bitmap is the ONLY download
    # the host reconstruction path needs (engine/init_recon.py) — the
    # tv16 / packed mirrors above stay on device untouched
    live_packed: jax.Array | None = None
    # True when this state is the result of the GLOBAL INIT superstep
    # alone (n_steps=1, no metadata/counting): tv AND the alive pairs are
    # then exact functions of (labels, graph, live-row set) and tv_host /
    # alive_pairs rebuild both on the host from live_packed
    recon_init: bool = False
    # LAZY representation (mirror of BucketedState): once the driver's
    # compact continuation lives on the pruned subgraph, the state is pure
    # host data (tv_np + original edge ids) and no device upload happens
    # unless a full mesh lcc_call actually consumes it (tv/edge_alive/
    # tp_flag above are None then)
    lazy_edge_ids: np.ndarray | None = None
    lazy_flag_ids: np.ndarray | None = None


class ShardedLccEngine:
    """Drop-in for LccEngine.lcc_call on an n-device mesh."""

    def __init__(
        self,
        graph: Graph,
        labels: np.ndarray,
        pattern: PatternGraph,
        mesh: Mesh | None = None,
        num_devices: int | None = None,
        num_ranks: int = 1,
        edge_meta: tuple[np.ndarray, np.ndarray] | None = None,
        counting: bool = False,
    ):
        if mesh is None:
            devs = jax.devices()[: (num_devices or len(jax.devices()))]
            mesh = Mesh(np.array(devs), ("x",))
        self.mesh = mesh
        n = mesh.devices.size
        self.n = n
        self.graph = graph
        self.p = pattern
        # output-rank attribution (cyclic owner = v % num_ranks, like the
        # reference's non-delegate rule, ipp:366): per-rank av/ae/msg counts
        # are segment-sums inside the superstep, psum-reduced (beta.cpp:
        # 1112-1125) — exact per-rank files from the mesh engine
        self.num_ranks = num_ranks
        v = graph.num_vertices
        e = graph.num_edges
        self.block = b = -(-v // n)
        self.vpad = n * b
        self.ec = ec = max(-(-e // n), 1)

        # --- balanced contiguous edge chunks (rows may split: hub rows
        # spanning a boundary are the delegate-splitting analog). All graph
        # reads go through the edge-range accessor protocol, so ``graph``
        # may be a materialized Graph OR a storage.GraphDb (per-shard
        # memmaps — no global CSR ever exists on this host) ----------------
        rowstart = np.zeros(n, dtype=np.int64)
        rowend = np.zeros(n, dtype=np.int64)
        for r in range(n):
            lo, hi = r * ec, min((r + 1) * ec, e)
            if lo < hi:
                ends = graph.edge_row_at(np.array([lo, hi - 1], dtype=np.int64))
                rowstart[r], rowend[r] = ends[0], ends[1]
            else:  # empty chunk: degenerate single-row range
                rowstart[r] = rowend[r] = max(v - 1, 0)
        self.rmax = rmax = int(max(rowend - rowstart + 1))
        self._rowstart = rowstart

        # --- ELL slot layout per chunk (round 5) --------------------------
        # The round-4 plane kept each chunk's slots in CSR order and did
        # its segment OR/sum/broadcast with lax.cummax scans over the full
        # slot space (~8 passes at init, ~22 per continuation superstep) —
        # measured as the mesh plane's n=1 tax (390 ms init vs the
        # bucketed plane's 48 ms, BENCH_SHARDED_CHIP.json): a TPU scan is
        # a log-depth multi-pass over HBM. This rebuild adopts the
        # bucketed plane's answer (engine/lcc_bucketed.py): group each
        # chunk's row FRAGMENTS (a hub row spanning chunks contributes one
        # fragment per chunk — the delegate-splitting analog) into
        # power-of-two width buckets; every segment op then becomes a
        # dense per-bucket reduction/broadcast the VPU vectorizes.
        # Bucket shapes are unified across chunks (shard_map runs ONE
        # program on every shard): nb[width] = max over chunks, padded
        # rows inert (evalid False, code 0, row sentinel rmax).
        # Half-step widths, capped at 1024: vs pow2-to-8192 buckets this
        # cuts the ELL pad inflation 1.44x -> 1.22x at s21 (76.9M vs
        # 90.8M slots) — and the continuation superstep is gather-LANE
        # bound, so pad lanes cost like real ones. Hub fragments longer
        # than the cap split into cap-wide (fully dense) pieces.
        WIDTHS = [8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384,
                  512, 768, 1024]
        CAP = WIDTHS[-1]
        frag_rows, frag_offs, frag_lens, frag_wes = [], [], [], []
        col_chunks = []
        for r in range(n):
            lo, hi = r * ec, min((r + 1) * ec, e)
            cnt = max(hi - lo, 0)  # trailing chunks may be empty
            hi = max(hi, lo)
            col_chunks.append(graph.cols_range(lo, hi))
            if cnt == 0:
                for acc in (frag_rows, frag_offs, frag_lens, frag_wes):
                    acc.append(np.empty(0, dtype=np.int64))
                continue
            lr = (graph.edge_row_range(lo, hi) - rowstart[r]).astype(np.int64)
            heads = np.concatenate(([True], lr[1:] != lr[:-1]))
            hpos = np.nonzero(heads)[0]
            flen = np.diff(np.concatenate((hpos, [cnt])))
            frow, foff = lr[hpos], hpos
            # split fragments wider than the cap into CAP-wide pieces
            npieces = -(-flen // CAP)
            prow = np.repeat(frow, npieces)
            pidx = np.arange(len(prow)) - np.repeat(
                np.cumsum(npieces) - npieces, npieces
            )
            poff = np.repeat(foff, npieces) + pidx * CAP
            plen = np.minimum(
                np.repeat(foff + flen, npieces) - poff, CAP
            )
            # width index: smallest listed width >= piece length
            pwe = np.searchsorted(WIDTHS, np.maximum(plen, WIDTHS[0]))
            # ALL pieces of a split fragment stay in the widest bucket
            # (a short tail piece in a narrower bucket would scatter one
            # row across two buckets and lose a partial in the combine)
            pwe = np.where(
                np.repeat(npieces > 1, npieces), len(WIDTHS) - 1, pwe
            )
            frag_rows.append(prow)
            frag_offs.append(poff)
            frag_lens.append(plen)
            frag_wes.append(pwe)
        wes_present = sorted(
            set(int(w) for ws in frag_wes for w in np.unique(ws))
        ) or [0]
        # unified bucket table: per width, rows = max pieces over chunks
        nb_by_we = {
            we: max(
                (int(np.sum(frag_wes[r] == we)) for r in range(n)), default=0
            )
            for we in wes_present
        }
        nb_by_we = {we: max(nb, 1) for we, nb in nb_by_we.items()}
        self.ell_buckets = []  # (width_idx, width, slot_off, nb, row_off)
        off = row_off = 0
        for we in wes_present:
            nb = nb_by_we[we]
            w = WIDTHS[we]
            self.ell_buckets.append((we, w, off, nb, row_off))
            off += nb * w
            row_off += nb
        self.S = S = off
        self.n_ellrows = row_off

        # per-chunk static tables in ELL order
        slot_to_edge = np.full((n, S), -1, dtype=np.int64)
        row_of_slot = np.full((n, S), rmax, dtype=np.int32)
        ellrow_row = np.full((n, self.n_ellrows), rmax, dtype=np.int32)
        # split-fragment combine (widest bucket only): per ELL row its
        # position in the chunk's per-bucket DISTINCT-row list
        seg_id_wide = np.zeros((n, nb_by_we[wes_present[-1]]), dtype=np.int32)
        nseg_wide = 1
        for r in range(n):
            lo = r * ec
            order = np.argsort(frag_wes[r], kind="stable")
            for we, w, boff, nb, broff in self.ell_buckets:
                sel = order[frag_wes[r][order] == we]
                for j, f in enumerate(sel):
                    frow = int(frag_rows[r][f])
                    fo, fl = int(frag_offs[r][f]), int(frag_lens[r][f])
                    s0 = boff + j * w
                    slot_to_edge[r, s0 : s0 + fl] = lo + fo + np.arange(fl)
                    row_of_slot[r, s0 : s0 + fl] = frow
                    ellrow_row[r, broff + j] = frow
        # distinct-row (seg) spaces per bucket; only the widest bucket can
        # hold several pieces of one row (pieces are consecutive there)
        we_wide = wes_present[-1]
        _, _, _, nb_wide, roff_wide = self.ell_buckets[-1]
        nseg_wide = 1
        for r in range(n):
            rows_w = ellrow_row[r, roff_wide : roff_wide + nb_wide]
            heads = np.concatenate(
                ([True], rows_w[1:] != rows_w[:-1])
            ) & (rows_w != rmax)
            sid = np.cumsum(heads) - 1
            sid[rows_w == rmax] = 0
            seg_id_wide[r] = np.maximum(sid, 0)
            nseg_wide = max(nseg_wide, int(heads.sum()))
        self.nseg_wide = nseg_wide
        # per-chunk map: local row -> flat position in the concatenated
        # per-bucket DISTINCT-row output (narrow buckets emit one value
        # per ELL row; the widest emits nseg_wide combined values)
        self.n_segout = (self.n_ellrows - nb_wide) + nseg_wide
        row_to_segpos = np.full((n, rmax), self.n_segout, dtype=np.int32)
        seg_row_wide = np.full((n, nseg_wide), rmax, dtype=np.int32)
        for r in range(n):
            for we, w, boff, nb, broff in self.ell_buckets[:-1]:
                rows_b = ellrow_row[r, broff : broff + nb]
                ok = rows_b != rmax
                row_to_segpos[r, rows_b[ok]] = broff + np.nonzero(ok)[0]
            rows_w = ellrow_row[r, roff_wide : roff_wide + nb_wide]
            ok = rows_w != rmax
            if ok.any():
                sid = seg_id_wide[r][ok]
                row_to_segpos[r, rows_w[ok]] = roff_wide + sid
                seg_row_wide[r, sid] = rows_w[ok]
        self._seg_row_wide = seg_row_wide

        # --- row-tv halo: per chunk, ONLY its own (contiguous) row range.
        # Column tv is NOT exchanged: the payload halo below delivers
        # tv[col(s)] as the row-tv of the reverse edge's owning row — the
        # same one-gather payload trick the bucketed plane uses
        # (lcc_bucketed.py), which removes the E-sized tvH[colmap]
        # permutation gather the round-3 superstep still paid
        # (docs/ROOFLINE.md "gather wall").
        H = 1
        req_tv = []  # per (dest r): per owner o, np.ndarray of vertex ids
        u_meta = []  # per r: (U, seg_start) for rowmap construction
        for r in range(n):
            rows_range = np.arange(rowstart[r], rowend[r] + 1, dtype=np.int64)
            U = rows_range
            owners = U // b
            seg_start = np.searchsorted(owners, np.arange(n + 1))
            req = [U[seg_start[o] : seg_start[o + 1]] for o in range(n)]
            H = max(H, max((len(x) for x in req), default=1))
            req_tv.append(req)
            u_meta.append((U, seg_start))
        self.halo_h = H = _pow2(H)
        sendidx_tv = np.full((n, n, H), b, dtype=np.int32)  # [owner, dest, H]
        for r in range(n):
            for o in range(n):
                q = req_tv[r][o]
                sendidx_tv[o, r, : len(q)] = q - o * b
        rowmap = np.full((n, rmax), n * H, dtype=np.int32)
        for r in range(n):
            U, seg_start = u_meta[r]
            rows_range = np.arange(rowstart[r], rowend[r] + 1, dtype=np.int64)
            o_r = rows_range // b
            ui = np.searchsorted(U, rows_range)
            rowmap[r, : len(rows_range)] = o_r * H + (ui - seg_start[o_r])
        # at n=1 the request list is the identity (all rows) ONLY when
        # the first edge's row is vertex 0 (rowstart[0] == 0): otherwise
        # req_tv[0][0] = arange(rowstart[0], ...) is shifted and reading
        # tv_loc[:szH] directly would deliver tv of the wrong vertices
        # (silently wrong matches — advisor round-4 high finding). The
        # exchange (and its V-sized index gather) collapses to a pad
        # only in the true identity case.
        self._tv_identity = n == 1 and int(rowstart[0]) == 0

        # --- rev-edge payload halo in ELL coordinates: per chunk, the
        # payload words (alive | row tv) of the reverse edges of its
        # slots (the cut edges) -------------------------------------------
        # global edge id -> (owner chunk, ELL position)
        e2chunk = np.full(e, -1, dtype=np.int32)
        e2pos = np.full(e, -1, dtype=np.int64)
        for r in range(n):
            ok = slot_to_edge[r] >= 0
            e2chunk[slot_to_edge[r][ok]] = r
            e2pos[slot_to_edge[r][ok]] = np.nonzero(ok)[0]
        self._edge_to_ellslot = e2chunk.astype(np.int64) * S + e2pos
        Hrev = 1
        req_al = []
        rv_meta = []
        for r in range(n):
            lo, hi = r * ec, min((r + 1) * ec, e)
            rv_chunkarr = graph.rev_range(lo, max(hi, lo))
            eids = slot_to_edge[r]
            ok = eids >= 0
            rv_eid = np.full(S, -1, dtype=np.int64)
            rv_eid[ok] = rv_chunkarr[eids[ok] - lo]
            rv_ok = rv_eid >= 0
            rv_chunk = np.where(rv_ok, e2chunk[np.maximum(rv_eid, 0)], -1)
            rv_pos = np.where(rv_ok, e2pos[np.maximum(rv_eid, 0)], -1)
            if n == 1:
                # identity request (conceptually arange(S), never
                # materialized): the send buffer IS the payload array —
                # the sender-side payload_pad[sendidx] gather (an E-sized
                # serialized gather on TPU) is skipped entirely
                req = [np.empty(0, dtype=np.int64)]
                Hrev = max(Hrev, S)
            else:
                RU_key = np.unique(
                    rv_chunk[rv_ok].astype(np.int64) * S + rv_pos[rv_ok]
                )
                owners = RU_key // S
                seg_start = np.searchsorted(owners, np.arange(n + 1))
                req = [
                    (RU_key % S)[seg_start[o] : seg_start[o + 1]]
                    for o in range(n)
                ]
            Hrev = max(Hrev, max((len(x) for x in req), default=1))
            req_al.append(req)
            rv_meta.append((rv_chunk, rv_pos, rv_ok))
        # n=1: the identity request is exactly the S slots — no pow2
        # rounding (it would pad the per-superstep plH copy ~2x for
        # nothing), and the send index table itself is never read
        # (identity fast path) so only a dummy is kept
        self.halo_hrev = Hrev = S if n == 1 else _pow2(Hrev)
        if n == 1:
            sendidx_al = np.zeros((1, 1, 1), dtype=np.int32)
        else:
            sendidx_al = np.full((n, n, Hrev), S, dtype=np.int32)
            for r in range(n):
                for o in range(n):
                    q = req_al[r][o]
                    sendidx_al[o, r, : len(q)] = q
        revmap = np.full((n, S), n * Hrev, dtype=np.int32)
        for r in range(n):
            rv_chunk, rv_pos, rv_ok = rv_meta[r]
            if n == 1:
                revmap[r][rv_ok] = rv_pos[rv_ok]
            else:
                for o in range(n):
                    q = req_al[r][o]
                    sel = rv_ok & (rv_chunk == o)
                    ui = np.searchsorted(q, rv_pos[sel])
                    revmap[r][sel] = o * Hrev + ui
        self._al_identity = n == 1

        # --- partial-OR exchange: chunk r's rows grouped by tv owner
        # (contiguous ranges; sendrows gathers partials, ridx places them
        # at the owner; the same tables reversed broadcast new_tv back) ---
        K = 1
        spans = []  # per r: per o, (local_row_lo, count)
        for r in range(n):
            row_spans = []
            for o in range(n):
                lo_v = max(rowstart[r], o * b)
                hi_v = min(rowend[r] + 1, (o + 1) * b)
                cnt = max(0, hi_v - lo_v)
                row_spans.append((lo_v, cnt))
                K = max(K, cnt)
            spans.append(row_spans)
        self.halo_k = K = _pow2(K)
        sendrows = np.full((n, n, K), rmax, dtype=np.int32)  # [chunk, owner, K]
        ridx = np.full((n, n, K), b, dtype=np.int32)  # [owner, chunk, K]
        for r in range(n):
            for o in range(n):
                lo_v, cnt = spans[r][o]
                if cnt:
                    sendrows[r, o, :cnt] = (
                        np.arange(lo_v, lo_v + cnt) - rowstart[r]
                    )
                    ridx[o, r, :cnt] = np.arange(lo_v, lo_v + cnt) - o * b

        # --- init-superstep label codes (see engine/lcc_bucketed.py): at
        # the global init tv == label_tv, so neighbor bitsets are replayed
        # from per-slot label indices — no halo at all at init --------------
        labels = np.asarray(labels)
        uniq_labels, inv_lab = np.unique(labels, return_inverse=True)
        code_dtype = np.uint8 if len(uniq_labels) <= 255 else np.uint16
        code_vert = np.zeros(v + 1, dtype=code_dtype)
        code_vert[:v] = (inv_lab + 1).astype(code_dtype)
        code_s = np.zeros((n, S), dtype=code_dtype)
        for r in range(n):
            ok = slot_to_edge[r] >= 0
            code_s[r][ok] = code_vert[
                col_chunks[r][slot_to_edge[r][ok] - r * ec]
            ]
        lab_tv_uniq = pattern.label_match_bitset(uniq_labels)
        self._init_pairs = [
            (code_dtype(j + 1), np.uint32(bits))
            for j, bits in enumerate(lab_tv_uniq)
            if bits
        ]
        lab_tv = pattern.label_match_bitset(labels).astype(np.uint32)
        self._label_tv_np = lab_tv  # host copy for init-state reconstruction
        lab_pad = np.zeros(self.vpad, dtype=np.uint32)
        lab_pad[:v] = lab_tv
        # static per-row label bitsets + accept masks for the init superstep
        init_rowtv = np.zeros((n, rmax), dtype=np.uint32)
        init_adjmask = np.zeros((n, rmax), dtype=np.uint32)
        adj_all_np = np.asarray(pattern.edges_bitset_all, dtype=np.uint32)
        for r in range(n):
            rr = np.arange(rowstart[r], rowend[r] + 1)
            m = np.zeros(len(rr), dtype=np.uint32)
            tvr = lab_tv[np.minimum(rr, v - 1)] * (rr < v)
            for i in range(pattern.vertex_count):
                m |= np.where((tvr >> i) & 1 != 0, adj_all_np[i], np.uint32(0))
            init_rowtv[r, : len(rr)] = tvr
            init_adjmask[r, : len(rr)] = m
        # per-SLOT init accept mask (init_adjmask spread along each row's
        # slots at construction): the init superstep then needs no
        # mask[lrow] gather at all — a pure streaming read. init_adjmask
        # itself stays host-only (the continuation superstep derives its
        # mask from the live rowtv via seg_bcast, so the device never
        # consumes the row-shaped init mask).
        init_slotmask = np.zeros((n, S), dtype=np.uint32)
        for r in range(n):
            ok = slot_to_edge[r] >= 0
            init_slotmask[r][ok] = init_adjmask[r, row_of_slot[r][ok]]

        # edge-metadata-constrained matching on the mesh (see LccEngine /
        # BucketedLccEngine; edge_data_db.hpp analog): per-chunk slot
        # metadata codes select allowed-parent masks; tn accumulates per
        # receiver bit through them (exact per-(p, i, value) gate). Partial
        # per-bit ORs ride the same owner exchange, stacked as [rmax, K+1]
        # (+1 = the accept-any plane for in_map).
        if edge_meta is not None:
            allow, ecode = edge_meta
            ecode = np.asarray(ecode, dtype=np.int64)
            mzero = allow.shape[0] - 1  # the all-zero allow row
            self.meta_allow = jnp.asarray(allow, dtype=jnp.uint32)
            mc_s = np.full((n, S), mzero, dtype=np.int32)
            for r in range(n):
                ok = slot_to_edge[r] >= 0
                mc_s[r][ok] = ecode[slot_to_edge[r][ok]]
        else:
            self.meta_allow = None
            mc_s = None

        # counting-LCC on the mesh (counting_ee.hpp:784-790): per-chunk
        # sender-class codes; per-(template-vertex, class) counts are
        # per-row partial sums, ADD-combined at the vertex owner through
        # a stacked [rmax, P] exchange next to the OR exchange.
        self.counting = counting
        if counting:
            class_labels, self.required = pattern.neighbor_label_counts()
            lab = np.asarray(labels)
            class_vert = np.zeros(v + 1, dtype=np.uint8)
            for j, cl in enumerate(class_labels):
                class_vert[:v][lab == cl] = j + 1
            cls_s = np.zeros((n, S), dtype=np.uint8)
            for r in range(n):
                ok = slot_to_edge[r] >= 0
                cls_s[r][ok] = class_vert[
                    col_chunks[r][slot_to_edge[r][ok] - r * ec]
                ]
        else:
            self.required = None
            cls_s = None

        # --- measured communication volumes (new_mailbox.hpp send/recv
        # counter analog): per-device USEFUL entries moved by each of the
        # three per-superstep all_to_alls, split intra-/cross-device, plus
        # the wire (padded) slab sizes and the cut-edge fraction. These
        # are measurements of the constructed exchange index lists — the
        # exact entries the compiled program moves every superstep.
        tv_use_cross = np.zeros(n, dtype=np.int64)
        tv_use_intra = np.zeros(n, dtype=np.int64)
        for r in range(n):
            for o in range(n):
                cnt = len(req_tv[r][o])
                if o == r:
                    tv_use_intra[r] += cnt
                else:
                    tv_use_cross[r] += cnt
        al_use_cross = np.zeros(n, dtype=np.int64)
        al_use_intra = np.zeros(n, dtype=np.int64)
        cut_edges = np.zeros(n, dtype=np.int64)
        local_rev = np.zeros(n, dtype=np.int64)
        for r in range(n):
            rv_chunk, rv_pos, rv_ok = rv_meta[r]
            owners = rv_chunk[rv_ok]
            cut_edges[r] = int(np.sum(owners != r))
            local_rev[r] = int(np.sum(owners == r))
            for o in range(n):
                cnt = (
                    len(req_al[r][o]) if n > 1 else int(np.sum(owners == o))
                )
                if o == r:
                    al_use_intra[r] += cnt
                else:
                    al_use_cross[r] += cnt
        or_use_cross = np.zeros(n, dtype=np.int64)
        or_use_intra = np.zeros(n, dtype=np.int64)
        for r in range(n):
            for o in range(n):
                cnt = spans[r][o][1]
                if o == r:
                    or_use_intra[r] += cnt
                else:
                    or_use_cross[r] += cnt
        self.comm_stats = {
            "tv_halo": {
                "useful_cross": tv_use_cross, "useful_intra": tv_use_intra,
                "wire_entries_per_device": n * H, "entry_bytes": 4,
            },
            "alive_halo": {
                "useful_cross": al_use_cross, "useful_intra": al_use_intra,
                "wire_entries_per_device": n * Hrev, "entry_bytes": 1,
            },
            "partial_or": {  # two directions: partials in, new_tv back
                "useful_cross": or_use_cross, "useful_intra": or_use_intra,
                "wire_entries_per_device": n * K, "entry_bytes": 4,
                "directions": 2,
            },
            "cut_edges": cut_edges,
            "local_rev_edges": local_rev,
        }

        # host maps for the state-layout conversions (ELL <-> edge ids)
        self._slot_to_edge = slot_to_edge
        shard2 = NamedSharding(mesh, P("x", None))
        shard3 = NamedSharding(mesh, P("x", None, None))
        ops = [
            jax.device_put(row_of_slot, shard2),
            # pad slots are inert by construction (revmap sentinel reads
            # the appended zero payload; label codes 0 at init), so no
            # per-slot validity table is needed — a dummy keeps the
            # operand tuple's shape protocol
            jax.device_put(np.zeros((n, 1), dtype=bool), shard2),
            jax.device_put(rowmap, shard2),
            jax.device_put(revmap, shard2),
            # identity fast paths never read the send index lists — don't
            # hold the (pow2(S)-sized at n=1) tables in HBM then
            jax.device_put(
                sendidx_tv if not self._tv_identity
                else np.zeros((n, n, 1), np.int32),
                shard3,
            ),
            jax.device_put(
                sendidx_al if not self._al_identity
                else np.zeros((n, n, 1), np.int32),
                shard3,
            ),
            jax.device_put(sendrows, shard3),
            jax.device_put(ridx, shard3),
            jax.device_put(code_s, shard2),
            jax.device_put(lab_pad.reshape(n, b), shard2),
            jax.device_put(rowstart.reshape(n, 1).astype(np.int32), shard2),
        ]
        self.label_tv = ops[9]
        if mc_s is not None:
            ops.append(jax.device_put(mc_s, shard2))
            ops.append(jax.device_put(init_rowtv, shard2))
        if cls_s is not None:
            ops.append(jax.device_put(cls_s, shard2))
        # ELL segment structure + per-slot init mask (always last four)
        ops.append(jax.device_put(ellrow_row, shard2))
        ops.append(jax.device_put(seg_id_wide, shard2))
        ops.append(jax.device_put(row_to_segpos, shard2))
        ops.append(jax.device_put(init_slotmask, shard2))
        self._ops = tuple(ops)

        self.k = pattern.vertex_count
        self.adj_all = jnp.asarray(pattern.edges_bitset_all, dtype=jnp.uint32)
        self.mand = jnp.asarray(pattern.edges_bitset, dtype=jnp.uint32)
        self.opt = jnp.asarray(pattern.edges_bitset_optional, dtype=jnp.uint32)
        self.opt_min = np.asarray(pattern.min_optional_edge_count)

        # whole-call programs: init superstep + scan of continuations in one
        # trace (single host round trip per LCC call); graph tables are
        # explicit shard_map operands (closure capture would broadcast)
        sh = P("x", None)
        sh3 = P("x", None, None)
        op_specs = tuple(sh3 if o.ndim == 3 else sh for o in self._ops)

        def make_call(init: bool, n_steps_total: int):
            def call(tv, alive, flag, ops):
                smap = lambda f: jax.shard_map(
                    f,
                    mesh=mesh,
                    in_specs=(sh, sh, sh, op_specs),
                    out_specs=(sh, sh, sh, (P(), P(), P(), P())),
                )
                n_steps = n_steps_total
                head = []
                if init:
                    tv, alive, flag, st = smap(
                        partial(self._superstep_spmd, init=True)
                    )(tv, alive, flag, ops)
                    head.append(st)
                    n_steps -= 1
                step_fn = smap(partial(self._superstep_spmd, init=False))

                def body(carry, _):
                    tv, alive, flag = carry
                    tv, alive, flag, st = step_fn(tv, alive, flag, ops)
                    return (tv, alive, flag), st

                st_scan = None
                if n_steps > 0:
                    (tv, alive, flag), st_scan = jax.lax.scan(
                        body, (tv, alive, flag), None, length=n_steps
                    )
                # pack every superstep's counters into ONE int32 matrix
                # [steps, 3R+1] (av | ae | msg | died), like the bucketed
                # engine: the caller downloads a single buffer instead of
                # 3-4 per-array pulls PER SUPERSTEP — each tiny pull costs
                # a full round trip on a remote-attached device
                rows_parts = [
                    jnp.concatenate(
                        [av, ae, msg, d.astype(jnp.int32).reshape(1)]
                    )[None, :]
                    for (av, ae, msg, d) in head
                ]
                if st_scan is not None:
                    av_s, ae_s, msg_s, died_s = st_scan
                    rows_parts.append(
                        jnp.concatenate(
                            [av_s, ae_s, msg_s,
                             died_s.astype(jnp.int32)[:, None]],
                            axis=1,
                        )
                    )
                stats = jnp.concatenate(rows_parts, axis=0)
                # compact transfer mirrors (see ShardedState.packed/tv16):
                # packed per shard so the host pulls E/8 + 2V bytes per
                # phase crossing instead of E + 4V; live rows (tv != 0)
                # packed too — after an init call that V/8-byte bitmap is
                # the ONLY transfer the host reconstruction path needs
                packed, tv16, live16 = jax.shard_map(
                    lambda a, t: (
                        jnp.packbits(a.reshape(-1))[None],
                        t.reshape(-1).astype(jnp.uint16)[None],
                        jnp.packbits(t.reshape(-1) != 0)[None],
                    ),
                    mesh=mesh,
                    in_specs=(sh, sh),
                    out_specs=(sh, sh, sh),
                )(alive, tv)
                return tv, alive, flag, packed, tv16, live16, stats

            return jax.jit(call)

        self._make_call = make_call
        self._call_cache = {}

    # ---------------------------------------------------------------- spmd

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

    @staticmethod
    def _segment_or(values, seg_id, n_seg):
        """OR-combine uint32 values per segment (tiny: split-hub
        partials in the widest ELL bucket — same helper as the bucketed
        plane, lcc_bucketed.py)."""
        planes = (
            (values[:, None] >> jnp.arange(16, dtype=jnp.uint32)[None, :]) & 1
        ).astype(jnp.uint8)
        seg = jax.ops.segment_max(planes, seg_id, num_segments=n_seg) > 0
        weights = (1 << jnp.arange(16, dtype=jnp.uint32))[None, :]
        return jnp.sum(
            seg.astype(jnp.uint32) * weights, axis=1, dtype=jnp.uint32
        )

    def _superstep_spmd(self, tv, edge_alive, tp_flag, ops, init: bool):
        n, b, S, rmax = self.n, self.block, self.S, self.rmax
        R = self.num_ranks
        meta = self.meta_allow is not None
        tv_loc = tv[0]
        alive_loc = edge_alive[0]
        flag_loc = tp_flag[0]
        ops_loc = [o[0] for o in ops]
        (
            lrow, evalid, rowmap, revmap, sendidx_tv, sendidx_al,
            sendrows, ridx, adj_code, label_tv_own, rowstart,
        ) = ops_loc[:11]
        pos = 11
        if meta:
            mc, init_rowtv = ops_loc[pos], ops_loc[pos + 1]
            pos += 2
        if self.counting:
            cls = ops_loc[pos]
            pos += 1
        (
            ellrow_row, seg_id_wide, row_to_segpos, init_slotmask,
        ) = ops_loc[pos : pos + 4]

        # --- per-bucket formulation over the chunk's ELL layout -----------
        # Every segment OR/sum/broadcast is a dense per-bucket reduction
        # or broadcast (VPU-vectorized) plus one small static gather —
        # the bucketed plane's formulation (lcc_bucketed.py) applied per
        # shard. This replaced the round-4 cummax-scan formulation whose
        # ~8-22 log-depth passes per superstep were the measured mesh
        # n=1 tax (BENCH_SHARDED_CHIP.json, docs/ROOFLINE.md). The loop
        # processes one bucket at a time so temporaries are bucket-sized;
        # only the payload halo, the state arrays, and the accept planes
        # (bool) stay S-sized — a flat-[S] formulation of the same math
        # held ~10 uint32 [S] temporaries live and exceeded HBM at s21.
        buckets = self.ell_buckets  # (we, w, off, nb, row_off)
        last = len(buckets) - 1
        u32 = jnp.uint32

        def rows_from_parts(parts, dtype=jnp.uint32):
            """Concat per-bucket distinct-row values -> [rmax] via the
            static row_to_segpos gather (pads read the appended zero)."""
            segall = jnp.concatenate(parts + [jnp.zeros(1, dtype)])
            return segall[row_to_segpos]

        def wide_or(vals):
            return self._segment_or(vals, seg_id_wide, self.nseg_wide)

        def ell_gather(row_vals, fill):
            """[rmax] row values -> per-ELL-row values [n_ellrows]."""
            pad = jnp.concatenate(
                [row_vals, jnp.full(1, fill, row_vals.dtype)]
            )
            return pad[ellrow_row]

        # --- row-space prep (V-sized, cheap) ------------------------------
        if init:
            tv_loc = label_tv_own
            rowtv = init_rowtv if meta else None
        else:
            # row-tv halo: only this chunk's CONTIGUOUS row range moves
            # (column tv arrives via the payload exchange below)
            if self._tv_identity:
                szH = n * self.halo_h
                base = (
                    tv_loc[:szH]
                    if tv_loc.shape[0] >= szH
                    else jnp.concatenate(
                        [tv_loc,
                         jnp.zeros(szH - tv_loc.shape[0], jnp.uint32)]
                    )
                )
                tvH = jnp.concatenate([base, jnp.zeros(1, jnp.uint32)])
            else:
                tv_pad = jnp.concatenate([tv_loc, jnp.zeros(1, jnp.uint32)])
                recv = jax.lax.all_to_all(
                    tv_pad[sendidx_tv], "x", split_axis=0, concat_axis=0
                )
                tvH = jnp.concatenate(
                    [recv.reshape(-1), jnp.zeros(1, jnp.uint32)]
                )
            rowtv = tvH[rowmap]
            rt_ell = ell_gather(rowtv, 0)
            if not meta:
                m_ell = ell_gather(self._or_over_bits(rowtv), 0)
        if meta:
            rb_ell = ell_gather(rowtv, 0)  # receiver bits per ELL row

        # --- payload halo (the bucketed plane's one-gather trick in
        # distributed form): per slot t = (v -> u), the payload word
        # (alive(t) << 31 | tv[v]) built on t's OWNER; the receiver of
        # the reverse edge s reads payload[rev(s)] = (alive[rev(s)],
        # tv[col(s)]) in ONE permutation gather ------------------------
        if not init:
            pl_parts = []
            for (we, w, off, nb, roff) in buckets:
                oa = alive_loc[off : off + nb * w].reshape(nb, w)
                pl_parts.append(
                    (
                        jnp.where(oa, u32(0x80000000), u32(0))
                        | rt_ell[roff : roff + nb][:, None]
                    ).reshape(-1)
                )
            payload_pad = jnp.concatenate(
                pl_parts + [jnp.zeros(1, jnp.uint32)]
            )
            if self._al_identity:
                # n=1: halo_hrev == S, so payload_pad IS plH (no copy)
                szA = n * self.halo_hrev
                plH = (
                    payload_pad
                    if payload_pad.shape[0] == szA + 1
                    else jnp.concatenate(
                        [payload_pad,
                         jnp.zeros(szA + 1 - payload_pad.shape[0],
                                   jnp.uint32)]
                    )
                )
            else:
                recva = jax.lax.all_to_all(
                    payload_pad[sendidx_al], "x", split_axis=0,
                    concat_axis=0,
                )
                plH = jnp.concatenate(
                    [recva.reshape(-1), jnp.zeros(1, jnp.uint32)]
                )

        # --- per-bucket compute: accept planes, tn partials, counters -----
        if self.counting:
            pairs = [
                (i, j, int(self.required[i, j]))
                for i in range(self.k)
                for j in range(self.required.shape[1])
                if self.required[i, j] > 0
            ]
            cnt_parts = [[] for _ in pairs]
        if meta:
            tn_i_parts = [[] for _ in range(self.k)]
            accany_parts = []
        else:
            tn_parts = []
        acc_parts = []  # per-bucket accept planes (bool), for the alive pass
        if R == 1:
            msg_acc = jnp.int32(0)
        else:
            rank_ell = (
                rowstart[0].astype(jnp.int32)
                + jnp.minimum(ellrow_row, rmax - 1)
            ) % R
            msg_acc = jnp.zeros(R, dtype=jnp.int32)
        for bi, (we, w, off, nb, roff) in enumerate(buckets):
            sl = slice(off, off + nb * w)
            if init:
                code_b = adj_code[sl].reshape(nb, w)
                p_b = jnp.zeros((nb, w), dtype=jnp.uint32)
                for cidx, bits in self._init_pairs:
                    p_b = p_b | jnp.where(code_b == cidx, bits, u32(0))
                send_ok_b = p_b != 0
            else:
                p_raw = plH[revmap[sl]].reshape(nb, w)
                p_b = p_raw & u32(0x7FFFFFFF)
                # pads need no gate: their revmap sentinel reads the
                # appended zero payload word, which fails both tests
                send_ok_b = (p_b != 0) & (p_raw >= u32(0x80000000))
                p_b = jnp.where(send_ok_b, p_b, u32(0))
            if meta:
                mc_b = mc[sl].reshape(nb, w)
                mask_b = jnp.zeros((nb, w), dtype=jnp.uint32)
                for i in range(self.k):
                    allow_i = jnp.take(self.meta_allow[:, i], mc_b)
                    has_i = ((rb_ell[roff : roff + nb] >> i) & 1) != 0
                    mask_b = mask_b | jnp.where(
                        has_i[:, None], allow_i, u32(0)
                    )
                    tn_i_b = jax.lax.reduce(
                        p_b & allow_i, np.uint32(0), jax.lax.bitwise_or,
                        dimensions=[1],
                    )
                    tn_i_parts[i].append(
                        wide_or(tn_i_b) if bi == last else tn_i_b
                    )
                accept_b = (p_b & mask_b) != 0
                aa_b = jax.lax.reduce(
                    accept_b.astype(jnp.uint32), np.uint32(0),
                    jax.lax.bitwise_or, dimensions=[1],
                )
                accany_parts.append(wide_or(aa_b) if bi == last else aa_b)
                pa_b = None
            else:
                if init:
                    mask_b = init_slotmask[sl].reshape(nb, w)
                    accept_b = (p_b & mask_b) != 0
                else:
                    accept_b = (
                        p_b & m_ell[roff : roff + nb][:, None]
                    ) != 0
                pa_b = jnp.where(accept_b, p_b, u32(0))
                tn_b = jax.lax.reduce(
                    pa_b, np.uint32(0), jax.lax.bitwise_or, dimensions=[1]
                )
                tn_parts.append(wide_or(tn_b) if bi == last else tn_b)
            if self.counting:
                cls_b = cls[sl].reshape(nb, w)
                for idx, (i, j, _req) in enumerate(pairs):
                    if meta:
                        acc_i_b = (
                            p_b & jnp.take(self.meta_allow[:, i], mc_b)
                        ) != 0
                    else:
                        acc_i_b = (pa_b & self.adj_all[i]) != 0
                    cnt_b = jnp.sum(
                        (acc_i_b & (cls_b == j + 1)).astype(jnp.int32),
                        axis=1,
                    )
                    if bi == last:
                        cnt_b = jax.ops.segment_sum(
                            cnt_b, seg_id_wide,
                            num_segments=self.nseg_wide,
                        )
                    cnt_parts[idx].append(cnt_b)
            acc_parts.append(accept_b)
            sor = jnp.sum(send_ok_b, axis=1, dtype=jnp.int32)  # [nb]
            if R == 1:
                msg_acc = msg_acc + jnp.sum(sor)
            else:
                msg_acc = msg_acc + jax.ops.segment_sum(
                    sor, rank_ell[roff : roff + nb], num_segments=R
                )

        if meta:
            stack = jnp.stack(
                [rows_from_parts(tn_i_parts[i]) for i in range(self.k)]
                + [rows_from_parts(accany_parts)],
                axis=1,
            )  # [rmax, K+1] (accept-any plane = column K, for in_map)
        else:
            stack = rows_from_parts(tn_parts)[:, None]  # [rmax, 1]

        # --- deliver partials to tv owners and OR-combine -----------------
        C = stack.shape[1]
        tn_pad = jnp.concatenate(
            [stack, jnp.zeros((1, C), jnp.uint32)], axis=0
        )
        recvt = jax.lax.all_to_all(
            tn_pad[sendrows], "x", split_axis=0, concat_axis=0
        )  # [n, K, C] partials from each chunk
        tn_own_st = jnp.zeros((b, C), dtype=jnp.uint32)
        for s in range(n):
            tn_own_st = tn_own_st | jnp.zeros((b, C), dtype=jnp.uint32).at[
                ridx[s]
            ].set(recvt[s], mode="drop")

        if meta:
            in_map = tn_own_st[:, self.k] != 0
            new_tv = tv_loc & self._keep_mask_per_i(
                [tn_own_st[:, i] for i in range(self.k)]
            )
        else:
            tn_own = tn_own_st[:, 0]
            in_map = tn_own != 0
            new_tv = tv_loc & self._keep_mask(tn_own)

        if self.counting:
            # per-(template-vertex, class) counts: per-row partial sums,
            # ADD-combined at the vertex owner (counting_ee.hpp:784-790)
            cnt_stack = jnp.stack(
                [
                    rows_from_parts(cnt_parts[idx], dtype=jnp.int32)
                    for idx in range(len(pairs))
                ],
                axis=1,
            )  # [rmax, P]
            cnt_pad = jnp.concatenate(
                [cnt_stack, jnp.zeros((1, len(pairs)), jnp.int32)], axis=0
            )
            recvc = jax.lax.all_to_all(
                cnt_pad[sendrows], "x", split_axis=0, concat_axis=0
            )
            cnt_own = jnp.zeros((b, len(pairs)), dtype=jnp.int32)
            for s in range(n):
                cnt_own = cnt_own.at[ridx[s]].add(recvc[s], mode="drop")
            keep_cnt = jnp.zeros(b, dtype=jnp.uint32)
            for i in range(self.k):
                ok_i = jnp.ones(b, dtype=bool)
                for p, (pi, _pj, req) in enumerate(pairs):
                    if pi == i:
                        ok_i = ok_i & (cnt_own[:, p] >= req)
                keep_cnt = keep_cnt | jnp.where(
                    ok_i, jnp.uint32(1 << i), jnp.uint32(0)
                )
            new_tv = new_tv & keep_cnt

        if init:
            new_tv = jnp.where(in_map, new_tv, jnp.uint32(0))
            died = in_map & (new_tv == 0)
        else:
            died = (tv_loc != 0) & (new_tv == 0)

        # --- broadcast new_tv back to the chunks holding each row ---------
        ntv_pad = jnp.concatenate([new_tv, jnp.zeros(1, jnp.uint32)])
        recvr = jax.lax.all_to_all(
            ntv_pad[ridx], "x", split_axis=0, concat_axis=0
        )  # [n, K] row tv from each owner
        row_tv = jnp.zeros(rmax, dtype=jnp.uint32)
        for o in range(n):
            row_tv = row_tv.at[sendrows[o]].set(recvr[o], mode="drop")

        lv_ell = ell_gather(row_tv, 0) != 0  # live rows per ELL row
        alive_parts = []
        if R == 1:
            ae_acc = jnp.int32(0)
        else:
            ae_acc = jnp.zeros(R, dtype=jnp.int32)
        for bi, (we, w, off, nb, roff) in enumerate(buckets):
            sl = slice(off, off + nb * w)
            rl_b = lv_ell[roff : roff + nb][:, None]
            if init:
                na_b = acc_parts[bi] & rl_b
            else:
                oa_b = alive_loc[sl].reshape(nb, w)
                of_b = flag_loc[sl].reshape(nb, w)
                na_b = oa_b & (acc_parts[bi] | of_b) & rl_b
            alive_parts.append(na_b.reshape(-1))
            nar = jnp.sum(na_b, axis=1, dtype=jnp.int32)
            if R == 1:
                ae_acc = ae_acc + jnp.sum(nar)
            else:
                ae_acc = ae_acc + jax.ops.segment_sum(
                    nar, rank_ell[roff : roff + nb], num_segments=R
                )
        new_alive = jnp.concatenate(alive_parts)

        # --- per-output-rank attribution (owner = global id % R,
        # beta.cpp:1112-1125), psum-reduced to exact per-rank counts ------
        if R == 1:
            av_r = jax.lax.psum(jnp.sum(new_tv != 0, dtype=jnp.int32), "x")[None]
            ae_r = jax.lax.psum(ae_acc, "x")[None]
            msg_r = jax.lax.psum(msg_acc, "x")[None]
        else:
            r_idx = jax.lax.axis_index("x")
            gid = r_idx.astype(jnp.int32) * b + jnp.arange(b, dtype=jnp.int32)
            av_r = jax.lax.psum(
                jax.ops.segment_sum(
                    (new_tv != 0).astype(jnp.int32), gid % R, num_segments=R
                ),
                "x",
            )
            ae_r = jax.lax.psum(ae_acc, "x")
            msg_r = jax.lax.psum(msg_acc, "x")
        any_died = jax.lax.pmax(jnp.any(died).astype(jnp.int32), "x")
        return (
            new_tv[None],
            new_alive[None],
            jnp.zeros_like(flag_loc)[None],
            (av_r, ae_r, msg_r, any_died),
        )

    # -------------------------------------------------------------- public

    def per_device_elems(self) -> int:
        """Static per-device working-set size in array elements — the
        O((V+E)/n + cut) bound the halo layout guarantees (vs O(V+E) for a
        full-all_gather data plane). Counts every device-resident operand:
        state (tv[b], alive[S], flag[S]), ELL slot-shaped tables (row_of_
        slot, evalid, revmap, code, init_slotmask), row-shaped tables
        (rowmap, row_to_segpos, ellrow_row), the label-tv block, and the
        halo exchange index lists. S is the chunk's ELL slot count
        (E/n padded to power-of-two fragment widths, <= ~2.2 E/n)."""
        n, b, rmax = self.n, self.block, self.rmax
        S = self.S
        elems = (
            2 * b  # tv block + label-tv block
            + 6 * S  # alive/flag/row_of_slot/revmap/code/init_slotmask
            + 2 * rmax  # rowmap + row_to_segpos
            + self.n_ellrows  # ellrow_row
            + n * (self.halo_h + self.halo_hrev + 2 * self.halo_k)
        )
        if self.meta_allow is not None:
            elems += S + rmax  # slot metadata codes + init_rowtv
        if self.counting:
            elems += S  # slot sender-class codes
        return elems

    def init_state(self) -> ShardedState:
        # zeros are created ON DEVICE (a host-side np.zeros would ship
        # n*S ~ E bytes through the tunnel on every search) and cached —
        # jax arrays are immutable and the call programs don't donate
        if getattr(self, "_zero_state", None) is None:
            shard2 = NamedSharding(self.mesh, P("x", None))
            z_v = jax.jit(
                lambda: jnp.zeros((self.n, self.block), dtype=jnp.uint32),
                out_shardings=shard2,
            )()
            z_e = jax.jit(
                lambda: jnp.zeros((self.n, self.S), dtype=bool),
                out_shardings=shard2,
            )()
            self._zero_state = (z_v, z_e)
        z_v, z_e = self._zero_state
        return ShardedState(tv=z_v, edge_alive=z_e, tp_flag=z_e)

    def _edge_flags_to_chunks(self, flags: np.ndarray) -> np.ndarray:
        """Flat [E] edge flags -> the per-chunk ELL slot layout."""
        out = np.zeros((self.n, self.S), dtype=bool)
        for r in range(self.n):
            ok = self._slot_to_edge[r] >= 0
            out[r][ok] = flags[self._slot_to_edge[r][ok]]
        return out

    def state_from_global(
        self, tv: np.ndarray, edge_alive: np.ndarray, tp_flag: np.ndarray
    ) -> ShardedState:
        """Repack flat (V, E)-indexed host state into sharded layout."""
        tv_p = np.zeros(self.vpad, dtype=np.uint32)
        tv_p[: self.graph.num_vertices] = tv
        shard2 = NamedSharding(self.mesh, P("x", None))
        return ShardedState(
            tv=jax.device_put(tv_p.reshape(self.n, self.block), shard2),
            edge_alive=jax.device_put(
                self._edge_flags_to_chunks(edge_alive), shard2
            ),
            tp_flag=jax.device_put(
                self._edge_flags_to_chunks(tp_flag), shard2
            ),
        )

    def _alive_host(self, state: ShardedState) -> np.ndarray:
        if state.edge_alive is None:  # lazy: edge ids ARE the alive set
            alive = np.zeros(self.graph.num_edges, dtype=bool)
            alive[state.lazy_edge_ids] = True
            return alive
        alive = np.zeros(self.graph.num_edges, dtype=bool)
        ids = self._alive_slot_edge_ids(state)
        alive[ids] = True
        return alive

    def _alive_slot_edge_ids(self, state: ShardedState) -> np.ndarray:
        """Original edge ids of the set ELL slots, ascending. Pad slots
        are never alive (evalid gates the superstep), so the alive count
        — not E — bounds the translation work."""
        if state.packed is not None:
            # count=S: each shard packs S bits into ceil(S/8) bytes, so
            # the row-trailing pad bits must be dropped before flattening
            ell = (
                np.unpackbits(np.asarray(state.packed), axis=1, count=self.S)
                .view(bool)
            )
        else:
            ell = np.asarray(state.edge_alive)
        sel = np.nonzero(ell.reshape(-1))[0]
        return np.sort(self._slot_to_edge.reshape(-1)[sel])

    def state_to_global(self, state: ShardedState):
        return self.tv_host(state).copy(), self._alive_host(state)

    # -- slot-space fast path (avoids all E-sized host remaps) -------------
    # Same protocol as BucketedLccEngine: the driver moves only tv (V-sized)
    # and the pruned alive set across the host boundary.

    def _live_host(self, state: ShardedState) -> np.ndarray:
        """V-bit live-row bitmap from the per-shard packed mirror. Each
        shard packs ``block`` bits (NOT byte-aligned): unpack per row with
        count=block before flattening, else the row-trailing pad bits
        shift every later shard."""
        return (
            np.unpackbits(
                np.asarray(state.live_packed), axis=1, count=self.block
            )
            .reshape(-1)[: self.graph.num_vertices]
            .view(bool)
        )

    def tv_host(self, state: ShardedState) -> np.ndarray:
        if state.tv_np is not None:
            return state.tv_np
        if state.recon_init and state.live_packed is not None:
            from ..engine.init_recon import recon_tv

            arow, acol = self.alive_pairs(state)
            state.tv_np = recon_tv(
                self.p, self._label_tv_np, self.graph.num_vertices,
                arow, acol,
            )
            return state.tv_np
        if state.tv16 is not None:
            return (
                np.asarray(state.tv16)
                .reshape(-1)[: self.graph.num_vertices]
                .astype(np.uint32)
            )
        return np.asarray(state.tv).reshape(-1)[: self.graph.num_vertices]

    def alive_pairs(self, state: ShardedState):
        """(row, col) arrays of currently-alive edges, row-sorted (chunks
        are contiguous CSR slices, so flat order IS row order)."""
        if state.pairs_cache is not None:
            return state.pairs_cache[:2]
        if state.edge_alive is None:
            # lazy state: sorted edge ids ARE the pairs (ascending ids ==
            # CSR row-major order) — zero device traffic
            ids = state.lazy_edge_ids
        elif state.recon_init and state.live_packed is not None:
            # post-init reconstruction: only the V-bit live bitmap crosses
            # (engine/init_recon.py); chunk layout == flat CSR order, so
            # the reconstructed edge ids satisfy the alive_edge_ids
            # contract directly
            from ..engine.init_recon import recon_pairs

            out = recon_pairs(
                self.graph, self.p, self._label_tv_np,
                self._live_host(state),
            )
            if out is not None:
                state.pairs_cache = out
                return state.pairs_cache[:2]
            ids = self._alive_slot_edge_ids(state)
        else:
            ids = self._alive_slot_edge_ids(state)
        state.pairs_cache = (
            self.graph.edge_row_at(ids).astype(np.int64),
            self.graph.cols_at(ids).astype(np.int64),
            ids,
        )
        return state.pairs_cache[:2]

    def alive_edge_ids(self, state: ShardedState) -> np.ndarray:
        """Original CSR edge ids of the alive set, aligned with
        ``alive_pairs`` order (chunk layout == flat CSR order)."""
        self.alive_pairs(state)
        return state.pairs_cache[2]

    def state_from_edge_ids(
        self, tv: np.ndarray, edge_ids: np.ndarray, flag_ids=None,
        lazy: bool = False,
    ) -> ShardedState:
        if lazy:
            from ..engine.lazy_state import (
                normalized_edge_ids,
                normalized_flag_ids,
            )

            return ShardedState(
                tv=None, edge_alive=None, tp_flag=None,
                tv_np=tv.astype(np.uint32),
                lazy_edge_ids=normalized_edge_ids(edge_ids),
                lazy_flag_ids=normalized_flag_ids(flag_ids),
            )
        al = np.zeros(self.n * self.S, dtype=bool)
        al[self._edge_to_ellslot[edge_ids]] = True
        fl = np.zeros(self.n * self.S, dtype=bool)
        if flag_ids is not None and len(flag_ids):
            fl[
                self._edge_to_ellslot[np.asarray(flag_ids, dtype=np.int64)]
            ] = True
        shard2 = NamedSharding(self.mesh, P("x", None))
        tv_p = np.zeros(self.vpad, dtype=np.uint32)
        tv_p[: self.graph.num_vertices] = tv
        return ShardedState(
            tv=jax.device_put(tv_p.reshape(self.n, self.block), shard2),
            edge_alive=jax.device_put(al.reshape(self.n, self.S), shard2),
            tp_flag=jax.device_put(fl.reshape(self.n, self.S), shard2),
            # astype always copies: the state's host mirror must not alias
            # the caller's array (the driver mutates tv in place)
            tv_np=tv.astype(np.uint32),
        )

    def _materialize(self, state: ShardedState) -> ShardedState:
        """Device arrays for a lazy state (no-op otherwise)."""
        if state.edge_alive is not None:
            return state
        s = self.state_from_edge_ids(
            state.tv_np, state.lazy_edge_ids, flag_ids=state.lazy_flag_ids
        )
        s.pairs_cache = state.pairs_cache
        return s

    def with_updates(self, state: ShardedState, tv: np.ndarray, tp_marks):
        """Replace tv and set token-passing success marks (slot flags)."""
        if state.edge_alive is None:
            from ..engine.lazy_state import merged_flag_ids

            return ShardedState(
                tv=None, edge_alive=None, tp_flag=None,
                tv_np=tv.astype(np.uint32),
                pairs_cache=state.pairs_cache,
                lazy_edge_ids=state.lazy_edge_ids,
                lazy_flag_ids=merged_flag_ids(state.lazy_flag_ids, tp_marks),
            )
        shard2 = NamedSharding(self.mesh, P("x", None))
        flag = state.tp_flag
        if tp_marks:
            fl = np.asarray(flag).reshape(-1)
            fl = fl.copy()
            fl[
                self._edge_to_ellslot[np.asarray(tp_marks, dtype=np.int64)]
            ] = True
            flag = jax.device_put(fl.reshape(self.n, self.S), shard2)
        tv_p = np.zeros(self.vpad, dtype=np.uint32)
        tv_p[: self.graph.num_vertices] = tv
        return ShardedState(
            tv=jax.device_put(tv_p.reshape(self.n, self.block), shard2),
            edge_alive=state.edge_alive,
            tp_flag=flag,
            pairs_cache=state.pairs_cache,  # alive unchanged
            packed=state.packed,  # alive unchanged: packed mirror stays valid
            tv_np=tv.astype(np.uint32),  # astype always copies (no aliasing)
        )

    def lcc_call(
        self, state: ShardedState, global_init_step: bool,
        n_steps: int | None = None,
    ):
        if n_steps is None:
            n_steps = self.p.diameter
        # Compile-size guard: one traced program per scan length, and the
        # XLA TPU compiler's memory grows super-linearly in the unrolled
        # shard_map superstep count — an 8-step scan of this superstep
        # exceeds the remote compile helper's limits at s21 (SIGKILL).
        # Chunk long calls into <= FPM_MESH_MAX_SCAN_STEPS-step programs;
        # the extra host round trips are negligible against the
        # multi-second full-graph supersteps this path exists for.
        import os

        max_scan = int(os.environ.get("FPM_MESH_MAX_SCAN_STEPS", "4"))
        if n_steps > max_scan:
            rows_all = []
            died_any = False
            first = global_init_step
            left = n_steps
            while left > 0:
                take = min(left, max_scan)
                state, rows, died = self.lcc_call(state, first, take)
                rows_all += rows
                died_any = died_any or died
                first = False
                left -= take
            return state, rows_all, died_any
        state = self._materialize(state)
        tv, alive, flag = state.tv, state.edge_alive, state.tp_flag
        if global_init_step:
            tv = self.label_tv
        key = (global_init_step, n_steps)
        if key not in self._call_cache:
            self._call_cache[key] = self._make_call(global_init_step, n_steps)
        tv, alive, flag, packed, tv16, live16, stats = (
            self._call_cache[key](tv, alive, flag, self._ops)
        )
        st = np.asarray(stats)  # ONE D2H pull for the whole call's counters
        rr = self.num_ranks
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
        out_state = ShardedState(
            tv, alive, flag, packed=packed, tv16=tv16, live_packed=live16
        )
        # post-init host reconstruction is exact only for the pure init
        # superstep with label-bitset acceptance (same rule as
        # BucketedLccEngine.lcc_call)
        out_state.recon_init = (
            global_init_step
            and n_steps == 1
            and self.meta_allow is None
            and not self.counting
        )
        return (
            out_state,
            rows,
            any_died,
        )
