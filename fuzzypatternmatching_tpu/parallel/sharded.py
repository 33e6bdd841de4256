"""Multi-device LCC — the superstep kernel sharded over a 1-D device mesh.

The reference distributes the graph over MPI ranks and exchanges visitor
messages through a two-level mailbox (new_mailbox.hpp). Here:

* vertices are block-partitioned over the mesh axis (pad V to n*B); each
  device owns its block's rows of the receiver-centric CSR (edges grouped by
  row owner, padded to a common per-shard count),
* one superstep = ``all_gather`` of the per-vertex candidate bitsets and the
  (bit-packed) edge-active flags over ICI — replacing all point-to-point
  mailbox traffic — followed by purely local gather/segment-sum compute,
* convergence counters are ``psum``s (replacing the MPI tree termination
  detection, termination_detection.hpp:96-233).

Padded slots are inert by construction: padded vertices have label-candidate
bitset 0 so they never send, accept, or count; padded edge slots point at
padded vertices.
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


@dataclass
class ShardedState:
    tv: jax.Array  # uint32 [n, B]
    edge_alive: jax.Array  # bool [n, Emax]
    tp_flag: jax.Array  # bool [n, Emax]


class ShardedLccEngine:
    """Drop-in for LccEngine.lcc_call on an n-device mesh."""

    def __init__(
        self,
        graph: Graph,
        labels: np.ndarray,
        pattern: PatternGraph,
        mesh: Mesh | None = None,
        num_devices: int | None = None,
    ):
        if mesh is None:
            devs = jax.devices()[: (num_devices or len(jax.devices()))]
            mesh = Mesh(np.array(devs), ("x",))
        self.mesh = mesh
        n = mesh.devices.size
        self.n = n
        self.graph = graph
        self.p = pattern
        v = graph.num_vertices
        self.block = b = -(-v // n)
        self.vpad = n * b

        # --- partition edges by row-owner block (rows are sorted, so the
        # partition is a contiguous split) ---------------------------------
        row_ptr = graph.row_ptr
        bounds = [int(row_ptr[min(r * b, v)]) for r in range(n + 1)]
        e_counts = [bounds[r + 1] - bounds[r] for r in range(n)]
        emax = max(max(e_counts), 1)
        self.emax = emax

        # new edge numbering: shard r's slice lands at [r*emax, r*emax+cnt)
        old_to_new = np.full(graph.num_edges, -1, dtype=np.int64)
        for r in range(n):
            lo, hi = bounds[r], bounds[r + 1]
            old_to_new[lo:hi] = r * emax + np.arange(hi - lo)

        col_s = np.zeros((n, emax), dtype=np.int32)
        lrow_s = np.zeros((n, emax), dtype=np.int32)  # row index local to block
        rev_s = np.zeros((n, emax), dtype=np.int32)  # padded-global edge index
        revok_s = np.zeros((n, emax), dtype=bool)
        evalid_s = np.zeros((n, emax), dtype=bool)  # real (non-padding) slots
        for r in range(n):
            lo, hi = bounds[r], bounds[r + 1]
            cnt = hi - lo
            col_s[r, :cnt] = graph.cols[lo:hi]
            lrow_s[r, :cnt] = graph.edge_row[lo:hi] - r * b
            rv = graph.rev_edge[lo:hi]
            ok = rv >= 0
            rev_s[r, :cnt] = np.where(ok, old_to_new[np.maximum(rv, 0)], 0)
            revok_s[r, :cnt] = ok
            evalid_s[r, :cnt] = True
            lrow_s[r, cnt:] = max(b - 1, 0)

        lab_tv = pattern.label_match_bitset(np.asarray(labels)).astype(np.uint32)
        lab_pad = np.zeros(self.vpad, dtype=np.uint32)
        lab_pad[:v] = lab_tv

        # init-superstep label codes (see engine/lcc_bucketed.py): at the
        # global init tv == label_tv, so the neighbor-bitset gather AND the
        # tv all_gather are replaced by per-slot label indices replayed as
        # one select per distinct template label
        uniq_labels, inv_lab = np.unique(np.asarray(labels), return_inverse=True)
        code_dtype = np.uint8 if len(uniq_labels) <= 255 else np.uint16
        code_pad = np.zeros(self.vpad, dtype=code_dtype)
        code_pad[:v] = (inv_lab + 1).astype(code_dtype)
        code_s = np.where(evalid_s, code_pad[col_s], code_dtype(0))
        lab_tv_uniq = pattern.label_match_bitset(uniq_labels)
        self._init_pairs = [
            (code_dtype(j + 1), np.uint32(bits))
            for j, bits in enumerate(lab_tv_uniq)
            if bits
        ]

        shard2 = NamedSharding(mesh, P("x", None))
        self.adj_code = jax.device_put(code_s, shard2)
        self.col = jax.device_put(col_s, shard2)
        self.evalid = jax.device_put(evalid_s, shard2)
        self.lrow = jax.device_put(lrow_s, shard2)
        self.rev = jax.device_put(rev_s, shard2)
        self.rev_valid = jax.device_put(revok_s, shard2)
        self.label_tv = jax.device_put(lab_pad.reshape(n, b), shard2)

        self.k = pattern.vertex_count
        self.adj_all = jnp.asarray(pattern.edges_bitset_all, dtype=jnp.uint32)
        self.mand = jnp.asarray(pattern.edges_bitset, dtype=jnp.uint32)
        self.opt = jnp.asarray(pattern.edges_bitset_optional, dtype=jnp.uint32)
        self.opt_min = np.asarray(pattern.min_optional_edge_count)

        # graph arrays must be explicit shard_map operands (closure capture
        # would broadcast the full array to every device)
        def make_step(init: bool):
            sh = P("x", None)
            return jax.jit(
                jax.shard_map(
                    partial(self._superstep_spmd, init=init),
                    mesh=mesh,
                    in_specs=(sh,) * 9,
                    out_specs=(sh, sh, sh, (P(), P(), P(), P())),
                )
            )

        self._step_init = make_step(True)
        self._step_cont = make_step(False)

        # whole-call programs: init superstep + scan of continuations in one
        # trace (single host round trip per LCC call)
        def make_call(init: bool):
            sh = P("x", None)

            def call(tv, alive, flag, col, lrow, rev, rev_ok, evalid, code):
                spmd_init = partial(self._superstep_spmd, init=True)
                spmd_cont = partial(self._superstep_spmd, init=False)
                smap = lambda f: jax.shard_map(
                    f,
                    mesh=mesh,
                    in_specs=(sh,) * 9,
                    out_specs=(sh, sh, sh, (P(), P(), P(), P())),
                )
                n_steps = self.p.diameter
                head = []
                if init:
                    tv, alive, flag, st = smap(spmd_init)(
                        tv, alive, flag, col, lrow, rev, rev_ok, evalid, code
                    )
                    head.append(st)
                    n_steps -= 1
                step_fn = smap(spmd_cont)

                def body(carry, _):
                    tv, alive, flag = carry
                    tv, alive, flag, st = step_fn(
                        tv, alive, flag, col, lrow, rev, rev_ok, evalid, code
                    )
                    return (tv, alive, flag), st

                st_scan = None
                if n_steps > 0:
                    (tv, alive, flag), st_scan = jax.lax.scan(
                        body, (tv, alive, flag), None, length=n_steps
                    )
                return tv, alive, flag, head, st_scan

            return jax.jit(call)

        self._call_init = make_call(True)
        self._call_cont = make_call(False)

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

    def _superstep_spmd(
        self, tv, edge_alive, tp_flag, col, lrow, rev, rev_ok, evalid,
        adj_code, init: bool,
    ):
        # block-local views ([1, B] leading shard dim squeezed)
        tv_loc = tv[0]
        alive_loc = edge_alive[0]
        flag_loc = tp_flag[0]
        col, lrow = col[0], lrow[0]
        rev, rev_ok = rev[0], rev_ok[0]
        evalid = evalid[0]
        adj_code = adj_code[0]
        b = self.block

        if init:
            # tv == label_tv at init: no all_gather, no gather — rebuild the
            # neighbor bitsets from the precomputed per-slot label codes
            p_bits = jnp.zeros(col.shape, dtype=jnp.uint32)
            for cidx, bits in self._init_pairs:
                p_bits = p_bits | jnp.where(
                    adj_code == cidx, bits, jnp.uint32(0)
                )
            send_ok = p_bits != 0
        else:
            # ICI exchange: candidate bitsets of all vertices + edge flags
            tv_full = jax.lax.all_gather(tv_loc, "x", tiled=True)  # [Vpad]
            p_bits = tv_full[col]
            alive_full = jax.lax.all_gather(alive_loc, "x", tiled=True)
            send_ok = (p_bits != 0) & alive_full[rev] & rev_ok & evalid
            p_bits = jnp.where(send_ok, p_bits, jnp.uint32(0))

        adj_mask_loc = self._or_over_bits(tv_loc)
        accept = (p_bits & adj_mask_loc[lrow]) != 0
        pa = jnp.where(accept, p_bits, jnp.uint32(0))

        planes = (
            (pa[:, None] >> jnp.arange(self.k, dtype=jnp.uint32)[None, :]) & 1
        ).astype(jnp.uint8)
        tn_planes = jax.ops.segment_max(planes, lrow, num_segments=b) > 0
        weights = (1 << jnp.arange(self.k, dtype=jnp.uint32))[None, :]
        tn = jnp.sum(tn_planes.astype(jnp.uint32) * weights, axis=1, dtype=jnp.uint32)

        in_map = tn != 0
        new_tv = tv_loc & self._keep_mask(tn)
        if init:
            new_tv = jnp.where(in_map, new_tv, jnp.uint32(0))
            died = in_map & (new_tv == 0)
        else:
            died = (tv_loc != 0) & (new_tv == 0)

        row_live = new_tv[lrow] != 0
        if init:
            new_alive = accept & row_live
        else:
            new_alive = alive_loc & (accept | flag_loc) & row_live

        av = jax.lax.psum(jnp.sum(new_tv != 0), "x")
        ae = jax.lax.psum(jnp.sum(new_alive), "x")
        msgs = jax.lax.psum(jnp.sum(send_ok), "x")
        any_died = jax.lax.pmax(jnp.any(died).astype(jnp.int32), "x")
        return (
            new_tv[None],
            new_alive[None],
            jnp.zeros_like(flag_loc)[None],
            (av, ae, msgs, any_died),
        )

    # -------------------------------------------------------------- public

    def init_state(self) -> ShardedState:
        shard2 = NamedSharding(self.mesh, P("x", None))
        z_v = jax.device_put(
            np.zeros((self.n, self.block), dtype=np.uint32), shard2
        )
        z_e = jax.device_put(np.zeros((self.n, self.emax), dtype=bool), shard2)
        return ShardedState(tv=z_v, edge_alive=z_e, tp_flag=z_e)

    def state_from_global(
        self, tv: np.ndarray, edge_alive: np.ndarray, tp_flag: np.ndarray
    ) -> ShardedState:
        """Repack flat (V, E)-indexed host state into sharded layout."""
        n, b, emax = self.n, self.block, self.emax
        tv_p = np.zeros(n * b, dtype=np.uint32)
        tv_p[: self.graph.num_vertices] = tv
        al = np.zeros((n, emax), dtype=bool)
        fl = np.zeros((n, emax), dtype=bool)
        row_ptr = self.graph.row_ptr
        v = self.graph.num_vertices
        for r in range(n):
            lo = int(row_ptr[min(r * b, v)])
            hi = int(row_ptr[min((r + 1) * b, v)])
            al[r, : hi - lo] = edge_alive[lo:hi]
            fl[r, : hi - lo] = tp_flag[lo:hi]
        shard2 = NamedSharding(self.mesh, P("x", None))
        return ShardedState(
            tv=jax.device_put(tv_p.reshape(n, b), shard2),
            edge_alive=jax.device_put(al, shard2),
            tp_flag=jax.device_put(fl, shard2),
        )

    def state_to_global(self, state: ShardedState):
        n, b = self.n, self.block
        v = self.graph.num_vertices
        tv = np.asarray(state.tv).reshape(-1)[:v]
        al_s = np.asarray(state.edge_alive)
        alive = np.zeros(self.graph.num_edges, dtype=bool)
        row_ptr = self.graph.row_ptr
        for r in range(n):
            lo = int(row_ptr[min(r * b, v)])
            hi = int(row_ptr[min((r + 1) * b, v)])
            alive[lo:hi] = al_s[r, : hi - lo]
        return tv, alive

    def lcc_call(self, state: ShardedState, global_init_step: bool):
        tv, alive, flag = state.tv, state.edge_alive, state.tp_flag
        if global_init_step:
            tv = self.label_tv
        call = self._call_init if global_init_step else self._call_cont
        tv, alive, flag, head, st_scan = call(
            tv, alive, flag, self.col, self.lrow, self.rev,
            self.rev_valid, self.evalid, self.adj_code,
        )
        rows = []
        any_died = False

        def emit(av, ae, msgs, died):
            nonlocal any_died
            rows.append((int(av), int(ae), int(msgs), None))
            any_died = any_died or bool(died)

        for st in head:
            emit(*st)
        if st_scan is not None:
            av_s, ae_s, msg_s, died_s = (np.asarray(x) for x in st_scan)
            for i in range(av_s.shape[0]):
                emit(av_s[i], ae_s[i], msg_s[i], died_s[i])
        return ShardedState(tv, alive, flag), rows, any_died

