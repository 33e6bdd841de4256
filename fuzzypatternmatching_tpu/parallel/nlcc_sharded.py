"""Distributed NLCC — token passing sharded over the device mesh.

The reference runs its token walks (nem path/cycle checks and TDS
enumeration) through the asynchronous MPI mailbox
(token_passing_pattern_matching_nonunique_nem_1.hpp:913-939,
..._tds_batch_1.hpp:976-1303). Here one whole constraint runs as ONE jitted
``shard_map`` program over a 1-D device mesh:

* vertices and their pruned-adjacency rows are block-partitioned across
  devices (the same layout as the sharded LCC engine: owner = v // block);
* each hop expands tokens over the device's local alive-CSR shard, then
  routes every new token to the owner of its arrival vertex with a batched
  ragged ``all_to_all`` — the BSP replacement for the mailbox's aggregated
  point-to-point sends (SURVEY §2.8; new_mailbox.hpp);
* the per-(vertex, source) forwarded-token dedup (nem_1.hpp:131-139,
  270-286) is shard-local BY CONSTRUCTION — all arrivals for a key land on
  the key vertex's owner in the same routing round — and uses the exact
  single-device determinism rule: winner = earliest superstep, then
  smallest parent id (multi-key ``lax.sort``);
* message counters and overflow flags are ``psum``s (the BSP replacement
  for tree termination detection, termination_detection.hpp:96-233).

Capacities are static: the program reports overflow and the host retries at
doubled capacity (each (constraint-shape, capacity) program compiles once
and is cached). Results are bit-identical to engine/nlcc.py — same
NlccOutcome, counts, winners, subgraphs (cross-tested at 1/2/8 devices).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.nlcc import (
    AliveCsr,
    ForwardedSets,
    FrontierOverflow,
    NlccOutcome,
    tds_start_pairs,
    token_sources,
)
from ..pattern.nonlocal_constraint import NonLocalConstraint

_SENT = np.int64(np.iinfo(np.int64).max)


def _pow2(n: int, lo: int = 256) -> int:
    return max(lo, 1 << int(np.ceil(np.log2(max(n, 1)))))


def _in_sorted(a: jax.Array, q: jax.Array) -> jax.Array:
    pos = jnp.searchsorted(a, q)
    pos = jnp.minimum(pos, a.shape[0] - 1)
    return a[pos] == q


class ShardedNlcc:
    """Mesh-distributed drop-in for DeviceNlcc (same run_nem/run_tds API)."""

    # bound on capacity doublings per batch: every (shape, capacity) pair is
    # a fresh XLA program (2-10 min through the compile relay); past the cap
    # the run raises FrontierOverflow and the driver falls back to the host
    # engine with a clear log line instead of stalling for hours.
    # FPM_NLCC_MAX_DOUBLINGS raises the bound where compiles are cheap
    # (CPU meshes, dryruns) so dense workloads stay on the mesh.
    MAX_CAP_DOUBLINGS = 3

    @property
    def max_cap_doublings(self) -> int:
        import os

        return int(
            os.environ.get(
                "FPM_NLCC_MAX_DOUBLINGS", str(self.MAX_CAP_DOUBLINGS)
            )
        )

    def __init__(self, num_vertices: int, mesh: Mesh, num_ranks: int = 1):
        if num_vertices >= (1 << 31):
            raise ValueError("device NLCC dedup keys require V < 2^31")
        self.V = num_vertices
        self.R = num_ranks
        self.mesh = mesh
        self.n = n = mesh.devices.size
        self.block = b = -(-num_vertices // n)
        self.vpad = n * b
        self._progs: dict = {}

    # -- sharded CSR upload (cached per AliveCsr instance) -------------------

    def prepare(self, acsr: AliveCsr):
        """Partition the pruned CSR by row-owner block: per-device local
        ``ptr`` [b+1] and padded ``col`` [Amax] (global neighbor ids), plus
        the per-edge metadata codes aligned with ``col`` when the AliveCsr
        carries them (edge-metadata-constrained matching)."""
        dev = getattr(acsr, "_shard_cache", None)
        if dev is not None and dev[0] is self:
            return dev[1]
        n, b, v = self.n, self.block, self.V
        bounds = [int(acsr.ptr[min(r * b, v)]) for r in range(n + 1)]
        amax = _pow2(max(max(bounds[r + 1] - bounds[r] for r in range(n)), 1))
        ptr_s = np.zeros((n, b + 1), dtype=np.int32)
        col_s = np.zeros((n, amax), dtype=np.int32)
        meta_s = (
            np.full((n, amax), -1, dtype=np.int32)
            if acsr.meta is not None
            else None
        )
        for r in range(n):
            lo, hi = bounds[r], bounds[r + 1]
            vlo, vhi = min(r * b, v), min((r + 1) * b, v)
            ptr_s[r, : vhi - vlo + 1] = acsr.ptr[vlo : vhi + 1] - lo
            ptr_s[r, vhi - vlo + 1 :] = ptr_s[r, vhi - vlo]
            col_s[r, : hi - lo] = acsr.col[lo:hi]
            if meta_s is not None:
                meta_s[r, : hi - lo] = acsr.meta[lo:hi]
        with jax.enable_x64(True):
            out = (
                jnp.asarray(ptr_s),
                jnp.asarray(col_s),
                None if meta_s is None else jnp.asarray(meta_s),
                amax,
            )
        acsr._shard_cache = (self, out)
        return out

    # -- traced building blocks ---------------------------------------------

    @staticmethod
    def _expand(ptr, col, cur_loc, valid, cap_out: int, apad: int):
        """All alive neighbors of the valid lanes (local row ids), flattened
        into ``cap_out`` lanes. Returns (token_lane, neighbor, edge_position,
        valid_out, overflow); edge_position indexes the local col/meta
        arrays (the traversed edge, for metadata hop filters)."""
        safe = jnp.where(valid, cur_loc, 0)
        base = ptr[safe].astype(jnp.int64)
        cnt = jnp.where(valid, (ptr[safe + 1].astype(jnp.int64) - base), 0)
        cum = jnp.cumsum(cnt)
        total = cum[-1]
        starts = cum - cnt
        lanes = jnp.arange(cap_out, dtype=jnp.int64)
        tok_ids = jnp.arange(cnt.shape[0], dtype=jnp.int32)
        idx = jnp.where(cnt > 0, starts, np.int64(cap_out))
        seed = jnp.zeros(cap_out, dtype=jnp.int32).at[idx].max(
            tok_ids, mode="drop"
        )
        tok = jax.lax.associative_scan(jnp.maximum, seed)
        off = lanes - starts[tok]
        gidx = jnp.clip(base[tok] + off, 0, apad - 1)
        nbr = col[gidx]
        valid_out = lanes < jnp.minimum(total, np.int64(cap_out))
        return tok, nbr, gidx, valid_out, total > cap_out

    def _route(self, dest, valid, fields, cap: int):
        """Batched ragged all-to-all: deliver each valid token to shard
        ``dest``. ``fields`` are [L] or [L, W] arrays riding with the token.
        Returns (recv_fields, recv_valid [n*cap], overflow)."""
        n = self.n
        L = dest.shape[0]
        key = jnp.where(valid, dest, n).astype(jnp.int32)
        lane = jnp.arange(L, dtype=jnp.int32)
        key_s, lane_s = jax.lax.sort((key, lane), num_keys=1)
        start = jnp.searchsorted(key_s, jnp.arange(n, dtype=jnp.int32))
        pos = jnp.arange(L, dtype=jnp.int32) - start[
            jnp.minimum(key_s, n - 1)
        ]
        overflow = jnp.any((key_s < n) & (pos >= cap))
        recv_fields = []
        for f in fields:
            f_s = f[lane_s]
            shape = (n, cap) + f.shape[1:]
            buf = jnp.zeros(shape, dtype=f.dtype).at[key_s, pos].set(
                f_s, mode="drop"
            )
            r = jax.lax.all_to_all(buf, "x", split_axis=0, concat_axis=0)
            recv_fields.append(r.reshape((n * cap,) + f.shape[1:]))
        vbuf = (
            jnp.zeros((n, cap), dtype=jnp.int8)
            .at[key_s, pos]
            .set(valid.astype(jnp.int8)[lane_s], mode="drop")
        )
        rv = jax.lax.all_to_all(vbuf, "x", split_axis=0, concat_axis=0)
        return recv_fields, rv.reshape(-1).astype(bool), overflow

    def _msg_stats(self, cur, valid):
        m = jax.lax.psum(jnp.sum(valid, dtype=jnp.int64), "x")
        if self.R == 1:
            return m, m[None]
        mr = jax.ops.segment_sum(
            valid.astype(jnp.int64), cur % self.R, num_segments=self.R
        )
        return m, jax.lax.psum(mr, "x")

    # -- nem program ---------------------------------------------------------

    def _nem_prog(
        self, ptr, col, ok_bits, sources, n_src, fwd_in, meta=None,
        *, maxi: int, valid_cycle: bool, selected: bool, cap: int,
        apad: int, fpad: int, hopc: tuple | None = None,
    ):
        n, b, V = self.n, self.block, self.V
        r = jax.lax.axis_index("x")
        vlo = r.astype(jnp.int32) * b
        ptr, col = ptr[0], col[0]
        ok_bits, sources, fwd_in = ok_bits[0], sources[0], fwd_in[0]
        n_src = n_src[0, 0]
        if hopc is not None:
            meta = meta[0]
        Lr = n * cap

        src_valid = jnp.arange(sources.shape[0]) < n_src
        tok, nbr, gidx, valid, overflow = self._expand(
            ptr, col, sources - vlo, src_valid, cap, apad
        )
        # route the first hop's arrivals to their owners (the traversed
        # edge's metadata code rides along in hopc mode)
        fields = [nbr, sources[tok], sources[tok]]
        if hopc is not None:
            fields.append(meta[gidx])
        (cur, src, parent, *em), valid, ovf = self._route(
            nbr // b, valid, fields, cap
        )
        emeta = em[0] if hopc is not None else None
        overflow = overflow | ovf
        messages = jnp.int64(0)
        msg_r = jnp.zeros(self.R, dtype=jnp.int64)
        validated = jnp.zeros(b, dtype=bool)
        chunks: list[jax.Array] = []
        mark_v = jnp.zeros(Lr, dtype=jnp.int32)
        mark_p = jnp.zeros(Lr, dtype=jnp.int32)
        mark_acc = jnp.zeros(Lr, dtype=bool)

        def membership(keys):
            hit = jnp.zeros(keys.shape, dtype=bool)
            if fpad > 0:
                hit = hit | _in_sorted(fwd_in, keys)
            for ch in chunks:
                hit = hit | _in_sorted(ch, keys)
            return hit

        for h in range(1, maxi + 2):
            m, mr = self._msg_stats(cur, valid)
            messages = messages + m
            msg_r = msg_r + mr
            cur_loc = jnp.clip(cur - vlo, 0, b - 1)
            ok = valid & (((ok_bits[cur_loc] >> h) & 1) != 0)
            if hopc is not None:
                # hop-h metadata check at arrival (engine/nlcc.py:217)
                ok = ok & (emeta == hopc[h - 1])
            if h == maxi + 1:
                if not valid_cycle:
                    acc = ok & (cur != src)
                    if selected:
                        keys = cur.astype(jnp.int64) * V + src
                        acc = acc & membership(keys)
                        validated = validated.at[cur_loc].max(
                            acc, mode="drop"
                        )
                    else:
                        # validated entities are the (remote) sources —
                        # route the acks back to their owners
                        # (nem_1.hpp:720-726 ack_success visitor)
                        (a_src,), a_valid, _ = self._route(
                            src // b, acc, [src], cap
                        )
                        validated = validated.at[
                            jnp.clip(a_src - vlo, 0, b - 1)
                        ].max(a_valid, mode="drop")
                else:
                    acc = (
                        ok & (cur == src)
                        & (((ok_bits[cur_loc] >> 31) & 1) != 0)
                    )
                    validated = validated.at[cur_loc].max(acc, mode="drop")
                    mark_v, mark_p, mark_acc = cur, parent, acc
                break
            ok = ok & (cur != src)  # the target cannot relay (nem_1.hpp:173-177)
            keys = jnp.where(ok, cur.astype(jnp.int64) * V + src, _SENT)
            ok = ok & ~membership(keys)
            keys = jnp.where(ok, keys, _SENT)
            k_s, p_s, c_s, s_s = jax.lax.sort(
                (keys, parent, cur, src), num_keys=2
            )
            first = jnp.concatenate(
                [jnp.ones(1, dtype=bool), k_s[1:] != k_s[:-1]]
            )
            sel = first & (k_s != _SENT)
            chunks.append(k_s)
            tok, nbr, gidx, valid, ovf = self._expand(
                ptr, col, jnp.clip(c_s - vlo, 0, b - 1), sel, cap, apad
            )
            overflow = overflow | ovf
            valid = valid & (nbr != p_s[tok])
            fields = [nbr, s_s[tok], c_s[tok]]
            if hopc is not None:
                fields.append(meta[gidx])
            (cur, src, parent, *em), valid, ovf = self._route(
                nbr // b, valid, fields, cap
            )
            emeta = em[0] if hopc is not None else None
            overflow = overflow | ovf

        chunks_out = (
            jnp.sort(jnp.concatenate(chunks)) if chunks
            else jnp.full(1, _SENT, dtype=jnp.int64)
        )
        overflow = jax.lax.pmax(overflow.astype(jnp.int32), "x")
        return (
            validated[None], messages, msg_r, mark_v[None], mark_p[None],
            mark_acc[None], chunks_out[None], overflow,
        )

    # -- tds program ---------------------------------------------------------

    def _tds_prog(
        self, ptr, col, ok_bits, sources, targets, n_src, meta=None,
        *, maxi: int, valid_cycle: bool, enum: tuple, cap: int, apad: int,
        collect: bool, hopc: tuple | None = None,
    ):
        n, b = self.n, self.block
        W = maxi + 1
        r = jax.lax.axis_index("x")
        vlo = r.astype(jnp.int32) * b
        ptr, col = ptr[0], col[0]
        ok_bits, sources, targets = ok_bits[0], sources[0], targets[0]
        n_src = n_src[0, 0]
        if hopc is not None:
            meta = meta[0]

        src_valid = jnp.arange(sources.shape[0]) < n_src
        tok, nbr, gidx, valid, overflow = self._expand(
            ptr, col, sources - vlo, src_valid, cap, apad
        )
        vis0 = jnp.zeros((nbr.shape[0], W), dtype=jnp.int32).at[:, 0].set(
            sources[tok]
        )
        fields = [nbr, targets[tok], vis0]
        if hopc is not None:
            fields.append(meta[gidx])
        (cur, tgt, visited, *em), valid, ovf = self._route(
            nbr // b, valid, fields, cap
        )
        emeta = em[0] if hopc is not None else None
        overflow = overflow | ovf
        messages = jnp.int64(0)
        msg_r = jnp.zeros(self.R, dtype=jnp.int64)
        validated = jnp.zeros(b, dtype=bool)
        sub_acc = jnp.zeros(cur.shape[0], dtype=bool)

        for h in range(1, maxi + 2):
            m, mr = self._msg_stats(cur, valid)
            messages = messages + m
            msg_r = msg_r + mr
            cur_loc = jnp.clip(cur - vlo, 0, b - 1)
            ok = valid & (((ok_bits[cur_loc] >> h) & 1) != 0)
            if hopc is not None:
                # hop-h metadata check at arrival (engine/nlcc.py:404)
                ok = ok & (emeta == hopc[h - 1])
            if h == maxi + 1:
                if not valid_cycle:
                    acc = ok & (cur != tgt)
                    sub_acc = acc  # path writes before the ack
                    (a_tgt,), a_valid, _ = self._route(
                        tgt // b, acc, [tgt], cap
                    )
                    validated = validated.at[
                        jnp.clip(a_tgt - vlo, 0, b - 1)
                    ].max(a_valid, mode="drop")
                else:
                    acc = ok & (cur == tgt) & (visited[:, 0] == cur)
                    tgt_loc = jnp.clip(tgt - vlo, 0, b - 1)
                    sub_acc = acc & (((ok_bits[tgt_loc] >> 0) & 1) != 0)
                    validated = validated.at[tgt_loc].max(acc, mode="drop")
                break
            k = int(enum[h])
            if k == h:
                ok = ok & ~jnp.any(visited[:, :h] == cur[:, None], axis=1)
            elif k < h:
                ok = ok & (visited[:, k] == cur)
            else:
                ok = jnp.zeros_like(ok)
            visited = visited.at[:, h].set(cur)
            tok, nbr, gidx, valid, ovf = self._expand(
                ptr, col, cur_loc, ok, cap, apad
            )
            overflow = overflow | ovf
            tgt2, vis2 = tgt[tok], visited[tok]

            def _route_step(valid_):
                fields = [nbr, tgt2, vis2]
                if hopc is not None:
                    fields.append(meta[gidx])
                (cur_, tgt_, visited_, *em_), valid2, ovf_ = self._route(
                    nbr // b, valid_, fields, cap
                )
                return (
                    cur_, tgt_, visited_,
                    em_[0] if hopc is not None else None, valid2, ovf_,
                )

            if h == maxi:
                if valid_cycle:
                    valid = valid & (nbr == tgt2)  # must close on the target
                    cur, tgt, visited, emeta, valid, ovf = _route_step(valid)
                    overflow = overflow | ovf
                    continue
                keep = nbr != tgt2
            else:
                keep = jnp.ones_like(valid)
            k2 = int(enum[h + 1])
            if k2 == h + 1:
                keep = keep & ~jnp.any(
                    vis2[:, : h + 1] == nbr[:, None], axis=1
                )
            elif k2 < h + 1:
                keep = keep & (vis2[:, k2] == nbr)
            else:
                keep = jnp.zeros_like(keep)
            valid = valid & keep
            cur, tgt, visited, emeta, valid, ovf = _route_step(valid)
            overflow = overflow | ovf

        if not collect:
            visited = jnp.zeros((1, W), dtype=jnp.int32)
            cur = jnp.zeros(1, dtype=jnp.int32)
            sub_acc = jnp.zeros(1, dtype=bool)
        overflow = jax.lax.pmax(overflow.astype(jnp.int32), "x")
        return (
            validated[None], messages, msg_r, visited[None], cur[None],
            sub_acc[None], overflow,
        )

    # -- program cache -------------------------------------------------------

    def _get(self, kind: str, spad: int, **kw):
        key = (kind, spad, tuple(sorted(kw.items())))
        if key not in self._progs:
            fn = self._nem_prog if kind == "nem" else self._tds_prog
            sh = P("x", None)
            rep = P()
            n_in = 7 if kw.get("hopc") is not None else 6
            if kind == "nem":
                out_specs = (sh, rep, rep, sh, sh, sh, sh, rep)
            else:
                out_specs = (sh, rep, rep, sh, sh, sh, rep)
            smap = jax.shard_map(
                partial(fn, **kw),
                mesh=self.mesh,
                in_specs=(sh,) * n_in,
                out_specs=out_specs,
            )
            with jax.enable_x64(True):
                self._progs[key] = jax.jit(smap)
        return self._progs[key]

    # -- host-side helpers ---------------------------------------------------

    def _ok_bits(
        self, labels, tv, c: NonLocalConstraint,
        map_keys: np.ndarray | None = None,
    ) -> np.ndarray:
        """Bit h: hop-h arrival check; bit 31: token_source_map membership
        (cycle tokens with a source missing from the map are dropped, like
        the reference's error path — nem_1.hpp:750-755)."""
        bits = np.zeros(self.vpad, dtype=np.uint32)
        for h in range(0, c.cycle_length + 2):
            ok = (labels == c.labels[h]) & (
                ((tv >> int(c.indices[h])) & 1) != 0
            )
            bits[: self.V] |= ok.astype(np.uint32) << np.uint32(h)
        if map_keys is not None:
            bits[map_keys] |= np.uint32(1) << np.uint32(31)
        return bits.reshape(self.n, self.block)

    def _partition(self, vals: np.ndarray, extra=None):
        """Split per-vertex-id arrays (sorted by id) into per-owner padded
        rows. Returns ([n, S] vals, [n, 1] counts, [n, S] extra?)."""
        n, b = self.n, self.block
        bounds = np.searchsorted(vals, np.arange(n + 1) * b)
        smax = _pow2(int(max((bounds[1:] - bounds[:-1]).max(), 1)), lo=8)
        out = np.zeros((n, smax), dtype=np.int32)
        cnt = np.zeros((n, 1), dtype=np.int32)
        ex = np.zeros((n, smax), dtype=np.int32) if extra is not None else None
        for r in range(n):
            lo, hi = bounds[r], bounds[r + 1]
            out[r, : hi - lo] = vals[lo:hi]
            cnt[r, 0] = hi - lo
            if extra is not None:
                ex[r, : hi - lo] = extra[lo:hi]
        return out, cnt, ex

    def _partition_keys(self, keys: np.ndarray):
        """Owner-partition sorted dedup keys (key // V is the vertex)."""
        n, b = self.n, self.block
        owners = keys // np.int64(self.V) // b
        bounds = np.searchsorted(owners, np.arange(n + 1))
        fmax = int(max((bounds[1:] - bounds[:-1]).max(initial=0), 0))
        fpad = _pow2(fmax, lo=0) if fmax else 0
        out = np.full((n, max(fpad, 1)), _SENT, dtype=np.int64)
        for r in range(n):
            lo, hi = bounds[r], bounds[r + 1]
            out[r, : hi - lo] = keys[lo:hi]
        return out, fpad

    def _first_expansion(self, acsr: AliveCsr, sources: np.ndarray) -> int:
        """Max per-device first-hop fan-out (sets the starting capacity)."""
        if len(sources) == 0:
            return 0
        deg = acsr.ptr[sources + 1] - acsr.ptr[sources]
        owners = sources // self.block
        per_dev = np.bincount(owners, weights=deg, minlength=self.n)
        return int(per_dev.max())

    # -- public API (mirrors DeviceNlcc) -------------------------------------

    def run_nem(
        self,
        acsr: AliveCsr,
        labels: np.ndarray,
        tv: np.ndarray,
        c: NonLocalConstraint,
        num_vertices: int,
        forwarded: ForwardedSets | None = None,
        hopc: np.ndarray | None = None,
        candidates: np.ndarray | None = None,
        source_batch: int | None = None,
    ) -> NlccOutcome:
        assert num_vertices == self.V
        if forwarded is None:
            forwarded = ForwardedSets.empty()
        sources = token_sources(c, labels, tv, candidates)
        if c.selected_vertices:
            map_keys = np.nonzero((tv != 0) & (labels == c.labels[-1]))[
                0
            ].astype(np.int64)
        else:
            map_keys = sources
        ptr, col, meta, apad = self.prepare(acsr)
        hopc_t = None
        if hopc is not None:
            if meta is None:
                raise ValueError("hopc given but the AliveCsr carries no meta")
            hopc_t = tuple(int(x) for x in hopc)
        maxi = c.cycle_length
        # dedup keys are per (vertex, SOURCE): source batches are
        # independent, so the outer chunking (the -x machinery,
        # tds_batch_1.hpp:1149-1303) bounds peak frontier memory exactly
        sb = source_batch or max(len(sources), 1)
        fwd_p, fpad = self._partition_keys(forwarded.keys)
        ok_bits = self._ok_bits(labels, tv, c, map_keys=map_keys)
        validated_v = np.zeros(self.V, dtype=bool)
        edge_marks: list = []
        messages = 0
        msg_r_tot = np.zeros(self.R, dtype=np.int64)

        for lo in range(0, max(len(sources), 1), sb):
            batch = sources[lo : lo + sb]
            if len(batch) == 0:
                continue
            cap = _pow2(self._first_expansion(acsr, batch))
            src_p, cnt_p, _ = self._partition(batch)
            with jax.enable_x64(True):
                args = [
                    ptr, col, jnp.asarray(ok_bits), jnp.asarray(src_p),
                    jnp.asarray(cnt_p), jnp.asarray(fwd_p),
                ]
                if hopc_t is not None:
                    args.append(meta)
                doublings = 0
                while True:
                    prog = self._get(
                        "nem", src_p.shape[1], maxi=maxi,
                        valid_cycle=bool(c.valid_cycle),
                        selected=bool(c.selected_vertices), cap=cap,
                        apad=apad, fpad=fpad, hopc=hopc_t,
                    )
                    out = prog(*args)
                    if not bool(np.asarray(out[-1])):
                        break
                    if doublings >= self.max_cap_doublings:
                        raise FrontierOverflow(
                            f"mesh nem frontier overflowed cap={cap} after "
                            f"{doublings} doublings (sources "
                            f"{lo}..{lo + len(batch)})"
                        )
                    cap *= 2
                    doublings += 1
            validated_s, m_b, mr_b, mk_v, mk_p, mk_acc, chunks, _ = out
            validated_v |= np.asarray(validated_s).reshape(-1)[: self.V]
            messages += int(m_b)
            mr_b = np.asarray(mr_b)
            msg_r_tot += mr_b if self.R > 1 else mr_b[:1]
            if c.valid_cycle:
                mk_acc = np.asarray(mk_acc).reshape(-1)
                if mk_acc.any():
                    mv = np.asarray(mk_v).reshape(-1)[mk_acc]
                    mp = np.asarray(mk_p).reshape(-1)[mk_acc]
                    edge_marks += [
                        (int(v), int(p)) for v, p in zip(mv, mp)
                    ]
            new_keys = np.asarray(chunks).reshape(-1)
            new_keys = new_keys[new_keys != _SENT]
            if len(new_keys):
                forwarded.add(np.unique(new_keys))
        return NlccOutcome(
            map_keys,
            validated_v[map_keys] if len(map_keys) else np.zeros(0, dtype=bool),
            messages,
            edge_marks,
            None,
            msg_r_tot,
        )

    def run_tds(
        self,
        acsr: AliveCsr,
        labels: np.ndarray,
        tv: np.ndarray,
        c: NonLocalConstraint,
        num_vertices: int,
        collect_subgraphs: bool = True,
        forwarded: ForwardedSets | None = None,
        hopc: np.ndarray | None = None,
        candidates: np.ndarray | None = None,
        source_batch: int | None = None,
    ) -> NlccOutcome:
        assert num_vertices == self.V
        sources = token_sources(c, labels, tv, candidates)
        starts, targets = tds_start_pairs(c, sources, forwarded, self.V)
        order = np.argsort(starts, kind="stable")
        starts, targets = starts[order], targets[order]
        ptr, col, meta, apad = self.prepare(acsr)
        hopc_t = None
        if hopc is not None:
            if meta is None:
                raise ValueError("hopc given but the AliveCsr carries no meta")
            hopc_t = tuple(int(x) for x in hopc)
        maxi = c.cycle_length
        W = maxi + 1
        ok_bits = self._ok_bits(labels, tv, c)
        # token-source batching (the -x machinery, tds_batch_1.hpp:
        # 1149-1303): TDS has no cross-source dedup, so chunks of the
        # start set are independent and bound peak frontier memory
        sb = source_batch or max(len(starts), 1)
        validated_v = np.zeros(self.V, dtype=bool)
        messages = 0
        msg_r_tot = np.zeros(self.R, dtype=np.int64)
        sub_parts: list[np.ndarray] = []

        for lo in range(0, max(len(starts), 1), sb):
            batch = starts[lo : lo + sb]
            btgt = targets[lo : lo + sb]
            if len(batch) == 0:
                continue
            cap = _pow2(self._first_expansion(acsr, batch))
            src_p, cnt_p, tgt_p = self._partition(batch, extra=btgt)
            with jax.enable_x64(True):
                args = [
                    ptr, col, jnp.asarray(ok_bits), jnp.asarray(src_p),
                    jnp.asarray(tgt_p), jnp.asarray(cnt_p),
                ]
                if hopc_t is not None:
                    args.append(meta)
                doublings = 0
                while True:
                    prog = self._get(
                        "tds", src_p.shape[1], maxi=maxi,
                        valid_cycle=bool(c.valid_cycle),
                        enum=tuple(int(x) for x in c.enumeration), cap=cap,
                        apad=apad, collect=collect_subgraphs, hopc=hopc_t,
                    )
                    out = prog(*args)
                    if not bool(np.asarray(out[-1])):
                        break
                    if doublings >= self.max_cap_doublings:
                        raise FrontierOverflow(
                            f"mesh TDS frontier overflowed cap={cap} after "
                            f"{doublings} doublings (sources "
                            f"{lo}..{lo + len(batch)})"
                        )
                    cap *= 2
                    doublings += 1
            validated_s, m_b, mr_b, visited, cur, sub_acc, _ = out
            validated_v |= np.asarray(validated_s).reshape(-1)[: self.V]
            messages += int(m_b)
            mr_b = np.asarray(mr_b)
            msg_r_tot += mr_b if self.R > 1 else mr_b[:1]
            sub_acc = np.asarray(sub_acc).reshape(-1)
            if collect_subgraphs and sub_acc.any():
                vis = np.asarray(visited).reshape(-1, W)[sub_acc].astype(
                    np.int64
                )
                last = np.asarray(cur).reshape(-1)[sub_acc].astype(np.int64)[
                    :, None
                ]
                sub_parts.append(np.hstack([vis, last, last]))
        subgraphs = (
            np.vstack(sub_parts)
            if sub_parts
            else np.empty((0, maxi + 3), dtype=np.int64)
        )
        return NlccOutcome(
            sources,
            validated_v[sources] if len(sources) else np.zeros(0, dtype=bool),
            messages,
            [],
            subgraphs,
            msg_r_tot,
        )
