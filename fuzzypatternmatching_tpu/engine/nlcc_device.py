"""Device-side NLCC — token-passing walks as jitted frontier programs.

The host engine (engine/nlcc.py) expands token frontiers with vectorized
numpy; that is fine for heavily-pruned tree workloads but leaves the
non-local phase off the accelerator. This module runs a WHOLE constraint
(all ``cycle_length + 1`` hops of nem_1.hpp / tds_batch_1.hpp token passing)
as ONE jitted XLA program over fixed-capacity frontier arrays:

  * ragged expansion over the alive CSR = scatter-max of token starts +
    an associative running max (lane -> token), all statically shaped;
  * the per-(vertex, source) forwarded-token dedup (nem_1.hpp:131-139,
    270-286) = a multi-key ``lax.sort`` by (key, parent) — winner is the
    smallest parent, exactly the host/oracle determinism rule — plus
    sorted per-hop key chunks checked with ``searchsorted`` membership;
  * frontier capacity is a static power of two; the program reports
    overflow and the host retries at double capacity (the compile cache
    makes each (constraint-shape, capacity) program a one-time cost).

Results are bit-identical to engine/nlcc.py (cross-tested) — same
NlccOutcome, same messages counts, same winner choices, same subgraphs.

Dedup keys are ``v * V + src`` int64; programs are traced under
``jax.enable_x64`` so the module works regardless of the global x64 flag.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..pattern.nonlocal_constraint import NonLocalConstraint
from .nlcc import (
    AliveCsr,
    FrontierOverflow,
    ForwardedSets,
    NlccOutcome,
    tds_start_pairs,
    token_sources,
)

_SENT = np.int64(np.iinfo(np.int64).max)


def _pow2(n: int, lo: int = 256) -> int:
    return max(lo, 1 << int(np.ceil(np.log2(max(n, 1)))))


def _in_sorted(a: jax.Array, q: jax.Array) -> jax.Array:
    """Membership of each q in sorted array a (sentinel padding at the end)."""
    pos = jnp.searchsorted(a, q)
    pos = jnp.minimum(pos, a.shape[0] - 1)
    return a[pos] == q


class DeviceNlcc:
    """Jit-program cache + host wrappers mirroring run_nem / run_tds."""

    # bound on capacity doublings (see ShardedNlcc.MAX_CAP_DOUBLINGS): each
    # (shape, capacity) pair is a fresh XLA program; past the cap the run
    # raises FrontierOverflow and the driver falls back to the host engine.
    # FPM_NLCC_MAX_DOUBLINGS overrides where compiles are cheap.
    MAX_CAP_DOUBLINGS = 3

    @property
    def max_cap_doublings(self) -> int:
        import os

        return int(
            os.environ.get(
                "FPM_NLCC_MAX_DOUBLINGS", str(self.MAX_CAP_DOUBLINGS)
            )
        )

    def __init__(self, num_vertices: int, num_ranks: int = 1):
        if num_vertices >= (1 << 31):
            raise ValueError("device NLCC dedup keys require V < 2^31")
        self.V = num_vertices
        self.R = num_ranks
        self._progs: dict = {}

    # -- CSR upload (cached per AliveCsr instance) --------------------------

    def prepare(self, acsr: AliveCsr):
        dev = getattr(acsr, "_dev_cache", None)
        if dev is not None:
            return dev
        apad = _pow2(len(acsr.col))
        col = np.zeros(apad, dtype=np.int32)
        col[: len(acsr.col)] = acsr.col
        with jax.enable_x64(True):
            dev = (
                jnp.asarray(acsr.ptr.astype(np.int32)),
                jnp.asarray(col),
                apad,
            )
        acsr._dev_cache = dev
        return dev

    # -- traced building blocks ---------------------------------------------

    @staticmethod
    def _expand(ptr, col, cur, valid, cap_out: int, apad: int):
        """All alive neighbors of the valid lanes of ``cur``, flattened into
        ``cap_out`` output lanes. Returns (token_lane, neighbor, valid_out,
        overflow)."""
        safe = jnp.where(valid, cur, 0)
        base = ptr[safe].astype(jnp.int64)
        cnt = jnp.where(valid, (ptr[safe + 1].astype(jnp.int64) - base), 0)
        cum = jnp.cumsum(cnt)
        total = cum[-1]
        starts = cum - cnt
        lanes = jnp.arange(cap_out, dtype=jnp.int64)
        tok_ids = jnp.arange(cnt.shape[0], dtype=jnp.int32)
        idx = jnp.where(cnt > 0, starts, np.int64(cap_out))  # OOB -> dropped
        seed = jnp.zeros(cap_out, dtype=jnp.int32).at[idx].max(
            tok_ids, mode="drop"
        )
        tok = jax.lax.associative_scan(jnp.maximum, seed)
        off = lanes - starts[tok]
        gidx = jnp.clip(base[tok] + off, 0, apad - 1)
        nbr = col[gidx]
        valid_out = lanes < jnp.minimum(total, np.int64(cap_out))
        return tok, nbr, valid_out, total > cap_out

    def _msg_stats(self, cur, valid):
        m = jnp.sum(valid, dtype=jnp.int64)
        if self.R == 1:
            return m, m[None]
        mr = jax.ops.segment_sum(
            valid.astype(jnp.int64), cur % self.R, num_segments=self.R
        )
        return m, mr

    # -- nem program ---------------------------------------------------------

    def _nem_prog(
        self, ptr, col, ok_bits, sources, n_src, fwd_in,
        *, maxi: int, valid_cycle: bool, selected: bool, cap: int,
        apad: int, fpad: int,
    ):
        V = self.V
        src_valid = jnp.arange(sources.shape[0]) < n_src
        tok, nbr, valid, overflow = self._expand(
            ptr, col, sources, src_valid, cap, apad
        )
        cur, src, parent = nbr, sources[tok], sources[tok]
        messages = jnp.int64(0)
        msg_r = jnp.zeros(self.R, dtype=jnp.int64)
        validated = jnp.zeros(V, dtype=bool)
        chunks: list[jax.Array] = []
        mark_v = jnp.zeros(cap, dtype=jnp.int32)
        mark_p = jnp.zeros(cap, dtype=jnp.int32)
        mark_acc = jnp.zeros(cap, dtype=bool)

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
            ok = valid & (((ok_bits[cur] >> h) & 1) != 0)
            if h == maxi + 1:
                if not valid_cycle:
                    acc = ok & (cur != src)
                    if selected:
                        keys = cur.astype(jnp.int64) * V + src
                        acc = acc & membership(keys)
                        validated = validated.at[cur].max(acc, mode="drop")
                    else:
                        validated = validated.at[src].max(acc, mode="drop")
                else:
                    acc = (
                        ok & (cur == src)
                        & (((ok_bits[cur] >> 31) & 1) != 0)
                    )
                    validated = validated.at[src].max(acc, mode="drop")
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
            chunks.append(k_s)  # winner keys (+ duplicates; same value set)
            tok, nbr, valid, ovf = self._expand(ptr, col, c_s, sel, cap, apad)
            overflow = overflow | ovf
            # don't return to the vertex the winner received the token from
            valid = valid & (nbr != p_s[tok])
            parent, src, cur = c_s[tok], s_s[tok], nbr

        chunks_out = (
            jnp.sort(jnp.concatenate(chunks)) if chunks
            else jnp.full(1, _SENT, dtype=jnp.int64)
        )
        return (
            validated, messages, msg_r, mark_v, mark_p, mark_acc,
            chunks_out, overflow,
        )

    # -- tds program ---------------------------------------------------------

    def _tds_prog(
        self, ptr, col, ok_bits, sources, targets, n_src,
        *, maxi: int, valid_cycle: bool, enum: tuple, cap: int, apad: int,
        collect: bool,
    ):
        V = self.V
        W = maxi + 1  # walk history columns 0..maxi
        src_valid = jnp.arange(sources.shape[0]) < n_src
        tok, nbr, valid, overflow = self._expand(
            ptr, col, sources, src_valid, cap, apad
        )
        # the walk start lives in visited[:, 0]; tgt is the expected target
        # (== start unless selected-vertices, tds_batch_1.hpp:494-500)
        cur, tgt = nbr, targets[tok]
        visited = jnp.zeros((cap, W), dtype=jnp.int32).at[:, 0].set(
            sources[tok]
        )
        messages = jnp.int64(0)
        msg_r = jnp.zeros(self.R, dtype=jnp.int64)
        validated = jnp.zeros(V, dtype=bool)
        sub_acc = jnp.zeros(cap, dtype=bool)

        for h in range(1, maxi + 2):
            m, mr = self._msg_stats(cur, valid)
            messages = messages + m
            msg_r = msg_r + mr
            ok = valid & (((ok_bits[cur] >> h) & 1) != 0)
            if h == maxi + 1:
                if not valid_cycle:
                    acc = ok & (cur != tgt)
                    sub_acc = acc  # path writes before the ack
                else:
                    acc = ok & (cur == tgt) & (visited[:, 0] == cur)
                    # cycle writes only when the target is in the map
                    sub_acc = acc & (((ok_bits[tgt] >> 0) & 1) != 0)
                # scatter at non-source targets is harmless: the outcome
                # only reads source positions
                validated = validated.at[tgt].max(acc, mode="drop")
                break
            # receiver-side enumeration rule (tds_batch_1.hpp:620-639)
            k = int(enum[h])
            if k == h:
                ok = ok & ~jnp.any(visited[:, :h] == cur[:, None], axis=1)
            elif k < h:
                ok = ok & (visited[:, k] == cur)
            else:
                ok = jnp.zeros_like(ok)
            visited = visited.at[:, h].set(cur)
            tok, nbr, valid, ovf = self._expand(ptr, col, cur, ok, cap, apad)
            overflow = overflow | ovf
            tgt, visited, cur = tgt[tok], visited[tok], nbr
            if h == maxi:
                # penultimate hop (tds_batch_1.hpp:806-846)
                if valid_cycle:
                    valid = valid & (nbr == tgt)  # must close on the target
                    continue
                keep = nbr != tgt
            else:
                keep = jnp.ones_like(valid)
            k2 = int(enum[h + 1])
            if k2 == h + 1:
                keep = keep & ~jnp.any(
                    visited[:, : h + 1] == nbr[:, None], axis=1
                )
            elif k2 < h + 1:
                keep = keep & (visited[:, k2] == nbr)
            else:
                keep = jnp.zeros_like(keep)
            valid = valid & keep

        if not collect:
            visited = jnp.zeros((1, W), dtype=jnp.int32)
            cur = jnp.zeros(1, dtype=jnp.int32)
        return validated, messages, msg_r, visited, cur, sub_acc, overflow

    # -- program cache -------------------------------------------------------

    def _get(self, kind: str, **kw):
        key = (kind, tuple(sorted(kw.items())))
        if key not in self._progs:
            fn = self._nem_prog if kind == "nem" else self._tds_prog
            with jax.enable_x64(True):
                self._progs[key] = jax.jit(partial(fn, **kw))
        return self._progs[key]

    # -- host-side helpers ---------------------------------------------------

    def _ok_bits(
        self, labels, tv, c: NonLocalConstraint,
        map_keys: np.ndarray | None = None,
    ) -> np.ndarray:
        """Per-vertex uint32 bitmask: bit h set iff the vertex passes the
        hop-h arrival check (label + template-vertex bit); bit 0 set iff it
        qualifies as a token source (the token_source_map membership test);
        bit 31 set iff the vertex is a token_source_map key (cycle
        acceptance drops tokens whose source is missing from the map, like
        the reference's error path — nem_1.hpp:750-755). tv is fixed for
        the duration of one constraint run, so this is precomputable."""
        bits = np.zeros(self.V, dtype=np.uint32)
        for h in range(0, c.cycle_length + 2):
            ok = (labels == c.labels[h]) & (
                ((tv >> int(c.indices[h])) & 1) != 0
            )
            bits |= ok.astype(np.uint32) << np.uint32(h)
        if map_keys is not None:
            bits[map_keys] |= np.uint32(1) << np.uint32(31)
        return bits

    def _first_expansion(self, acsr: AliveCsr, sources: np.ndarray) -> int:
        if len(sources) == 0:
            return 0
        return int((acsr.ptr[sources + 1] - acsr.ptr[sources]).sum())

    # -- public API (mirrors engine/nlcc.py) ---------------------------------

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
    ) -> NlccOutcome:
        assert num_vertices == self.V
        if hopc is not None:
            raise NotImplementedError(
                "metadata hop filters run in the host or mesh NLCC engines"
            )
        if forwarded is None:
            forwarded = ForwardedSets.empty()
        sources = token_sources(c, labels, tv, candidates)
        if c.selected_vertices:
            map_keys = np.nonzero((tv != 0) & (labels == c.labels[-1]))[0].astype(np.int64)
        else:
            map_keys = sources
        ptr, col, apad = self.prepare(acsr)
        maxi = c.cycle_length
        cap = _pow2(self._first_expansion(acsr, sources))
        spad = _pow2(len(sources), lo=8)
        src_pad = np.zeros(spad, dtype=np.int32)
        src_pad[: len(sources)] = sources
        fpad = _pow2(len(forwarded.keys), lo=0) if len(forwarded.keys) else 0
        fwd_in = np.full(max(fpad, 1), _SENT, dtype=np.int64)
        fwd_in[: len(forwarded.keys)] = forwarded.keys
        ok_bits = self._ok_bits(labels, tv, c, map_keys=map_keys)

        with jax.enable_x64(True):
            args = (
                ptr, col, jnp.asarray(ok_bits), jnp.asarray(src_pad),
                jnp.int32(len(sources)), jnp.asarray(fwd_in),
            )
            doublings = 0
            while True:
                prog = self._get(
                    "nem", maxi=maxi, valid_cycle=bool(c.valid_cycle),
                    selected=bool(c.selected_vertices), cap=cap, apad=apad,
                    fpad=fpad,
                )
                out = prog(*args)
                if not bool(out[-1]):
                    break
                if doublings >= self.max_cap_doublings:
                    raise FrontierOverflow(
                        f"device nem frontier overflowed cap={cap} after "
                        f"{doublings} doublings"
                    )
                cap *= 2
                doublings += 1
        validated_v, messages, msg_r, mk_v, mk_p, mk_acc, chunks, _ = out
        validated_v = np.asarray(validated_v)
        edge_marks = []
        if c.valid_cycle:
            mk_acc = np.asarray(mk_acc)
            if mk_acc.any():
                mv = np.asarray(mk_v)[mk_acc]
                mp = np.asarray(mk_p)[mk_acc]
                edge_marks = [(int(v), int(p)) for v, p in zip(mv, mp)]
        new_keys = np.asarray(chunks)
        new_keys = new_keys[new_keys != _SENT]
        if len(new_keys):
            forwarded.add(np.unique(new_keys))
        msg_r = np.asarray(msg_r)
        if self.R == 1:
            msg_r = msg_r[:1]
        return NlccOutcome(
            map_keys,
            validated_v[map_keys] if len(map_keys) else np.zeros(0, dtype=bool),
            int(messages),
            edge_marks,
            None,
            msg_r,
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
    ) -> NlccOutcome:
        assert num_vertices == self.V
        if hopc is not None:
            raise NotImplementedError(
                "metadata hop filters run in the host or mesh NLCC engines"
            )
        sources = token_sources(c, labels, tv, candidates)
        starts, targets = tds_start_pairs(c, sources, forwarded, self.V)
        ptr, col, apad = self.prepare(acsr)
        maxi = c.cycle_length
        cap = _pow2(self._first_expansion(acsr, starts))
        spad = _pow2(len(starts), lo=8)
        src_pad = np.zeros(spad, dtype=np.int32)
        src_pad[: len(starts)] = starts
        tgt_pad = np.zeros(spad, dtype=np.int32)
        tgt_pad[: len(starts)] = targets
        ok_bits = self._ok_bits(labels, tv, c)

        with jax.enable_x64(True):
            args = (
                ptr, col, jnp.asarray(ok_bits), jnp.asarray(src_pad),
                jnp.asarray(tgt_pad), jnp.int32(len(starts)),
            )
            doublings = 0
            while True:
                prog = self._get(
                    "tds", maxi=maxi, valid_cycle=bool(c.valid_cycle),
                    enum=tuple(int(x) for x in c.enumeration), cap=cap,
                    apad=apad, collect=collect_subgraphs,
                )
                out = prog(*args)
                if not bool(out[-1]):
                    break
                if doublings >= self.max_cap_doublings:
                    raise FrontierOverflow(
                        f"device TDS frontier overflowed cap={cap} after "
                        f"{doublings} doublings"
                    )
                cap *= 2
                doublings += 1
        validated_v, messages, msg_r, visited, cur, sub_acc, _ = out
        validated_v = np.asarray(validated_v)
        sub_acc = np.asarray(sub_acc)
        if collect_subgraphs and sub_acc.any():
            vis = np.asarray(visited)[sub_acc].astype(np.int64)
            last = np.asarray(cur)[sub_acc].astype(np.int64)[:, None]
            subgraphs = np.hstack([vis, last, last])
        else:
            subgraphs = np.empty((0, maxi + 3), dtype=np.int64)
        msg_r = np.asarray(msg_r)
        if self.R == 1:
            msg_r = msg_r[:1]
        return NlccOutcome(
            sources,
            validated_v[sources] if len(sources) else np.zeros(0, dtype=bool),
            int(messages),
            [],
            subgraphs,
            msg_r,
        )
