"""NLCC — non-local constraint checking as vectorized frontier supersteps.

Re-expresses the reference's asynchronous token-passing visitors
(token_passing_pattern_matching_nonunique_nem_1.hpp — path/cycle checks;
..._tds_batch_1.hpp — template-driven search with walk history) as
breadth-synchronous frontier expansion over the *pruned* adjacency (the
dense mirror of ``vertex_active_edges_map``).

Determinism: the reference forwards at most one token per (vertex, source)
per constraint run, first-arrival-wins (nem_1.hpp:131-139, 270-286). Here
the winner is defined as: earliest superstep, then smallest parent id.

Token-source batching (the ``-x`` flag / max_ranks_per_itr machinery,
tds_batch_1.hpp:1149-1303) becomes an outer loop over source chunks that
bounds peak frontier memory without changing results (TDS has no dedup, so
batches are independent; nem dedup is per-source, hence also
batch-independent).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..graph.csr import Graph
from ..pattern.nonlocal_constraint import NonLocalConstraint


@dataclass
class AliveCsr:
    """Pruned adjacency: only edges whose receiver-side slot is alive and
    whose row vertex is still active."""

    ptr: np.ndarray  # int64 [V+1]
    col: np.ndarray  # int64 [A]

    @classmethod
    def from_pairs(
        cls, arow: np.ndarray, acol: np.ndarray, live: np.ndarray,
        num_vertices: int,
    ) -> "AliveCsr":
        """Build from (row, col) alive-slot pairs (already row-sorted)."""
        mask = live[arow]
        r, c = arow[mask], acol[mask]
        counts = np.bincount(r, minlength=num_vertices)
        ptr = np.zeros(num_vertices + 1, dtype=np.int64)
        np.cumsum(counts, out=ptr[1:])
        return cls(ptr=ptr, col=c.astype(np.int64))

    @classmethod
    def build(cls, graph: Graph, edge_alive: np.ndarray, live: np.ndarray) -> "AliveCsr":
        mask = edge_alive & live[graph.edge_row]
        arow = graph.edge_row[mask]
        acol = graph.cols[mask]
        counts = np.bincount(arow, minlength=graph.num_vertices)
        ptr = np.zeros(graph.num_vertices + 1, dtype=np.int64)
        np.cumsum(counts, out=ptr[1:])
        return cls(ptr=ptr, col=acol.astype(np.int64))

    # token frontiers beyond this size abort with guidance rather than
    # exhausting host memory (tds_batch's -x analog caps sources, not walks)
    MAX_FRONTIER = 1 << 28

    def expand(self, vs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All alive neighbors of each vs[i]: returns (token_index, neighbor)
        with one row per (i, nbr) pair."""
        cnt = self.ptr[vs + 1] - self.ptr[vs]
        total = int(cnt.sum())
        if total > self.MAX_FRONTIER:
            raise MemoryError(
                f"token frontier would reach {total} entries; re-run with a "
                "smaller token-source batch (-x) or tighten the pattern's "
                "local constraints"
            )
        rep = np.repeat(np.arange(len(vs), dtype=np.int64), cnt)
        offs = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        nbr = self.col[self.ptr[vs][rep] + offs]
        return rep, nbr


@dataclass
class ForwardedSets:
    """Persistent (vertex, source) forwarded-token keys — the dense mirror
    of vertex_token_source_set, shared across constraint runs for the
    selected-vertices work aggregation (beta.cpp:791-852)."""

    keys: np.ndarray  # sorted v*V + src

    @classmethod
    def empty(cls) -> "ForwardedSets":
        return cls(keys=np.empty(0, dtype=np.int64))

    def reset_for(
        self,
        c: NonLocalConstraint,
        labels: np.ndarray,
        tv: np.ndarray,
        num_vertices: int,
    ) -> None:
        if not c.selected_vertices:
            self.keys = np.empty(0, dtype=np.int64)
            return
        v_of = self.keys // np.int64(num_vertices)
        keep = (tv[v_of] != 0) & (labels[v_of] == c.labels[-1])
        self.keys = self.keys[keep]

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(self.keys) == 0:
            return np.zeros(len(keys), dtype=bool)
        pos = np.searchsorted(self.keys, keys)
        pos_c = np.minimum(pos, len(self.keys) - 1)
        return self.keys[pos_c] == keys

    def add(self, keys: np.ndarray) -> None:
        self.keys = np.union1d(self.keys, keys)


@dataclass
class NlccOutcome:
    sources: np.ndarray  # all token sources (the token_source_map keys)
    validated: np.ndarray  # bool per source
    messages: int
    edge_marks: list  # (v, parent) pairs to flag (cycle success marks)
    subgraphs: np.ndarray | None = None  # [N, walk_len+1] enumerated matches
    msg_per_rank: np.ndarray | None = None  # arrival counts by receiver owner


def token_sources(
    c: NonLocalConstraint, labels: np.ndarray, tv: np.ndarray
) -> np.ndarray:
    """Qualifying token sources (nem_1.hpp:387-479; tds_batch_1.hpp:1067-1135).

    Path-check (non-TDS) sources must hold both endpoint template bits."""
    mask = (labels == c.labels[0]) & ((tv >> int(c.indices[0])) & 1).astype(bool)
    if not c.is_tds and not c.valid_cycle and not c.selected_vertices:
        mask &= ((tv >> int(c.indices[-1])) & 1).astype(bool)
    return np.nonzero(mask)[0].astype(np.int64)


def _arrival_ok(
    cur: np.ndarray, labels: np.ndarray, tv: np.ndarray, c, h: int
) -> np.ndarray:
    return (labels[cur] == c.labels[h]) & (
        (tv[cur] >> int(c.indices[h])) & 1
    ).astype(bool)


def run_nem(
    acsr: AliveCsr,
    labels: np.ndarray,
    tv: np.ndarray,
    c: NonLocalConstraint,
    num_vertices: int,
    batch_size: int = 1 << 22,
    num_ranks: int = 1,
    forwarded: ForwardedSets | None = None,
) -> NlccOutcome:
    """nem-style walk constraint: one pass of
    token_passing_pattern_matching (nem_1.hpp:913-939). ``forwarded`` is the
    persistent per-(vertex, source) dedup/aggregation set; pass the same
    object across constraints after calling ``reset_for``."""
    if forwarded is None:
        forwarded = ForwardedSets.empty()
    sources = token_sources(c, labels, tv)
    if c.selected_vertices:
        # destinations (active final-label vertices) are the validated
        # entities in aggregation mode (nem_1.hpp:414-432, 694-716)
        map_keys = np.nonzero((tv != 0) & (labels == c.labels[-1]))[0].astype(
            np.int64
        )
    else:
        map_keys = sources
    validated = np.zeros(len(map_keys), dtype=bool)
    src_pos = {int(s): i for i, s in enumerate(map_keys)}
    maxi = c.cycle_length
    vv = np.int64(num_vertices)
    messages = 0
    msg_r = np.zeros(num_ranks, dtype=np.int64)
    edge_marks: list = []

    for lo in range(0, max(len(sources), 1), batch_size):
        batch = sources[lo : lo + batch_size]
        if len(batch) == 0:
            continue
        rep, nbr = acsr.expand(batch)
        cur, src, parent = nbr, batch[rep], batch[rep]
        for h in range(1, maxi + 2):
            messages += len(cur)
            if len(cur) == 0:
                break
            msg_r += np.bincount(cur % num_ranks, minlength=num_ranks)
            ok = _arrival_ok(cur, labels, tv, c, h)
            if h == maxi + 1:
                if not c.valid_cycle:
                    acc = ok & (cur != src)
                    if c.selected_vertices:
                        # validate destinations that forwarded this source
                        acc &= forwarded.contains(cur * vv + src)
                        for d in np.unique(cur[acc]):
                            if int(d) in src_pos:
                                validated[src_pos[int(d)]] = True
                        break
                else:
                    acc = ok & (cur == src)
                    for v, p in zip(cur[acc], parent[acc]):
                        edge_marks.append((int(v), int(p)))
                for s in np.unique(src[acc]):
                    validated[src_pos[int(s)]] = True
                break
            ok &= cur != src  # the target cannot relay (nem_1.hpp:173-177)
            keys = cur * vv + src
            ok &= ~forwarded.contains(keys)
            k_ok, p_ok = keys[ok], parent[ok]
            cur_ok, src_ok = cur[ok], src[ok]
            # winner per (v, src): smallest parent id
            order = np.lexsort((p_ok, k_ok))
            k_sorted = k_ok[order]
            first = np.ones(len(order), dtype=bool)
            first[1:] = k_sorted[1:] != k_sorted[:-1]
            sel = order[first]
            forwarded.add(k_sorted[first])
            v_sel, s_sel, p_sel = cur_ok[sel], src_ok[sel], p_ok[sel]
            rep, nbr = acsr.expand(v_sel)
            keep = nbr != p_sel[rep]  # don't return to the received-from parent
            cur = nbr[keep]
            src = s_sel[rep][keep]
            parent = v_sel[rep][keep]
    return NlccOutcome(map_keys if c.selected_vertices else sources, validated, messages, edge_marks, None, msg_r)


def tds_start_pairs(
    c: NonLocalConstraint,
    sources: np.ndarray,
    forwarded: ForwardedSets | None,
    num_vertices: int,
) -> tuple[np.ndarray, np.ndarray]:
    """(start, expected-target) pairs. Normally target == start; in
    selected-vertices mode each source emits one token per remembered
    original source (tds_batch_1.hpp:439-441, 494-500)."""
    if not c.selected_vertices:
        return sources, sources
    if forwarded is None or len(forwarded.keys) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    v_of = forwarded.keys // np.int64(num_vertices)
    t_of = forwarded.keys % np.int64(num_vertices)
    keep = np.isin(v_of, sources)
    return v_of[keep], t_of[keep]


def run_tds(
    acsr: AliveCsr,
    labels: np.ndarray,
    tv: np.ndarray,
    c: NonLocalConstraint,
    num_vertices: int,
    source_batch: int = 1 << 16,
    collect_subgraphs: bool = True,
    num_ranks: int = 1,
    forwarded: ForwardedSets | None = None,
) -> NlccOutcome:
    """TDS enumeration walk with full history
    (tds_batch_1.hpp:560-930, 1149-1303)."""
    sources = token_sources(c, labels, tv)
    validated = np.zeros(len(sources), dtype=bool)
    src_pos = {int(s): i for i, s in enumerate(sources)}
    starts, targets = tds_start_pairs(c, sources, forwarded, num_vertices)
    maxi = c.cycle_length
    enum = c.enumeration
    messages = 0
    msg_r = np.zeros(num_ranks, dtype=np.int64)
    sub_parts: list[np.ndarray] = []

    for lo in range(0, max(len(starts), 1), source_batch):
        batch = starts[lo : lo + source_batch]
        btgt = targets[lo : lo + source_batch]
        if len(batch) == 0:
            continue
        rep, nbr = acsr.expand(batch)
        cur, tgt = nbr, btgt[rep]
        visited = batch[rep][:, None]  # positions 0..h-1 per token
        for h in range(1, maxi + 2):
            messages += len(cur)
            if len(cur) == 0:
                break
            msg_r += np.bincount(cur % num_ranks, minlength=num_ranks)
            ok = _arrival_ok(cur, labels, tv, c, h)
            if h == maxi + 1:
                if not c.valid_cycle:
                    acc = ok & (cur != tgt)
                    emit = acc  # path writes before the ack (…hpp:684-696)
                else:
                    acc = ok & (cur == tgt) & (visited[:, 0] == cur)
                    # cycle writes only after the map lookup succeeds
                    emit = acc & np.isin(tgt, sources)
                for s in np.unique(tgt[acc]):
                    if int(s) in src_pos:
                        validated[src_pos[int(s)]] = True
                if collect_subgraphs and np.any(emit):
                    sub_parts.append(
                        np.hstack(
                            [visited[emit], cur[emit, None], cur[emit, None]]
                        )
                    )
                break
            # receiver-side enumeration rule for position h
            # (tds_batch_1.hpp:620-639)
            k = int(enum[h])
            if k == h:
                ok &= ~np.any(visited == cur[:, None], axis=1)
            elif k < h:
                ok &= visited[:, k] == cur
            else:
                ok &= False
            cur, tgt, visited = cur[ok], tgt[ok], visited[ok]
            visited2 = np.hstack([visited, cur[:, None]])
            rep, nbr = acsr.expand(cur)
            tgt_r, vis_r = tgt[rep], visited2[rep]
            if h == maxi:
                # penultimate hop (tds_batch_1.hpp:806-846)
                if c.valid_cycle:
                    keep = nbr == tgt_r  # cycle closes on the target; no enum
                    cur, tgt, visited = nbr[keep], tgt_r[keep], vis_r[keep]
                    continue
                keep = nbr != tgt_r
            else:
                keep = np.ones(len(nbr), dtype=bool)
            k2 = int(enum[h + 1])
            if k2 == h + 1:
                keep &= ~np.any(vis_r == nbr[:, None], axis=1)
            elif k2 < h + 1:
                keep &= vis_r[:, k2] == nbr
            else:
                keep &= False
            cur, tgt, visited = nbr[keep], tgt_r[keep], vis_r[keep]

    subgraphs = (
        np.vstack(sub_parts)
        if sub_parts
        else np.empty((0, maxi + 3), dtype=np.int64)
    )
    return NlccOutcome(sources, validated, messages, [], subgraphs, msg_r)


def invalidate_sources(
    tv: np.ndarray, c: NonLocalConstraint, outcome: NlccOutcome
) -> bool:
    """Reset the source template-vertex bit of failed sources, in place
    (run_pattern_matching_beta.cpp:964-1016). Returns token_source_deleted."""
    failed = outcome.sources[~outcome.validated]
    failed = failed[tv[failed] != 0]
    if len(failed) == 0:
        return False
    bit = int(c.indices[-1] if c.selected_vertices else c.indices[0])
    tv[failed] &= np.uint32(~np.uint32(1 << bit))
    return True
