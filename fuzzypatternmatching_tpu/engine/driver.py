"""Match driver — the prune-to-fixpoint application loop.

Mirrors run_pattern_matching_beta.cpp:544-1351: LCC call (diameter
supersteps), forced token passing on iteration 0, per-constraint NLCC with
source invalidation, interleaved LCC re-runs after source deletions, global
fixpoint. LCC runs on the accelerator (engine/lcc.py); NLCC frontiers run
either as vectorized host supersteps (engine/nlcc.py) or, when the expansion
is big enough to amortize a program launch, as jitted device programs
(engine/nlcc_device.py); state crosses the boundary once per phase (a
V-sized uint32 + an E-sized bool).
"""

from __future__ import annotations

import time

import numpy as np

from ..graph.csr import Graph
from ..pattern.nonlocal_constraint import NonLocalConstraint
from ..pattern.pattern_graph import PatternGraph
from .lcc import LccEngine
from .lcc_bucketed import BucketedLccEngine
from .nlcc import (
    AliveCsr,
    ForwardedSets,
    FrontierOverflow,
    invalidate_sources,
    run_nem,
    run_tds,
    token_sources,
)
from .nlcc_device import DeviceNlcc
from .result import MatchResult, PhaseRow


class MatchEngine:
    def __init__(
        self,
        graph: Graph,
        labels: np.ndarray,
        pattern: PatternGraph,
        constraints: list[NonLocalConstraint],
        num_ranks: int = 1,
        lcc_engine: str = "bucketed",
        mesh=None,
        source_batch: int = 1 << 16,
        nlcc_mode: str = "auto",
        nlcc_device_min: int = 1 << 19,
        superstep_timing: bool = False,
        counting: bool = False,
        lcc_pallas: bool = False,
        edge_data: np.ndarray | None = None,
        compact: bool = True,
    ):
        self.graph = graph
        self.labels = np.asarray(labels, dtype=np.uint64)
        self.pattern = pattern
        self.constraints = constraints
        self.num_ranks = num_ranks
        self.source_batch = source_batch
        # count of constraints that overflowed the device/mesh NLCC
        # capacity cap and re-ran on the host (observability: the dryrun
        # asserts 0 to prove the distributed path actually executed)
        self.nlcc_fallbacks = 0
        # NLCC placement: "device" forces the jitted frontier programs
        # (engine/nlcc_device.py), "host" forces vectorized numpy, "auto"
        # keeps tiny frontiers on the host (one device program launch costs
        # more than a sub-ms numpy pass) and moves big ones on-device
        self.nlcc_mode = nlcc_mode
        self.nlcc_device_min = nlcc_device_min
        # timing mode: dispatch one superstep per device call and record its
        # real wall time in result_superstep, like the reference's per-step
        # MPI_Wtime brackets (beta.cpp:592-596). Production keeps the fused
        # init+scan call (one host round trip) and divides the call total.
        self.superstep_timing = superstep_timing
        # counting-LCC (neighbor-label count thresholds,
        # counting_ee.hpp): supported by every LCC engine + the oracle
        self.counting = counting
        # edge-metadata-constrained matching: active iff BOTH graph edge
        # metadata (edge_data_db analog) and a pattern _edge_data file are
        # present. Supported by every LCC engine (flat, bucketed, sharded)
        # and the host + mesh NLCC (the reference stores but never enforces
        # these values — beta.cpp:575; enforcement is this framework's
        # opt-in extension).
        self._meta = None
        if edge_data is not None and pattern.edge_data is not None:
            vals, allow = pattern.edge_meta_tables()
            ed = np.asarray(edge_data, dtype=np.int64)
            pos = np.minimum(np.searchsorted(vals, ed), len(vals) - 1)
            code = np.where(vals[pos] == ed, pos, len(vals)).astype(np.int64)
            self._meta = (vals, allow, code)
        em = None if self._meta is None else (self._meta[1], self._meta[2])
        if lcc_engine == "sharded" or mesh is not None:
            from ..parallel.sharded import ShardedLccEngine

            self.lcc = ShardedLccEngine(
                graph, self.labels, pattern, mesh=mesh, num_ranks=num_ranks,
                edge_meta=em, counting=counting,
            )
            # the mesh plane compacts only over a materialized Graph: the
            # closure/sub-engine rebuild needs full edge_row/cols arrays,
            # which a lazily-opened GraphDb lacks
            compact_capable = isinstance(graph, Graph)
        else:
            if not isinstance(graph, Graph):
                raise TypeError(
                    "a lazily-opened GraphDb (storage.open_db) requires "
                    "lcc_engine='sharded'; other engines need storage.load"
                )
            if lcc_engine == "bucketed":
                self.lcc = BucketedLccEngine(
                    graph, self.labels, pattern, num_ranks=num_ranks,
                    use_pallas=lcc_pallas, edge_meta=em, counting=counting,
                )
                compact_capable = True
            else:
                self.lcc = LccEngine(
                    graph, self.labels, pattern, num_ranks=num_ranks,
                    counting=counting, edge_meta=em,
                )
                compact_capable = False  # flat engine has no slot fast path
        # NLCC accelerator engine: on a mesh the token walks run distributed
        # (parallel/nlcc_sharded.py: all_to_all routing + shard-local dedup);
        # single-device runs use the one-chip frontier programs
        if nlcc_mode in ("auto", "device") and graph.num_vertices < (1 << 31):
            if hasattr(self.lcc, "mesh"):
                from ..parallel.nlcc_sharded import ShardedNlcc

                self._dev_nlcc = ShardedNlcc(
                    graph.num_vertices, mesh=self.lcc.mesh,
                    num_ranks=num_ranks,
                )
            else:
                self._dev_nlcc = DeviceNlcc(
                    graph.num_vertices, num_ranks=num_ranks
                )
        else:
            self._dev_nlcc = None
        # compact continuation (run supersteps 1+ on the pruned subgraph) is
        # exact only when every template vertex requires hearing at least
        # one neighbor class; vertices with no alive edges then always die
        self._compact_ok = bool(
            np.all(
                (pattern.edges_bitset != 0)
                | (pattern.min_optional_edge_count > 0)
            )
        )
        # engines whose states support the compact continuation (slot-space
        # fast path + lazy host states), per the construction branch above.
        # ``compact=False`` forces full-graph supersteps on the primary
        # engine every call — used by the multichip dryrun and the halo
        # -plane benchmark to exercise the full mesh data plane.
        self._compact_engine = compact and compact_capable
        # (fp, keys, union, u_rows_uniq, alive_sub_eids, sub, sub_cpu):
        # the full compact-closure derivation keyed on the exact alive set
        self._sub_cache: tuple | None = None
        # per-constraint token-source label candidates (labels never
        # change): token_sources then filters this list by tv bits instead
        # of re-scanning the V-sized label array on every call
        self._cands = [
            np.nonzero(self.labels == c.labels[0])[0].astype(np.int64)
            for c in constraints
        ]

    def _edge_index(self, v: int, u: int) -> int:
        """Edge slot of (v, u): binary search within v's sorted CSR row
        (no E-sized key array; works for lazy GraphDb graphs too)."""
        lo, hi = int(self.graph.row_ptr[v]), int(self.graph.row_ptr[v + 1])
        row_cols = self.graph.cols_range(lo, hi)
        i = int(np.searchsorted(row_cols, u))
        if i < hi - lo and row_cols[i] == u:
            return lo + i
        return -1

    def _lcc_phase(
        self, state, global_init: bool, itr: int, result: MatchResult,
        allow_compact: bool = True, tp_mark_eids=None,
    ):
        """One LCC call. ``tp_mark_eids`` (original CSR edge ids carrying
        token-passing success marks) lets the compact continuation run even
        across pending TP marks: the flags are translated into the pruned
        subgraph's slot space instead of forcing diameter full-graph
        supersteps (each with an S-element random gather)."""
        if self.superstep_timing:
            # one device call per superstep, each timed for real
            rows_t, dts = [], []
            died_any = False
            first = global_init
            for _ in range(self.pattern.diameter):
                t0 = time.perf_counter()
                state, r1, d1 = self.lcc.lcc_call(state, first, n_steps=1)
                dts.append(time.perf_counter() - t0)
                rows_t += r1
                died_any = died_any or d1
                first = False
            for s, (row, dt) in enumerate(zip(rows_t, dts)):
                av, ae, msgs, per_rank = row
                result.rows.append(
                    PhaseRow(itr, "LP", s, av, ae, msgs, dt, per_rank)
                )
                result.traversed_edges += msgs
            return state, died_any

        compactable = (
            allow_compact and self._compact_ok and self._compact_engine
        )
        if not compactable:
            t0 = time.perf_counter()
            state, rows, died = self.lcc.lcc_call(state, global_init)
            dt = (time.perf_counter() - t0) / max(len(rows), 1)
            self._emit_lp_rows_fresh(rows, dt, itr, result)
            return state, died

        # compact continuation: the init/first superstep runs on the full
        # graph; the surviving edge set is typically a tiny fraction of E,
        # so the remaining supersteps run on an engine rebuilt over the
        # pruned subgraph — identical dynamics (see _compact_ok), a fraction
        # of the cost.
        from ..graph.csr import from_edges

        t0 = time.perf_counter()
        died_any = False
        rows_all = []
        diameter = self.pattern.diameter
        steps_left = diameter
        if global_init:
            state, r1, d1 = self.lcc.lcc_call(state, True, n_steps=1)
            rows_all += r1
            died_any = died_any or d1
            steps_left -= 1
        if steps_left > 0:
            tv = self.lcc.tv_host(state)
            arow, acol = self.lcc.alive_pairs(state)
            if len(arow) == 0 or len(arow) > self.graph.num_edges // 4:
                state, r2, d2 = self.lcc.lcc_call(
                    state, False, n_steps=steps_left
                )
                rows_all += r2
                died_any = died_any or d2
            else:
                # the subgraph is the SYMMETRIC CLOSURE of the alive set: a
                # live sender edge (u,v) delivers into receiver slot (v,u)
                # even when that slot itself is dead (its message still
                # feeds tn; nonunique_ee.hpp:790-814), so dead-but-reachable
                # slots must exist with alive=False
                vv = np.uint64(self.graph.num_vertices)
                keys = arow.astype(np.uint64) * vv + acol.astype(np.uint64)
                # cache keyed on the EXACT alive set (cheap fingerprint
                # pre-filter, then full equality — ~ms): repeated searches
                # and iterations with an unchanged pruned set skip the
                # union1d/searchsorted closure work entirely, not just the
                # engine rebuild
                fp = (len(keys), int(keys[0]), int(keys[-1]))
                cache = self._sub_cache
                if (
                    cache is not None
                    and cache[0] == fp
                    and np.array_equal(keys, cache[1])
                ):
                    _, _, union, u_rows_uniq, alive_sub_eids, sub, sub_cpu = (
                        cache
                    )
                else:
                    rkeys = acol.astype(np.uint64) * vv + arow.astype(
                        np.uint64
                    )
                    union = np.union1d(keys, rkeys)
                    u_row = (union // vv).astype(np.int64)
                    u_col = (union % vv).astype(np.int64)
                    sub_cpu = len(union) <= self.SUB_CPU_MAX_EDGES
                    sub_meta = None
                    if self._meta is not None:
                        # metadata codes for the subgraph's edges: union is
                        # in CSR key order, so from_edges preserves it —
                        # sub edge e corresponds to union[e]
                        ek = self._edge_keys_cached()
                        sub_meta = (
                            self._meta[1],
                            self._meta[2][np.searchsorted(ek, union)],
                        )
                    with self._sub_device_ctx(sub_cpu):
                        gsub = from_edges(
                            u_row, u_col, num_vertices=self.graph.num_vertices
                        )
                        sub = BucketedLccEngine(
                            gsub, self.labels, self.pattern,
                            num_ranks=self.num_ranks, edge_meta=sub_meta,
                            counting=self.counting,
                        )
                    # per-slot aliveness = membership in the original set
                    pos = np.searchsorted(keys, union)
                    pos_c = np.minimum(pos, len(keys) - 1)
                    alive_sub_eids = np.nonzero(keys[pos_c] == union)[0]
                    u_rows_uniq = np.unique(u_row)
                    self._sub_cache = (
                        fp, keys, union, u_rows_uniq, alive_sub_eids, sub,
                        sub_cpu,
                    )
                flag_ids = None
                if tp_mark_eids:
                    # TP success marks, translated into the subgraph's edge
                    # ids. Marks on dead slots are no-ops in the full engine
                    # (own_alive gates the flag), so only union hits carry.
                    mk = self._edge_keys_cached()[
                        np.asarray(tp_mark_eids, dtype=np.int64)
                    ]
                    mp = np.searchsorted(union, mk)
                    mp_c = np.minimum(mp, len(union) - 1)
                    flag_ids = mp_c[union[mp_c] == mk]
                with self._sub_device_ctx(sub_cpu):
                    sub_state = sub.state_from_edge_ids(
                        tv, alive_sub_eids, flag_ids=flag_ids
                    )
                    sub_state, r2, d2 = sub.lcc_call(
                        sub_state, False, n_steps=steps_left
                    )
                rows_all += r2
                died_any = died_any or d2
                # a live vertex with no alive incident edge is outside the
                # union closure: the sub engine never sees it, but the full
                # engine would kill it in this call's first superstep and
                # raise the died flag — account for it here
                live_v = np.nonzero(tv)[0]
                if len(live_v) and not np.isin(live_v, u_rows_uniq).all():
                    died_any = True
                with self._sub_device_ctx(sub_cpu):
                    tv2 = sub.tv_host(sub_state)
                    a2r, a2c = sub.alive_pairs(sub_state)
                state = self._state_from_pairs(tv2, a2r, a2c)
        dt = (time.perf_counter() - t0) / max(len(rows_all), 1)
        self._emit_lp_rows_fresh(rows_all, dt, itr, result)
        return state, died_any

    def _emit_lp_rows_fresh(self, rows, dt, itr, result):
        for s, (av, ae, msgs, per_rank) in enumerate(rows):
            result.rows.append(
                PhaseRow(itr, "LP", s, av, ae, msgs, dt, per_rank)
            )
            result.traversed_edges += msgs

    def _nlcc_on_device(
        self, acsr: AliveCsr, c: NonLocalConstraint, tv: np.ndarray,
        candidates: np.ndarray | None = None,
    ) -> bool:
        """Place one constraint run. A jitted frontier program pays a fixed
        dispatch (and one-time compile) cost, so "auto" moves a constraint
        on-device only when the first token expansion is big enough to
        amortize it; tiny tree-corpus frontiers stay on the host."""
        if self._dev_nlcc is None or self.nlcc_mode == "host":
            return False
        if self._meta is not None and not hasattr(self._dev_nlcc, "mesh"):
            # metadata hop filters run in the host engine or on the mesh
            # (ShardedNlcc); the single-chip DeviceNlcc has no meta path
            return False
        if self.nlcc_mode == "device":
            return True
        sources = token_sources(c, self.labels, tv, candidates)
        work = self._dev_nlcc._first_expansion(acsr, sources)
        return work >= self.nlcc_device_min

    def _dev_or_host(
        self, is_tds, pl, acsr, tv, c, forwarded, hopc, candidates=None
    ):
        """One constraint on the device NLCC engine, with the host engine as
        the bounded-growth fallback: a frontier that overflows past the
        capped capacity doublings (each a fresh multi-minute XLA compile)
        reruns on the host — exact same results, no compile stall. The
        forwarded set is snapshotted so a partial device run never leaks
        dedup keys into the host rerun."""
        kw = {"forwarded": forwarded, "hopc": hopc,
              "candidates": candidates}
        if hasattr(self._dev_nlcc, "mesh"):
            kw["source_batch"] = self.source_batch
        fn = self._dev_nlcc.run_tds if is_tds else self._dev_nlcc.run_nem
        snapshot = forwarded.keys.copy()
        try:
            return fn(
                acsr, self.labels, tv, c, self.graph.num_vertices, **kw
            )
        except FrontierOverflow as exc:
            print(
                f"NLCC constraint [{pl}]: {exc}; falling back to the host "
                "engine"
            )
            self.nlcc_fallbacks += 1
            forwarded.keys = snapshot
            host_fn = run_tds if is_tds else run_nem
            hkw = {"forwarded": forwarded, "hopc": hopc,
                   "num_ranks": self.num_ranks, "candidates": candidates}
            if is_tds:
                hkw["source_batch"] = self.source_batch
            return host_fn(
                acsr, self.labels, tv, c, self.graph.num_vertices, **hkw
            )

    def _owner_cached(self) -> np.ndarray:
        """Cyclic output-rank owner per vertex (id % R) — built once."""
        if getattr(self, "_owner", None) is None:
            self._owner = (
                np.arange(self.graph.num_vertices, dtype=np.int64)
                % self.num_ranks
            )
        return self._owner

    def _edge_keys_cached(self) -> np.ndarray:
        """Sorted (row*V + col) keys — built lazily, only on the compact
        path (bucketed or mesh engine; _compact_engine guarantees a
        materialized Graph with full edge_row/cols arrays)."""
        if getattr(self, "_edge_keys", None) is None:
            self._edge_keys = self.graph.edge_row.astype(np.uint64) * np.uint64(
                self.graph.num_vertices
            ) + self.graph.cols.astype(np.uint64)
        return self._edge_keys

    def _state_from_pairs(self, tv, arow, acol):
        """Full-engine state with the alive set given as (row, col) pairs —
        LAZY for the bucketed engine: once compact, the per-iteration state
        is pure host data and no device upload happens at all."""
        edge_keys = self._edge_keys_cached()
        keys = arow.astype(np.uint64) * np.uint64(self.graph.num_vertices) + acol.astype(np.uint64)
        pos = np.searchsorted(edge_keys, keys)
        eids = pos[edge_keys[np.minimum(pos, len(edge_keys) - 1)] == keys]
        if self._compact_engine:
            return self.lcc.state_from_edge_ids(tv, eids, lazy=True)
        return self.lcc.state_from_edge_ids(tv, eids)

    # compact subgraphs below this many (symmetric-closure) edges run their
    # supersteps on the LOCAL CPU backend: a tiny jit program's wall time is
    # all dispatch, and on a remote-attached TPU each dispatch is a ~0.5-1 s
    # tunnel round trip (docs/ROOFLINE.md) — the host does the same work in
    # microseconds
    SUB_CPU_MAX_EDGES = 1 << 22

    @staticmethod
    def _sub_device_ctx(use_cpu: bool):
        import contextlib

        if not use_cpu:
            return contextlib.nullcontext()
        import jax

        try:
            return jax.default_device(jax.devices("cpu")[0])
        except Exception:
            return contextlib.nullcontext()

    def run(self, max_iterations: int = 100) -> MatchResult:
        t_start = time.perf_counter()
        result = MatchResult()
        result.pattern_found = [False] * len(self.constraints)
        g = self.graph
        state = self.lcc.init_state()
        forwarded = ForwardedSets.empty()  # persists across constraints
        global_init = True
        pending_marks: list = []  # TP success marks awaiting the next LCC call
        itr = 0
        while True:
            state, not_finished = self._lcc_phase(
                state, global_init, itr, result,
                tp_mark_eids=pending_marks or None,
            )
            pending_marks = []
            global_init = False
            if itr == 0:
                not_finished = True  # forced token passing (beta.cpp:691-696)
            if not_finished:
                not_finished = False
                # slot-space fast path: only the (small) alive edge set
                # crosses the device boundary, never E-sized arrays
                fast = hasattr(self.lcc, "alive_pairs")
                if fast:
                    tv = self.lcc.tv_host(state).copy()
                    arow, acol = self.lcc.alive_pairs(state)
                    alive = None
                else:
                    tv, alive = self.lcc.state_to_global(state)
                    tv = tv.copy()
                    alive = alive.copy()
                tp_marks: list = []
                tp_flag = None if fast else np.zeros(g.num_edges, dtype=bool)
                # the pruned adjacency changes only via LCC; reuse it across
                # constraints (deactivated vertices are filtered by the
                # arrival checks, matching the reference's unreclaimed maps)
                acsr = None
                for pl, c in enumerate(self.constraints):
                    t0 = time.perf_counter()
                    if acsr is None:
                        if fast:
                            pair_meta = None
                            if self._meta is not None:
                                if hasattr(self.lcc, "alive_edge_ids"):
                                    # sharded engine: flat edge ids are the
                                    # pair order (works for mmap GraphDb too)
                                    pair_meta = self._meta[2][
                                        self.lcc.alive_edge_ids(state)
                                    ]
                                else:
                                    ek = self._edge_keys_cached()
                                    keys = arow.astype(np.uint64) * np.uint64(
                                        g.num_vertices
                                    ) + acol.astype(np.uint64)
                                    pair_meta = self._meta[2][
                                        np.searchsorted(ek, keys)
                                    ]
                            acsr = AliveCsr.from_pairs(
                                arow, acol, tv != 0, g.num_vertices,
                                meta=pair_meta,
                            )
                        else:
                            acsr = AliveCsr.build(
                                g, alive, tv != 0,
                                meta=None
                                if self._meta is None
                                else self._meta[2],
                            )
                    hopc = (
                        np.searchsorted(
                            self._meta[0],
                            self.pattern.hop_edge_values(c.indices),
                        )
                        if self._meta is not None
                        else None
                    )
                    cand = self._cands[pl]
                    use_dev = self._nlcc_on_device(acsr, c, tv, cand)
                    # driver-level forwarded-set clearing runs before EVERY
                    # constraint: non-selected runs wipe the sets, selected
                    # ones keep only active final-label vertices
                    # (beta.cpp:791-852)
                    forwarded.reset_for(c, self.labels, tv, g.num_vertices)
                    if c.is_tds:
                        if use_dev:
                            out = self._dev_or_host(
                                True, pl, acsr, tv, c, forwarded, hopc,
                                cand,
                            )
                        else:
                            out = run_tds(
                                acsr, self.labels, tv, c, g.num_vertices,
                                source_batch=self.source_batch,
                                num_ranks=self.num_ranks,
                                forwarded=forwarded, hopc=hopc,
                                candidates=cand,
                            )
                        if out.subgraphs is not None and len(out.subgraphs):
                            result.subgraphs.setdefault(pl, []).extend(
                                map(tuple, out.subgraphs.tolist())
                            )
                        else:
                            result.subgraphs.setdefault(pl, [])
                    else:
                        if use_dev:
                            out = self._dev_or_host(
                                False, pl, acsr, tv, c, forwarded, hopc,
                                cand,
                            )
                        else:
                            out = run_nem(
                                acsr, self.labels, tv, c, g.num_vertices,
                                num_ranks=self.num_ranks, forwarded=forwarded,
                                hopc=hopc, candidates=cand,
                            )
                    if bool(out.validated.any()):
                        result.pattern_found[pl] = True
                    for v, p in out.edge_marks:
                        e = self._edge_index(v, p)
                        if e >= 0:
                            if fast:
                                tp_marks.append(e)
                            else:
                                tp_flag[e] = True
                    deleted = invalidate_sources(tv, c, out)
                    if deleted:
                        not_finished = True
                    live = tv != 0
                    av = int(live.sum())
                    if fast:
                        live_rows = live[arow]
                        ae = int(live_rows.sum())
                        ae_rows = arow[live_rows]
                    else:
                        ae_mask = alive & live[g.edge_row]
                        ae = int(ae_mask.sum())
                        ae_rows = g.edge_row[np.nonzero(ae_mask)[0]]
                    owner = self._owner_cached()
                    per_rank = {
                        "av": np.bincount(
                            owner[live], minlength=self.num_ranks
                        ),
                        "ae": np.bincount(
                            owner[ae_rows], minlength=self.num_ranks,
                        ),
                        "msg": out.msg_per_rank
                        if out.msg_per_rank is not None
                        else np.zeros(self.num_ranks, dtype=np.int64),
                    }
                    result.rows.append(
                        PhaseRow(
                            itr, "TP", pl, av, ae, out.messages,
                            time.perf_counter() - t0, per_rank,
                        )
                    )
                    result.traversed_edges += out.messages
                    if deleted and c.interleave_lcc:
                        if fast:
                            state = self.lcc.with_updates(state, tv, tp_marks)
                        else:
                            state = self.lcc.state_from_global(tv, alive, tp_flag)
                        # tp success marks are carried into the compact
                        # subgraph's slot space (tp_mark_eids), so the
                        # continuation stays on the pruned graph
                        state, died = self._lcc_phase(
                            state, False, itr, result,
                            tp_mark_eids=tp_marks if fast else None,
                        )
                        if died:
                            not_finished = True
                        if fast:
                            tv = self.lcc.tv_host(state).copy()
                            arow, acol = self.lcc.alive_pairs(state)
                            tp_marks = []
                        else:
                            tv, alive = self.lcc.state_to_global(state)
                            tv = tv.copy()
                            alive = alive.copy()
                            tp_flag = np.zeros(g.num_edges, dtype=bool)
                        acsr = None  # pruned adjacency changed
                if fast:
                    state = self.lcc.with_updates(state, tv, tp_marks)
                    pending_marks = list(tp_marks)
                else:
                    state = self.lcc.state_from_global(tv, alive, tp_flag)
                    pending_marks = []  # non-fast engines never compact
            itr += 1
            if not not_finished:
                break
            if itr >= max_iterations:
                # the reference loops to fixpoint unconditionally
                # (beta.cpp:1351); a truncated search is NOT a fixpoint and
                # its result is not comparable — fail loudly, never silently
                import warnings

                result.truncated = True
                warnings.warn(
                    f"search truncated at max_iterations={max_iterations} "
                    "before reaching the LCC/NLCC fixpoint; the returned "
                    "active sets are an over-approximation "
                    "(MatchResult.truncated=True)",
                    RuntimeWarning,
                    stacklevel=2,
                )
                break

        result.iterations = itr
        if hasattr(self.lcc, "alive_pairs"):
            tv = self.lcc.tv_host(state)
            arow, acol = self.lcc.alive_pairs(state)
            live = tv != 0
            keep = live[arow]
            result.active_edges = {
                (int(r), int(c)) for r, c in zip(arow[keep], acol[keep])
            }
        else:
            tv, alive = self.lcc.state_to_global(state)
            live = tv != 0
            e_idx = np.nonzero(alive & live[g.edge_row])[0]
            result.active_edges = {
                (int(g.edge_row[e]), int(g.cols[e])) for e in e_idx
            }
        live_idx = np.nonzero(tv)[0]
        result.active_vertices = {int(v): int(tv[v]) for v in live_idx}
        result.total_seconds = time.perf_counter() - t_start
        return result
