"""Differential A/B of the payload-gather superstep under vertex reordering.

The steady-state (non-init) bucketed superstep's dominant cost is ONE
S-element random HBM gather ``payload_pad[rev]`` (docs/ROOFLINE.md; the
reference's fan-out loop label_propagation_..._nonunique_ee.hpp:552-624).
The gather indices are static, so the only remaining lever inside the
current formulation is LOCALITY: renumber vertices so reverse-edge slots
cluster, then measure the identical program on the permuted operands.

Methodology (CLAUDE.md): isolated-gather micro-benchmarks through the
remote-TPU relay report bogus numbers — this harness times the REAL jitted
superstep program (an 8-step lax.scan, one host round trip), best-of-N,
with the SAME compiled executable for every ordering (bucket shapes are
permutation-invariant: the degree multiset is preserved), so the comparison
is purely operand layout.

Two measurements:

1. ``full_graph`` A/B — uniform labels + a same-label edge template, the
   non-pruning workload: every vertex keeps its bits and every edge stays
   alive, so all S slots run the payload gather in every superstep. This is
   the north-star kernel for deep-diameter / weakly-pruning searches.
   Orderings: natural (R-MAT scramble), bfs (from the max-degree vertex),
   degree (descending-degree clustering).

2. ``production_init`` — the isolated init-superstep program of the actual
   bench configuration (degree labels + tree corpus): the only device work
   left on the production search path (VERDICT r02 asked for this number
   in isolation).

Writes BENCH_GATHER_AB.json. Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/gather_ab_bench.py
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS = 8
REPS = 5


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bfs_order(g) -> np.ndarray:
    """BFS visit order from the max-degree vertex; unreached vertices are
    appended in natural order. Returns old ids in new-id order."""
    visited = np.zeros(g.num_vertices, dtype=bool)
    order = []
    frontier = np.array([int(np.argmax(g.raw_degree))], dtype=np.int64)
    visited[frontier] = True
    while len(frontier):
        order.append(frontier)
        cnt = g.row_ptr[frontier + 1] - g.row_ptr[frontier]
        rep = np.repeat(g.row_ptr[frontier], cnt) + (
            np.arange(int(cnt.sum())) -
            np.repeat(np.cumsum(cnt) - cnt, cnt)
        )
        nxt = np.unique(g.cols[rep])
        nxt = nxt[~visited[nxt]]
        visited[nxt] = True
        frontier = nxt
    rest = np.nonzero(~visited)[0]
    if len(rest):
        order.append(rest)
    return np.concatenate(order)


def degree_order(g) -> np.ndarray:
    return np.argsort(-g.raw_degree, kind="stable")


def permute(g, old_in_new_order):
    """Relabel vertices: old id -> its position in the given order."""
    from fuzzypatternmatching_tpu.graph.csr import from_edges

    v = g.num_vertices
    newid = np.empty(v, dtype=np.int64)
    newid[old_in_new_order] = np.arange(v, dtype=np.int64)
    return from_edges(newid[g.edge_row], newid[g.cols], num_vertices=v)


def uniform_pattern():
    """Same-label edge template: with constant labels NOTHING ever prunes —
    tv stays 0b11 everywhere, every edge stays alive, and each superstep
    runs the payload gather over all S slots."""
    from fuzzypatternmatching_tpu.pattern.pattern_graph import PatternGraph

    return PatternGraph(
        vertex_count=2,
        edge_count=2,
        row_ptr=np.array([0, 1, 2]),
        cols=np.array([1, 0]),
        vertex_data=np.array([7, 7], dtype=np.uint64),
        diameter=2,
    )


def time_call(call, args, reps=REPS):
    import jax

    out = call(*args)
    jax.block_until_ready(out[:4])
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = call(*args)
        jax.block_until_ready(out[:4])
        times.append(time.time() - t0)
    return out, times


def main():
    from fuzzypatternmatching_tpu.utils.jax_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache(os.path.join(REPO, ".bench_cache", "jax_cache"))
    from fuzzypatternmatching_tpu.engine.lcc_bucketed import BucketedLccEngine
    from fuzzypatternmatching_tpu.graph import storage
    from fuzzypatternmatching_tpu.pattern.builtin import load_tree_pattern

    scale = int(os.environ.get("BENCH_SCALE", "21"))
    base = os.path.join(REPO, ".bench_cache", f"rmat_s{scale}")
    if os.path.exists(os.path.join(base, "meta.json")):
        log(f"loading cached graph {base}")
        g, labels, _ = storage.load(base)
    else:
        import bench

        g, labels = bench.build_or_load_graph(scale)
    log(f"V={g.num_vertices} E={g.num_edges}")
    results = {
        "scale": scale,
        "steps_per_call": STEPS,
        "reps": REPS,
        "full_graph": {},
        "production_init": {},
    }

    # ---- part 2 first (cheap): isolated production init superstep --------
    pattern, _ = load_tree_pattern(tempfile.mkdtemp())
    eng_p = BucketedLccEngine(g, labels, pattern)
    consts_p = {
        "owner": eng_p.owner,
        "inv_perm": eng_p._inv_perm,
        "label_tv": eng_p.label_tv,
    }
    s0 = eng_p.init_state()
    t0 = time.time()
    out, init_times = time_call(
        eng_p._get_call(True, 1), (s0.tv, s0.alive, s0.tp_flag, eng_p._dev, consts_p)
    )
    av = int(np.asarray(out[5])[0, 0])  # stats matrix row 0, av col (R=1)
    log(f"[production init] first {time.time()-t0:.1f}s (incl. compile), "
        f"best {min(init_times):.3f}s, av={av}")
    results["production_init"] = {
        "config": "degree labels + tree corpus (the bench path)",
        "best_s": round(min(init_times), 4),
        "times": [round(t, 4) for t in init_times],
        "active_after": av,
    }
    del eng_p, s0, out

    # ---- part 1: full-graph steady-state superstep A/B -------------------
    upat = uniform_pattern()
    ulabels = np.full(g.num_vertices, 7, dtype=np.uint64)
    orders = {"natural": None, "bfs": bfs_order, "degree": degree_order}
    shared = {}
    for name, fn in orders.items():
        t0 = time.time()
        g2 = g if fn is None else permute(g, fn(g))
        log(f"[{name}] graph ready in {time.time()-t0:.0f}s; engine build...")
        t0 = time.time()
        eng = BucketedLccEngine(g2, ulabels, upat)
        log(f"[{name}] engine in {time.time()-t0:.0f}s "
            f"(slots={eng.num_slots}, buckets={len(eng.buckets)})")
        consts = {
            "owner": eng.owner,
            "inv_perm": eng._inv_perm,
            "label_tv": eng.label_tv,
        }
        # shared executables: bucket shapes are permutation-invariant
        if "init" not in shared:
            shared["init"] = eng._get_call(True, 1)
            shared["scan"] = eng._get_call(False, STEPS)
        s0 = eng.init_state()
        out, _ = time_call(
            shared["init"], (s0.tv, s0.alive, s0.tp_flag, eng._dev, consts),
            reps=1,
        )
        tv1, alive1, flag1 = out[0], out[1], out[2]
        av = int(np.asarray(out[5])[0, 0])
        nz = int((g.raw_degree > 0).sum())
        assert av == nz, f"uniform pattern pruned? av={av}, non-isolated={nz}"
        t0 = time.time()
        out_s, scan_times = time_call(
            shared["scan"], (tv1, alive1, flag1, eng._dev, consts)
        )
        msgs = int(np.asarray(out_s[5])[:, 2].sum())
        best = min(scan_times)
        log(f"[{name}] scan({STEPS}): first {time.time()-t0:.1f}s, best "
            f"{best:.3f}s -> {best/STEPS*1e3:.1f} ms/superstep, msgs={msgs}")
        assert msgs == STEPS * g.num_edges, "not a full-graph scan"
        results["full_graph"][name] = {
            "scan_best_s": round(best, 4),
            "ms_per_superstep": round(best / STEPS * 1e3, 2),
            "scan_times": [round(t, 4) for t in scan_times],
            "gathered_slots_per_superstep": eng.num_slots,
        }
        del eng, s0, tv1, alive1, flag1, out, out_s
        if fn is not None:
            del g2

    nat = results["full_graph"]["natural"]["ms_per_superstep"]
    for name, r in results["full_graph"].items():
        r["speedup_vs_natural"] = round(nat / r["ms_per_superstep"], 3)
    with open(os.path.join(REPO, "BENCH_GATHER_AB.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
