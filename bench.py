"""Benchmark: traversed edges/sec/chip on the reference workload.

Workload (BASELINE.md): R-MAT scale-21 (scrambled, undirected, 4-rank
stream), degree labels, the rmat_log2_tree pattern corpus — the full
LCC+NLCC prune-to-fixpoint search including TDS enumeration.

Metric: total traversed edges (LCC messages + NLCC token hops) divided by
end-to-end search seconds, on one chip. The reference publishes no numbers
(BASELINE.md) and its MPI build is unavailable in this image, so
``vs_baseline`` is the speedup over the first recorded run of this bench
(committed in BENCH_BASELINE.json) — a self-referential baseline until a
true 4-rank MPI measurement exists.

Prints exactly one JSON line.

Env knobs: BENCH_SCALE (default 21), BENCH_FRESH=1 to ignore the graph cache.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CACHE = os.path.join(REPO, ".bench_cache")
BASELINE_FILE = os.path.join(REPO, "BENCH_BASELINE.json")

# persistent XLA compilation cache: the s21 programs take minutes to compile
# through the remote relay; cache them across bench invocations
try:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(CACHE, "jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_or_load_graph(scale: int):
    from fuzzypatternmatching_tpu.graph import storage
    from fuzzypatternmatching_tpu.graph.csr import degree_labels, from_edges
    from fuzzypatternmatching_tpu.generators.rmat import rmat_all_ranks

    base = os.path.join(CACHE, f"rmat_s{scale}")
    if os.path.exists(os.path.join(base, "meta.json")) and not os.environ.get(
        "BENCH_FRESH"
    ):
        log(f"loading cached graph {base}")
        g, labels, _ = storage.load(base)
        return g, labels
    t0 = time.time()
    log(f"generating R-MAT s{scale} (4-rank stream, scrambled)...")
    src, dst = rmat_all_ranks(scale=scale, n_ranks=4)
    log(f"  {src.size} directed entries in {time.time()-t0:.0f}s")
    t0 = time.time()
    g = from_edges(src, dst, num_vertices=1 << scale)
    labels = degree_labels(g)
    log(
        f"  CSR: V={g.num_vertices} E={g.num_edges} "
        f"max_deg={int(g.raw_degree.max())} in {time.time()-t0:.0f}s"
    )
    storage.save(g, base, num_shards=4, labels=labels)
    return g, labels


# Pinned conformance anchors per (scale, tree-corpus) workload. These are
# the oracle-verified fixpoints (CLAUDE.md "Search results" note; golden
# trees in examples/results_golden/). A bench run whose warm-up search
# diverges from them is a SEMANTIC regression, not a perf datum — fail
# loudly instead of emitting a plausible-looking JSON line (round-4
# verdict item 5). Keys absent for a scale mean "not yet pinned"; pin
# new scales as they are first measured + cross-checked.
ANCHORS = {
    21: {
        "active_vertices": 147,
        "active_edges": 262,
        "subgraphs": 74,
        "traversed_edges": 13207467,
    },
    22: {
        "active_vertices": 412,
        "active_edges": 744,
        "subgraphs": 296,
        "traversed_edges": 30730528,
    },
    23: {
        "active_vertices": 7,
        "active_edges": 12,
        "subgraphs": 1,
        "traversed_edges": 27971377,
    },
}


def check_anchors(scale, r):
    anchors = ANCHORS.get(scale)
    if anchors is None:
        log(f"  (no pinned anchors for s{scale}; skipping conformance check)")
        return
    got = {
        "active_vertices": len(r.active_vertices),
        "active_edges": len(r.active_edges),
        "subgraphs": sum(len(v) for v in r.subgraphs.values()),
        "traversed_edges": r.traversed_edges,
    }
    bad = {k: (got[k], v) for k, v in anchors.items() if got[k] != v}
    if bad:
        log(f"ANCHOR MISMATCH at s{scale}: {bad} (got, expected)")
        log("refusing to emit a bench number for a semantically wrong search")
        sys.exit(1)
    log(f"  anchors OK: {anchors}")


def main():
    scale = int(os.environ.get("BENCH_SCALE", "21"))
    g, labels = build_or_load_graph(scale)

    from fuzzypatternmatching_tpu.engine.driver import MatchEngine
    from fuzzypatternmatching_tpu.pattern.builtin import load_tree_pattern

    pattern, constraints = load_tree_pattern(tempfile.mkdtemp())
    engine = MatchEngine(g, labels, pattern, constraints)

    log("warm-up run (compile)...")
    t0 = time.time()
    r = engine.run()
    log(
        f"  warm-up: {time.time()-t0:.1f}s, iterations={r.iterations}, "
        f"traversed={r.traversed_edges}, active={len(r.active_vertices)}, "
        f"subgraphs={sum(len(v) for v in r.subgraphs.values())}"
    )
    check_anchors(scale, r)
    # three measured runs, best taken: single measurements on this box are
    # sensitive to transient host-CPU / relay-tunnel contention (observed
    # 3x spread between contended and clean runs of identical code)
    times = []
    for i in range(3):
        t0 = time.time()
        r = engine.run()
        times.append(time.time() - t0)
        log(f"  measured run {i}: {times[-1]:.2f}s")
    dt = min(times)
    edges_per_sec = r.traversed_edges / dt
    log(
        f"  best of {len(times)}: {dt:.2f}s, traversed={r.traversed_edges}, "
        f"{edges_per_sec/1e6:.1f}M edges/s/chip"
    )

    vs_baseline = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        if base.get("scale") == scale and base.get("edges_per_sec", 0) > 0:
            vs_baseline = edges_per_sec / base["edges_per_sec"]
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "scale": scale,
                    "edges_per_sec": edges_per_sec,
                    "note": "first recorded run (round 1); vs_baseline is "
                    "relative to this until a true MPI baseline exists",
                },
                f,
                indent=1,
            )

    # Roofline-relative yardstick (docs/ROOFLINE.md): the production
    # search's device floor is the measured init-superstep compute plus
    # one V-bit download; quote what fraction of the measured wall that
    # floor is. The legacy ratio is the repo's own round-1 run
    # (BENCH_BASELINE.json) — the reference publishes no numbers and its
    # MPI build is unavailable here (BASELINE.md) — label it as such.
    # The floor is the measured production init-superstep compute at this
    # scale, read from BENCH_INIT_DECOMPOSE.json's "production_floor"
    # section (written by tools/init_decompose.py, stamped with the
    # measurement commit) so it cannot silently go stale (advisor round-4
    # low finding). Fallback: the round-4 hand-measured 48 ms at s21.
    floor_s, floor_note = None, None
    decomp_file = os.path.join(REPO, "BENCH_INIT_DECOMPOSE.json")
    if os.path.exists(decomp_file):
        try:
            with open(decomp_file) as f:
                decomp = json.load(f)
            pf = decomp.get("production_floor", {}).get(str(scale))
            if pf:
                floor_s = pf["best_ms"] / 1e3
                floor_note = f"measured at commit {pf.get('commit', '?')}"
        except Exception:
            pass
    if floor_s is None and scale == 21:
        floor_s = 0.048
        floor_note = "round-4 hand measurement (commit 3584c14)"
    extra = {}
    if floor_s is not None:
        extra = {
            "roofline_floor_seconds": floor_s,
            "roofline_floor_note": floor_note,
            "floor_fraction": round(floor_s / dt, 3),
        }
    print(
        json.dumps(
            {
                "metric": f"traversed edges/sec/chip (LCC+NLCC, R-MAT s{scale} tree pattern)",
                "value": round(edges_per_sec, 1),
                "unit": "edges/s",
                "vs_baseline": round(vs_baseline, 3),
                "vs_baseline_note": "vs round-1 self-baseline "
                "(BENCH_BASELINE.json); no reference MPI baseline exists "
                "in this image — see docs/ROOFLINE.md for the absolute "
                "yardstick",
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
