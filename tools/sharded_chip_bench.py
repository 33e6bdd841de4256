"""Real-chip measurement of the SHARDED engine at n=1 (VERDICT r02 #8).

bench.py always measures the single-chip bucketed engine; the halo-exchange
mesh plane (parallel/sharded.py) had only virtual-CPU measurements, so its
constant-factor overhead on the actual TPU was unknown and pod-scale
projections rested on extrapolation. This runs the full search (LCC +
NLCC/TDS + enumeration, same s21 tree workload as bench.py) through
``lcc_engine="sharded"`` on a 1-device mesh of the real chip and records
the comparison constant.

Writes BENCH_SHARDED_CHIP.json. Run:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/sharded_chip_bench.py
"""

import datetime
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from fuzzypatternmatching_tpu.utils.jax_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache(os.path.join(REPO, ".bench_cache", "jax_cache"))
    import jax
    from jax.sharding import Mesh

    from fuzzypatternmatching_tpu.engine.driver import MatchEngine
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
    pattern, constraints = load_tree_pattern(tempfile.mkdtemp())
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    log(f"V={g.num_vertices} E={g.num_edges}; device={jax.devices()[0]}")

    out = {
        "metric": f"sharded-engine (n=1 mesh) full search, R-MAT s{scale} "
                  "tree pattern, one real chip",
        "modes": {},
        "note": "full_plane (compact=False) keeps every superstep on the "
                "halo-exchange data plane — its per-call cost vs bench.py "
                "(bucketed engine, same workload) is the halo plane's "
                "single-chip constant factor. compact (default) is the "
                "user-facing mesh end-to-end: first superstep on the mesh, "
                "continuation on the pruned-subgraph sub-engine.",
    }
    # BENCH_MODES=compact (or full_plane) re-measures one mode and merges
    # into the existing JSON — the other mode's relay compile (~44 min for
    # full_plane) is not re-paid when only one data path changed. Each mode
    # carries its own (measured_at, commit) so a carried-over measurement
    # keeps its provenance instead of being re-stamped by the merge.
    want = os.environ.get("BENCH_MODES", "full_plane,compact").split(",")
    try:
        commit = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        commit = "unknown"
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds"
    )
    prev = os.path.join(REPO, "BENCH_SHARDED_CHIP.json")
    if os.path.exists(prev):
        with open(prev) as f:
            out["modes"].update(json.load(f).get("modes", {}))
    for mode, kw in (("full_plane", {"compact": False}), ("compact", {})):
        if mode not in want:
            continue
        t0 = time.time()
        engine = MatchEngine(
            g, labels, pattern, constraints, lcc_engine="sharded",
            mesh=mesh, **kw,
        )
        log(f"[{mode}] engine built in {time.time()-t0:.0f}s; "
            "warm-up (compile)...")
        t0 = time.time()
        r = engine.run()
        log(
            f"[{mode}] warm-up {time.time()-t0:.1f}s: "
            f"iterations={r.iterations} active={len(r.active_vertices)} "
            f"traversed={r.traversed_edges} "
            f"subgraphs={sum(len(v) for v in r.subgraphs.values())}"
        )
        times = []
        for i in range(3):
            t0 = time.time()
            r = engine.run()
            times.append(time.time() - t0)
            log(f"[{mode}] measured run {i}: {times[-1]:.2f}s")
        dt = min(times)
        lp_s = sum(row.seconds for row in r.rows if row.phase == "LP")
        tp_s = sum(row.seconds for row in r.rows if row.phase == "TP")
        out["modes"][mode] = {
            "best_seconds": round(dt, 3),
            "times": [round(t, 3) for t in times],
            "traversed_edges": r.traversed_edges,
            "edges_per_sec": round(r.traversed_edges / dt, 1),
            "lp_seconds": round(lp_s, 3),
            "tp_seconds": round(tp_s, 3),
            "active_vertices": len(r.active_vertices),
            "subgraphs": sum(len(v) for v in r.subgraphs.values()),
            "measured_at": stamp,
            "commit": commit,
        }
        del engine
    with open(os.path.join(REPO, "BENCH_SHARDED_CHIP.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
