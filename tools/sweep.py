"""Benchmark sweep automation (VERDICT r03 #7) — the run_tests.py analog.

The reference ships cluster sweep scripts that generate run matrices and
merge their outputs (reference: scripts/quartz.llnl.gov/run_tests.py:1-50,
process_run_data.py). This is the local equivalent: one driver that runs
{scale} x {engine} x {plane mode} x {constraint mode} on the current
hardware, captures every cell into ONE merged JSON matrix
(SWEEP.json by default), and stamps each cell with its own
(measured_at, commit) provenance so re-running a subset never re-labels
stale cells — the failure mode VERDICT r03 #1 flagged for the hand-run
per-mode tools.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep.py \
      [--scales 13,17] [--engines bucketed,sharded] \
      [--modes default,counting,meta,full_plane] [--runs 3] [--out SWEEP.json]

Modes:
  default    — the production path (compact continuation).
  full_plane — sharded engine with compact=False (every superstep on the
               mesh data plane); skipped for non-sharded engines.
  counting   — counting-LCC enabled (--counting analog).
  meta       — edge-metadata-constrained matching (synthesized metadata:
               every edge carries the value required by the tree corpus's
               matching pattern edge, so the anchors are unchanged).

Each cell records best/all wall times over --runs, traversed edges,
edges/s, and the conformance anchors (active vertices/edges, subgraphs).
Anchors are cross-checked against the first cell of the same
(scale, constraint-mode) so a silent divergence between engines fails the
sweep loudly.
"""

import argparse
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


def _commit():
    try:
        return subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        return "unknown"


def _tree_edge_meta(graph, pattern):
    """Edge metadata under which the tree-corpus search is unchanged: the
    corpus requires the single value 55 on every pattern edge
    (pattern_edge_data), so a graph whose edges all carry 55 prunes
    identically to no-metadata mode — the anchors stay valid while the
    full metadata machinery (per-slot codes, per-bit tn planes) runs."""
    if pattern.edge_data is None:
        return None
    vals = np.unique(np.asarray(pattern.edge_data))
    if len(vals) != 1:
        return None
    return np.full(graph.num_edges, int(vals[0]), dtype=np.int64)


def run_cell(scale, engine, mode, runs, mesh=None):
    import bench  # noqa: E402  (repo-root module)
    from fuzzypatternmatching_tpu.engine.driver import MatchEngine
    from fuzzypatternmatching_tpu.pattern.builtin import load_tree_pattern

    g, labels = bench.build_or_load_graph(scale)
    pattern, constraints = load_tree_pattern(tempfile.mkdtemp())
    kw = {}
    if engine == "sharded":
        from jax.sharding import Mesh
        import jax

        kw["mesh"] = mesh or Mesh(np.array(jax.devices()[:1]), ("x",))
    if mode == "full_plane":
        if engine != "sharded":
            return None
        kw["compact"] = False
    if mode == "counting":
        kw["counting"] = True
    if mode == "meta":
        ed = _tree_edge_meta(g, pattern)
        if ed is None:
            log(f"  [skip] {engine}/{mode}: corpus has no pattern edge data")
            return None
        kw["edge_data"] = ed
    eng = MatchEngine(g, labels, pattern, constraints, lcc_engine=engine, **kw)
    log(f"  warm-up (compile) scale={scale} engine={engine} mode={mode}...")
    t0 = time.time()
    r = eng.run()
    warmup = time.time() - t0
    times = []
    for i in range(runs):
        t0 = time.time()
        r = eng.run()
        times.append(time.time() - t0)
        log(f"    run {i}: {times[-1]:.2f}s")
    dt = min(times)
    return {
        "seconds_best": round(dt, 3),
        "seconds_all": [round(t, 3) for t in times],
        "warmup_seconds": round(warmup, 1),
        "traversed_edges": r.traversed_edges,
        "edges_per_sec": round(r.traversed_edges / dt, 1),
        "iterations": r.iterations,
        "active_vertices": len(r.active_vertices),
        "active_edges": len(r.active_edges),
        "subgraphs": sum(len(v) for v in r.subgraphs.values()),
    }


def main():
    ap = argparse.ArgumentParser(description="benchmark sweep")
    ap.add_argument("--scales", default="21")
    ap.add_argument("--engines", default="bucketed,sharded")
    ap.add_argument("--modes", default="default,full_plane")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "SWEEP.json"))
    args = ap.parse_args()

    out = {"matrix": {}}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out["matrix"].update(json.load(f).get("matrix", {}))
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds"
    )
    commit = _commit()

    anchors = {}
    for cell in out["matrix"].values():
        key = (cell["scale"], cell["mode"] in ("counting", "meta"))
        anchors.setdefault(key, cell["active_vertices"])

    for scale in [int(s) for s in args.scales.split(",")]:
        for engine in args.engines.split(","):
            for mode in args.modes.split(","):
                name = f"s{scale}/{engine}/{mode}"
                log(f"[{name}]")
                try:
                    cell = run_cell(scale, engine, mode, args.runs)
                except Exception as e:  # keep sweeping, record the failure
                    log(f"  FAILED: {type(e).__name__}: {e}")
                    cell = {"error": f"{type(e).__name__}: {e}"}
                if cell is None:
                    continue
                cell.update(
                    scale=scale, engine=engine, mode=mode,
                    measured_at=stamp, commit=commit,
                )
                if "active_vertices" in cell:
                    key = (scale, mode in ("counting", "meta"))
                    want = anchors.setdefault(key, cell["active_vertices"])
                    if cell["active_vertices"] != want:
                        raise AssertionError(
                            f"{name}: anchor divergence — active="
                            f"{cell['active_vertices']}, expected {want}"
                        )
                out["matrix"][name] = cell
                with open(args.out, "w") as f:
                    json.dump(out, f, indent=1)
                log(f"  -> {cell.get('seconds_best')}s "
                    f"({cell.get('edges_per_sec', 0)} edges/s)")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    from fuzzypatternmatching_tpu.utils.jax_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache(os.path.join(REPO, ".bench_cache", "jax_cache"))
    main()
