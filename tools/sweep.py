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


# Pinned conformance anchors per (scale, corpus). Sources: the oracle-run
# golden trees (examples/results_golden/golden_meta.json, tools/
# make_golden.py) for s11/s13, and the chip-validated bench anchors
# (bench.ANCHORS, CLAUDE.md) for s21. A sweep cell at a pinned key that
# diverges fails LOUDLY — the first cell of a new run can no longer
# self-seed a wrong fixpoint (round-4 verdict item 5). "traversed" is
# pinned where known; it is mode-independent on these workloads (counting
# and meta prune identically by construction, see _tree_edge_meta).
PINNED_ANCHORS = {
    # s11/s13 verified against the golden trees on the sweep's scrambled
    # stream (active counts are isomorphism-invariant; traversed counts
    # measured on the scrambled stream, round 5)
    (11, "tree"): {
        "active_vertices": 0, "active_edges": 0, "subgraphs": 0,
        "traversed_edges": 25734,
    },
    (13, "tree"): {
        "active_vertices": 12, "active_edges": 22, "subgraphs": 6,
        "traversed_edges": 94524,
    },
    (13, "cycle"): {
        "active_vertices": 254, "active_edges": 5500, "subgraphs": 109,
        "traversed_edges": 1037191,
    },
    (17, "cycle"): {  # empty fixpoint (degree-label mix shifts with scale)
        "active_vertices": 0, "active_edges": 0, "subgraphs": 0,
        "traversed_edges": 282425,
    },
    # s19/s21 cycle: measured round 5 with the oracle-contract-validated
    # engine on CPU (2-iteration fixpoints); chip sweep cells must agree
    (19, "cycle"): {
        "active_vertices": 54, "active_edges": 122, "subgraphs": 18,
        "traversed_edges": 4170009,
    },
    (21, "cycle"): {
        "active_vertices": 169, "active_edges": 346, "subgraphs": 56,
        "traversed_edges": 105906296,
    },
    (21, "tree"): {
        "active_vertices": 147, "active_edges": 262, "subgraphs": 74,
        "traversed_edges": 13207467,
    },
    (22, "tree"): {  # chip-measured round 5 (post recon-threshold fix)
        "active_vertices": 412, "active_edges": 744, "subgraphs": 296,
        "traversed_edges": 30730528,
    },
    (23, "tree"): {  # chip-measured round 5
        "active_vertices": 7, "active_edges": 12, "subgraphs": 1,
        "traversed_edges": 27971377,
    },
    # new (scale, corpus) keys: pin by running the oracle (or the already
    # cross-validated bucketed engine) once and committing the counts here
}


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


def load_corpus(corpus):
    from fuzzypatternmatching_tpu.pattern.builtin import load_tree_pattern
    from fuzzypatternmatching_tpu.pattern.nonlocal_constraint import (
        load_nonlocal_constraints,
    )
    from fuzzypatternmatching_tpu.pattern.pattern_graph import (
        load_pattern_graph,
    )

    if corpus == "tree":
        return load_tree_pattern(tempfile.mkdtemp())
    if corpus == "cycle":
        prefix = os.path.join(
            REPO, "examples", "patterns_cycle", "0", "pattern"
        )
        return load_pattern_graph(prefix), load_nonlocal_constraints(prefix)
    raise ValueError(f"unknown corpus {corpus!r}")


def run_cell(scale, engine, mode, runs, corpus="tree", mesh=None):
    import bench  # noqa: E402  (repo-root module)
    from fuzzypatternmatching_tpu.engine.driver import MatchEngine

    g, labels = bench.build_or_load_graph(scale)
    pattern, constraints = load_corpus(corpus)
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
    ap.add_argument("--corpora", default="tree",
                    help="comma list: tree,cycle")
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

    # cross-cell fallback for (scale, corpus) keys without pinned
    # constants: every cell of the same key must still agree with the
    # first one ever recorded (stale SWEEP.json cells included)
    seen = {}
    for cname, cell in out["matrix"].items():
        key = (cell["scale"], cell.get("corpus", "tree"))
        if "active_vertices" in cell:
            seen.setdefault(key, cell["active_vertices"])

    for corpus in args.corpora.split(","):
        for scale in [int(s) for s in args.scales.split(",")]:
            for engine in args.engines.split(","):
                for mode in args.modes.split(","):
                    name = f"s{scale}/{engine}/{mode}"
                    if corpus != "tree":
                        name = f"s{scale}/{corpus}/{engine}/{mode}"
                    log(f"[{name}]")
                    try:
                        cell = run_cell(
                            scale, engine, mode, args.runs, corpus=corpus
                        )
                    except Exception as e:  # keep sweeping, record failure
                        log(f"  FAILED: {type(e).__name__}: {e}")
                        cell = {"error": f"{type(e).__name__}: {e}"}
                    if cell is None:
                        continue
                    cell.update(
                        scale=scale, engine=engine, mode=mode, corpus=corpus,
                        measured_at=stamp, commit=commit,
                    )
                    if "active_vertices" in cell:
                        key = (scale, corpus)
                        pinned = PINNED_ANCHORS.get(key)
                        if pinned is not None:
                            bad = {
                                k: (cell[k], v)
                                for k, v in pinned.items()
                                if cell.get(k) != v
                            }
                            if bad:
                                raise AssertionError(
                                    f"{name}: PINNED anchor divergence "
                                    f"(got, expected): {bad}"
                                )
                        else:
                            log(f"  (no pinned anchors for {key}; "
                                "cross-cell check only — pin after "
                                "oracle validation)")
                            want = seen.setdefault(
                                key, cell["active_vertices"]
                            )
                            if cell["active_vertices"] != want:
                                raise AssertionError(
                                    f"{name}: anchor divergence — active="
                                    f"{cell['active_vertices']}, "
                                    f"expected {want}"
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
