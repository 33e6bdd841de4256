"""Generate the checked-in golden conformance result trees.

The project's contract is output parity on the corpus (reference
README.md:33-44; merged by examples/scripts/total_active_count.py). These
trees are produced ONCE by the conformance oracle and committed under
examples/results_golden/; tests/test_golden_results.py then diffs every
engine's ``write_results`` output against them byte-for-byte (after
normalizing the wall-clock fields). Regenerate only when the corpus or the
result-layout contract deliberately changes:

    PYTHONPATH=/root/repo python tools/make_golden.py

Configs:
  tree_s11  — R-MAT s11 (4-rank stream, unscrambled), degree labels, the
              rmat_log2 tree corpus: prunes to the EMPTY fixpoint (trace
              anchors [327, 124, 8, 0, ...]).
  tree_s13  — same at s13: non-empty fixpoint — 12 active vertices,
              22 active edges, 6 enumerated subgraphs (the conformance
              anchor the multichip dryrun asserts too).
  cycle_s13 — s13 with the examples/patterns_cycle corpus: a triangle
              template (labels 2, 8, 10) with TWO valid_cycle=1
              constraints — one nem-style cycle check and one TDS cyclic
              enumeration — converging in 2 iterations to a non-empty
              fixpoint (254 vertices, 5500 edges, 109 cyclic subgraphs):
              the cyclic-acceptance path (nem_1.hpp:736-770, incl. the
              winning-edge marks) is pinned by golden files, not only by
              synthetic unit fixtures.
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_BASE = os.path.join(REPO, "examples", "results_golden")
PATTERN_PREFIX = os.path.join(REPO, "examples", "patterns", "0", "pattern")
CYCLE_PREFIX = os.path.join(
    REPO, "examples", "patterns_cycle", "0", "pattern"
)
NUM_RANKS = 4


def build_config(scale: int, pattern_prefix: str = PATTERN_PREFIX):
    """The golden workload at the given scale: 4-rank unscrambled R-MAT
    stream + degree labels + the tree-pattern corpus (same recipe as
    tests/test_engine_vs_oracle._rmat_s11 and __graft_entry__)."""
    from fuzzypatternmatching_tpu.generators.rmat import (
        RmatParams,
        generate_edges,
    )
    from fuzzypatternmatching_tpu.graph.csr import degree_labels, from_edges
    from fuzzypatternmatching_tpu.pattern.nonlocal_constraint import (
        load_nonlocal_constraints,
    )
    from fuzzypatternmatching_tpu.pattern.pattern_graph import (
        load_pattern_graph,
    )

    parts = [
        generate_edges(
            RmatParams(
                seed=5489 + 3 * r,
                vertex_scale=scale,
                edge_count=(16 << scale) // 4,
                scramble=False,
            )
        )
        for r in range(4)
    ]
    src = np.concatenate([p[0] for p in parts])
    dst = np.concatenate([p[1] for p in parts])
    g = from_edges(src, dst, num_vertices=1 << scale)
    labels = degree_labels(g)
    pattern = load_pattern_graph(pattern_prefix)
    constraints = load_nonlocal_constraints(pattern_prefix)
    return g, labels, pattern, constraints


def zero_seconds(result):
    """Golden trees carry deterministic bytes: wall-clock fields are zeroed
    (the comparison test strips them from engine output the same way)."""
    for row in result.rows:
        row.seconds = 0.0
    result.total_seconds = 0.0
    return result


def main():
    from fuzzypatternmatching_tpu.engine.oracle import MatchOracle
    from fuzzypatternmatching_tpu.io.results import write_results

    meta = {"num_ranks": NUM_RANKS, "configs": {}}
    for name, scale, prefix in (
        ("tree_s11", 11, PATTERN_PREFIX),
        ("tree_s13", 13, PATTERN_PREFIX),
        ("cycle_s13", 13, CYCLE_PREFIX),
    ):
        g, labels, pattern, constraints = build_config(scale, prefix)
        print(f"[{name}] V={g.num_vertices} E={g.num_edges}; oracle run...")
        r = zero_seconds(
            MatchOracle(
                g, labels, pattern, constraints, num_ranks=NUM_RANKS
            ).run()
        )
        out_dir = os.path.join(GOLDEN_BASE, name)
        ps_path = os.path.join(out_dir, "result_pattern_set")
        if os.path.exists(ps_path):
            os.remove(ps_path)
        write_results(
            out_dir, 0, r, labels, NUM_RANKS,
            pattern.edge_count, pattern.vertex_count, len(constraints),
        )
        n_sub = sum(len(v) for v in r.subgraphs.values())
        meta["configs"][name] = {
            "scale": scale,
            "corpus": os.path.relpath(prefix, REPO),
            "num_vertices": int(g.num_vertices),
            "num_edges": int(g.num_edges),
            "iterations": r.iterations,
            "active_vertices": len(r.active_vertices),
            "active_edges": len(r.active_edges),
            "subgraphs": n_sub,
            "traversed_rows": len(r.rows),
        }
        print(f"[{name}] iterations={r.iterations} "
              f"active={len(r.active_vertices)} subgraphs={n_sub}")
    with open(os.path.join(GOLDEN_BASE, "golden_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"golden trees written under {GOLDEN_BASE}")


if __name__ == "__main__":
    main()
