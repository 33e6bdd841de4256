"""Result-FILE-level conformance against the checked-in golden trees.

The reference's contract is byte-for-byte output parity on the corpus
(README.md:33-44, merged by examples/scripts/total_active_count.py). The
golden trees under examples/results_golden/ were generated once by the
oracle (tools/make_golden.py) and committed; here every engine's
``write_results`` output is diffed against them file by file — a regression
anywhere in io/results.py or in any engine's counts/sets/subgraphs fails.

Wall-clock fields are the only nondeterminism in the layout; they are
stripped by the normalizer (the golden trees carry zeros there).
"""

import json
import os

import numpy as np
import pytest

from fuzzypatternmatching_tpu.engine.driver import MatchEngine
from fuzzypatternmatching_tpu.io.results import write_results

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_BASE = os.path.join(REPO, "examples", "results_golden")


def _build(scale, corpus=None):
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_golden import PATTERN_PREFIX, build_config

    prefix = PATTERN_PREFIX if corpus is None else os.path.join(REPO, corpus)
    return build_config(scale, prefix)


def _normalize(path: str) -> list[str]:
    """File rows with wall-clock fields stripped (see module docstring)."""
    name = os.path.basename(path)
    out = []
    with open(path) as f:
        for line in f:
            parts = [p.strip() for p in line.rstrip("\n").split(",")]
            if name in ("result_superstep", "result_step", "result_iteration"):
                parts = parts[:-1]  # trailing seconds
            elif name == "result_pattern_set":
                parts[3] = "0.0"  # total_seconds
            out.append(", ".join(parts))
    return out


def _tree_files(base: str) -> dict[str, list[str]]:
    tree = {}
    for root, _dirs, files in os.walk(base):
        for fn in files:
            if fn == "golden_meta.json":
                continue
            p = os.path.join(root, fn)
            tree[os.path.relpath(p, base)] = _normalize(p)
    return tree


@pytest.fixture(scope="module")
def golden_meta():
    with open(os.path.join(GOLDEN_BASE, "golden_meta.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("engine", ["flat", "bucketed", "sharded"])
@pytest.mark.parametrize("config", ["tree_s11", "tree_s13", "cycle_s13"])
def test_engine_result_tree_matches_golden(
    engine, config, golden_meta, tmp_path
):
    cfg = golden_meta["configs"][config]
    num_ranks = golden_meta["num_ranks"]
    g, labels, pattern, constraints = _build(cfg["scale"], cfg.get("corpus"))
    assert g.num_vertices == cfg["num_vertices"]
    assert g.num_edges == cfg["num_edges"]
    kw = {"nlcc_mode": "device"} if engine == "sharded" else {}
    r = MatchEngine(
        g, labels, pattern, constraints, lcc_engine=engine,
        num_ranks=num_ranks, **kw,
    ).run()
    # the committed anchors pin the fixpoint itself
    assert r.iterations == cfg["iterations"]
    assert len(r.active_vertices) == cfg["active_vertices"]
    assert len(r.active_edges) == cfg["active_edges"]
    assert sum(len(v) for v in r.subgraphs.values()) == cfg["subgraphs"]

    out = str(tmp_path / "out")
    write_results(
        out, 0, r, labels, num_ranks,
        pattern.edge_count, pattern.vertex_count, len(constraints),
    )
    got = _tree_files(out)
    want = _tree_files(os.path.join(GOLDEN_BASE, config))
    assert set(got) == set(want), (
        f"file set mismatch: only-engine={sorted(set(got) - set(want))}, "
        f"only-golden={sorted(set(want) - set(got))}"
    )
    for rel in sorted(want):
        assert got[rel] == want[rel], f"{engine}/{config}: {rel} differs"


def test_reference_merge_script_totals(golden_meta):
    """The golden per-rank count files must merge to the totals the way the
    reference's own analysis does (examples/scripts/total_active_count.py:
    sum the per-rank files row-position-wise)."""
    base = os.path.join(GOLDEN_BASE, "tree_s13", "0")
    per_rank = []
    d = os.path.join(base, "all_ranks_active_vertices_count")
    for fn in sorted(os.listdir(d)):
        with open(os.path.join(d, fn)) as f:
            per_rank.append(
                [int(line.rsplit(",", 1)[1]) for line in f if line.strip()]
            )
    totals = np.array(per_rank).sum(axis=0)
    # the final row of the trace is the fixpoint's active count
    assert totals[-1] == golden_meta["configs"]["tree_s13"]["active_vertices"]
    # first LP superstep of the s13 run (label-match survivors)
    assert totals[0] > totals[-1]
