"""End-to-end CLI tests: generate -> search -> result layout."""

import os

import numpy as np

from fuzzypatternmatching_tpu.cli import generate_rmat, ingest_edge_list, run_pattern_matching

from test_pattern import write_tree_pattern


def test_generate_search_results_layout(tmp_path):
    db = str(tmp_path / "db")
    out = str(tmp_path / "out")
    pat_dir = tmp_path / "patterns" / "0"
    pat_dir.mkdir(parents=True)
    write_tree_pattern(pat_dir)

    generate_rmat.main(["-s", "11", "-o", db, "-p", "4", "--no-scramble"])
    run_pattern_matching.main(
        ["-i", db, "-p", str(tmp_path / "patterns"), "-o", out]
    )

    base = os.path.join(out, "0")
    assert os.path.exists(os.path.join(out, "result_pattern_set"))
    for sub in (
        "result_iteration",
        "result_step",
        "result_superstep",
    ):
        assert os.path.exists(os.path.join(base, sub))
    # 4 ranks of count files with equal line counts
    counts = []
    for r in range(4):
        p = os.path.join(base, "all_ranks_active_vertices_count", f"active_vertices_{r}")
        with open(p) as f:
            counts.append(len(f.readlines()))
    assert len(set(counts)) == 1 and counts[0] > 0

    # the merge semantics of total_active_count.py: per-rank last fields sum
    # to the global per-superstep counts
    totals = None
    for r in range(4):
        p = os.path.join(base, "all_ranks_active_vertices_count", f"active_vertices_{r}")
        vals = [int(l.rsplit(",", 1)[1]) for l in open(p)]
        totals = vals if totals is None else [a + b for a, b in zip(totals, vals)]
    with open(os.path.join(base, "result_superstep")) as f:
        n_rows = len(f.readlines())
    assert len(totals) == n_rows
    # first superstep of an s11 no-scramble run: 327 label-matched vertices
    assert totals[0] == 327


def test_ingest_edge_list(tmp_path):
    ef = tmp_path / "edges.txt"
    ef.write_text("0 1\n1 2\n2 0\n")
    db = str(tmp_path / "db")
    ingest_edge_list.main(["-o", db, "-u", "-p", "2", str(ef)])
    from fuzzypatternmatching_tpu.graph import storage

    g, _, _ = storage.load(db)
    assert g.num_vertices == 3
    assert g.num_edges == 6  # symmetrized triangle


def test_explicit_labels_lcc_only(tmp_path):
    """BASELINE config 2: chain pattern with -v labels, no NLC files."""
    # graph: path 0-1-2-3 plus a distractor 4-5
    ef = tmp_path / "edges.txt"
    ef.write_text("0 1\n1 2\n2 3\n4 5\n")
    db = str(tmp_path / "db")
    ingest_edge_list.main(["-o", db, "-u", "-p", "2", str(ef)])

    # labels via -v files (vertex_data_db format: "<base>*")
    lab = tmp_path / "labels_0"
    lab.write_text("0 7\n1 8\n2 7\n3 8\n4 7\n5 9\n")

    # chain template 7-8 (no pattern_nlc / non_local_constraint files)
    pdir = tmp_path / "patterns" / "0"
    pdir.mkdir(parents=True)
    (pdir / "pattern_edge").write_text("0 1\n1 0\n")
    (pdir / "pattern_vertex_data").write_text("0 7\n1 8\n")
    (pdir / "pattern_stat").write_text("diameter : 2\n")

    out = str(tmp_path / "out")
    run_pattern_matching.main(
        ["-i", db, "-p", str(tmp_path / "patterns"), "-o", out,
         "-v", str(tmp_path / "labels_")]
    )
    av_lines = []
    for r in range(2):
        p = os.path.join(out, "0", "all_ranks_active_vertices", f"active_vertices_{r}")
        av_lines += open(p).read().splitlines()
    # 0(7)-1(8)-2(7)-3(8) chain survives; 4(7)-5(9) pruned
    vs = sorted(int(l.split(",")[1]) for l in av_lines)
    assert vs == [0, 1, 2, 3]


def test_run_algorithms_cli(tmp_path, capsys):
    from fuzzypatternmatching_tpu.cli import run_algorithms

    ef = tmp_path / "edges.txt"
    ef.write_text("0 1\n1 2\n2 0\n2 3\n")
    db = str(tmp_path / "db")
    ingest_edge_list.main(["-o", db, "-u", "-p", "1", str(ef)])
    for algo, expect in [
        ("bfs", "visited 4 vertices"),
        ("cc", "components: 1"),
        ("kcore", "2-core size: 3"),
        ("triangles", "triangles: 1"),
        ("pagerank", "top-5"),
        ("sssp", "reached 4"),
    ]:
        run_algorithms.main([algo, "-i", db])
        out = capsys.readouterr().out
        assert expect in out, (algo, out)
