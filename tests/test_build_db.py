"""Chunked construction (graph/build.py) and per-shard open (GraphDb):
bounded-memory builds must be byte-identical to the in-memory path, and a
search over a lazily-opened DB must equal the materialized one."""

import numpy as np
import pytest

from fuzzypatternmatching_tpu.engine.driver import MatchEngine
from fuzzypatternmatching_tpu.generators.rmat import rmat_all_ranks
from fuzzypatternmatching_tpu.graph import storage
from fuzzypatternmatching_tpu.graph.build import (
    build_db_from_chunks,
    build_rmat_db,
)
from fuzzypatternmatching_tpu.graph.csr import degree_labels, from_edges

from test_nlcc_device import _results_equal
from test_pattern import write_tree_pattern


def _reference_db(tmp_path, scale=10, shards=4):
    src, dst = rmat_all_ranks(scale=scale, n_ranks=4, scramble=False)
    g = from_edges(src, dst, num_vertices=1 << scale)
    base = str(tmp_path / "mem_db")
    storage.save(g, base, num_shards=shards, labels=degree_labels(g))
    return g, base, (src, dst)


def _assert_db_equal(base_a, base_b):
    ga, la, _ = storage.load(base_a)
    gb, lb, _ = storage.load(base_b)
    assert ga.num_vertices == gb.num_vertices
    assert np.array_equal(ga.row_ptr, gb.row_ptr)
    assert np.array_equal(ga.cols, gb.cols)
    assert np.array_equal(ga.rev_edge, gb.rev_edge)
    assert np.array_equal(ga.raw_degree, gb.raw_degree)
    assert np.array_equal(la, lb)


def test_chunked_rmat_build_matches_in_memory(tmp_path):
    _, mem_base, _ = _reference_db(tmp_path)
    chunked = str(tmp_path / "chunked_db")
    build_rmat_db(chunked, scale=10, n_ranks=4, num_shards=4, scramble=False)
    _assert_db_equal(mem_base, chunked)


def test_python_chunk_spill_matches_in_memory(tmp_path):
    # the generic (ingest-path) builder from raw chunks, no native spill
    g, mem_base, (src, dst) = _reference_db(tmp_path)
    chunked = str(tmp_path / "chunks_db")

    def chunks(n=7):
        step = -(-len(src) // n)
        for lo in range(0, len(src), step):
            yield src[lo : lo + step], dst[lo : lo + step]

    build_db_from_chunks(chunked, chunks(), 1 << 10, num_shards=4)
    _assert_db_equal(mem_base, chunked)


def test_graphdb_accessors_match_graph(tmp_path):
    g, base, _ = _reference_db(tmp_path)
    db = storage.open_db(base)
    assert db.num_edges == g.num_edges
    assert np.array_equal(db.row_ptr, g.row_ptr)
    rng = np.random.RandomState(0)
    for _ in range(20):
        lo, hi = sorted(rng.randint(0, g.num_edges + 1, size=2))
        assert np.array_equal(db.cols_range(lo, hi), g.cols_range(lo, hi))
        assert np.array_equal(db.rev_range(lo, hi), g.rev_range(lo, hi))
        assert np.array_equal(
            db.edge_row_range(lo, hi), g.edge_row_range(lo, hi)
        )
    ids = rng.randint(0, g.num_edges, size=200)
    assert np.array_equal(db.cols_at(ids), g.cols_at(ids))
    assert np.array_equal(db.edge_row_at(ids), g.edge_row_at(ids))


def test_search_over_lazy_db_matches_materialized(tmp_path):
    from fuzzypatternmatching_tpu.pattern.nonlocal_constraint import (
        load_nonlocal_constraints,
    )
    from fuzzypatternmatching_tpu.pattern.pattern_graph import (
        load_pattern_graph,
    )

    g, base, _ = _reference_db(tmp_path)
    db = storage.open_db(base)
    prefix = write_tree_pattern(tmp_path)
    pattern = load_pattern_graph(prefix)
    constraints = load_nonlocal_constraints(prefix)
    labels = degree_labels(g)
    mat = MatchEngine(g, labels, pattern, constraints, nlcc_mode="host").run()
    lazy = MatchEngine(
        db, db.labels, pattern, constraints, lcc_engine="sharded",
        nlcc_mode="device",
    ).run()
    _results_equal(mat, lazy)


def test_graphdb_requires_sharded_engine(tmp_path):
    _, base, _ = _reference_db(tmp_path)
    db = storage.open_db(base)
    from test_oracle import PATH_PATTERN

    with pytest.raises(TypeError):
        MatchEngine(db, db.labels, PATH_PATTERN, [], lcc_engine="bucketed")


def test_log_step_traces_build_phases(tmp_path, capsys):
    """Construction-phase tracing (impl/log_step.hpp analog): each chunked
    build phase prints a Starting/Finished bracket with wall seconds and
    RSS/IO/dirty-page figures."""
    from fuzzypatternmatching_tpu.graph.build import build_rmat_db

    build_rmat_db(str(tmp_path / "db"), scale=8, n_ranks=2, num_shards=2,
                  scramble=False)
    out = capsys.readouterr().out
    assert out.count("Starting:") >= 3
    assert out.count("Finished:") >= 3
    assert "pass B2" in out and "RSS:" in out


def test_log_step_disabled_by_env(tmp_path, capsys, monkeypatch):
    from fuzzypatternmatching_tpu.graph.build import build_rmat_db

    monkeypatch.setenv("FPM_LOG_STEPS", "0")
    build_rmat_db(str(tmp_path / "db"), scale=8, n_ranks=2, num_shards=2,
                  scramble=False)
    assert "Starting:" not in capsys.readouterr().out


def test_page_cache_advise(tmp_path):
    """cache_utilities.hpp analog: madvise issues cleanly on the open_db
    memmaps (advisory; returns True on Linux when the call succeeded)."""
    import numpy as np

    from fuzzypatternmatching_tpu.graph import storage
    from fuzzypatternmatching_tpu.graph.csr import from_edges
    from fuzzypatternmatching_tpu.utils.page_cache import advise

    src = np.array([0, 1, 1, 2])
    dst = np.array([1, 0, 2, 1])
    g = from_edges(src, dst, num_vertices=3)
    base = str(tmp_path / "db")
    storage.save(g, base, num_shards=2)
    db = storage.open_db(base)
    assert advise(db._cols[0], "random") is True
    assert advise(db._cols[0], "sequential") is True
    # non-memmap arrays are skipped, not crashed
    assert advise(np.arange(10), "random") is False
    # and the db still reads correctly after advice
    assert (db.cols_range(0, db.num_edges) ==
            g.cols).all()


def _dist_build_proc(base, pid, nproc, labels, q):
    import numpy as np

    from fuzzypatternmatching_tpu.graph.build import (
        build_db_from_chunks_distributed,
    )

    v = 64
    rng = np.random.default_rng(42)
    src = rng.integers(0, v, 600)
    dst = rng.integers(0, v, 600)
    # symmetrize, then slice the stream by process
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    lo = pid * len(s) // nproc
    hi = (pid + 1) * len(s) // nproc
    try:
        build_db_from_chunks_distributed(
            base, iter([(s[lo:hi], d[lo:hi])]), v, pid, nproc,
            num_shards=4, labels=labels, timeout=60.0,
        )
        q.put((pid, None))
    except Exception as e:  # noqa: BLE001
        q.put((pid, f"{type(e).__name__}: {e}"))


def test_distributed_build_validates_labels(tmp_path):
    """Explicitly passed labels must be identical on every process: a
    divergent array fails loudly (sha256 cross-check through the work
    dir) instead of silently writing divergent shards (advisor round-4
    finding)."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    v = 64
    good = np.arange(v, dtype=np.uint64) % 5

    # identical labels: both processes succeed
    base = str(tmp_path / "ok")
    q = ctx.Queue()
    ps = [
        ctx.Process(target=_dist_build_proc, args=(base, pid, 2, good, q))
        for pid in range(2)
    ]
    [p.start() for p in ps]
    [p.join(120) for p in ps]
    res = dict(q.get(timeout=10) for _ in ps)
    assert res == {0: None, 1: None}, res

    # divergent labels: at least the diverging process raises ValueError
    base2 = str(tmp_path / "bad")
    bad = good.copy()
    bad[3] += 1
    q2 = ctx.Queue()
    ps = [
        ctx.Process(
            target=_dist_build_proc,
            args=(base2, pid, 2, good if pid == 0 else bad, q2),
        )
        for pid in range(2)
    ]
    [p.start() for p in ps]
    [p.join(120) for p in ps]
    res2 = dict(q2.get(timeout=10) for _ in ps)
    errs = [e for e in res2.values() if e]
    assert errs and any("labels mismatch" in e for e in errs), res2
