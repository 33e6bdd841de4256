"""superstep_timing mode: real per-step seconds, identical results."""

import numpy as np
import pytest

from fuzzypatternmatching_tpu.engine.driver import MatchEngine
from fuzzypatternmatching_tpu.graph.csr import degree_labels

from test_engine_vs_oracle import _random_graph
from test_nlcc_device import _results_equal
from test_oracle import PATH_PATTERN, path_constraint, tds_constraint


@pytest.mark.parametrize("lcc_engine", ["flat", "bucketed", "sharded"])
def test_timing_mode_identical_results_real_seconds(lcc_engine):
    g = _random_graph(11, v=48, e=160)
    rng = np.random.RandomState(111)
    labels = rng.randint(1, 4, size=48).astype(np.uint64)
    cs = [path_constraint(), tds_constraint()]
    base = MatchEngine(g, labels, PATH_PATTERN, cs, lcc_engine=lcc_engine).run()
    timed_engine = MatchEngine(
        g, labels, PATH_PATTERN, cs, lcc_engine=lcc_engine,
        superstep_timing=True,
    )
    timed = timed_engine.run()
    _results_equal(base, timed)
    lp = [r for r in timed.rows if r.phase == "LP"]
    assert all(r.seconds > 0 for r in lp)
    # per-step seconds are individually measured, not one value divided:
    # with >= 2 steps the wall times essentially never tie exactly
    if len(lp) >= 2:
        assert len({r.seconds for r in lp}) > 1
