"""Native C++ data-plane must be bit-identical to the NumPy implementations."""

import time

import numpy as np
import pytest

from fuzzypatternmatching_tpu import native
from fuzzypatternmatching_tpu.generators.rmat import rmat_all_ranks
from fuzzypatternmatching_tpu.graph.csr import from_edges

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_rmat_native_matches_numpy_scrambled():
    a = rmat_all_ranks(scale=17, n_ranks=4, edges_per_vertex=2, use_native=True)
    b = rmat_all_ranks(scale=17, n_ranks=4, edges_per_vertex=2, use_native=False)
    assert np.array_equal(a[0], b[0])
    assert np.array_equal(a[1], b[1])


def test_rmat_native_matches_numpy_unscrambled():
    a = rmat_all_ranks(
        scale=17, n_ranks=2, edges_per_vertex=1, scramble=False, use_native=True
    )
    b = rmat_all_ranks(
        scale=17, n_ranks=2, edges_per_vertex=1, scramble=False, use_native=False
    )
    assert np.array_equal(a[0], b[0])
    assert np.array_equal(a[1], b[1])


def test_csr_native_matches_numpy():
    src, dst = rmat_all_ranks(scale=17, n_ranks=4, edges_per_vertex=2)
    g1 = from_edges(src, dst, num_vertices=1 << 17, use_native=True)
    g2 = from_edges(src, dst, num_vertices=1 << 17, use_native=False)
    assert np.array_equal(g1.row_ptr, g2.row_ptr)
    assert np.array_equal(g1.cols, g2.cols)
    assert np.array_equal(g1.rev_edge, g2.rev_edge)
    assert np.array_equal(g1.raw_degree, g2.raw_degree)
    assert np.array_equal(g1.edge_row, g2.edge_row)


def test_native_is_faster():
    t0 = time.time()
    rmat_all_ranks(scale=17, n_ranks=4, edges_per_vertex=4, use_native=True)
    t_native = time.time() - t0
    t0 = time.time()
    rmat_all_ranks(scale=17, n_ranks=4, edges_per_vertex=4, use_native=False)
    t_numpy = time.time() - t0
    assert t_native < t_numpy
