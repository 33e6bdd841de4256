"""The native streaming edge-list parser must match the loadtxt fallback
byte-for-byte on every supported shape."""

import os

import numpy as np
import pytest

from fuzzypatternmatching_tpu import native
from fuzzypatternmatching_tpu.generators.edge_list import read_edge_lists

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _both(paths, undirected=False):
    a = read_edge_lists(paths, undirected=undirected, use_native=True)
    b = read_edge_lists(paths, undirected=undirected, use_native=False)
    for x, y in zip(a, b):
        if x is None or y is None:
            assert x is None and y is None
        else:
            assert np.array_equal(x, y)
    return a


def test_two_column_multifile(tmp_path):
    p1 = tmp_path / "a"
    p1.write_text("0 1\n1 2\n\n2 3\n")  # blank line skipped
    p2 = tmp_path / "b"
    p2.write_bytes(b"3 0\r\n0 2")  # CRLF, no trailing newline
    src, dst, data = _both([str(p1), str(p2)])
    assert src.tolist() == [0, 1, 2, 3, 0]
    assert dst.tolist() == [1, 2, 3, 0, 2]
    assert data is None
    _both([str(p1), str(p2)], undirected=True)


def test_three_column_with_negative_weights(tmp_path):
    p = tmp_path / "w"
    p.write_text("0 1 5\n1 0 -7\n")
    src, dst, data = _both([str(p)])
    assert data.tolist() == [5, -7]


def test_empty_file(tmp_path):
    p = tmp_path / "empty"
    p.write_text("")
    src, dst, data = read_edge_lists([str(p)], use_native=True)
    assert src.size == 0 and dst.size == 0


def test_tab_separated(tmp_path):
    p = tmp_path / "tabs"
    p.write_text("10\t20\n20\t30\n")
    src, dst, _ = _both([str(p)])
    assert src.tolist() == [10, 20]
