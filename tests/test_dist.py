"""Multi-host harness (utils/dist.py) on the virtual CPU mesh."""

import argparse

import jax
import numpy as np

from fuzzypatternmatching_tpu.utils.dist import (
    add_distributed_args,
    build_mesh,
    init_distributed,
)


def test_build_mesh_1d_host_major():
    mesh = build_mesh()
    assert mesh.axis_names == ("x",)
    assert mesh.devices.size == len(jax.devices())
    mesh4 = build_mesh(num_devices=4)
    assert mesh4.devices.size == 4


def test_build_mesh_2d():
    mesh = build_mesh(two_d=True)
    assert mesh.axis_names == ("host", "chip")
    # single-process CI: one "host" row holding every virtual device
    assert mesh.devices.shape[0] == 1
    assert mesh.devices.shape[1] == len(jax.devices())


def test_init_distributed_noop_without_flag():
    ap = argparse.ArgumentParser()
    add_distributed_args(ap)
    args = ap.parse_args([])
    init_distributed(args)  # must be a no-op, not an error


def test_sharded_engine_accepts_dist_mesh():
    from fuzzypatternmatching_tpu.graph.csr import (
        degree_labels,
        from_edges,
        grid_graph,
    )
    from fuzzypatternmatching_tpu.parallel.sharded import ShardedLccEngine
    from test_oracle import PATH_PATTERN

    src, dst = grid_graph(6, 6)
    g = from_edges(src, dst)
    engine = ShardedLccEngine(
        g, degree_labels(g), PATH_PATTERN, mesh=build_mesh()
    )
    _, rows, _ = engine.lcc_call(engine.init_state(), True)
    assert rows[0][0] >= 0
