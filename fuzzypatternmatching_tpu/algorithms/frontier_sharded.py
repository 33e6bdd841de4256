"""Distributed classic graph algorithms over a 1-D device mesh.

The reference runs BFS/CC/PageRank/k-core/SSSP over the delegate-
partitioned graph on all MPI ranks (reference:
include/havoqgt/breadth_first_search.hpp:196-204,
connected_components.hpp:121, page_rank.hpp:167, kth_core.hpp:130,
single_source_shortest_path.hpp; drivers src/run_bfs.cpp:186 etc.), with
visitor messages through the mailbox. The TPU-first layout here:

* **Edges are partitioned** into n contiguous CSR chunks of ~E/n (the same
  chunking as the LCC mesh plane, hub rows split across devices), so the
  per-superstep relaxation work is E/n per device.
* **The V-sized frontier state is replicated** (levels / components /
  ranks / core flags / distances — a few bytes per vertex): each device
  reduces its chunk's contributions into a V-sized partial with a
  segment reduction, and one ``pmin``/``psum`` over the mesh combines
  them — every device deterministically holds the same new state. For
  these algorithms state is V-sized and tiny next to the edge slabs; a
  V-sized collective per superstep rides ICI, and the O((V+E)/n + cut)
  halo machinery of the matching plane (parallel/sharded.py) is not
  needed to scale the dominant E-sized work.
* Convergence tests are the same ``psum``-reduced any-changed flags the
  matching engines use (termination_detection.hpp analog).

Results are bit-identical to the single-device fixpoints in
``algorithms/frontier.py`` (cross-tested at 1/2/8 devices,
tests/test_algorithms.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.csr import Graph

_INF = np.int32(2**31 - 1)


def _chunked_csr(graph: Graph, n: int, extra: np.ndarray | None = None):
    """Contiguous edge chunks: per-device global cols / rows / valid
    (+ an optional per-edge payload, e.g. SSSP weights)."""
    e = graph.num_edges
    v = graph.num_vertices
    ec = max(-(-e // n), 1)
    cols = np.full((n, ec), v, dtype=np.int32)  # pad -> sentinel vertex v
    rows = np.full((n, ec), v, dtype=np.int32)
    valid = np.zeros((n, ec), dtype=bool)
    ext = None if extra is None else np.zeros((n, ec), dtype=extra.dtype)
    for r in range(n):
        lo, hi = r * ec, min((r + 1) * ec, e)
        cnt = max(hi - lo, 0)
        hi = max(hi, lo)
        cols[r, :cnt] = graph.cols_range(lo, hi)
        rows[r, :cnt] = graph.edge_row_range(lo, hi)
        valid[r, :cnt] = True
        if ext is not None:
            ext[r, :cnt] = extra[lo:hi]
    return cols, rows, valid, ext


def _put(mesh: Mesh, arr: np.ndarray):
    return jax.device_put(arr, NamedSharding(mesh, P("x", None)))


def _mesh_for(mesh: Mesh | None, num_devices: int | None) -> Mesh:
    if mesh is not None:
        return mesh
    devs = jax.devices()[: (num_devices or len(jax.devices()))]
    return Mesh(np.array(devs), ("x",))


def breadth_first_search(
    graph: Graph, source: int,
    mesh: Mesh | None = None, num_devices: int | None = None,
):
    """Distributed BFS levels + parents (breadth_first_search.hpp:196-204,
    run_bfs.cpp:186). Same deterministic parent rule as the single-device
    version: smallest-id neighbor on a shortest path."""
    mesh = _mesh_for(mesh, num_devices)
    n = mesh.devices.size
    v = graph.num_vertices
    cols, rows, valid, _ = _chunked_csr(graph, n)

    def spmd(level, parent, col, erow, ok):
        col, erow, ok = col[0], erow[0], ok[0]

        def body(state):
            level, parent, _ = state
            lvl_pad = jnp.concatenate([level, jnp.full(1, _INF, jnp.int32)])
            lc = lvl_pad[col]
            cand = jnp.where(ok & (lc < _INF), lc + 1, _INF)
            part = jax.ops.segment_min(cand, erow, num_segments=v + 1)[:v]
            new_level = jnp.minimum(level, jax.lax.pmin(part, "x"))
            nl_pad = jnp.concatenate([new_level, jnp.full(1, _INF, jnp.int32)])
            is_par = ok & (lc + 1 == nl_pad[erow]) & (lc < _INF)
            pcand = jnp.where(is_par, col, jnp.int32(v))
            ppart = jax.ops.segment_min(pcand, erow, num_segments=v + 1)[:v]
            new_parent = jax.lax.pmin(ppart, "x")
            new_parent = jnp.where(new_level < level, new_parent, parent)
            changed = jax.lax.pmax(
                jnp.any(new_level < level).astype(jnp.int32), "x"
            )
            return new_level, new_parent, changed != 0

        level, parent, _ = jax.lax.while_loop(
            lambda s: s[2], body, (level, parent, jnp.bool_(True))
        )
        return level, parent

    fn = jax.jit(
        jax.shard_map(
            spmd, mesh=mesh,
            in_specs=(P(), P(), P("x", None), P("x", None), P("x", None)),
            out_specs=(P(), P()),
        )
    )
    level0 = jnp.full(v, _INF, dtype=jnp.int32).at[source].set(0)
    parent0 = jnp.full(v, -1, dtype=jnp.int32).at[source].set(source)
    level, parent = fn(
        level0, parent0, _put(mesh, cols), _put(mesh, rows), _put(mesh, valid)
    )
    return np.asarray(level), np.asarray(parent)


def connected_components(
    graph: Graph, mesh: Mesh | None = None, num_devices: int | None = None,
):
    """Distributed min-label propagation (connected_components.hpp:121)."""
    mesh = _mesh_for(mesh, num_devices)
    n = mesh.devices.size
    v = graph.num_vertices
    cols, rows, valid, _ = _chunked_csr(graph, n)

    def spmd(comp, col, erow, ok):
        col, erow, ok = col[0], erow[0], ok[0]

        def body(state):
            comp, _ = state
            cpad = jnp.concatenate([comp, jnp.full(1, _INF, jnp.int32)])
            cand = jnp.where(ok, cpad[col], _INF)
            part = jax.ops.segment_min(cand, erow, num_segments=v + 1)[:v]
            new = jnp.minimum(comp, jax.lax.pmin(part, "x"))
            changed = jax.lax.pmax(jnp.any(new < comp).astype(jnp.int32), "x")
            return new, changed != 0

        comp, _ = jax.lax.while_loop(
            lambda s: s[1], body, (comp, jnp.bool_(True))
        )
        return comp

    fn = jax.jit(
        jax.shard_map(
            spmd, mesh=mesh,
            in_specs=(P(), P("x", None), P("x", None), P("x", None)),
            out_specs=P(),
        )
    )
    comp = fn(
        jnp.arange(v, dtype=jnp.int32),
        _put(mesh, cols), _put(mesh, rows), _put(mesh, valid),
    )
    return np.asarray(comp)


def pagerank(
    graph: Graph, damping: float = 0.85, iterations: int = 20,
    mesh: Mesh | None = None, num_devices: int | None = None,
):
    """Distributed power iteration (page_rank.hpp:167): per-device partial
    receive sums, psum-combined."""
    mesh = _mesh_for(mesh, num_devices)
    n = mesh.devices.size
    v = graph.num_vertices
    cols, rows, valid, _ = _chunked_csr(graph, n)
    out_deg = np.maximum(np.diff(graph.row_ptr), 0).astype(np.float32)

    def spmd(pr, deg, col, erow, ok):
        col, erow, ok = col[0], erow[0], ok[0]

        def step(pr, _):
            contrib = jnp.where(deg > 0, pr / deg, 0.0)
            cpad = jnp.concatenate([contrib, jnp.zeros(1, jnp.float32)])
            cand = jnp.where(ok, cpad[col], 0.0)
            part = jax.ops.segment_sum(cand, erow, num_segments=v + 1)[:v]
            recv = jax.lax.psum(part, "x")
            dangling = jnp.sum(jnp.where(deg == 0, pr, 0.0))
            pr2 = (1.0 - damping) / v + damping * (recv + dangling / v)
            return pr2, None

        pr, _ = jax.lax.scan(step, pr, None, length=iterations)
        return pr

    fn = jax.jit(
        jax.shard_map(
            spmd, mesh=mesh,
            in_specs=(P(), P(), P("x", None), P("x", None), P("x", None)),
            out_specs=P(),
        )
    )
    pr = fn(
        jnp.full(v, 1.0 / v, dtype=jnp.float32), jnp.asarray(out_deg),
        _put(mesh, cols), _put(mesh, rows), _put(mesh, valid),
    )
    return np.asarray(pr)


def kth_core(
    graph: Graph, k: int,
    mesh: Mesh | None = None, num_devices: int | None = None,
):
    """Distributed iterative peel (kth_core.hpp:130)."""
    mesh = _mesh_for(mesh, num_devices)
    n = mesh.devices.size
    v = graph.num_vertices
    cols, rows, valid, _ = _chunked_csr(graph, n)

    def spmd(alive, col, erow, ok):
        col, erow, ok = col[0], erow[0], ok[0]

        def body(state):
            alive, _ = state
            apad = jnp.concatenate([alive, jnp.zeros(1, bool)])
            cand = (ok & apad[col] & apad[erow]).astype(jnp.int32)
            part = jax.ops.segment_sum(cand, erow, num_segments=v + 1)[:v]
            deg = jax.lax.psum(part, "x")
            new = alive & (deg >= k)
            changed = jax.lax.pmax(
                jnp.any(new != alive).astype(jnp.int32), "x"
            )
            return new, changed != 0

        alive, _ = jax.lax.while_loop(
            lambda s: s[1], body, (alive, jnp.bool_(True))
        )
        return alive

    fn = jax.jit(
        jax.shard_map(
            spmd, mesh=mesh,
            in_specs=(P(), P("x", None), P("x", None), P("x", None)),
            out_specs=P(),
        )
    )
    alive = fn(
        jnp.ones(v, dtype=bool),
        _put(mesh, cols), _put(mesh, rows), _put(mesh, valid),
    )
    return np.asarray(alive)


def sssp(
    graph: Graph, source: int, weights: np.ndarray,
    mesh: Mesh | None = None, num_devices: int | None = None,
):
    """Distributed Bellman-Ford (single_source_shortest_path.hpp): same
    sender-side weight rule as the single-device version."""
    mesh = _mesh_for(mesh, num_devices)
    n = mesh.devices.size
    v = graph.num_vertices
    rev = graph.rev_edge
    w_in = np.where(rev >= 0, weights[np.maximum(rev, 0)], weights).astype(
        np.float32
    )
    cols, rows, valid, w_c = _chunked_csr(graph, n, extra=w_in)
    inf = jnp.float32(np.inf)

    def spmd(dist, col, erow, ok, w):
        col, erow, ok, w = col[0], erow[0], ok[0], w[0]

        def body(state):
            dist, _ = state
            dpad = jnp.concatenate([dist, jnp.full(1, inf, jnp.float32)])
            dc = dpad[col]
            cand = jnp.where(ok & (dc < inf), dc + w, inf)
            part = jax.ops.segment_min(cand, erow, num_segments=v + 1)[:v]
            new = jnp.minimum(dist, jax.lax.pmin(part, "x"))
            changed = jax.lax.pmax(jnp.any(new < dist).astype(jnp.int32), "x")
            return new, changed != 0

        dist, _ = jax.lax.while_loop(
            lambda s: s[1], body, (dist, jnp.bool_(True))
        )
        return dist

    fn = jax.jit(
        jax.shard_map(
            spmd, mesh=mesh,
            in_specs=(
                P(), P("x", None), P("x", None), P("x", None), P("x", None),
            ),
            out_specs=P(),
        )
    )
    dist = fn(
        jnp.full(v, np.inf, dtype=jnp.float32).at[source].set(0.0),
        _put(mesh, cols), _put(mesh, rows), _put(mesh, valid),
        _put(mesh, w_c),
    )
    return np.asarray(dist)
