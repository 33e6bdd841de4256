"""Classic graph algorithms as dense JAX supersteps on the shared CSR
substrate.

These are the TPU-native counterparts of the reference's visitor-queue
algorithms (reference: include/havoqgt/breadth_first_search.hpp,
connected_components.hpp, page_rank.hpp, kth_core.hpp,
single_source_shortest_path.hpp, triangle_count.hpp). Each asynchronous
visitor traversal becomes an edge-parallel relaxation iterated to fixpoint
under ``lax.while_loop`` — the same receiver-centric layout the matching
kernels use: for vertex v's CSR row, ``col[e]`` are the senders.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import Graph

_INF = np.int32(2**31 - 1)


def _device_csr(graph: Graph):
    return (
        jnp.asarray(graph.cols, dtype=jnp.int32),
        jnp.asarray(graph.edge_row, dtype=jnp.int32),
        graph.num_vertices,
    )


def breadth_first_search(graph: Graph, source: int):
    """Levels + parents from ``source`` (breadth_first_search.hpp:196-204).

    Parent choice is deterministic: the smallest-id neighbor on a shortest
    path (the reference keeps whichever visitor arrived first)."""
    col, erow, v = _device_csr(graph)

    def body(state):
        level, parent, _ = state
        cand = jnp.where(level[col] < _INF, level[col] + 1, _INF)
        new_level = jnp.minimum(
            level, jax.ops.segment_min(cand, erow, num_segments=v)
        )
        # parent = min neighbor id among those at new_level - 1
        is_par = (level[col] + 1 == new_level[erow]) & (level[col] < _INF)
        pcand = jnp.where(is_par, col, jnp.int32(v))
        new_parent = jax.ops.segment_min(pcand, erow, num_segments=v)
        new_parent = jnp.where(
            new_level < level, new_parent, parent
        )
        changed = jnp.any(new_level < level)
        return new_level, new_parent, changed

    level0 = jnp.full(v, _INF, dtype=jnp.int32).at[source].set(0)
    parent0 = jnp.full(v, -1, dtype=jnp.int32).at[source].set(source)

    def cond(state):
        return state[2]

    level, parent, _ = jax.lax.while_loop(
        cond, lambda s: body(s), (level0, parent0, jnp.bool_(True))
    )
    return np.asarray(level), np.asarray(parent)


def connected_components(graph: Graph):
    """Min-label propagation (connected_components.hpp:121)."""
    col, erow, v = _device_csr(graph)

    def body(state):
        comp, _ = state
        new = jnp.minimum(
            comp, jax.ops.segment_min(comp[col], erow, num_segments=v)
        )
        return new, jnp.any(new < comp)

    comp0 = jnp.arange(v, dtype=jnp.int32)
    comp, _ = jax.lax.while_loop(
        lambda s: s[1], body, (comp0, jnp.bool_(True))
    )
    return np.asarray(comp)


def pagerank(graph: Graph, damping: float = 0.85, iterations: int = 20):
    """Power iteration (page_rank.hpp:167). Contributions flow along the
    symmetric edges; dangling mass is redistributed uniformly."""
    col, erow, v = _device_csr(graph)
    out_deg = jnp.asarray(
        np.maximum(np.diff(graph.row_ptr), 0), dtype=jnp.float32
    )

    def step(pr, _):
        contrib = jnp.where(out_deg > 0, pr / out_deg, 0.0)
        recv = jax.ops.segment_sum(contrib[col], erow, num_segments=v)
        dangling = jnp.sum(jnp.where(out_deg == 0, pr, 0.0))
        pr2 = (1.0 - damping) / v + damping * (recv + dangling / v)
        return pr2, None

    pr0 = jnp.full(v, 1.0 / v, dtype=jnp.float32)
    pr, _ = jax.lax.scan(step, pr0, None, length=iterations)
    return np.asarray(pr)


def kth_core(graph: Graph, k: int):
    """Iterative peel: alive vertices need >= k alive neighbors
    (kth_core.hpp:130)."""
    col, erow, v = _device_csr(graph)

    def body(state):
        alive, _ = state
        deg = jax.ops.segment_sum(
            (alive[col] & alive[erow]).astype(jnp.int32), erow, num_segments=v
        )
        new = alive & (deg >= k)
        return new, jnp.any(new != alive)

    alive0 = jnp.ones(v, dtype=bool)
    alive, _ = jax.lax.while_loop(
        lambda s: s[1], body, (alive0, jnp.bool_(True))
    )
    return np.asarray(alive)


def sssp(graph: Graph, source: int, weights: np.ndarray):
    """Bellman-Ford edge relaxation (single_source_shortest_path.hpp).
    ``weights[e]`` is the weight of directed edge e; relaxing v uses the
    reverse edge's weight (sender-side), falling back to the slot's own
    weight for asymmetric inputs."""
    col, erow, v = _device_csr(graph)
    rev = graph.rev_edge
    w_in = np.where(rev >= 0, weights[np.maximum(rev, 0)], weights)
    w = jnp.asarray(w_in, dtype=jnp.float32)
    inf = jnp.float32(np.inf)

    def body(state):
        dist, _ = state
        cand = jnp.where(dist[col] < inf, dist[col] + w, inf)
        new = jnp.minimum(dist, jax.ops.segment_min(cand, erow, num_segments=v))
        return new, jnp.any(new < dist)

    dist0 = jnp.full(v, inf, dtype=jnp.float32).at[source].set(0.0)
    dist, _ = jax.lax.while_loop(lambda s: s[1], body, (dist0, jnp.bool_(True)))
    return np.asarray(dist)


@jax.jit
def _wedge_hits(keys: jax.Array, queries: jax.Array) -> jax.Array:
    """Device-side membership count of wedge-closing keys (sorted)."""
    pos = jnp.searchsorted(keys, queries)
    pos = jnp.minimum(pos, keys.shape[0] - 1)
    return jnp.sum(keys[pos] == queries)


def triangle_count(graph: Graph, wedge_chunk: int = 1 << 24) -> int:
    """Global triangle count (triangle_count.hpp) on the shared substrate:
    degree-orient edges (low (deg, id) -> high), enumerate each vertex's
    oriented-neighbor pairs in bounded host chunks, and close the wedges
    with a jitted sorted-key membership count on the accelerator. Work is
    sum of oriented-degree squared — the O(E^1.5) bound of the standard
    forward algorithm, not O(V^2)."""
    v = graph.num_vertices
    rows = graph.edge_row
    cols = graph.cols
    deg = np.diff(graph.row_ptr)
    # orientation: keep (u, w) with (deg u, u) < (deg w, w); no self loops
    du, dw = deg[rows], deg[cols]
    keep = (du < dw) | ((du == dw) & (rows < cols))
    orow, ocol = rows[keep], cols[keep]
    # oriented CSR
    counts = np.bincount(orow, minlength=v)
    optr = np.zeros(v + 1, dtype=np.int64)
    np.cumsum(counts, out=optr[1:])
    order = np.argsort(orow, kind="stable")
    onbr = ocol[order]
    # sorted oriented-edge keys for closure checks
    keys = np.sort(orow.astype(np.int64) * v + ocol.astype(np.int64))
    keys_d = jnp.asarray(keys)

    total = 0
    # wedge enumeration per source vertex, chunked by cumulative d+^2
    d2 = counts.astype(np.int64) ** 2
    cum = np.cumsum(d2)
    lo = 0
    verts = np.arange(v)
    while lo < v:
        base = cum[lo - 1] if lo else 0
        hi = int(np.searchsorted(cum, base + wedge_chunk)) + 1
        hi = min(max(hi, lo + 1), v)
        vs = verts[lo:hi]
        cs = counts[lo:hi]
        npairs = cs * (cs - 1) // 2
        tot = int(npairs.sum())
        if tot:
            rep = np.repeat(np.arange(len(vs)), npairs)
            offs = np.arange(tot) - np.repeat(np.cumsum(npairs) - npairs, npairs)
            # pair index -> (i, j), i < j within the row, row-major upper tri
            c_r = cs[rep]
            i_idx = (
                c_r - 2
                - np.floor(
                    np.sqrt(-8.0 * offs + 4.0 * c_r * (c_r - 1) - 7) / 2.0
                    - 0.5
                ).astype(np.int64)
            )
            j_idx = (
                offs + i_idx + 1 - c_r * (c_r - 1) // 2
                + (c_r - i_idx) * (c_r - i_idx - 1) // 2
            )
            b = optr[vs[rep]]
            a_v = onbr[b + i_idx].astype(np.int64)
            b_v = onbr[b + j_idx].astype(np.int64)
            # wedge closes iff the oriented edge (min-end -> max-end) exists
            lo_v = np.minimum(a_v, b_v)
            hi_v = np.maximum(a_v, b_v)
            # orientation of the closing edge follows (deg, id) order
            swap = (deg[hi_v] < deg[lo_v]) | (
                (deg[hi_v] == deg[lo_v]) & (hi_v < lo_v)
            )
            q_src = np.where(swap, hi_v, lo_v)
            q_dst = np.where(swap, lo_v, hi_v)
            q = q_src * v + q_dst
            total += int(_wedge_hits(keys_d, jnp.asarray(q)))
        lo = hi
    return total
