"""Other synthetic edge streams.

* ``upper_triangle``: deterministic test stream of all (i, j), i < j pairs
  over small vertex ranges, optionally symmetrized — the reference's
  upper_triangle_edge_generator.hpp test generator.
* ``preferential_attachment``: Barabasi-Albert-style stream
  (gen_preferential_attachment_edge_list.hpp / detail/preferential_attachment.hpp):
  each new vertex attaches ``k`` edges whose targets are, with probability
  ``beta``, the endpoint of a uniformly random earlier edge slot (degree-
  proportional) and otherwise a uniformly random earlier vertex.
"""

from __future__ import annotations

import numpy as np


def upper_triangle(num_vertices: int, undirected: bool = True):
    idx = np.triu_indices(num_vertices, k=1)
    src = idx[0].astype(np.int64)
    dst = idx[1].astype(np.int64)
    if undirected:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    return src, dst


def preferential_attachment(
    num_vertices: int,
    edges_per_vertex: int = 4,
    seed: int = 5489,
    beta: float = 1.0,
    undirected: bool = True,
):
    """Sequential PA stream (the reference parallelizes this with a
    fix-up pass over unresolved slots; the sequential form is the same
    distribution)."""
    rng = np.random.RandomState(seed)
    k = edges_per_vertex
    m0 = k + 1  # seed clique size
    srcs: list[np.ndarray] = []
    dsts: list[np.ndarray] = []
    # seed: clique over the first m0 vertices
    s0, d0 = np.triu_indices(m0, k=1)
    srcs.append(s0.astype(np.int64))
    dsts.append(d0.astype(np.int64))
    # flat endpoint pool for degree-proportional sampling
    pool = np.concatenate([s0, d0]).astype(np.int64).tolist()
    for v in range(m0, num_vertices):
        targets = []
        while len(targets) < k:
            if rng.rand() < beta and pool:
                t = pool[rng.randint(len(pool))]
            else:
                t = rng.randint(v)
            if t != v:
                targets.append(t)
        for t in targets:
            pool.append(v)
            pool.append(t)
        srcs.append(np.full(k, v, dtype=np.int64))
        dsts.append(np.array(targets, dtype=np.int64))
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    if undirected:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    return src, dst
