"""Micro-benchmark the LCC superstep's constituent ops at s21 scale.

Identifies which op dominates the ~1.5s/superstep device time: the
candidate-bitset gather, the reverse-flag gather, the OR reduction, or the
stats segment-sums. Uses the persistent compile cache.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(REPO, ".bench_cache", "jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from fuzzypatternmatching_tpu.engine.lcc_bucketed import BucketedLccEngine
from fuzzypatternmatching_tpu.graph import storage
from fuzzypatternmatching_tpu.pattern.builtin import load_tree_pattern
import tempfile


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    g, labels, _ = storage.load(os.path.join(REPO, ".bench_cache", "rmat_s21"))
    pat, cons = load_tree_pattern(tempfile.mkdtemp())
    eng = BucketedLccEngine(g, labels, pat)
    print(
        f"V={g.num_vertices} E={g.num_edges} slots={eng.num_slots} "
        f"buckets={[(len(b.rows), b.adj.shape[1]) for b in eng.buckets]}",
        flush=True,
    )

    tv = eng.label_tv
    tv_pad = jnp.concatenate([tv, jnp.zeros(1, dtype=jnp.uint32)])
    alive = jnp.zeros(eng.num_slots + 1, dtype=bool)

    # 1. candidate gather over all buckets
    @jax.jit
    def gather_tv(tv_pad, dev):
        acc = jnp.uint32(0)
        for (rows, adj, rev, valid, seg, segr) in dev:
            acc = acc + jnp.sum(tv_pad[adj], dtype=jnp.uint32)
        return acc

    timeit("gather tv_pad[adj] (all buckets)", gather_tv, tv_pad, eng._dev)

    # 2. reverse-flag gather
    @jax.jit
    def gather_rev(alive, dev):
        acc = jnp.int32(0)
        for (rows, adj, rev, valid, seg, segr) in dev:
            acc = acc + jnp.sum(alive[rev], dtype=jnp.int32)
        return acc

    timeit("gather alive[rev] (all buckets)", gather_rev, alive, eng._dev)

    # 3. OR-reduce over bucket widths
    @jax.jit
    def or_reduce(tv_pad, dev):
        acc = jnp.uint32(0)
        for (rows, adj, rev, valid, seg, segr) in dev:
            p = tv_pad[adj]
            tn = jax.lax.reduce(p, np.uint32(0), jax.lax.bitwise_or, dimensions=[1])
            acc = acc + jnp.sum(tn, dtype=jnp.uint32)
        return acc

    timeit("gather + OR-reduce", or_reduce, tv_pad, eng._dev)

    # 4. full superstep (init)
    consts = {
        "owner": eng.owner,
        "inv_perm": eng._inv_perm,
        "label_tv": eng.label_tv,
    }
    flag = jnp.zeros(eng.num_slots + 1, dtype=bool)

    @jax.jit
    def full(tv, alive, flag, dev, consts):
        return eng._superstep(tv, alive, flag, dev, consts, init=False)

    timeit("full superstep (cont)", full, tv, alive, flag, eng._dev, consts)

    # 5. stats only
    @jax.jit
    def stats_only(tv, dev, consts):
        owner = consts["owner"]
        acc = jnp.zeros(1, dtype=jnp.int32)
        for (rows, adj, rev, valid, seg, segr) in dev:
            ownb = owner[segr]
            acc = acc + jax.ops.segment_sum(
                (tv[segr] != 0).astype(jnp.int32), ownb, num_segments=1
            )
        return acc

    timeit("stats segment sums", stats_only, tv, eng._dev, consts)


if __name__ == "__main__":
    main()
