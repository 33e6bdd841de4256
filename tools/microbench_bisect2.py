"""Drill into stage A: which term of the accept path costs 1.5s."""

import os
import sys
import tempfile
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


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms", flush=True)


def main():
    g, labels, _ = storage.load(os.path.join(REPO, ".bench_cache", "rmat_s21"))
    pat, _ = load_tree_pattern(tempfile.mkdtemp())
    eng = BucketedLccEngine(g, labels, pat)
    tv = eng.label_tv
    alive = jnp.zeros(eng.num_slots + 1, dtype=bool)

    def make(variant):
        def fn(tv, alive, dev):
            tv_pad = jnp.concatenate([tv, jnp.zeros(1, dtype=jnp.uint32)])
            acc = jnp.uint32(0)
            for bkt, (rows, adj, rev, valid, seg_id, seg_rows) in zip(
                eng.buckets, dev
            ):
                n, w = adj.shape
                n_seg = len(bkt.seg_rows)
                split = n_seg != n
                p_bits = tv_pad[adj]
                if variant != "no_rev":
                    send_ok = (p_bits != 0) & alive[rev]
                else:
                    send_ok = p_bits != 0
                p_bits = jnp.where(send_ok, p_bits, jnp.uint32(0))
                if variant != "no_accept":
                    tv_seg = tv[seg_rows]
                    adj_mask_seg = eng._or_over_bits(tv_seg)
                    accept = (p_bits & adj_mask_seg[seg_id][:, None]) != 0
                    pa = jnp.where(accept, p_bits, jnp.uint32(0))
                else:
                    pa = p_bits
                tn_rows = jax.lax.reduce(
                    pa, np.uint32(0), jax.lax.bitwise_or, dimensions=[1]
                )
                if split and variant != "no_split_or":
                    tn = eng._segment_or(tn_rows, seg_id, n_seg)
                else:
                    tn = tn_rows
                acc = acc + jnp.sum(tn, dtype=jnp.uint32)
            return acc

        return jax.jit(fn)

    for v in ["full", "no_rev", "no_accept", "no_split_or"]:
        timeit(f"A[{v}]", make(v), tv, alive, eng._dev)


if __name__ == "__main__":
    main()
