"""Test candidate fixes: packed-uint32 rev gather; optimization barriers to
stop gather-into-elementwise refusion."""

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
    s_pad = -(eng.num_slots + 1) % 32
    n_words = (eng.num_slots + 1 + s_pad) // 32
    alive_words = jnp.zeros(n_words, dtype=jnp.uint32)

    def make(variant):
        def fn(tv, alive_words, dev):
            tv_pad = jnp.concatenate([tv, jnp.zeros(1, dtype=jnp.uint32)])
            acc = jnp.uint32(0)
            for bkt, (rows, adj, rev, valid, seg_id, seg_rows) in zip(
                eng.buckets, dev
            ):
                n, w = adj.shape
                n_seg = len(bkt.seg_rows)
                split = n_seg != n
                p_bits = tv_pad[adj]
                if variant in ("barrier", "packed_barrier"):
                    p_bits = jax.lax.optimization_barrier(p_bits)
                if variant in ("packed", "packed_barrier"):
                    word = alive_words[rev >> 5]
                    if variant == "packed_barrier":
                        word = jax.lax.optimization_barrier(word)
                    gate = ((word >> (rev & 31).astype(jnp.uint32)) & 1) != 0
                    send_ok = (p_bits != 0) & gate
                else:
                    send_ok = p_bits != 0
                p_bits = jnp.where(send_ok, p_bits, jnp.uint32(0))
                tv_seg = tv[seg_rows]
                adj_mask_seg = eng._or_over_bits(tv_seg)
                accept = (p_bits & adj_mask_seg[seg_id][:, None]) != 0
                pa = jnp.where(accept, p_bits, jnp.uint32(0))
                tn_rows = jax.lax.reduce(
                    pa, np.uint32(0), jax.lax.bitwise_or, dimensions=[1]
                )
                tn = eng._segment_or(tn_rows, seg_id, n_seg) if split else tn_rows
                acc = acc + jnp.sum(tn, dtype=jnp.uint32)
            return acc

        return jax.jit(fn)

    for v in ["barrier", "packed", "packed_barrier"]:
        timeit(f"A[{v}]", make(v), tv, alive_words, eng._dev)


if __name__ == "__main__":
    main()
