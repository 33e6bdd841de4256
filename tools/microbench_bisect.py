"""Bisect the LCC superstep cost: cumulative variants of the real superstep
body, timed at s21 scale."""

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
    flag = jnp.zeros(eng.num_slots + 1, dtype=bool)
    consts = {
        "owner": eng.owner,
        "inv_perm": eng._inv_perm,
        "label_tv": eng.label_tv,
    }

    def variant(stage):
        def fn(tv, alive, flag, dev, consts):
            owner, inv_perm = consts["owner"], consts["inv_perm"]
            tv_pad = jnp.concatenate([tv, jnp.zeros(1, dtype=jnp.uint32)])
            new_tv_parts = []
            new_alive_parts = []
            av_r = jnp.zeros(1, dtype=jnp.int32)
            for bkt, (rows, adj, rev, valid, seg_id, seg_rows) in zip(
                eng.buckets, dev
            ):
                n, w = adj.shape
                n_seg = len(bkt.seg_rows)
                split = n_seg != n
                base = bkt.slot_base
                p_bits = tv_pad[adj]
                send_ok = (p_bits != 0) & alive[rev]
                p_bits = jnp.where(send_ok, p_bits, jnp.uint32(0))
                tv_seg = tv[seg_rows]
                adj_mask_seg = eng._or_over_bits(tv_seg)
                accept = (p_bits & adj_mask_seg[seg_id][:, None]) != 0
                pa = jnp.where(accept, p_bits, jnp.uint32(0))
                tn_rows = jax.lax.reduce(
                    pa, np.uint32(0), jax.lax.bitwise_or, dimensions=[1]
                )
                tn = eng._segment_or(tn_rows, seg_id, n_seg) if split else tn_rows
                if stage == "A":  # through tn only
                    av_r = av_r + jnp.sum(tn, dtype=jnp.int32)[None]
                    continue
                new_tv_seg = tv_seg & eng._keep_mask(tn)
                if stage == "B":  # + keep mask
                    av_r = av_r + jnp.sum(new_tv_seg, dtype=jnp.int32)[None]
                    continue
                row_live = (new_tv_seg != 0)[seg_id]
                own_alive = alive[base : base + n * w].reshape(n, w)
                own_flag = flag[base : base + n * w].reshape(n, w)
                new_alive_b = own_alive & (accept | own_flag) & row_live[:, None]
                new_alive_parts.append(new_alive_b.reshape(-1))
                new_tv_parts.append(new_tv_seg)
                if stage == "C":  # + alive update, no stats
                    continue
                ownb = owner[seg_rows]
                av_r = av_r + jax.ops.segment_sum(
                    (new_tv_seg != 0).astype(jnp.int32), ownb, num_segments=1
                )
                own_rows = owner[rows]
                av_r = av_r + jax.ops.segment_sum(
                    jnp.sum(new_alive_b, axis=1).astype(jnp.int32), own_rows,
                    num_segments=1,
                ) + jax.ops.segment_sum(
                    jnp.sum(send_ok, axis=1).astype(jnp.int32), own_rows,
                    num_segments=1,
                )
            outs = [av_r]
            if stage in ("C", "D", "E"):
                if stage != "C":
                    pass
                if new_alive_parts and stage in ("D", "E"):
                    outs.append(
                        jnp.concatenate(new_alive_parts + [jnp.zeros(1, bool)])
                    )
                if new_tv_parts and stage == "E":
                    seg_all = jnp.concatenate(
                        new_tv_parts + [jnp.zeros(1, jnp.uint32)]
                    )
                    outs.append(seg_all[inv_perm])
            return tuple(outs)

        return jax.jit(fn)

    for stage in ["A", "B", "C", "D", "E"]:
        timeit(f"stage {stage}", variant(stage), tv, alive, flag, eng._dev, consts)


if __name__ == "__main__":
    main()
