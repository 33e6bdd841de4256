"""Formulation probe for the payload gather, inside the REAL superstep.

BENCH_GATHER_AB.json showed the flat gather is issue-rate-bound
(~63M slots/s, layout-insensitive). BENCH_TAA_PROBE.json demonstrated (again)
that toy programs report bogus times through the relay, so this probe embeds
each candidate formulation into the full bucketed-superstep pipeline
(payload build -> GATHER -> accept -> row OR-reduce -> keep -> alive update,
8-step lax.scan — the same shape as tools/gather_ab_bench.py, whose numbers
are reproducible to ±0.1%) and compares wall times. Candidate gathers use
arbitrary static indices — values are wrong, but every op is statically
shaped and data-independent, so the COST is exact.

Variants:
  flat     — payload_pad[rev]: the production gather (control; must
             reproduce ~1443 ms/superstep at s21)
  seq      — a sequential same-volume read (roll by 1): everything-else
             cost; flat - seq = the gather's true marginal cost
  taa1     — one take_along_axis(axis=0) pass over a [R, 512] view:
             the per-pass cost of the single-axis form Mosaic lowers
  taa3     — three passes (axis0, axis1, axis0): the Benes/Hall
             decomposition stand-in — ANY static permutation factors into
             col-perm . row-perm . col-perm, so this is the real cost a
             routed two-level gather would pay

Writes BENCH_GATHER_FORMULATION.json.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS = 8
REPS = 5
C = 512


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from fuzzypatternmatching_tpu.utils.jax_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache(os.path.join(REPO, ".bench_cache", "jax_cache"))
    import jax
    import jax.numpy as jnp

    from fuzzypatternmatching_tpu.engine.lcc_bucketed import BucketedLccEngine
    from fuzzypatternmatching_tpu.graph import storage
    from fuzzypatternmatching_tpu.pattern.pattern_graph import PatternGraph

    scale = int(os.environ.get("BENCH_SCALE", "21"))
    base = os.path.join(REPO, ".bench_cache", f"rmat_s{scale}")
    if os.path.exists(os.path.join(base, "meta.json")):
        g, labels, _ = storage.load(base)
    else:
        import bench

        g, labels = bench.build_or_load_graph(scale)
    # the uniform non-pruning workload of gather_ab_bench
    upat = PatternGraph(
        vertex_count=2, edge_count=2, row_ptr=np.array([0, 1, 2]),
        cols=np.array([1, 0]), vertex_data=np.array([7, 7], dtype=np.uint64),
        diameter=2,
    )
    ulabels = np.full(g.num_vertices, 7, dtype=np.uint64)
    eng = BucketedLccEngine(g, ulabels, upat)
    S = eng.num_slots
    log(f"V={g.num_vertices} E={g.num_edges} slots={S}")

    # static index sets for the stand-ins
    rng = np.random.RandomState(0)
    Spad = S + 1
    R = -(-Spad // C)
    colperm0 = jnp.asarray(rng.randint(0, R, size=(R, C)).astype(np.int32))
    rowperm = jnp.asarray(rng.randint(0, C, size=(R, C)).astype(np.int32))
    colperm1 = jnp.asarray(rng.randint(0, R, size=(R, C)).astype(np.int32))
    k = eng.k
    adj_all = eng.adj_all
    mand = eng.mand

    def build_payload(tv, alive, dev):
        parts = []
        for bkt, (rows, adj, rev, valid, seg_id, seg_rows, _c) in zip(
            eng.buckets, dev
        ):
            n, w = bkt.adj.shape
            base_ = bkt.slot_base
            tv_rows = tv[seg_rows][seg_id]
            own_alive = alive[base_ : base_ + n * w].reshape(n, w)
            parts.append(
                (
                    jnp.where(own_alive, jnp.uint32(0x80000000), jnp.uint32(0))
                    | tv_rows[:, None]
                ).reshape(-1)
            )
        return jnp.concatenate(parts + [jnp.zeros(1, dtype=jnp.uint32)])

    def gathered(payload_pad, mode, perms):
        cp0, rp, cp1 = perms
        if mode == "seq":
            x = jnp.roll(payload_pad, 1)
        elif mode == "taa1":
            x2 = jnp.pad(payload_pad, (0, R * C - Spad)).reshape(R, C)
            x2 = jnp.take_along_axis(x2, cp0, axis=0)
            x = x2.reshape(-1)[:Spad]
        elif mode == "taa3":
            x2 = jnp.pad(payload_pad, (0, R * C - Spad)).reshape(R, C)
            x2 = jnp.take_along_axis(x2, cp0, axis=0)
            x2 = jnp.take_along_axis(x2, rp, axis=1)
            x2 = jnp.take_along_axis(x2, cp1, axis=0)
            x = x2.reshape(-1)[:Spad]
        else:
            raise ValueError(mode)
        return x

    def make_prog(mode):
        def superstep(tv, alive, dev, perms, inv_perm):
            payload_pad = build_payload(tv, alive, dev)
            pre = None
            if mode != "flat":
                pre = gathered(payload_pad, mode, perms)
            new_tv_parts = []
            new_alive_parts = []
            for bkt, (rows, adj, rev, valid, seg_id, seg_rows, _c) in zip(
                eng.buckets, dev
            ):
                n, w = bkt.adj.shape
                base_ = bkt.slot_base
                if mode == "flat":
                    p = payload_pad[rev]
                else:
                    p = jax.lax.dynamic_slice_in_dim(
                        pre, base_, n * w
                    ).reshape(n, w)
                p_bits = p & jnp.uint32(0x7FFFFFFF)
                send_ok = (p_bits != 0) & (p >= jnp.uint32(0x80000000))
                p_bits = jnp.where(send_ok, p_bits, jnp.uint32(0))
                tv_seg = tv[seg_rows]
                m = jnp.zeros_like(tv_seg)
                for i in range(k):
                    m = m | jnp.where(
                        (tv_seg >> i) & 1 != 0, adj_all[i], jnp.uint32(0)
                    )
                accept = (p_bits & m[seg_id][:, None]) != 0
                pa = jnp.where(accept, p_bits, jnp.uint32(0))
                tn_rows = jax.lax.reduce(
                    pa, np.uint32(0), jax.lax.bitwise_or, dimensions=[1]
                )
                n_seg = len(bkt.seg_rows)
                if n_seg != n:
                    tn = eng._segment_or(tn_rows, seg_id, n_seg)
                else:
                    tn = tn_rows
                keep = jnp.zeros_like(tn)
                for i in range(k):
                    ok = (mand[i] & ~tn) == 0
                    keep = keep | jnp.where(
                        ok, jnp.uint32(1 << i), jnp.uint32(0)
                    )
                new_tv_seg = tv_seg & keep
                row_live = (new_tv_seg != 0)[seg_id]
                own_alive = alive[base_ : base_ + n * w].reshape(n, w)
                new_alive_parts.append(
                    (own_alive & accept & row_live[:, None]).reshape(-1)
                )
                new_tv_parts.append(new_tv_seg)
            new_alive = jnp.concatenate(
                new_alive_parts + [jnp.zeros(1, dtype=bool)]
            )
            seg_all = jnp.concatenate(
                new_tv_parts + [jnp.zeros(1, dtype=jnp.uint32)]
            )
            new_tv = seg_all[inv_perm]
            return new_tv, new_alive

        def prog(tv, alive, dev, perms, inv_perm_a):
            def step(carry, _):
                tv, alive = carry
                tv, alive = superstep(tv, alive, dev, perms, inv_perm_a)
                return (tv, alive), jnp.sum(alive, dtype=jnp.int32)

            (tv, alive), sums = jax.lax.scan(
                step, (tv, alive), None, length=STEPS
            )
            return tv, alive, sums

        return jax.jit(prog)

    tv0 = eng.label_tv
    alive0 = jnp.ones(S + 1, dtype=bool)
    perms = (colperm0, rowperm, colperm1)
    results = {"scale": scale, "slots": S, "steps": STEPS, "forms": {}}
    for mode in ("flat", "seq", "taa1", "taa3"):
        prog = make_prog(mode)
        args = (tv0, alive0, eng._dev, perms, eng._inv_perm)
        t0 = time.time()
        out = jax.block_until_ready(prog(*args))
        first = time.time() - t0
        times = []
        for _ in range(REPS):
            t0 = time.time()
            jax.block_until_ready(prog(*args))
            times.append(time.time() - t0)
        best = min(times)
        log(f"[{mode}] first {first:.1f}s, best {best:.3f}s -> "
            f"{best/STEPS*1e3:.1f} ms/superstep (alive sums tail "
            f"{np.asarray(out[2])[-1]})")
        results["forms"][mode] = {
            "best_s": round(best, 4),
            "ms_per_superstep": round(best / STEPS * 1e3, 2),
            "times": [round(t, 4) for t in times],
        }
    with open(os.path.join(REPO, "BENCH_GATHER_FORMULATION.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
