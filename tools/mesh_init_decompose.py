"""Decompose the mesh plane's n=1 device programs (VERDICT r04 #1/#2).

Round 4 measured the mesh init program at 390 ms and the continuation
superstep at ~1.8 s device compute (BENCH_SHARDED_CHIP.json) with no
committed breakdown. Round 5 rebuilt the plane's slot space as ELL
buckets (parallel/sharded.py); this measures WHERE the remaining time
goes by compiling ablated variants of the real shard_map programs (the
BENCH_INIT_DECOMPOSE.json technique: ablations may compute wrong values,
their cost is exact):

  init_full        — the production init call (superstep + packed
                     mirrors + counters), n_steps=1
  init_no_pack     — packbits/tv16/live16 transfer mirrors dropped
  init_no_alive    — the S-sized new_alive output also dropped (counters
                     keep their per-bucket planes; the write is DCE'd)
  init_tv_only     — only new_tv survives (alive + counters + mirrors
                     dropped): the irreducible label-replay + seg-OR +
                     owner-exchange core
  cont_full        — ONE continuation superstep (payload build + rev
                     gather + seg machinery + exchanges). CAVEAT: the
                     measured round-5 value (0.1 ms) is the known bogus
                     isolated-microbench artifact of the remote relay
                     (CLAUDE.md) — continuation cost must be taken from
                     end-to-end full_plane walls (BENCH_SHARDED_CHIP),
                     where it is ~(wall - init - dispatches)/supersteps.

Writes BENCH_MESH_DECOMPOSE.json. Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/mesh_init_decompose.py
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from fuzzypatternmatching_tpu.utils.jax_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache(os.path.join(REPO, ".bench_cache", "jax_cache"))
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax.sharding import Mesh, PartitionSpec as P

    from fuzzypatternmatching_tpu.graph import storage
    from fuzzypatternmatching_tpu.parallel.sharded import ShardedLccEngine
    from fuzzypatternmatching_tpu.pattern.builtin import load_tree_pattern
    from fuzzypatternmatching_tpu.graph.csr import degree_labels

    scale = int(os.environ.get("BENCH_SCALE", "21"))
    base = os.path.join(REPO, ".bench_cache", f"rmat_s{scale}")
    if os.path.exists(os.path.join(base, "meta.json")):
        g, labels, _ = storage.load(base)
    else:
        import bench

        g, labels = bench.build_or_load_graph(scale)
    if labels is None:
        labels = degree_labels(g)
    pattern, _cons = load_tree_pattern(tempfile.mkdtemp())
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    eng = ShardedLccEngine(g, labels, pattern, mesh=mesh)
    log(f"V={g.num_vertices} E={g.num_edges} S={eng.S} "
        f"buckets={[(w, nb) for (_we, w, _o, nb, _ro) in eng.ell_buckets]}")

    sh = P("x", None)
    sh3 = P("x", None, None)
    op_specs = tuple(sh3 if o.ndim == 3 else sh for o in eng._ops)

    def make(init, outputs):
        def call(tv, alive, flag, ops):
            new_tv, new_alive, new_flag, st = jax.shard_map(
                partial(eng._superstep_spmd, init=init),
                mesh=mesh,
                in_specs=(sh, sh, sh, op_specs),
                out_specs=(sh, sh, sh, (P(), P(), P(), P())),
            )(tv, alive, flag, ops)
            out = []
            if "tv" in outputs:
                out.append(new_tv)
            if "alive" in outputs:
                out.append(new_alive)
            if "stats" in outputs:
                out.append(jnp.concatenate(
                    [st[0], st[1], st[2], st[3].astype(jnp.int32).reshape(1)]
                ))
            if "pack" in outputs:
                packed, tv16, live16 = jax.shard_map(
                    lambda a, t: (
                        jnp.packbits(a.reshape(-1))[None],
                        t.reshape(-1).astype(jnp.uint16)[None],
                        jnp.packbits(t.reshape(-1) != 0)[None],
                    ),
                    mesh=mesh, in_specs=(sh, sh), out_specs=(sh, sh, sh),
                )(new_alive, new_tv)
                out += [packed, tv16, live16]
            return tuple(out)

        return jax.jit(call)

    st0 = eng.init_state()
    tv0 = eng.label_tv
    variants = {
        "init_full": (True, ("tv", "alive", "stats", "pack")),
        "init_no_pack": (True, ("tv", "alive", "stats")),
        "init_no_alive": (True, ("tv", "stats")),
        "init_tv_only": (True, ("tv",)),
        "cont_full": (False, ("tv", "alive", "stats")),
    }
    results = {}
    out_path = os.path.join(REPO, "BENCH_MESH_DECOMPOSE.json")
    if os.path.exists(out_path):
        with open(out_path) as f:
            results.update(json.load(f).get("variants", {}))
    # a continuation input state: the init superstep's own output
    init_fn = make(True, ("tv", "alive"))
    tv1, alive1 = init_fn(tv0, st0.edge_alive, st0.tp_flag, eng._ops)
    jax.block_until_ready((tv1, alive1))
    for name, (init, outputs) in variants.items():
        fn = make(init, outputs)
        tv_in = tv0 if init else tv1
        al_in = st0.edge_alive if init else alive1
        t0 = time.time()
        r = fn(tv_in, al_in, st0.tp_flag, eng._ops)
        jax.block_until_ready(r)
        compile_s = time.time() - t0
        times = []
        for _ in range(5):
            t0 = time.time()
            r = fn(tv_in, al_in, st0.tp_flag, eng._ops)
            jax.block_until_ready(r)
            times.append((time.time() - t0) * 1e3)
        results[name] = {
            "best_ms": round(min(times), 1),
            "times_ms": [round(t, 1) for t in times],
            "compile_s": round(compile_s, 1),
        }
        log(f"{name}: best {results[name]['best_ms']} ms "
            f"(compile {compile_s:.0f}s)")
    try:
        commit = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        commit = "unknown"
    with open(out_path, "w") as f:
        json.dump(
            {
                "metric": f"mesh-plane (n=1) program ablations, R-MAT "
                          f"s{scale}, one real chip (best of 5, warm)",
                "ell_buckets": [
                    {"width": w, "rows": nb}
                    for (_we, w, _o, nb, _ro) in eng.ell_buckets
                ],
                "S": eng.S,
                "commit": commit,
                "variants": results,
            },
            f, indent=1,
        )
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
