"""Decompose the 83 ms init superstep (VERDICT r03 #2).

The production search's only device compute is the bucketed init
superstep (engine/lcc_bucketed.py _superstep init=True), measured at
~83 ms at s21 against a ~6 ms streaming SOL (docs/ROOFLINE.md). This
measures WHERE the time goes by compiling ablated variants of the real
program (same technique as BENCH_GATHER_FORMULATION.json: stand-in
inputs keep every op statically shaped — values may be wrong in an
ablation, its cost is exact):

  full          — the production init call (1 superstep + packed outputs)
  no_exit_perm  — the V-sized seg_all[inv_perm] exit gather dropped
                  (outputs re-expressed so XLA dead-code-eliminates it)
  no_entry_seg  — the V-sized label_tv[seg_rows] entry gather replaced
                  by a precomputed per-bucket constant (exact at the
                  global init step, where tv == label_tv)
  neither       — both V-sized gathers removed
  no_pack       — packbits/combo outputs dropped (transfer-prep cost)

Hypothesis under test: the two V-sized arbitrary gathers (~2.1M elements
each) pay the measured ~63M elem/s TPU gather issue-rate wall — ~33 ms
each — and dominate the 83 ms.

Writes BENCH_INIT_DECOMPOSE.json. Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/init_decompose.py
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


class _TvShim:
    """Stands in for the vertex-ordered tv array: ``tv[seg_rows]``
    returns the precomputed per-bucket constant instead of gathering.
    Valid only at the global init step (tv == label_tv)."""

    def __init__(self, const_by_id):
        self.const_by_id = const_by_id

    def __getitem__(self, idx):
        return self.const_by_id[id(idx)]


def main():
    from fuzzypatternmatching_tpu.utils.jax_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache(os.path.join(REPO, ".bench_cache", "jax_cache"))
    import jax
    import jax.numpy as jnp

    import bench
    from fuzzypatternmatching_tpu.engine.lcc_bucketed import BucketedLccEngine
    from fuzzypatternmatching_tpu.pattern.builtin import load_tree_pattern

    scale = int(os.environ.get("BENCH_SCALE", "21"))
    g, labels = bench.build_or_load_graph(scale)
    pattern, _ = load_tree_pattern(tempfile.mkdtemp())
    eng = BucketedLccEngine(g, labels, pattern)
    consts = {
        "owner": eng.owner,
        "inv_perm": eng._inv_perm,
        "label_tv": eng.label_tv,
    }
    lab_tv_np = eng._label_tv_np
    seg_tv_np = [
        lab_tv_np[b.seg_rows].astype(np.uint32) for b in eng.buckets
    ]
    seg_tv_dev = [jnp.asarray(x) for x in seg_tv_np]

    def make_variant(entry_const: bool, exit_perm: bool, pack: bool,
                     counters: bool = True, alive_path: bool = True):
        def call(tv, alive, flag, bucket_arrays, consts, seg_consts):
            if entry_const:
                tv_in = _TvShim(
                    {
                        id(ba[5]): c
                        for ba, c in zip(bucket_arrays, seg_consts)
                    }
                )
            else:
                tv_in = tv
            tv2, alive2, _flag2, st = eng._superstep(
                tv_in, alive, flag, bucket_arrays, consts, init=True
            )
            out = []
            if pack and alive_path:
                out.append(jnp.packbits(alive2))
            if pack:
                # live-rows bitmap: over tv2 when the exit gather is
                # kept, over a same-sized stand-in when ablated (cost
                # identical, values unused)
                out.append(jnp.packbits((tv2 if exit_perm else tv) != 0))
            if exit_perm and not pack:
                out.append(tv2)
            if counters:
                # av only: ae/msg (and new_alive when alive_path=False)
                # dead-code-eliminate
                out.append(st[0])
                if alive_path:
                    out.append(st[1])
                    out.append(st[2])
            elif not out:
                out.append(tv2)
            return tuple(out)

        return jax.jit(call)

    VARIANTS = {
        "full": (False, True, True),
        "no_exit_perm": (False, False, True),
        "no_entry_seg": (True, True, True),
        "neither": (True, False, True),
        "no_pack": (False, True, False),
        # residual-core ablations (round-4 second pass)
        "no_counters": (False, True, True, False),
        "no_alive_path": (False, True, True, True, False),
        "tv_only": (True, False, False, False, False),
    }
    want = os.environ.get("INIT_DECOMPOSE_VARIANTS")
    if want:
        VARIANTS = {k: v for k, v in VARIANTS.items() if k in want.split(",")}
    st0 = eng.init_state()
    results = {}
    prev_path = os.path.join(REPO, "BENCH_INIT_DECOMPOSE.json")
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            results.update(json.load(f).get("variants", {}))
    for name, spec in VARIANTS.items():
        fn = make_variant(*spec)
        log(f"[{name}] compile...")
        t0 = time.time()
        out = fn(consts["label_tv"], st0.alive, st0.tp_flag, eng._dev,
                 consts, seg_tv_dev)
        jax.block_until_ready(out)
        log(f"[{name}] compiled+first in {time.time()-t0:.1f}s")
        times = []
        for _ in range(5):
            t0 = time.time()
            out = fn(consts["label_tv"], st0.alive, st0.tp_flag, eng._dev,
                     consts, seg_tv_dev)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        results[name] = {
            "best_ms": round(min(times) * 1e3, 1),
            "times_ms": [round(t * 1e3, 1) for t in times],
        }
        log(f"[{name}] best {results[name]['best_ms']} ms")

    # --- the PRODUCTION init program (what bench.py's search actually
    # dispatches: _call_init1_seg via lcc_call) — measured directly and
    # recorded commit-stamped as the roofline floor bench.py reads
    # (advisor round-4 finding: a hardcoded floor silently goes stale)
    log("[production] warm-up...")
    eng.lcc_call(eng.init_state(), True, n_steps=1)
    times = []
    for _ in range(5):
        t0 = time.time()
        st = eng.lcc_call(eng.init_state(), True, n_steps=1)
        # lcc_call pulls the combo buffer synchronously; timing includes
        # the V/8-byte download, like the production search does
        times.append(time.time() - t0)
    production = {
        "best_ms": round(min(times) * 1e3, 1),
        "times_ms": [round(t * 1e3, 1) for t in times],
    }
    log(f"[production] best {production['best_ms']} ms")

    import subprocess

    try:
        commit = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        commit = "unknown"
    prev_floor = {}
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            prev_floor = json.load(f).get("production_floor", {})
    prev_floor[str(scale)] = {**production, "commit": commit}
    out = {
        "metric": f"bucketed init-superstep ablations, R-MAT s{scale}, "
                  "one real chip (best of 5, warm program)",
        "variants": results,
        "production_floor": prev_floor,
        "note": "no_exit_perm drops the V-sized seg_all[inv_perm] "
                "gather; no_entry_seg replaces the V-sized tv[seg_rows] "
                "gather with a precomputed constant; no_pack drops the "
                "packbits transfer-prep outputs. production_floor times "
                "the real lcc_call init program incl. the combo download "
                "(bench.py reads it as roofline_floor_seconds).",
    }
    with open(os.path.join(REPO, "BENCH_INIT_DECOMPOSE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
