"""Phase-level profile of the full search (warm-up + measured).

BENCH_SCALE selects the workload (default 21) — used round 5 to decompose
the s22 scaling outlier (VERDICT r04 #4) into LP device time, TP time, and
the host/other remainder per scale."""

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

from fuzzypatternmatching_tpu.engine.driver import MatchEngine
from fuzzypatternmatching_tpu.graph import storage
from fuzzypatternmatching_tpu.pattern.builtin import load_tree_pattern


def main():
    scale = int(os.environ.get("BENCH_SCALE", "21"))
    base = os.path.join(REPO, ".bench_cache", f"rmat_s{scale}")
    if os.path.exists(os.path.join(base, "meta.json")):
        g, labels, _ = storage.load(base)
    else:
        import bench

        g, labels = bench.build_or_load_graph(scale)
    pat, cons = load_tree_pattern(tempfile.mkdtemp())
    eng = MatchEngine(g, labels, pat, cons)
    t0 = time.time()
    eng.run()
    print(f"warmup {time.time()-t0:.1f}s", flush=True)
    for i in range(2):
        t0 = time.time()
        r = eng.run()
        total = time.time() - t0
        lp = sum(x.seconds for x in r.rows if x.phase == "LP")
        tp = sum(x.seconds for x in r.rows if x.phase == "TP")
        print(f"measured {total:.2f}s | LP {lp:.2f}s | TP {tp:.2f}s | "
              f"other {total-lp-tp:.2f}s")
        for x in r.rows:
            if x.phase == "TP" or x.step == 0:
                print(f"  itr{x.itr} {x.phase} {x.step}: t={x.seconds:.2f}")
    # function-level profile of a steady-state run (closure cache warm)
    import cProfile
    import pstats

    prof = cProfile.Profile()
    prof.enable()
    eng.run()
    prof.disable()
    pstats.Stats(prof).sort_stats("cumulative").print_stats(35)


if __name__ == "__main__":
    main()
