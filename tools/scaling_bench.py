"""Scaling harness: LCC superstep throughput across mesh sizes.

Measures the sharded engine's superstep time at 1..N devices on the same
graph (weak or strong scaling) and reports parallel efficiency. On this
box only virtual CPU devices are available beyond one chip, so CPU numbers
are *harness validation*, not performance claims; on a real pod slice the
same script measures ICI scaling (the driver's dryrun validates the
program compiles/executes for arbitrary mesh sizes).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python tools/scaling_bench.py [-s scale] [-d 1,2,4,8]
"""

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--scale", type=int, default=14)
    ap.add_argument("-d", "--devices", default="1,2,4,8")
    ap.add_argument("-i", "--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    # sitecustomize imports jax before env vars apply on this box
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from fuzzypatternmatching_tpu.generators.rmat import rmat_all_ranks
    from fuzzypatternmatching_tpu.graph.csr import degree_labels, from_edges
    from fuzzypatternmatching_tpu.parallel.sharded import ShardedLccEngine
    from fuzzypatternmatching_tpu.pattern.builtin import load_tree_pattern

    scale = args.scale
    scramble = scale >= 17
    src, dst = rmat_all_ranks(scale=scale, n_ranks=4, scramble=scramble)
    g = from_edges(src, dst, num_vertices=1 << scale)
    labels = degree_labels(g)
    pattern, _ = load_tree_pattern(tempfile.mkdtemp())
    print(f"graph: V={g.num_vertices} E={g.num_edges} "
          f"devices available: {len(jax.devices())}")

    base = None
    for n in [int(x) for x in args.devices.split(",")]:
        if n > len(jax.devices()):
            print(f"n={n}: skipped (not enough devices)")
            continue
        eng = ShardedLccEngine(g, labels, pattern, num_devices=n)
        st = eng.init_state()
        st, rows, _ = eng.lcc_call(st, True)  # warm-up/compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, rows, _ = eng.lcc_call(st, False)
        jax.block_until_ready(out.tv)
        dt = (time.perf_counter() - t0) / args.iters / max(len(rows), 1)
        if base is None:
            base = dt
        eff = base / (dt * n) * 100
        print(
            f"n={n}: {dt*1e3:.1f} ms/superstep  speedup={base/dt:.2f}x  "
            f"efficiency={eff:.0f}%"
        )


if __name__ == "__main__":
    main()
