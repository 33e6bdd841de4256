"""A/B: pallas-fused vs XLA bucketed superstep, full s21 search.

Micro-benchmarks through the remote-compile relay report bogus numbers
(CLAUDE.md), so this measures the only trustworthy way: the COMPLETE
LCC+NLCC search end-to-end with each engine variant, same process, same
cached graph. Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/pallas_ab_bench.py

Prints one JSON line with both timings; writes nothing else. The probe
failure mode (Mosaic rejecting the VMEM-table dynamic gather) is reported
explicitly — that is the committed measurement either way.
"""

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(REPO, ".bench_cache", "jax_cache"),
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    scale = int(os.environ.get("BENCH_SCALE", "21"))
    from bench import build_or_load_graph

    from fuzzypatternmatching_tpu.engine.driver import MatchEngine
    from fuzzypatternmatching_tpu.ops.lcc_superstep import pallas_supported
    from fuzzypatternmatching_tpu.pattern.builtin import load_tree_pattern

    supported = pallas_supported()
    log(f"pallas VMEM-gather probe on {jax.default_backend()}: {supported}")
    g, labels = build_or_load_graph(scale)
    pattern, constraints = load_tree_pattern(tempfile.mkdtemp())

    results = {"scale": scale, "pallas_supported": supported}
    for name, flag in (("xla", False), ("pallas", True)):
        if flag and not supported:
            results["pallas_seconds"] = None
            results["note"] = "Mosaic rejected the VMEM-table dynamic gather"
            break
        engine = MatchEngine(g, labels, pattern, constraints, lcc_pallas=flag)
        log(f"[{name}] warm-up (compile)...")
        t0 = time.time()
        r = engine.run()
        log(
            f"[{name}] warm-up {time.time()-t0:.1f}s "
            f"traversed={r.traversed_edges} active={len(r.active_vertices)} "
            f"subgraphs={sum(len(v) for v in r.subgraphs.values())}"
        )
        t0 = time.time()
        r = engine.run()
        dt = time.time() - t0
        log(f"[{name}] measured {dt:.2f}s")
        results[f"{name}_seconds"] = round(dt, 3)
        results[f"{name}_traversed"] = r.traversed_edges
        results[f"{name}_anchors"] = [
            len(r.active_vertices),
            sum(len(v) for v in r.subgraphs.values()),
        ]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
