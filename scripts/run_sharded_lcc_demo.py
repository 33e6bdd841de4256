"""Multi-process sharded-LCC demo payload (run via launch_multiprocess.py).

Every process connects to the coordinator, contributes its devices to one
global host-major mesh, builds the SAME deterministic R-MAT s11 + tree
corpus workload, and runs the distributed LCC data plane (halo exchange +
partial-OR owner combination + psum convergence counters) to the
diameter's fixpoint across processes. Process 0 checks the per-superstep
convergence trace against the host oracle and prints PASS.

This is the true multi-controller code path of the mesh engine's jitted
programs — the same program a TPU pod runs; only the coordinator address
and device kind change (scripts/tpu_pod_run.sh).

Note the scope: the jitted data plane is multi-controller clean; the
MatchEngine HOST loop (compact continuation, NLCC placement decisions)
is single-controller and is exercised on the one-process mesh instead.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    from fuzzypatternmatching_tpu.utils.dist import (
        add_distributed_args,
        apply_cpu_env,
        build_mesh,
        init_distributed,
    )

    apply_cpu_env()
    add_distributed_args(ap)
    args = ap.parse_args()
    init_distributed(args)
    import jax

    pid = jax.process_index()
    mesh = build_mesh()
    print(
        f"[proc {pid}] {jax.process_count()} processes, "
        f"{len(jax.devices())} global devices, mesh={mesh.devices.shape}",
        flush=True,
    )

    import tempfile

    from fuzzypatternmatching_tpu.generators.rmat import (
        RmatParams,
        generate_edges,
    )
    from fuzzypatternmatching_tpu.graph.csr import degree_labels, from_edges
    from fuzzypatternmatching_tpu.parallel.sharded import ShardedLccEngine
    from fuzzypatternmatching_tpu.pattern.builtin import load_tree_pattern

    parts = [
        generate_edges(
            RmatParams(seed=5489 + 3 * r, vertex_scale=11,
                       edge_count=(16 << 11) // 4, scramble=False)
        )
        for r in range(4)
    ]
    g = from_edges(
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        num_vertices=1 << 11,
    )
    labels = degree_labels(g)
    pattern, constraints = load_tree_pattern(tempfile.mkdtemp())

    eng = ShardedLccEngine(g, labels, pattern, mesh=mesh)
    state = eng.init_state()
    state, rows, died = eng.lcc_call(state, True)
    trace = [(av, ae, msgs) for av, ae, msgs, _ in rows]
    print(f"[proc {pid}] LP trace: {trace}", flush=True)

    if pid == 0:
        from fuzzypatternmatching_tpu.engine.oracle import MatchOracle

        o = MatchOracle(g, labels, pattern, [])
        r = o.run(max_iterations=1)
        want = [
            (row.active_vertices, row.active_edges, row.messages)
            for row in r.rows
            if row.phase == "LP"
        ][: len(trace)]
        assert trace == want, f"mesh trace {trace} != oracle {want}"
        print(
            f"PASS: {jax.process_count()}-process sharded LCC matches the "
            f"oracle trace ({len(trace)} supersteps)",
            flush=True,
        )


if __name__ == "__main__":
    main()
