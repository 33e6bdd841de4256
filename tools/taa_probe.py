"""Probe: is single-axis take_along_axis vectorized (fast) on this chip?

BENCH_GATHER_AB.json showed the flat payload gather runs at a fixed
~63M elements/s regardless of operand layout — an issue-rate bound, not a
locality bound. Mosaic rejects flat int indexing in Pallas but lowers
``take_along_axis`` on either axis alone (CLAUDE.md). If one of those
single-axis forms runs orders faster than the flat gather at the same
element count, a static 3-pass Beneš-style decomposition of the rev
permutation (col-perm ∘ row-perm ∘ col-perm, each a single-axis
take_along_axis with static indices) beats the XLA gather; if both run at
the same ~63M/s, the formulation frontier is closed and the null stands.

Methodology: each rep is one jitted program of STEPS chained iterations
(output feeds the next step's indices, so nothing can be elided), timed
end-to-end best-of-N — same differential discipline as gather_ab_bench.

Writes BENCH_TAA_PROBE.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS = 8
REPS = 5
N = 1 << 26  # 67.1M elements, ~the s21 slot count scale
C = 512  # lanes


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from fuzzypatternmatching_tpu.utils.jax_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache(os.path.join(REPO, ".bench_cache", "jax_cache"))
    import jax
    import jax.numpy as jnp

    R = N // C
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randint(0, 1 << 30, size=N, dtype=np.int64)
                        .astype(np.uint32))
    flat_idx = jnp.asarray(rng.randint(0, N, size=N).astype(np.int32))
    row_idx = jnp.asarray(rng.randint(0, R, size=N).astype(np.int32)
                          .reshape(R, C))
    lane_idx = jnp.asarray(rng.randint(0, C, size=N).astype(np.int32)
                           .reshape(R, C))

    def chain(body):
        def prog(t, idx):
            def step(t, _):
                out = body(t, idx)
                # feed the output back into the table: nothing elidable,
                # every pass depends on the previous one
                return (t + out.reshape(-1)).astype(jnp.uint32), out.sum(
                    dtype=jnp.uint32
                )

            _, sums = jax.lax.scan(step, t, None, length=STEPS)
            return sums

        return jax.jit(prog)

    def f_flat(t, idx):
        return t[idx]

    def f_row(t, idx):  # gather within lanes, data-dependent sublane coord
        return jnp.take_along_axis(t.reshape(R, C), idx, axis=0)

    def f_lane(t, idx):  # gather within sublanes, data-dependent lane coord
        return jnp.take_along_axis(t.reshape(R, C), idx, axis=1)

    results = {"elements": N, "steps": STEPS, "reps": REPS, "forms": {}}
    for name, body, idx in (
        ("flat_gather", f_flat, flat_idx),
        ("taa_axis0_sublane", f_row, row_idx),
        ("taa_axis1_lane", f_lane, lane_idx),
    ):
        prog = chain(body)
        t0 = time.time()
        out = jax.block_until_ready(prog(table, idx))
        first = time.time() - t0
        times = []
        for _ in range(REPS):
            t0 = time.time()
            jax.block_until_ready(prog(table, idx))
            times.append(time.time() - t0)
        best = min(times)
        per = best / STEPS
        log(f"[{name}] first {first:.1f}s, best {best:.3f}s -> "
            f"{per*1e3:.1f} ms/pass, {N/per/1e6:.0f}M elem/s")
        results["forms"][name] = {
            "best_s": round(best, 4),
            "ms_per_pass": round(per * 1e3, 2),
            "elem_per_s_millions": round(N / per / 1e6, 1),
            "times": [round(t, 4) for t in times],
        }
    with open(os.path.join(REPO, "BENCH_TAA_PROBE.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
