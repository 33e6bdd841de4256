"""Communication micro-benchmark — the mailbox rate test analog.

The reference measures visitor messages/second through its MPI mailbox
(src/mailbox_rate_test.cpp, new_mailbox_rate_test.cpp). The equivalent
exchange primitive here is the per-superstep all_gather of per-vertex state
over the device mesh (plus psum for the termination counters); this tool
measures their achieved bandwidth/latency on the current devices.

Usage:
  python -m fuzzypatternmatching_tpu.cli.comm_rate_test [-n bytes] [-i iters]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="collective rate test")
    ap.add_argument("-n", "--bytes", type=int, default=1 << 22,
                    help="payload bytes per device")
    ap.add_argument("-i", "--iters", type=int, default=20)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    n = len(devs)
    mesh = Mesh(np.array(devs), ("x",))
    per_dev = args.bytes // 4
    x = jax.device_put(
        np.zeros((n, per_dev), dtype=np.float32),
        NamedSharding(mesh, P("x", None)),
    )

    @jax.jit
    @partial_shard_map(mesh)
    def gather_and_sum(x):
        full = jax.lax.all_gather(x[0], "x", tiled=True)
        return jax.lax.psum(jnp.sum(full), "x")[None]

    # warm up
    gather_and_sum(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = gather_and_sum(x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / args.iters
    moved = args.bytes * (n - 1)  # bytes received per device per all_gather
    print(
        f"devices={n} payload={args.bytes/2**20:.1f}MiB/dev "
        f"all_gather+psum latency={dt*1e3:.2f}ms "
        f"bw={moved/dt/2**30:.2f}GiB/s/dev"
    )


def partial_shard_map(mesh):
    import jax
    from jax.sharding import PartitionSpec as P

    def deco(f):
        return jax.shard_map(
            f, mesh=mesh, in_specs=(P("x", None),), out_specs=P("x")
        )

    return deco


if __name__ == "__main__":
    main()
