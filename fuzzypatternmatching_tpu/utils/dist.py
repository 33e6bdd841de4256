"""Multi-host process environment — the TPU-native environment.hpp.

The reference splits MPI_COMM_WORLD into world / node-local / node-offset
communicators by hostname (environment.hpp:136-240) so its mailbox can use
shared memory intra-node and MPI inter-node. The JAX runtime owns that
layering natively: ``jax.distributed.initialize`` connects the processes of
a multi-host run, ``jax.devices()`` then lists every chip in the slice, and
XLA routes each collective over ICI within a host/slice and DCN across
hosts — the two-level mailbox falls out of device ordering, not code.

What this module provides:

* ``add_distributed_args`` / ``init_distributed`` — CLI plumbing for
  multi-process launches (the ``havoqgt_init`` analog). Single-process runs
  skip initialization entirely.
* ``build_mesh`` — the 1-D graph-partition mesh over all (global) devices,
  ordered host-major so that adjacent vertex blocks land on the same host:
  the LCC halo exchanges and NLCC token routing between neighboring blocks
  then ride ICI, and only far-block traffic crosses DCN (the ICI/DCN
  analog of the node-local/node-offset split). An explicit 2-D
  (host × chip) mesh is also available for collectives that want the axes
  separate (e.g. hierarchical reductions in tools/scaling_bench.py).

Validated on the virtual CPU mesh (tests/test_dist.py); real multi-host
hardware is not present in CI, but the code path is the same — only the
coordinator address changes.
"""

from __future__ import annotations

import numpy as np


def apply_cpu_env() -> None:
    """Honor ``FPM_VIRTUAL_CPU_DEVICES`` (set by scripts/
    launch_multiprocess.py): switch this process to the CPU backend with
    that many virtual devices. Must run before the first backend use; safe
    no-op when the variable is absent."""
    import os

    n = os.environ.get("FPM_VIRTUAL_CPU_DEVICES")
    if not n:
        return
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def add_distributed_args(ap) -> None:
    g = ap.add_argument_group("distributed (multi-host)")
    g.add_argument(
        "--distributed", action="store_true",
        help="initialize jax.distributed (multi-process / multi-host run)",
    )
    g.add_argument(
        "--coordinator", default=None,
        help="coordinator address host:port (default: JAX auto-detect, e.g. "
             "on Cloud TPU pods)",
    )
    g.add_argument(
        "--num-processes", type=int, default=None,
        help="total process count (default: auto-detect)",
    )
    g.add_argument(
        "--process-id", type=int, default=None,
        help="this process's id (default: auto-detect)",
    )


def init_distributed(args) -> None:
    """havoqgt_init analog: connect this process to the multi-host run."""
    if not getattr(args, "distributed", False):
        return
    import jax

    kwargs = {}
    if args.coordinator is not None:
        kwargs["coordinator_address"] = args.coordinator
    if args.num_processes is not None:
        kwargs["num_processes"] = args.num_processes
    if args.process_id is not None:
        kwargs["process_id"] = args.process_id
    jax.distributed.initialize(**kwargs)


def build_mesh(num_devices: int | None = None, two_d: bool = False):
    """The graph-partition mesh over all global devices, host-major.

    ``two_d=False`` (default): 1-D mesh ("x",) — what ShardedLccEngine /
    ShardedNlcc consume. Host-major ordering keeps neighboring vertex
    blocks on one host so boundary all_to_all traffic prefers ICI.
    ``two_d=True``: ("host", "chip") mesh exposing the DCN/ICI axes
    separately.
    """
    import jax
    from jax.sharding import Mesh

    devs = sorted(
        jax.devices(), key=lambda d: (d.process_index, d.id)
    )
    if num_devices is not None:
        devs = devs[:num_devices]
    if not two_d:
        return Mesh(np.array(devs), ("x",))
    n_hosts = len({d.process_index for d in devs})
    per_host = len(devs) // n_hosts
    grid = np.array(devs[: n_hosts * per_host]).reshape(n_hosts, per_host)
    return Mesh(grid, ("host", "chip"))
