"""Multi-process launcher — the cluster-script analog (ref scripts/
quartz.llnl.gov/*, which srun the MPI binaries; here the runtime is
jax.distributed instead of MPI).

Spawns N local processes, each connected to one coordinator, and runs the
given command in every process with the distributed flags appended
(``--distributed --coordinator ... --num-processes N --process-id i`` — the
flags every CLI in this package accepts via utils/dist.add_distributed_args).
On CPU it forces ``--xla_force_host_platform_device_count`` per process so
an M-device global mesh spans the processes — the same code path a real
multi-host TPU pod runs, only the coordinator address and device kind
change (see scripts/tpu_pod_run.sh for the pod recipe).

Examples:

  # 2 processes x 4 virtual CPU devices = one 8-device global mesh
  python scripts/launch_multiprocess.py -n 2 --devices-per-proc 4 -- \
      python scripts/run_sharded_lcc_demo.py

  # the full search CLI, sharded over 2 processes
  python scripts/launch_multiprocess.py -n 2 --devices-per-proc 4 -- \
      python -m fuzzypatternmatching_tpu.cli.run_pattern_matching \
      -i /tmp/db -p examples/patterns -o /tmp/out --lcc-engine sharded
"""

import argparse
import os
import socket
import subprocess
import sys


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="spawn an N-process jax.distributed run"
    )
    ap.add_argument("-n", "--num-processes", type=int, required=True)
    ap.add_argument(
        "--devices-per-proc", type=int, default=None,
        help="force this many virtual CPU devices per process "
             "(omit on real TPU hosts — the chips are auto-detected)",
    )
    ap.add_argument(
        "--coordinator", default=None,
        help="host:port (default: 127.0.0.1:<free port> for local runs)",
    )
    ap.add_argument("command", nargs=argparse.REMAINDER,
                    help="command to run in every process (prefix with --)")
    args = ap.parse_args(argv)
    cmd = args.command
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (append it after --)")
    coord = args.coordinator or f"127.0.0.1:{free_port()}"

    procs = []
    for pid in range(args.num_processes):
        env = dict(os.environ)
        if args.devices_per_proc:
            # consumed by fuzzypatternmatching_tpu.utils.dist.apply_cpu_env
            # INSIDE the payload (on this image a sitecustomize imports jax
            # at interpreter start, so backend flags must be applied by the
            # script before first backend use, not via spawn env)
            env["FPM_VIRTUAL_CPU_DEVICES"] = str(args.devices_per_proc)
        full = cmd + [
            "--distributed", "--coordinator", coord,
            "--num-processes", str(args.num_processes),
            "--process-id", str(pid),
        ]
        procs.append(subprocess.Popen(full, env=env))
    rc = 0
    for pid, p in enumerate(procs):
        r = p.wait()
        if r != 0:
            print(f"process {pid} exited with {r}", file=sys.stderr)
            rc = rc or r
    return rc


if __name__ == "__main__":
    sys.exit(main())
