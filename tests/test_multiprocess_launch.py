"""True multi-process (multi-controller) launch: scripts/
launch_multiprocess.py spawns 2 OS processes, each contributing 4 virtual
CPU devices to ONE global 8-device mesh via jax.distributed, and the
sharded LCC data plane runs its halo exchanges and psum counters ACROSS
the process boundary (gloo collectives) — the same code path a TPU pod
runs (scripts/tpu_pod_run.sh), only the coordinator and device kind
change."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_sharded_lcc_matches_oracle():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the launcher sets per-process device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts",
                                         "launch_multiprocess.py"),
            "-n", "2", "--devices-per-proc", "4", "--",
            sys.executable, os.path.join(REPO, "scripts",
                                         "run_sharded_lcc_demo.py"),
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "2 processes, 8 global devices" in r.stdout
    assert "PASS: 2-process sharded LCC matches the oracle trace" in r.stdout
