"""True multi-process (multi-controller) launch: scripts/
launch_multiprocess.py spawns 2 OS processes, each contributing 4 virtual
CPU devices to ONE global 8-device mesh via jax.distributed, and the
sharded LCC data plane runs its halo exchanges and psum counters ACROSS
the process boundary (gloo collectives) — the same code path a TPU pod
runs (scripts/tpu_pod_run.sh), only the coordinator and device kind
change."""

import filecmp
import json
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


def test_two_process_construction_matches_single_host(tmp_path):
    """Multi-process graph construction (ipp:398-608 analog): two
    processes, each generating its own R-MAT rank slice and building the
    shards it owns via the shared-filesystem owner exchange, must produce
    shard dirs BYTE-IDENTICAL to the single-process chunked build."""
    from fuzzypatternmatching_tpu.graph.build import build_rmat_db

    single = str(tmp_path / "single")
    build_rmat_db(single, scale=12, n_ranks=4, num_shards=4)

    multi = str(tmp_path / "multi")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts",
                                         "launch_multiprocess.py"),
            "-n", "2", "--",
            sys.executable, "-m",
            "fuzzypatternmatching_tpu.cli.generate_rmat",
            "-s", "12", "-p", "4", "-o", multi,
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "2-process build:" in r.stdout

    # shard dirs byte-identical
    for shard in sorted(os.listdir(single)):
        s_dir = os.path.join(single, shard)
        if not os.path.isdir(s_dir):
            continue
        m_dir = os.path.join(multi, shard)
        assert os.path.isdir(m_dir), f"missing shard dir {shard}"
        files = sorted(os.listdir(s_dir))
        assert files == sorted(os.listdir(m_dir))
        for f in files:
            assert filecmp.cmp(
                os.path.join(s_dir, f), os.path.join(m_dir, f), shallow=False
            ), f"shard file differs: {shard}/{f}"
    # header identical up to the uuid
    with open(os.path.join(single, "meta.json")) as f:
        ma = json.load(f)
    with open(os.path.join(multi, "meta.json")) as f:
        mb = json.load(f)
    ma.pop("uuid"), mb.pop("uuid")
    assert ma == mb
    assert not os.path.exists(os.path.join(multi, ".dist_build"))
