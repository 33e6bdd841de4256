"""Measured communication-volume scaling curve (VERDICT r03 #6).

Wall-clock scaling on the 2-core virtual mesh is memory-bandwidth-bound
noise (SCALING_r02.json), but the COMMUNICATION VOLUME of the mesh data
plane is exactly measurable on any backend: the three per-superstep
all_to_alls move statically-constructed index lists, and
ShardedLccEngine.comm_stats records, per device, the useful entries each
exchange moves (split intra-/cross-device) plus the padded wire slab
sizes and the cut-edge counts — the send/recv accounting the reference
keeps in its mailbox counters (new_mailbox.hpp print_stats).

This sweeps n = 1/2/4/8 over s14-s17 on the virtual CPU mesh, writes
SCALING_r04.json, and reports the empirical O((V+E)/n + cut) curve:
per-device useful volume should fall ~1/n while the cross fraction
(the cut) grows toward saturation.

Run: PYTHONPATH=/root/repo python tools/comm_volume.py [--scales 14,15,16,17]
"""

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="14,15,16,17")
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r04.json"))
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from fuzzypatternmatching_tpu.generators.rmat import rmat_all_ranks
    from fuzzypatternmatching_tpu.graph.csr import degree_labels, from_edges
    from fuzzypatternmatching_tpu.parallel.sharded import ShardedLccEngine
    from fuzzypatternmatching_tpu.pattern.builtin import load_tree_pattern
    import tempfile

    pattern, _constraints = load_tree_pattern(tempfile.mkdtemp())
    try:
        commit = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        commit = "unknown"
    out = {
        "metric": "per-device communication volume of the mesh LCC "
                  "superstep (useful entries moved by the three "
                  "all_to_alls; measured from the constructed exchange "
                  "index lists)",
        "measured_at": datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat(timespec="seconds"),
        "commit": commit,
        "rows": [],
    }
    for scale in [int(s) for s in args.scales.split(",")]:
        src, dst = rmat_all_ranks(scale=scale, n_ranks=4)
        g = from_edges(src, dst, num_vertices=1 << scale)
        labels = degree_labels(g)
        for n in [int(x) for x in args.devices.split(",")]:
            mesh = Mesh(np.array(jax.devices("cpu")[:n]), ("x",))
            eng = ShardedLccEngine(g, labels, pattern, mesh=mesh)
            cs = eng.comm_stats
            row = {
                "scale": scale,
                "V": int(g.num_vertices),
                "E": int(g.num_edges),
                "n": n,
                "per_device_elems": eng.per_device_elems(),
            }
            total_bytes_cross = 0
            total_bytes_wire = 0
            for name in ("tv_halo", "alive_halo", "partial_or"):
                st = cs[name]
                d = st.get("directions", 1)
                cross = int(np.max(st["useful_cross"])) * d
                intra = int(np.max(st["useful_intra"])) * d
                wire = st["wire_entries_per_device"] * d
                row[name] = {
                    "useful_cross_max_per_device": cross,
                    "useful_intra_max_per_device": intra,
                    "wire_entries_per_device": wire,
                    "bytes_per_entry": st["entry_bytes"],
                }
                total_bytes_cross += cross * st["entry_bytes"]
                total_bytes_wire += wire * st["entry_bytes"]
            cut = int(cs["cut_edges"].sum())
            row["cut_edges_total"] = cut
            row["cut_fraction"] = round(cut / max(g.num_edges, 1), 4)
            row["cross_bytes_max_per_device_per_superstep"] = (
                total_bytes_cross
            )
            row["wire_bytes_per_device_per_superstep"] = total_bytes_wire
            out["rows"].append(row)
            log(
                f"s{scale} n={n}: cut={row['cut_fraction']:.3f} "
                f"cross={total_bytes_cross/1e6:.2f}MB/dev/step "
                f"wire={total_bytes_wire/1e6:.2f}MB "
                f"elems/dev={row['per_device_elems']}"
            )
    # empirical scaling check: per-device volume at n=8 vs n=1
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["rows"][-1], indent=1))
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
