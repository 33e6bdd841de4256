"""Exact HBM residency budget of the bucketed engine at a given scale.

VERDICT r04 #8: before attempting s24 (≈0.5B edges) on the single 16 GB
v5e, compute the device-resident byte budget from the actual degree
distribution — the same width-assignment math as BucketedLccEngine
(engine/lcc_bucketed.py:131-178), without instantiating any device array.

Static residents (uploaded once per engine):
  per slot  : adj int32 (4) + rev int32 (4) + valid bool (1) + label code
              uint8 (1)                                     = 10 B/slot
  per row   : rows/seg_id int32 (8) + seg label consts (8)  = 16 B/row
  per vertex: label_tv + owner + inv_perm (uint32 each)     = 12 B/vertex
Search state (production path): tv 4 B/vertex + live bitmap V/8; the
full-plane alive/tp_flag bool planes add 2 B/slot only when a non-init
lcc_call materializes them (compact continuation never does).

Superstep transient (per bucket, peak = largest bucket): the gathered
candidate plane (uint32), the accept/tn accumulator (uint32) and the
payload/alive write (uint32) ≈ 12 B/slot-of-largest-bucket; XLA may fuse
some of these away, so the printed peak is an upper-bound model validated
against device memory_stats at s21 (run with --device-stats after a
search to compare).

Usage: BENCH_SCALE=24 python tools/hbm_budget.py [--json-out FILE]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HBM_BYTES = 16 * (1 << 30)  # v5e


def bucket_table(deg, min_width=8, max_width=8192):
    """Replicates BucketedLccEngine width assignment; returns rows/slots."""
    nz = deg[deg > 0]
    wexp = np.maximum(
        int(np.log2(min_width)),
        np.ceil(np.log2(np.maximum(nz, 1))).astype(np.int64),
    )
    wexp = np.minimum(wexp, int(np.log2(max_width)))
    cap = int(np.log2(max_width))
    table = []
    for we in np.unique(wexp):
        w = 1 << int(we)
        d = nz[wexp == we]
        if we == cap:
            rows = int(np.sum(-(-d // w)))  # split hubs
        else:
            rows = len(d)
        table.append({"width": int(w), "rows": rows, "slots": rows * w,
                      "real_edges": int(d.sum())})
    return table


def tiled_bytes(table, v):
    """Physical (tile-padded) device bytes of the engine statics.

    TPU arrays tile the two minormost dims to (sublane, lane) =
    (8, 128) for 32-bit types, (32, 128) for 8-bit: a 2-D [n, w] array
    with w < 128 occupies n * 128 lanes physically — 16x for the w=8
    bucket. This is what actually OOMed the s24 attempt: the un-tiled
    model below said 9.3 GiB, the tiled statics alone exceed HBM. (Same
    mechanism as the round-4 mask-reuse revert's '16x padding
    expansion', now with the arithmetic.)"""
    per_bucket = []
    total = 0
    for b in table:
        w, n = b["width"], b["rows"]
        wpad32 = max(w, 128)
        n8, n32 = -(-n // 8) * 8, -(-n // 32) * 32
        bytes_b = (
            2 * 4 * n8 * wpad32  # adj + rev int32
            + 2 * 1 * n32 * wpad32  # valid bool + label code uint8
        )
        per_bucket.append(
            {"width": w, "rows": n, "logical_bytes": 10 * n * w,
             "tiled_bytes": bytes_b,
             "inflation": round(bytes_b / max(10 * n * w, 1), 2)}
        )
        total += bytes_b
    total += 12 * v  # V-sized consts (1-D: padding negligible)
    return total, per_bucket


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--device-stats", action="store_true",
                    help="also query jax device memory_stats (needs TPU)")
    args = ap.parse_args()

    scale = int(os.environ.get("BENCH_SCALE", "21"))
    import bench

    g, labels = bench.build_or_load_graph(scale)
    v, e = g.num_vertices, g.num_edges
    deg = np.diff(g.row_ptr)
    table = bucket_table(deg)
    S = sum(b["slots"] for b in table)
    rows = sum(b["rows"] for b in table)
    largest = max(b["slots"] for b in table)

    static = 10 * S + 16 * rows + 12 * v
    tiled_static, tiled_detail = tiled_bytes(table, v)
    state = 4 * v + v // 8
    full_state = state + 2 * (S + 1)
    transient = 12 * largest
    report = {
        "scale": scale,
        "V": v,
        "E": e,
        "slots": S,
        "pad_factor": round(S / e, 3),
        "rows": rows,
        "buckets": table,
        "tiled": {
            "static_residents_tiled": tiled_static,
            "static_tiled_gib": round(tiled_static / (1 << 30), 2),
            "per_bucket": tiled_detail,
            "fits": tiled_static + state + transient < HBM_BYTES,
        },
        "bytes": {
            "static_residents": static,
            "search_state_production": state,
            "search_state_full_plane": full_state,
            "superstep_transient_model": transient,
            "peak_production_model": static + state + transient,
            "peak_full_plane_model": static + full_state + transient,
        },
        "hbm_bytes": HBM_BYTES,
        "peak_production_gib": round((static + state + transient) / (1 << 30), 2),
        "fits_production": static + state + transient < HBM_BYTES,
        "fits_full_plane": static + full_state + transient < HBM_BYTES,
    }
    if args.device_stats:
        try:
            import jax

            stats = jax.devices()[0].memory_stats()
            report["device_memory_stats"] = {
                k: stats[k]
                for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                if k in stats
            }
        except Exception as ex:  # axon may not expose stats
            report["device_memory_stats_error"] = repr(ex)
    print(json.dumps(report, indent=1))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
