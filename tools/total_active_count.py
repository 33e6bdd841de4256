"""Merge per-rank count files into the global convergence trace — the
Python-3 equivalent of the reference's analysis script
(reference: examples/scripts/total_active_count.py): each file in the
directory holds one row per superstep whose LAST comma-field is that
rank's count; the script sums the last field row-position-wise across
files and prints each row's leading fields plus the global total.

Works unchanged on this framework's result trees (io/results.py writes
the same layout):

  python tools/total_active_count.py <out>/0/all_ranks_active_vertices_count
  python tools/total_active_count.py <out>/0/all_ranks_active_edges_count
  python tools/total_active_count.py <out>/0/all_ranks_messages
"""

import os
import sys


def merge(directory: str) -> list[str]:
    files = sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if os.path.isfile(os.path.join(directory, f))
    )
    if not files:
        return []
    with open(files[0]) as f:
        prefixes = [
            ",".join(t.strip() for t in line.strip().split(",")[:-1])
            for line in f
            if line.strip()
        ]
    totals = [0] * len(prefixes)
    for path in files:
        with open(path) as f:
            for i, line in enumerate(l for l in f if l.strip()):
                if i >= len(totals):
                    # the reference script silently assumes every rank file
                    # has the first file's row count; report the mismatch
                    # instead of crashing with IndexError
                    raise SystemExit(
                        f"{path}: row {i + 1} exceeds the {len(totals)} rows "
                        f"of {files[0]} — per-rank files disagree on "
                        "superstep count"
                    )
                totals[i] += int(line.strip().split(",")[-1])
    return [
        (p + "," if p else "") + str(t) for p, t in zip(prefixes, totals)
    ]


def main():
    if len(sys.argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    rows = merge(sys.argv[1])
    print(f"{len(os.listdir(sys.argv[1]))} files to process ...",
          file=sys.stderr)
    for r in rows:
        print(r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
