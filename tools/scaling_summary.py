"""Combine two targeted bench detail files (same queries, different
core counts) into the scaling block VERDICT r17 #5 asked for: per-query
low-core/high-core wall ratio at a scale factor big enough to show
parallelism (sf1), with the core ratio as the ideal.

Usage: python tools/scaling_summary.py <detail_low.json> <detail_high.json> \
           [--cpus-low 8] [--cpus-high 32] [--out JSON]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out = None
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i : i + 2]

    def opt(name, default):
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i : i + 2]
            return int(v)
        return default

    cl = opt("--cpus-low", 8)
    ch = opt("--cpus-high", 32)
    low = json.load(open(args[0]))["queries"]
    high = json.load(open(args[1]))["queries"]
    rows = {}
    for q in sorted(high):
        if q in low:
            rows[q] = {
                f"c{cl}_s": low[q],
                f"c{ch}_s": high[q],
                "low_over_high": round(low[q] / high[q], 3),
            }
    res = {
        "cpus_low": cl,
        "cpus_high": ch,
        "ideal_ratio": round(ch / cl, 2),
        "per_query": rows,
    }
    line = json.dumps(res, indent=1)
    print(line)
    if out:
        with open(out, "w") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
