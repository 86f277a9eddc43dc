"""Compare two bench JSON lines (e.g. BENCH_r06.json vs a fresh run):
per-query ratios on the common set, new/dropped queries, and a loud list
of regressions past a threshold — the round-over-round check the verdict
applies, automated so it runs before numbers ship.

Drift correction (r13 VERDICT #5): single-machine rounds carry a uniform
environmental drift (the whole suite reads ~x1.1 one day, ~x0.9 the
next), which for three rounds running had to be re-diagnosed by hand.
The MEDIAN ratio across all common queries estimates that drift — a real
regression moves one query, not the median of sixty — so the tool now
reports each query's raw ratio AND its drift-NORMALIZED ratio
(raw / median), and flags only normalized outliers. `--raw` restores the
un-normalized flagging.

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 2.0]
       [--raw]
Exit code 1 if any common query regressed past the threshold (normalized
by the median drift unless --raw).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        text = f.read().strip()
    # accept a raw bench line, a multi-line JSON document, or the driver's
    # wrapper ({rc, tail, parsed: {queries: ...}})
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        obj = json.loads(text.splitlines()[-1])
    if "queries" not in obj and obj.get("parsed"):
        obj = obj["parsed"]
    return dict(obj.get("queries") or {})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument(
        "--raw", action="store_true",
        help="flag on raw ratios (no median-drift normalization)",
    )
    args = ap.parse_args()

    old, new = load_queries(args.old), load_queries(args.new)
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries between the two files", file=sys.stderr)
        return 2

    ratios = {
        n: (new[n] / old[n] if old[n] else float("inf")) for n in common
    }
    drift = statistics.median(ratios.values())
    if args.raw or drift <= 0 or drift == float("inf"):
        drift = 1.0

    rows = [
        (n, old[n], new[n], ratios[n], ratios[n] / drift) for n in common
    ]
    rows.sort(key=lambda r: -r[4])
    width = max(len(n) for n in common)
    for n, o, v, r, nr in rows:
        flag = "  <-- REGRESSION" if nr > args.threshold else ""
        print(
            f"{n:<{width}}  {o:7.3f} -> {v:7.3f}  x{r:.2f}"
            f"  (norm x{nr:.2f}){flag}"
        )

    sum_old, sum_new = sum(old[n] for n in common), sum(new[n] for n in common)
    print(
        f"\ncommon set ({len(common)} queries): {sum_old:.2f}s -> "
        f"{sum_new:.2f}s = x{sum_new / sum_old:.2f}; "
        f"median drift x{statistics.median(ratios.values()):.2f}"
        + ("" if args.raw else " (ratios above normalized by it)")
    )
    only_new = sorted(set(new) - set(old))
    only_old = sorted(set(old) - set(new))
    if only_new:
        print(f"new queries ({len(only_new)}): "
              + ", ".join(f"{n}={new[n]:.2f}s" for n in only_new))
    if only_old:
        print(f"dropped queries ({len(only_old)}): {', '.join(only_old)}")

    regressed = [n for n, _, _, _, nr in rows if nr > args.threshold]
    kind = "raw" if args.raw else "drift-normalized"
    if regressed:
        print(f"\nFAIL: {len(regressed)} quer{'y' if len(regressed) == 1 else 'ies'} "
              f"regressed past x{args.threshold} ({kind}): {', '.join(regressed)}")
        return 1
    print(f"\nOK: no query regressed past x{args.threshold} ({kind})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
