#!/usr/bin/env python
"""Compare two bench.py JSON outputs per-query and flag regressions.

Usage: python tools/bench_compare.py BENCH_r01.json BENCH_r02.json [threshold]

Prints one line per query: old, new, ratio; queries slower than
`threshold`x (default 1.5) are marked REGRESSED, new queries NEW. Exit
code 1 if any regression (so it can gate CI-style checks). Bench numbers
on a shared box carry ~±20% run-to-run noise — treat <1.5x as noise.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    def load(path):
        d = json.load(open(path))
        if "parsed" in d:  # driver BENCH_r{N}.json wraps bench output
            if d["parsed"] is None:
                # The driver stores only a TAIL of bench stdout; when the
                # JSON line didn't fit, "parsed" is null and the tail is an
                # incomplete fragment. Comparing fragments silently produced
                # misleading per-query deltas (VERDICT r4 item 9) — refuse
                # loudly instead and point at the full builder-side records.
                raise SystemExit(
                    f"{path}: driver bench record is TRUNCATED ('parsed' is "
                    "null — the tail is not a complete bench JSON line). "
                    "Use the full per-query records in BENCH_HISTORY.md, or "
                    "re-run bench.py locally and compare its output file."
                )
            d = d["parsed"]
        return d["queries"]

    old = load(sys.argv[1])
    new = load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    regressed = []
    for name, t_new in new.items():
        t_old = old.get(name)
        if t_old is None:
            print(f"{name:35s} {'-':>8} {t_new:8.3f}  NEW")
            continue
        ratio = t_new / t_old if t_old else float("inf")
        flag = "REGRESSED" if ratio > threshold else ""
        if flag:
            regressed.append(name)
        print(f"{name:35s} {t_old:8.3f} {t_new:8.3f}  {ratio:5.2f}x {flag}")
    for name in sorted(set(old) - set(new)):
        print(f"{name:35s} {old[name]:8.3f} {'-':>8}  REMOVED")
    total_old = sum(v for k, v in old.items() if k in new)
    total_new = sum(v for k, v in new.items() if k in old)
    print(f"{'TOTAL (shared queries)':35s} {total_old:8.3f} {total_new:8.3f}  "
          f"{total_new / total_old if total_old else 0:5.2f}x")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
