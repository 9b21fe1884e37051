"""Summarize a hardware-queue bench log (results/r3_hw_queue.log) into the
default-flip decision table.

The log interleaves `=== N. <label>` section headers with bench.py's
one-line JSON results ({"metric", "value", "unit", "vs_baseline"}).
This prints value deltas vs the first (default-config) bench and the
resulting recommendation per the repo's rules:
  * batched vs flat sort: whichever is faster becomes the default
    (NARUTO_FLAT_SORT / _batched_sort gate);
  * sort_carry=frac: flip grid.sort_carry default if faster;
  * Pallas kernels: default-on-or-gone — a kernel whose OFF bench is not
    slower gets deleted;
  * approx_topk stays opt-in unless the win is large (deviates from the
    reference's exact top-k selection).

Usage: python scripts/analyze_hw_queue.py [results/r3_hw_queue.log]
"""
from __future__ import annotations

import json
import re
import sys


def parse(path: str):
    rows = []
    label = None
    with open(path) as f:
        for line in f:
            m = re.match(r"=== (\S+)\.? (.*)", line.strip())
            if m:
                label = m.group(0)[4:]
                continue
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "error" in rec or not rec.get("value"):
                    print(f"skipping error row under {label!r}: "
                          f"{rec.get('error', 'zero value')}")
                else:
                    rows.append((label or "?", rec))
                label = None
    return rows


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "results/r3_hw_queue.log"
    rows = parse(path)
    if not rows:
        print(f"no bench rows found in {path}")
        return
    base = rows[0][1]["value"]
    print(f"{'section':<60s} {'it/s':>8s} {'vs default':>10s}")
    for label, rec in rows:
        v = rec["value"]
        print(f"{label[:60]:<60s} {v:8.2f} {v / base - 1:+10.1%}")
    print()
    for label, rec in rows[1:]:
        v, d = rec["value"], rows[0][1]["value"]
        ll = label.lower()
        if "flat_sort" in ll or "flat-sort" in ll:
            rec_txt = ("keep batched default" if v <= d * 1.01
                       else "FLIP default to flat sort")
        elif "frac" in ll:
            rec_txt = ("keep sort_carry='weights'" if v <= d * 1.01
                       else "FLIP grid.sort_carry default to 'frac'")
        elif "only outer_cumsum off" in ll:
            rec_txt = ("keep outer_cumsum kernel" if v < d * 0.99
                       else "DELETE outer_cumsum kernel (XLA not slower)")
        elif "only fused_adam off" in ll:
            rec_txt = ("keep fused_adam kernel" if v < d * 0.99
                       else "DELETE fused_adam kernel (XLA not slower)")
        elif "approx_topk" in ll:
            rec_txt = ("large win — consider default + parity note"
                       if v > d * 1.05 else "keep exact top_k default")
        else:
            continue
        print(f"  {label[:52]:<54s} -> {rec_txt}")


if __name__ == "__main__":
    main()
