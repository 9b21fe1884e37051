"""Summarize a hardware-queue bench log (results/r4_hw_queue.log) into the
default-flip decision table.

The log interleaves `=== N. <label>` section headers with bench.py's
one-line JSON results ({"metric", "value", "unit", "vs_baseline"}).
This prints value deltas vs the default-config bench and the resulting
recommendation per the repo's rules:
  * batched vs flat sort: whichever is faster becomes the default
    (NARUTO_FLAT_SORT / _batched_sort gate);
  * sort_carry=frac: flip grid.sort_carry default if faster;
  * Pallas kernels: default-on-or-gone — a kernel whose OFF bench is not
    slower gets deleted;
  * approx_topk stays opt-in unless the win is large (deviates from the
    reference's exact top-k selection).

Base-row integrity (round-3 lesson: the r3 queue's first "default" row
measured 16.2 it/s where the driver bench of the same graph measured
43.06, inflating every "+X% vs default" ~2.7x and inverting every
recommendation): the queue now BRACKETS the A/Bs with a default bench
first AND last, and this analyzer

  1. refuses to run unless the first row is labeled "default";
  2. refuses the whole log (exit 1) if the bracketing default rows
     disagree by more than REJECT_SPREAD (20%) — that means the device
     was not in a steady state and NO decision in the table is valid;
  3. uses the MEAN of the default rows as the comparison base.

Usage: python scripts/analyze_hw_queue.py [results/r4_hw_queue.log]
"""
from __future__ import annotations

import json
import re
import sys

REJECT_SPREAD = 0.20


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


def _is_default(label: str) -> bool:
    return "default" in label.lower() and "a/b" not in label.lower()


def check_base(rows) -> float | None:
    """Validate the default-row bracket; return the base value or None
    (log rejected). Prints the reason on rejection."""
    if not rows:
        print("no bench rows found")
        return None
    if not _is_default(rows[0][0]):
        print(f"REJECTED: first row {rows[0][0]!r} is not the default "
              "bench — the queue must bench the default graph first "
              "(and the base row must not be a dropped/errored step).")
        return None
    defaults = [(lbl, rec["value"]) for lbl, rec in rows if _is_default(lbl)]
    if len(defaults) < 2:
        print("REJECTED: only one default row — the queue must bracket "
              "the A/Bs with a default bench first AND last so device "
              "drift is detectable.")
        return None
    vals = [v for _, v in defaults]
    spread = (max(vals) - min(vals)) / max(vals)
    if spread > REJECT_SPREAD:
        print(f"REJECTED: default bracket disagrees by {spread:.0%} "
              f"({', '.join(f'{lbl}={v:.2f}' for lbl, v in defaults)}) — "
              "the device was not in a steady state; no decision in this "
              "table is valid. Re-run the queue.")
        return None
    base = sum(vals) / len(vals)
    print(f"default bracket OK: {', '.join(f'{v:.2f}' for v in vals)} "
          f"(spread {spread:.1%}) -> base {base:.2f} it/s")
    return base


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "results/r4_hw_queue.log"
    rows = parse(path)
    base = check_base(rows)
    if base is None:
        sys.exit(1)
    print(f"{'section':<60s} {'it/s':>8s} {'vs default':>10s}")
    for label, rec in rows:
        v = rec["value"]
        print(f"{label[:60]:<60s} {v:8.2f} {v / base - 1:+10.1%}")
    print()
    d = base
    for label, rec in rows:
        if _is_default(label):
            continue
        v = rec["value"]
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
