"""Results-file merge/append.

Parity with reference update_results_file (src/utils/general_utils.py:163-188):
a csv-ish two-line format (header line of metric names, value line) that is
merged when new metrics arrive for the same file.
"""
from __future__ import annotations

import os
from typing import Dict


def update_results_file(result_dict: Dict[str, float], filepath: str) -> None:
    existing: Dict[str, str] = {}
    if os.path.exists(filepath):
        with open(filepath) as f:
            lines = [ln.strip() for ln in f.readlines() if ln.strip()]
        if len(lines) >= 2:
            keys = lines[0].split(",")
            vals = lines[1].split(",")
            existing = dict(zip(keys, vals))
    for k, v in result_dict.items():
        existing[k] = f"{v:.6f}" if isinstance(v, float) else str(v)
    os.makedirs(os.path.dirname(os.path.abspath(filepath)), exist_ok=True)
    with open(filepath, "w") as f:
        f.write(",".join(existing.keys()) + "\n")
        f.write(",".join(existing.values()) + "\n")
