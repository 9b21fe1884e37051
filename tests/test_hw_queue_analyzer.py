"""The hardware-queue analyzer (scripts/analyze_hw_queue.py) turns the
round-3 A/B bench log into default-flip decisions (CLAUDE.md round-3
protocol: batched-vs-flat sort, sort_carry, Pallas default-on-or-gone,
approx_topk opt-in). Its parsing + decision rules gate real default
changes, so they get a guard."""
from __future__ import annotations

import importlib.util
import os
import sys

_SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _load_analyzer():
    spec = importlib.util.spec_from_file_location(
        "analyze_hw_queue", os.path.join(_SCRIPTS, "analyze_hw_queue.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _row(value, **extra):
    import json

    rec = {"metric": "mapping_iters_per_sec", "value": value,
           "unit": "iters/s", "vs_baseline": value / 100.0}
    rec.update(extra)
    return json.dumps(rec)


def test_parse_skips_error_and_zero_rows(tmp_path, capsys):
    mod = _load_analyzer()
    log = tmp_path / "q.log"
    log.write_text("\n".join([
        "=== 1. default (batched sort)",
        _row(47.0),
        "=== 2. flat_sort A/B",
        _row(0.0, error="device acquisition timed out"),
        "=== 3. frac-carry A/B",
        "not json {",
        _row(49.0),
    ]) + "\n")
    rows = mod.parse(str(log))
    assert [lbl for lbl, _ in rows] == [
        "1. default (batched sort)", "3. frac-carry A/B"]
    assert [r["value"] for _, r in rows] == [47.0, 49.0]


def test_decision_rules(tmp_path, capsys):
    mod = _load_analyzer()
    log = tmp_path / "q.log"
    # default 47; flat sort slower (keep batched); frac faster (flip);
    # cumsum-off NOT slower (delete); adam-off slower (keep kernel);
    # approx_topk small win (stay opt-in).
    log.write_text("\n".join([
        "=== 1. default (batched sort)", _row(47.0),
        "=== 2. flat_sort A/B", _row(44.0),
        "=== 3. frac-carry A/B", _row(49.5),
        "=== 4. only outer_cumsum off", _row(47.2),
        "=== 5. only fused_adam off", _row(43.0),
        "=== 6. approx_topk A/B", _row(48.0),
    ]) + "\n")
    sys.argv = ["analyze_hw_queue.py", str(log)]
    mod.main()
    out = capsys.readouterr().out
    assert "keep batched default" in out
    assert "FLIP grid.sort_carry default to 'frac'" in out
    assert "DELETE outer_cumsum kernel" in out
    assert "keep fused_adam kernel" in out
    assert "keep exact top_k default" in out
