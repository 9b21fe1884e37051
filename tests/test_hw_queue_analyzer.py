"""The hardware-queue analyzer (scripts/analyze_hw_queue.py) turns the
A/B bench log into default-flip decisions (CLAUDE.md protocol:
batched-vs-flat sort, sort_carry, Pallas default-on-or-gone, approx_topk
opt-in). Its parsing + decision rules gate real default changes, so they
get a guard — including the round-4 base-row integrity rules added after
the r3 queue's contaminated base row (16.2 it/s vs the driver's 43.06 for
the same graph) inverted every recommendation."""
from __future__ import annotations

import importlib.util
import os
import sys

import pytest

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


def _bracketed_log(open_val, close_val, mid_rows):
    lines = ["=== 1. default bracket-open (batched sort)", _row(open_val)]
    lines += mid_rows
    lines += ["=== 7. default bracket-close (batched sort)",
              _row(close_val)]
    return "\n".join(lines) + "\n"


def test_decision_rules(tmp_path, capsys, monkeypatch):
    mod = _load_analyzer()
    log = tmp_path / "q.log"
    # default bracket 47/46 (base 46.5); flat sort slower (keep batched);
    # frac faster (flip); cumsum-off NOT slower (delete); adam-off slower
    # (keep kernel); approx_topk small win (stay opt-in).
    log.write_text(_bracketed_log(47.0, 46.0, [
        "=== 2. flat_sort A/B", _row(44.0),
        "=== 3. frac-carry A/B", _row(49.5),
        "=== 4. only outer_cumsum off", _row(47.2),
        "=== 5. only fused_adam off", _row(43.0),
        "=== 6. approx_topk A/B", _row(48.0),
    ]))
    monkeypatch.setattr(sys, "argv", ["analyze_hw_queue.py", str(log)])
    mod.main()
    out = capsys.readouterr().out
    assert "default bracket OK" in out
    assert "keep batched default" in out
    assert "FLIP grid.sort_carry default to 'frac'" in out
    assert "DELETE outer_cumsum kernel" in out
    assert "keep fused_adam kernel" in out
    assert "keep exact top_k default" in out


def test_rejects_disagreeing_bracket(tmp_path, capsys, monkeypatch):
    """The r3 failure mode: a base row wildly off from the same graph's
    true throughput. A 16.2/43.1 bracket must reject the whole log."""
    mod = _load_analyzer()
    log = tmp_path / "q.log"
    log.write_text(_bracketed_log(16.2, 43.1, [
        "=== 2. flat_sort A/B", _row(18.9),
    ]))
    monkeypatch.setattr(sys, "argv", ["analyze_hw_queue.py", str(log)])
    with pytest.raises(SystemExit) as ei:
        mod.main()
    assert ei.value.code == 1
    assert "REJECTED" in capsys.readouterr().out


def test_rejects_non_default_first_row(tmp_path, capsys, monkeypatch):
    """If the opening default bench errored out and was skipped, the first
    surviving row is an A/B row — the analyzer must not silently use it
    as the base (ADVICE r3 medium)."""
    mod = _load_analyzer()
    log = tmp_path / "q.log"
    log.write_text("\n".join([
        "=== 1. default bracket-open (batched sort)",
        _row(0.0, error="device acquisition timed out"),
        "=== 2. flat_sort A/B", _row(44.0),
        "=== 7. default bracket-close (batched sort)", _row(46.0),
    ]) + "\n")
    monkeypatch.setattr(sys, "argv", ["analyze_hw_queue.py", str(log)])
    with pytest.raises(SystemExit) as ei:
        mod.main()
    assert ei.value.code == 1
    assert "REJECTED" in capsys.readouterr().out


def test_rejects_single_default_row(tmp_path, capsys, monkeypatch):
    mod = _load_analyzer()
    log = tmp_path / "q.log"
    log.write_text("\n".join([
        "=== 1. default (batched sort)", _row(47.0),
        "=== 2. flat_sort A/B", _row(44.0),
    ]) + "\n")
    monkeypatch.setattr(sys, "argv", ["analyze_hw_queue.py", str(log)])
    with pytest.raises(SystemExit) as ei:
        mod.main()
    assert ei.value.code == 1
    assert "bracket" in capsys.readouterr().out
