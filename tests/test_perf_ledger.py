"""Round-over-round perf-ledger mechanics (scripts/perf_ledger.py):
numeric flattening, delta ratios, and the >10%-down flagging that
generalizes the bench.py headline guard to every measured number
(VERDICT r4 #8)."""

import json
import os

from scripts import perf_ledger


def test_numeric_leaves_flattens_nested_and_lists():
    tree = {"train": {"preset": 42.0, "paths": [1.0, 2.0]},
            "note": "text", "ok": True}
    flat = perf_ledger.numeric_leaves(tree)
    assert flat == {"train.preset": 42.0, "train.paths.0": 1.0,
                    "train.paths.1": 2.0}


def test_delta_table_flags_only_rate_drops():
    prev = {"train": {"preset2048": 40e6, "wall_s": 10.0,
                      "relative_cost": 1.5},
            "headline": {"repeats": [2.0e9, 2.2e9]}}
    cur = {"train": {"preset2048": 30e6,       # -25%: flag
                     "wall_s": 20.0,           # slower wall: NOT flagged
                     "relative_cost": 2.0},    # cost metric: NOT flagged
           "headline": {"repeats": [2.1e9, 1.5e9]}}  # repeat -32%: flag
    deltas, flags = perf_ledger.delta_table(cur, prev)
    assert deltas["train.preset2048"] == 0.75
    flagged = " ".join(flags)
    assert "train.preset2048" in flagged
    assert "headline.repeats.1" in flagged
    assert "wall_s" not in flagged and "relative_cost" not in flagged


def test_rates_named_per_s_are_flaggable_but_seconds_are_not():
    prev = {"pop": {"agg_steps_per_s": 40e6, "first_call_s": 5.0}}
    cur = {"pop": {"agg_steps_per_s": 30e6, "first_call_s": 50.0}}
    _, flags = perf_ledger.delta_table(cur, prev)
    joined = " ".join(flags)
    assert "agg_steps_per_s" in joined
    assert "first_call_s" not in joined


def test_delta_table_ignores_metrics_missing_on_either_side():
    deltas, flags = perf_ledger.delta_table({"a": 1.0}, {"b": 2.0})
    assert deltas == {} and flags == []


def test_ledger_roundtrip_with_previous_round(tmp_path, monkeypatch):
    """build_ledger finds the newest prior-round artifact and records the
    delta table + flags in the committed JSON."""
    art = tmp_path / "artifacts"
    art.mkdir()
    monkeypatch.setattr(perf_ledger, "REPO", str(tmp_path))
    with open(art / "chip_session_r04.json", "w") as f:
        json.dump({"round": 4, "phases": {"train": {"x": 100.0}}}, f)
    ledger = perf_ledger.build_ledger(5, {"train": {"x": 80.0}})
    assert ledger["delta_vs"] == "chip_session_r04.json"
    assert ledger["deltas"]["train.x"] == 0.8
    assert len(ledger["flags_over_10pct_down"]) == 1
    # round 1 (no prior): no delta keys
    first = perf_ledger.build_ledger(1, {"train": {"x": 80.0}})
    assert "deltas" not in first


def test_main_writes_artifact(tmp_path, monkeypatch):
    sess = tmp_path / "sess"
    sess.mkdir()
    with open(sess / "train.json", "w") as f:
        json.dump({"preset": 1.0}, f)
    monkeypatch.setattr(perf_ledger, "REPO", str(tmp_path))
    (tmp_path / "artifacts").mkdir()
    rc = perf_ledger.main(["--round", "5", "--session-dir", str(sess)])
    assert rc == 0
    out = tmp_path / "artifacts" / "chip_session_r05.json"
    assert os.path.exists(out)
    with open(out) as f:
        led = json.load(f)
    assert led["phases"]["train"]["preset"] == 1.0
