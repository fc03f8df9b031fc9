"""Variance-honest bench protocol: session aggregation + worst-of-N pin.

Round-4 verdict weak #1/#7: the north-star was pinned on a best-weather
single session (observed band 661-1142 lines/s at identical flags).
These tests pin the round-5 protocol mechanics: bench_sessions
aggregates median/min/max across separate invocations, and
pick_northstar scores candidates by their WORST session, never a lucky
median, with the CER budget still gating.
"""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench_sessions = _load("bench_sessions", "scripts/bench_sessions.py")
pick_northstar = _load("pick_northstar", "scripts/pick_northstar.py")


def _row(value, cer=0.02, flags=None, **kw):
    r = {"metric": "textline_images_per_sec_per_chip", "value": value,
         "unit": "lines/s/chip", "weights": "trained",
         "corpus": "/tmp/x/corpus.json", "cer": cer,
         "flags": flags or ["--recognizer_dir", "/tmp/rec",
                            "--localizer_dir", "/tmp/loc"]}
    r.update(kw)
    return r


def test_aggregate_median_min_max():
    rows = [_row(1100.0), _row(700.0), _row(900.0)]
    agg = bench_sessions.aggregate("cfg", rows)
    assert agg["value"] == 900.0        # median, not max
    assert agg["min"] == 700.0
    assert agg["max"] == 1100.0
    assert agg["sessions"] == [1100.0, 700.0, 900.0]
    assert "worst-weather" in agg["protocol"]


def test_aggregate_worst_cer_guards():
    rows = [_row(800.0, cer=0.019), _row(820.0, cer=0.021)]
    agg = bench_sessions.aggregate("cfg", rows)
    assert agg["cer"] == 0.021          # never under-reports accuracy


def test_pick_scores_by_min_not_median(tmp_path, monkeypatch):
    # candidate A: flashy median, terrible worst session
    # candidate B: lower median, better worst session -> must win
    a = bench_sessions.aggregate("a", [_row(1150.0), _row(600.0),
                                       _row(1100.0)])
    b = bench_sessions.aggregate("b", [_row(900.0), _row(850.0),
                                       _row(880.0)])
    for name, agg in (("a", a), ("b", b)):
        with open(tmp_path / f"{name}.result.json", "w") as f:
            f.write(json.dumps(agg) + "\n")
    results = pick_northstar.load_results(str(tmp_path))
    assert len(results) == 2
    winner = pick_northstar.select_winner(results)
    assert winner["value"] == 880.0     # B's median; A's 600 floor loses


def test_pick_accuracy_first_once_target_cleared():
    # Both clear the 625 worst-weather bar -> the MORE ACCURATE config
    # wins even though it is slower (round-4 verdict #6: don't buy
    # unneeded throughput margin with exact-line accuracy).
    fast_dithered = bench_sessions.aggregate(
        "bits2", [_row(1370.0, cer=0.0195), _row(1200.0, cer=0.0195),
                  _row(1300.0, cer=0.0195)])
    accurate = bench_sessions.aggregate(
        "bits4", [_row(1045.0, cer=0.0132), _row(900.0, cer=0.0132),
                  _row(980.0, cer=0.0132)])
    winner = pick_northstar.select_winner([fast_dithered, accurate])
    assert winner["cer"] == 0.0132

    # ...but if the accurate config's WORST session misses the target,
    # worst-weather throughput decides again.
    accurate_slow = bench_sessions.aggregate(
        "bits4", [_row(1045.0, cer=0.0132), _row(500.0, cer=0.0132)])
    winner = pick_northstar.select_winner([fast_dithered, accurate_slow])
    assert winner["cer"] == 0.0195


def test_pick_single_session_cannot_enter_accuracy_branch():
    # a single-session row never attests worst weather: even with a
    # better CER it must not beat a multi-session row via the
    # accuracy-first branch
    single_accurate = _row(1000.0, cer=0.010)
    multi = bench_sessions.aggregate(
        "m", [_row(900.0, cer=0.0195), _row(880.0, cer=0.0195)])
    winner = pick_northstar.select_winner([single_accurate, multi])
    assert winner["cer"] == 0.0195


def test_pick_cer_budget_still_gates(tmp_path):
    fast_bad = bench_sessions.aggregate(
        "fast", [_row(2000.0, cer=0.09), _row(1900.0, cer=0.09)])
    slow_good = bench_sessions.aggregate(
        "slow", [_row(700.0, cer=0.02), _row(650.0, cer=0.02)])
    for name, agg in (("fast", fast_bad), ("slow", slow_good)):
        with open(tmp_path / f"{name}.result.json", "w") as f:
            f.write(json.dumps(agg) + "\n")
    results = pick_northstar.load_results(str(tmp_path))
    passing = [r for r in results if r["cer"] <= pick_northstar.CER_BUDGET]
    assert all(r["value"] != 1950.0 for r in passing)
    winner = max(passing, key=lambda r: r.get("min", r["value"]))
    assert winner["min"] == 650.0


def test_single_session_rows_fall_back_to_value(tmp_path):
    single = _row(1000.0)
    multi = bench_sessions.aggregate("m", [_row(950.0), _row(940.0)])
    for name, row in (("s", single), ("m", multi)):
        with open(tmp_path / f"{name}.result.json", "w") as f:
            f.write(json.dumps(row) + "\n")
    results = pick_northstar.load_results(str(tmp_path))
    # a single-session row can still win on its value — but only because
    # no min exists; the protocol prefers feeding everything through
    # bench_sessions so this stays a fallback
    scores = sorted(r.get("min", r["value"]) for r in results)
    assert scores == [940.0, 1000.0]
