"""Evidence-selection rules in bench.py (no Spark needed).

The recorded scaling headline is assembled from BENCH/scaling_attempts.jsonl
by three pure functions; these tests pin the admission/qualification rules —
in particular the round-5 calibration sanity ceiling: a burn-scaling probe
reading far above 1.0 means the probe's own small side was stalled (the
window measurement is invalid), so it must DISQUALIFY an attempt rather
than vouch for it. One real logged attempt (2026-08-18T04:53:37,
cal_before=2.186, efficiency 0.349) was "qualified" under the old
min(cal)>=0.9 rule and would have been promoted over genuine 0.85+ pairs.
"""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    os.makedirs(tmp_path / "BENCH", exist_ok=True)
    return mod


def _write_log(bench, recs, name="scaling_attempts.jsonl"):
    path = os.path.join(bench.REPO, "BENCH", name)
    with open(path, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


def _rec(ts, eff, cal_before, cal_after, qualified=None, scale=4, norm=None):
    r = {
        "ts": ts, "cal_before": cal_before, "cal_after": cal_after,
        "cal_min": min(cal_before, cal_after),
        "wall_s_local[8]": 32.0, "wall_s_local[32]": 32.0 / (4 * eff),
        "pages": 150000, "efficiency_n_to_4n": eff,
        "efficiency_normalized_by_host":
            norm if norm is not None
            else round(eff / ((cal_before + cal_after) / 2), 3),
        "qualified": qualified if qualified is not None
        else min(cal_before, cal_after) >= 0.9,
        "scale": scale,
    }
    return r


def test_cal_in_band_rejects_superlinear_probe(bench):
    assert bench._cal_in_band({"cal_before": 0.95, "cal_after": 0.91})
    # the real 04:53:37 artifact: 2.186 before, 0.913 after
    assert not bench._cal_in_band({"cal_before": 2.186, "cal_after": 0.913})
    assert not bench._cal_in_band({"cal_before": 0.91, "cal_after": 1.2})
    # admission floor variant
    assert bench._cal_in_band({"cal_before": 0.76, "cal_after": 1.1},
                              floor=0.75)
    assert not bench._cal_in_band({"cal_before": 0.74, "cal_after": 0.9},
                                  floor=0.75)


def test_hunt_best_ignores_superlinear_qualified(bench):
    # a steal-poisoned pair marked qualified by the OLD rule must not win
    _write_log(bench, [
        _rec("t1", 0.349, 2.186, 0.913, qualified=True),
        _rec("t2", 0.85, 0.83, 0.84),
        _rec("t3", 0.80, 0.82, 0.86),
    ])
    best = bench._hunt_best()
    assert best["kind"] == "cross_attempt_best_pair"
    assert best["n_qualified_attempts"] == 0


def test_hunt_best_prefers_genuinely_qualified(bench):
    _write_log(bench, [
        _rec("t1", 0.349, 2.186, 0.913, qualified=True),
        _rec("t2", 0.83, 0.95, 0.92, qualified=True),
        _rec("t3", 0.99, 0.80, 0.80),  # admissible but not qualified
    ])
    best = bench._hunt_best()
    assert best["ts"] == "t2"
    assert best["efficiency_n_to_4n"] == 0.83
    assert best["n_qualified_attempts"] == 1


def test_superlinear_raw_pair_never_wins_admissible_selection(bench):
    # the real 2026-08-18T23:11:30 artifact: raw 1.152 with clean cal
    # probes on both sides — the pair's own SMALL side was stalled
    # mid-run, which the cal band around it cannot see. It must not be
    # promoted as best_admissible_raw, nor counted in the >=0.8 census.
    _write_log(bench, [
        _rec("t1", 1.152, 0.878, 0.888),
        _rec("t2", 0.85, 0.83, 0.84),
        _rec("t3", 0.72, 0.82, 0.86),
    ])
    norm = bench._hunt_best_normalized()
    assert norm["best_admissible_raw"]["ts"] == "t2"
    assert norm["n_admissible_raw_ge_0_8"] == 1
    assert norm["n_admissible_attempts"] == 2


def test_superlinear_raw_pair_never_wins_qualified_selection(bench):
    _write_log(bench, [
        _rec("t1", 1.09, 0.95, 0.93, qualified=True),
        _rec("t2", 0.82, 0.96, 0.91, qualified=True),
    ])
    best = bench._hunt_best()
    assert best["ts"] == "t2"
    assert best["n_qualified_attempts"] == 1


def test_cluster_best_skips_superlinear(bench):
    recs = [
        {"ts": "c1", "cal_before": 0.9, "cal_after": 0.91, "cal_min": 0.9,
         "wall_s_small": 40.0, "wall_s_big": 8.0,
         "efficiency_n_to_4n": 1.25, "efficiency_normalized_by_host": 1.38,
         "qualified": True},
        {"ts": "c2", "cal_before": 0.8, "cal_after": 0.82, "cal_min": 0.8,
         "wall_s_small": 40.0, "wall_s_big": 14.0,
         "efficiency_n_to_4n": 0.714, "efficiency_normalized_by_host": 0.88,
         "qualified": False},
    ]
    _write_log(bench, recs, name="cluster_scaling_attempts.jsonl")
    best = bench._cluster_best()
    assert best["ts"] == "c2"
    assert best["selection"] == "admissible_normalized"


def test_normalized_admission_uses_band(bench):
    _write_log(bench, [
        _rec("t1", 0.9, 2.186, 0.913),   # probe invalid: excluded
        _rec("t2", 0.82, 0.80, 0.78),
        _rec("t3", 0.888, 0.958, 0.812),
    ])
    norm = bench._hunt_best_normalized()
    assert norm["n_admissible_attempts"] == 2
    assert norm["best_admissible_raw"]["ts"] == "t3"
    assert norm["best_admissible_raw"]["efficiency_n_to_4n"] == 0.888
    # normalized figure is capped at 1.0 (steal can inflate either way)
    assert norm["efficiency_normalized_by_host"] <= 1.0


def test_cluster_parity_summary(bench):
    assert bench._cluster_parity_summary() is None  # no log yet
    recs = [
        {"ts": "2026-08-19T23:11:00", "n_executors": 2, "all_match": True,
         "modes": {"random": {"order_match": True, "seen_match": True},
                   "fifo": {"order_match": True, "seen_match": True}}},
        {"ts": "2026-08-19T23:13:51", "n_executors": 4, "all_match": True,
         "modes": {"random": {"order_match": True, "seen_match": True},
                   "fifo": {"order_match": True, "seen_match": True}}},
    ]
    _write_log(bench, recs, name="cluster_parity.jsonl")
    s = bench._cluster_parity_summary()
    assert s["executor_counts"] == [2, 4]
    assert s["order_modes"] == ["fifo", "random"]
    assert s["n_runs"] == 2 and s["all_match"] is True
    # one mismatching run flips the aggregate — a parity failure can
    # never be averaged away
    recs.append({"ts": "2026-08-19T23:20:00", "n_executors": 8,
                 "all_match": False,
                 "modes": {"random": {"order_match": False,
                                      "seen_match": True}}})
    _write_log(bench, recs, name="cluster_parity.jsonl")
    assert bench._cluster_parity_summary()["all_match"] is False
