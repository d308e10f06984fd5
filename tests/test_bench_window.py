"""Pins for bench.py's prev-window selection (ADVICE r13, medium).

The structural regression-declaration (`deltas_vs_prev`) is only as
good as the window it diffs against: an unanchored glob let sidecar
payloads like bench_window_r13_runA.json (metric line only, no
raw_times) shadow the canonical window and silently zero the diff.
These tests pin the fixed contract: anchored filename match, skip
payloads without raw_times, deterministic newest-round-first pick.
"""

import json

import bench


def _write(tmp_path, name, payload):
    (tmp_path / name).write_text(json.dumps(payload))


def _point_bench_at(monkeypatch, tmp_path):
    # _latest_prev_window resolves the repo dir from bench.__file__
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))


def test_sidecar_payload_does_not_shadow_canonical(monkeypatch, tmp_path):
    _point_bench_at(monkeypatch, tmp_path)
    _write(tmp_path, "bench_window_r13.json", {"sf": "0.1", "raw_times": {"q01": [1.0, 1.2]}})
    # same round, lexically later, NO raw_times — the r13 failure shape
    _write(tmp_path, "bench_window_r13_runA.json", {"sf": "0.1", "metric": "headline"})
    got = bench._latest_prev_window()
    assert got is not None
    name, sf, prev = got
    assert name == "bench_window_r13.json"
    assert sf == "0.1"
    assert prev == {"q01": 1.0}


def test_payload_without_raw_times_is_skipped_even_if_newest(monkeypatch, tmp_path):
    _point_bench_at(monkeypatch, tmp_path)
    _write(tmp_path, "bench_window_r14.json", {"sf": "0.1"})  # anchored name, empty payload
    _write(tmp_path, "bench_window_r13.json", {"sf": "0.1", "raw_times": {"q02": [2.0]}})
    got = bench._latest_prev_window()
    assert got is not None and got[0] == "bench_window_r13.json"
    assert got[2] == {"q02": 2.0}


def test_newest_round_wins(monkeypatch, tmp_path):
    _point_bench_at(monkeypatch, tmp_path)
    _write(tmp_path, "bench_window_r9.json", {"raw_times": {"q01": [9.0]}})
    _write(tmp_path, "bench_window_r14.json", {"sf": "0.1", "raw_times": {"q01": [14.0]}})
    got = bench._latest_prev_window()
    assert got is not None and got[0] == "bench_window_r14.json"
    assert got[2]["q01"] == 14.0


def test_no_candidates_returns_none(monkeypatch, tmp_path):
    _point_bench_at(monkeypatch, tmp_path)
    _write(tmp_path, "bench_window_r13_runA.json", {"metric": "headline"})
    assert bench._latest_prev_window() is None


def test_machine_state_fields_are_plain_numbers():
    """r15 (VERDICT r14 #3): the bench sidecar records machine state at
    window start/end. Best-effort by contract, but on this platform the
    core fields must exist and be JSON-serializable plain numbers."""
    state = bench.machine_state()
    for key in ("cpu_steal_pct_since_boot", "loadavg_1m", "tmp_spark_residue_bytes"):
        assert key in state, state
        assert isinstance(state[key], (int, float))
    json.dumps(state)  # must survive the sidecar round-trip


def test_outlier_rerun_is_opt_in_and_bounded(monkeypatch, tmp_path):
    """The outlier re-run protocol must stay OFF without the env toggle
    (the driver's min-of-N methodology is untouched) and, when on, must
    append at most OUTLIER_EXTRA_REPEATS extra repeats and only for
    queries whose min exceeds OUTLIER_RERUN_RATIO x the committed prior
    window's min. Pinned against the module constants so a silent
    default flip is caught."""
    # the behavior itself, not a tautology (ADVICE r15): unset => off,
    # set non-empty => on, empty string => off (falsy env value)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_RERUN_OUTLIERS", raising=False)
    assert bench.rerun_outliers_enabled() is False
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RERUN_OUTLIERS", "1")
    assert bench.rerun_outliers_enabled() is True
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RERUN_OUTLIERS", "")
    assert bench.rerun_outliers_enabled() is False
    assert bench.OUTLIER_RERUN_RATIO >= 2.0  # never reruns inside the noise band
    assert 1 <= bench.OUTLIER_EXTRA_REPEATS <= 3  # bounded extra work
