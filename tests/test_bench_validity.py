"""Bench self-validation logic (VERDICT r4 item 4).

Pins the per-metric validity policy: a loose secondary envelope must be
individually flagged without poisoning the run, retries must keep the
tightest attempt, and the median-of-attempt-medians fallback must engage
only when raw windows never tighten but attempt medians agree.
"""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

bench = importlib.import_module("bench")


class TestSpreadOk:
    def test_tight(self):
        assert bench._spread_ok([100.0, 99.0, 101.0])

    def test_loose(self):
        assert not bench._spread_ok([70.0, 100.0, 101.0])

    def test_boundary(self):
        # min exactly at 85% of median passes.
        assert bench._spread_ok([85.0, 100.0, 100.0])


class TestMeasureWithRetry:
    def test_tight_first_attempt_no_retry(self):
        calls = []

        def thunk():
            calls.append(1)
            return [100.0, 101.0, 99.0], 1.0

        log = {}
        rates, flops = bench._measure_with_retry("m", thunk, log,
                                                 max_retries=2)
        assert len(calls) == 1 and not log
        assert rates == [100.0, 101.0, 99.0] and flops == 1.0

    def test_keeps_tightest_attempt(self):
        attempts = iter([
            ([50.0, 100.0, 101.0], 1.0),   # loose
            ([98.0, 100.0, 101.0], None),  # tight
        ])

        def thunk():
            return next(attempts)

        log = {}
        rates, _ = bench._measure_with_retry(
            "m", thunk, log, max_retries=2)
        assert rates == [98.0, 100.0, 101.0]
        assert log["m"][-1]["retries"] == 1
        assert "policy" not in log["m"][-1]

    def test_median_of_attempt_medians_fallback(self, monkeypatch):
        monkeypatch.setattr(bench, "_wait_for_quiet", lambda *_: True)
        # Every attempt loose, but the attempt medians agree within 15%:
        # the fallback reports those medians and records the policy.
        attempts = iter([
            ([50.0, 100.0, 102.0], 1.0),
            ([60.0, 98.0, 103.0], None),
            ([55.0, 101.0, 104.0], None),
        ])
        log = {}
        rates, _ = bench._measure_with_retry(
            "m", lambda: next(attempts), log, max_retries=2)
        assert rates == [100.0, 98.0, 101.0]
        assert log["m"][-1]["policy"] == "median_of_attempt_medians"
        assert bench._spread_ok(rates)

    def test_fallback_needs_agreeing_medians(self, monkeypatch):
        monkeypatch.setattr(bench, "_wait_for_quiet", lambda *_: True)
        # Attempt medians disagree >15%: no fallback, tightest attempt kept.
        attempts = iter([
            ([50.0, 100.0, 102.0], 1.0),
            ([30.0, 60.0, 75.0], None),
            ([20.0, 50.0, 65.0], None),
        ])
        log = {}
        rates, _ = bench._measure_with_retry(
            "m", lambda: next(attempts), log, max_retries=2)
        assert "policy" not in log["m"][-1]
        assert rates == [50.0, 100.0, 102.0]  # tightest min/median ratio


class TestRunValidity:
    """Pins bench._run_validity — the function main() emits from, so a
    regression to the old any-loose-metric-poisons-the-run behavior (or a
    broken headline reason) fails here (VERDICT r4 item 4)."""

    def test_loose_secondary_flagged_not_fatal(self):
        env = {
            "shakespeare_train_it_s": [100.0, 101.0, 99.0],
            "guided_tokens_s": [50.0, 100.0, 101.0],
        }
        metric_valid, loose, reasons = bench._run_validity(env, True)
        assert metric_valid["shakespeare_train_it_s"]
        assert not metric_valid["guided_tokens_s"]
        assert loose == ["guided_tokens_s"]
        # Headline tight + solo -> run valid despite the loose secondary.
        assert reasons == []

    def test_loose_headline_invalidates_run(self):
        env = {"shakespeare_train_it_s": [50.0, 100.0, 101.0]}
        metric_valid, loose, reasons = bench._run_validity(env, True)
        assert not metric_valid["shakespeare_train_it_s"]
        assert loose == ["shakespeare_train_it_s"]
        assert any("headline" in r for r in reasons)

    def test_not_solo_invalidates_run(self):
        env = {"shakespeare_train_it_s": [100.0, 101.0, 99.0]}
        _, loose, reasons = bench._run_validity(env, False)
        assert loose == []
        assert any("solo" in r for r in reasons)
