"""Unit tests for the scaling-bench round summary (bench.py).

The measurement loop itself needs subprocesses and minutes of wall; the
selection/efficiency logic is pure and pinned here: the headline must
come from ONE round (both levels measured in the same host-drift
window, never each level's independent best), chosen by least combined
wall, with the full per-round spread preserved.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _round_efficiency, _summarize_rounds  # noqa: E402


def _round(lo_wall, hi_wall, n_docs=320_000, n_low=2, n_high=8):
    return {
        n_low: {"build_sec": lo_wall, "files_per_sec": n_docs / lo_wall},
        n_high: {"build_sec": hi_wall, "files_per_sec": n_docs / hi_wall},
    }


def test_round_efficiency_is_speedup_over_core_ratio():
    # 4x cores, 4x throughput -> 1.0; 4x cores, 2x throughput -> 0.5
    assert _round_efficiency(_round(400.0, 100.0), 2, 8) == pytest.approx(1.0)
    assert _round_efficiency(_round(400.0, 200.0), 2, 8) == pytest.approx(0.5)


def test_headline_is_least_combined_wall_not_best_ratio():
    clean = _round(354.0, 106.0)          # combined 460, eff ~0.835
    thrashed_lo = _round(700.0, 110.0)    # combined 810, eff ~1.59 (inflated!)
    thrashed_hi = _round(350.0, 200.0)    # combined 550, eff ~0.44 (deflated)
    s = _summarize_rounds([thrashed_lo, clean, thrashed_hi], 2, 8)
    # the slow-low round has the BEST ratio but must not win: its
    # denominator was measured on a degraded machine
    assert s["results"] is clean
    assert s["efficiency"] == pytest.approx(_round_efficiency(clean, 2, 8))
    # the spread stays visible for the report, in measurement order
    assert len(s["efficiency_per_round"]) == 3
    assert s["efficiency_per_round"][1] == pytest.approx(0.835, abs=0.001)


def test_headline_pairs_levels_from_one_round():
    # best-of-per-level would pick lo from round A and hi from round B
    # (eff 1.0); the paired summary may not exceed every round's eff
    a = _round(300.0, 150.0)  # fast lo, slow hi
    b = _round(600.0, 75.0)   # slow lo, fast hi
    s = _summarize_rounds([a, b], 2, 8)
    assert s["results"] in (a, b)
    cross = (320_000 / 75.0) / (320_000 / 300.0) / 4.0
    assert s["efficiency"] < cross  # never the cross-window pairing


def test_empty_rounds_rejected():
    with pytest.raises(ValueError, match="runs >= 1"):
        _summarize_rounds([], 2, 8)


def test_drift_discard_rule_and_distribution_stats():
    """Round-4 verdict item 7: the distribution over VALID rounds
    (combined wall <= DRIFT_DISCARD_FACTOR x best) is reported with
    median + min; degraded-phase rounds are excluded from the stats but
    stay visible in the all-rounds spread."""
    clean1 = _round(354.0, 106.0)   # combined 460, eff ~0.835
    clean2 = _round(360.0, 110.0)   # combined 470, eff ~0.818
    clean3 = _round(370.0, 115.0)   # combined 485, eff ~0.804
    thrashed = _round(500.0, 320.0)  # combined 820 > 1.5*460 -> discarded
    s = _summarize_rounds([clean2, thrashed, clean1, clean3], 2, 8)
    assert s["results"] is clean1
    assert s["rounds_discarded"] == 1
    assert len(s["efficiency_per_round"]) == 4      # all stay visible
    assert len(s["efficiency_valid_rounds"]) == 3   # stats skip the outlier
    assert s["efficiency_min"] == pytest.approx(0.804, abs=0.001)
    assert s["efficiency_median"] == pytest.approx(0.818, abs=0.001)
    assert s["discard_factor"] == 1.5


def test_discard_never_removes_the_headline_round():
    only = _round(400.0, 130.0)
    s = _summarize_rounds([only], 2, 8)
    assert s["rounds_discarded"] == 0
    assert s["efficiency_valid_rounds"] == s["efficiency_per_round"]
    assert s["efficiency_median"] == s["efficiency_min"]


def test_per_level_rule_discards_either_legs_outlier():
    """Revised protocol (committed mid-session-4, results unseen): a
    round is valid iff BOTH legs are within PER_LEVEL_DISCARD_FACTOR of
    the session's best wall at that level — the combined-wall rule
    never fires on a degraded ~120 s high leg because the ~390 s low
    leg dominates combined wall (the session-2 design-flaw note)."""
    clean1 = _round(390.0, 110.0)   # eff ~0.886
    clean2 = _round(400.0, 115.0)   # eff ~0.870
    clean3 = _round(395.0, 118.0)   # eff ~0.837
    bad_hi = _round(388.0, 170.0)   # hi 170 > 1.3*110 -> discarded
    bad_lo = _round(560.0, 112.0)   # lo 560 > 1.3*390 -> discarded (inflated eff!)
    s = _summarize_rounds([clean1, bad_hi, clean2, bad_lo, clean3], 2, 8)
    # combined rule misses bad_hi (558 < 1.5*500) — per-level catches it
    assert s["rounds_discarded"] < 2 <= s["rounds_pl_discarded"]
    assert s["rounds_pl_discarded"] == 2
    assert len(s["efficiency_pl_rounds"]) == 3
    assert s["pl_conclusive"] is True
    assert s["efficiency_pl_median"] == pytest.approx(0.870, abs=0.001)
    assert s["efficiency_pl_min"] == pytest.approx(0.837, abs=0.001)


def test_per_level_rule_inconclusive_below_min_valid():
    clean = _round(390.0, 110.0)
    bad1 = _round(390.0, 170.0)
    bad2 = _round(560.0, 112.0)
    s = _summarize_rounds([clean, bad1, bad2], 2, 8)
    assert s["rounds_pl_discarded"] == 2
    assert s["pl_conclusive"] is False          # 1 valid < MIN_VALID_ROUNDS
    assert s["efficiency_pl_median"] is not None  # stats still reported
