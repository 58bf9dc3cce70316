"""Episode-aware band checking (r17, judge r16 #1): the co-measured DuckDB
control labels throttling episodes mechanically.  Pure-python tests over
tools/bench_baseline.check_bands — no Spark session."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from bench_baseline import (BANDS_FILE, SWING_MIN_S,  # noqa: E402
                            UNSTABLE_MIN_QUERIES, check_bands,
                            check_canary, check_instability)

BANDS = {
    "tolerance": 0.4,
    "abs_slack_s": 0.1,
    "duck_tolerance": 0.35,
    "duck_abs_slack_s": 0.05,
    "duck_total_tolerance": 0.2,
    "control_drift_min_breaches": 3,
    "bands": {"q_a": 0.5, "q_b": 1.0, "q_c": 2.0},
    "duck_bands": {"q_a": 0.2, "q_b": 1.0, "q_c": 3.0},
}


def test_quiet_run_no_breach_no_drift():
    spark = {"q_a": 0.55, "q_b": 0.9, "q_c": 2.1}
    duck = {"q_a": 0.2, "q_b": 1.05, "q_c": 2.8}
    breaches, control, drift = check_bands(spark, duck, BANDS)
    assert breaches == {} and control == {} and drift is False


def test_real_regression_quiet_control():
    """One spark query 3x its band while the control sits in band ->
    a genuine regression breach, NOT environment."""
    spark = {"q_a": 1.5, "q_b": 0.9, "q_c": 2.1}
    duck = {"q_a": 0.2, "q_b": 1.0, "q_c": 2.9}
    breaches, control, drift = check_bands(spark, duck, BANDS)
    assert drift is False and control == {}
    assert breaches == {"q_a": {"spark_s": 1.5, "band": 0.5,
                                "dir": "above"}}


def test_throttling_episode_flags_control_drift():
    """The r16 specimen, faked: EVERY query elevated ~2-3x on both sides,
    load guard blind — the elevated control labels the run environment."""
    spark = {"q_a": 1.4, "q_b": 2.8, "q_c": 5.5}      # all above band
    duck = {"q_a": 0.55, "q_b": 2.4, "q_c": 6.1}      # control elevated too
    breaches, control, drift = check_bands(spark, duck, BANDS)
    assert drift is True
    assert set(control) == {"q_a", "q_b", "q_c"}
    # spark breaches are still RECORDED (the caller reclassifies them)
    assert all(b["dir"] == "above" for b in breaches.values())


def test_total_drift_rule_catches_broad_mild_elevation():
    """A broad ~30% elevation that clears no single per-query band by the
    count rule still flips drift via the control-TOTAL rule."""
    spark = {"q_a": 0.5, "q_b": 1.0, "q_c": 2.0}
    duck = {"q_a": 0.26, "q_b": 1.3, "q_c": 3.75}     # +30% each, tot 5.31
    breaches, control, drift = check_bands(spark, duck, BANDS)
    assert len(control) < 3
    assert drift is True                               # 5.31 > 4.2 * 1.2


def test_fast_control_never_flags():
    """Above-only: a control FASTER than its bands is a better host, not
    an episode."""
    duck = {"q_a": 0.05, "q_b": 0.3, "q_c": 1.0}
    _b, control, drift = check_bands({}, duck, BANDS)
    assert control == {} and drift is False


def test_quiet_floor_jitter_is_not_instability():
    """The measured quiet-run shape (r17 resumed session, load1 0.15,
    control ON bands, round-best total): seven sub-0.4 s floor entries
    doubled between passes — ~0.2 s absolute scheduling jitter — while
    every real-work entry was stable.  The spread-only rule flagged this
    run; the swing-qualified rule must not."""
    passes = {
        # floor entries: spread > 2x, swing ~0.15-0.25 s (pure jitter)
        "q_day_rollup": [0.22, 0.385, 0.45],
        "q_lag_window": [0.10, 0.149, 0.33],
        "q_link_two_hop": [0.13, 0.20, 0.30],
        "q_yql_text": [0.09, 0.149, 0.27],
        "q_tpch_q1": [0.21, 0.315, 0.44],
        "q_related_items": [0.16, 0.283, 0.42],
        "dp_ann_bruteforce": [0.08, 0.124, 0.19],
        # real-work entries: stable
        "dp_text_stats": [2.32, 2.40, 2.69],
        "dp_lang_id": [0.45, 0.525, 0.66],
        "dp_neardup_scale": [1.60, 1.655, 1.78],
    }
    unstable, n, detail = check_instability(passes)
    assert unstable is False and n == 0 and detail == {}


def test_jvm_contention_swings_flag_instability():
    """The contended-window shape (OPTIMIZATION_r17.md specimens):
    queries swing multi-x by absolute seconds while the single-process
    control sits in band — dp_embed_neardup spreads 8.5x/44x, heavy
    entries gaining whole seconds between passes."""
    passes = {
        "dp_embed_neardup": [0.4, 1.7, 3.4],     # the 8.5x specimen
        "dp_text_stats": [2.3, 4.9, 5.6],
        "dp_neardup_scale": [1.7, 3.2, 4.4],
        "q_agg_stats": [0.3, 0.7, 1.1],
        "q_day_rollup": [0.25, 0.3, 0.35],       # not every query swings
    }
    unstable, n, detail = check_instability(passes)
    assert unstable is True and n >= UNSTABLE_MIN_QUERIES
    assert "dp_embed_neardup" in detail
    assert detail["dp_embed_neardup"]["swing_s"] == 3.0


def test_stable_regression_is_not_instability():
    """A genuine regression is STABLY slow: big absolute times, tiny
    spreads — never unstable (it must surface as a band breach, not be
    excused as environment)."""
    passes = {
        "dp_text_stats": [4.8, 4.9, 5.0],
        "dp_lang_id": [2.0, 2.05, 2.1],
        "dp_neardup_scale": [3.3, 3.4, 3.5],
    }
    unstable, n, _d = check_instability(passes)
    assert unstable is False and n == 0


def test_instability_needs_both_spread_and_swing():
    """Boundary: a big swing at low spread (3.0 -> 3.9 s) is load drift
    inside tolerance, not contention; a big spread under the absolute
    floor is jitter.  Only the conjunction qualifies."""
    big_swing_low_spread = {"a": [3.0, 3.5, 3.9]}   # spread 1.3, swing 0.9
    big_spread_low_swing = {"b": [0.05, 0.1, 0.2]}  # spread 4, swing 0.15
    both = {"c": [0.3, 0.9, 1.2]}                   # spread 4, swing 0.9
    assert check_instability(big_swing_low_spread)[1] == 0
    assert check_instability(big_spread_low_swing)[1] == 0
    assert check_instability(both)[1] == 1
    # the qualifying swing must exceed the absolute floor strictly
    at_floor = {"d": [0.1, 0.2, 0.1 + SWING_MIN_S]}
    assert check_instability(at_floor)[1] == 0


def test_single_huge_swing_flags_the_run():
    """The measured r17 calibration specimen: a run at load1 0.13 with
    the control in band swung dp_embed_neardup 0.4 -> 5.1 s (spread 10x,
    swing 4.75 s) while only one other query qualified — mid-run
    contention touching one heavy query must still flag the record."""
    passes = {
        "dp_embed_neardup": [0.38, 0.732, 5.13],
        "q_related_items": [0.25, 0.366, 0.673],
        "dp_text_stats": [3.33, 3.341, 3.35],    # stably elevated
        "q_day_rollup": [0.65, 0.714, 0.84],
    }
    unstable, n, detail = check_instability(passes)
    assert n == 2 and unstable is True
    assert detail["dp_embed_neardup"]["swing_s"] > 4


CANARY_BANDS = {"canary_s": 0.55, "canary_tolerance": 0.5}


def test_canary_quiet_host_not_inflated():
    """On-pin (and faster-than-pin) canaries never flag — above-only."""
    infl, flagged = check_canary([0.52, 0.58], CANARY_BANDS)
    assert flagged is False and infl == 1.05
    infl, flagged = check_canary([0.3, 0.35], CANARY_BANDS)
    assert flagged is False  # a faster host is a better host


def test_canary_steady_jvm_inflation_flags():
    """The steady JVM-only mode (docs/scale.md: every query uniformly
    ~1.5-2x at load1 0.02, control in band, spreads low): the
    repo-independent canary runs the same factor slow and labels it."""
    infl, flagged = check_canary([0.95, 1.05], CANARY_BANDS)
    assert flagged is True and infl == 1.91


def test_canary_compares_the_worst_leg():
    """The helper is list-shaped (experiments may measure several legs)
    and compares the WORST one.  The shipped protocol measures a single
    START leg — an end-of-run leg was built and REJECTED on measurement:
    it tracked the run's own JVM heap shrink/re-expand churn (end passes
    0.8-6.6 s vs fresh 0.73-0.78 s), not the host."""
    infl, flagged = check_canary([0.54, 1.1], CANARY_BANDS)
    assert flagged is True and infl == 2.0


def test_canary_without_pin_is_silent():
    assert check_canary([0.9, 1.0], {}) == (None, False)
    assert check_canary([], CANARY_BANDS) == (None, False)


def test_checked_in_bands_carry_the_control():
    """The shipped bench_bands.json pins a duck band for every compared
    query it pins a spark band for (the spark-only extras excepted)."""
    with open(BANDS_FILE) as f:
        bands = json.load(f)
    spark_only = {"dp_neardup_scale"}
    missing = (set(bands["bands"]) - spark_only) - set(bands["duck_bands"])
    assert missing == set()
    for k in ("duck_tolerance", "duck_total_tolerance",
              "control_drift_min_breaches"):
        assert k in bands
