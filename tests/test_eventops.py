"""eventops: ordered-step funnel, cohort retention, transition
matrix — semantics on hand-built streams plus the one-Exchange funnel
plan contract."""

from __future__ import annotations

import datetime as dt

import pytest

from gocrawl_spark import eventops


def T(m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, m)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_funnel_ordered_steps(spark):
    """Step k requires steps 1..k−1 completed first, in time order; a
    conversion out of order does not count; equal-ts completion is
    at-or-after (inclusive)."""
    ev = _ev(spark, [
        # u1 completes all three in order
        (1, 1, T(0), "view"), (2, 1, T(5), "click"), (3, 1, T(9), "purchase"),
        # u2: purchase BEFORE click → stops at click
        (4, 2, T(0), "view"), (5, 2, T(3), "purchase"), (6, 2, T(7), "click"),
        # u3: click before any view → stops at view
        (7, 3, T(0), "click"), (8, 3, T(2), "view"),
        # u4: view only
        (9, 4, T(1), "view"),
        # u5: no view at all
        (10, 5, T(1), "click"), (11, 5, T(2), "purchase"),
    ])
    got = {
        r["step"]: r["n_users"]
        for r in eventops.funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 4, "click": 2, "purchase": 1}

    # equal timestamps: the tie order is STEP-AWARE (ts, step index,
    # type), so a click at exactly the view's ts sees the view in its
    # prefix and counts — regardless of how the type strings sort
    ev2 = _ev(spark, [(1, 1, T(0), "view"), (2, 1, T(0), "click")])
    got2 = {
        r["step"]: r["n_users"]
        for r in eventops.funnel(ev2, ["view", "click"]).collect()
    }
    assert got2 == {"view": 1, "click": 1}
    # …and symmetrically when the step names sort the other way
    # ('apple' < 'zebra'): equal-ts completion still counts
    ev2b = _ev(spark, [(1, 1, T(0), "zebra"), (2, 1, T(0), "apple")])
    got2b = {
        r["step"]: r["n_users"]
        for r in eventops.funnel(ev2b, ["zebra", "apple"]).collect()
    }
    assert got2b == {"zebra": 1, "apple": 1}
    # …whereas a click one tick later does count
    ev3 = _ev(spark, [(1, 1, T(0), "view"), (2, 1, T(1), "click")])
    got3 = {
        r["step"]: r["n_users"]
        for r in eventops.funnel(ev3, ["view", "click"]).collect()
    }
    assert got3 == {"view": 1, "click": 1}

    with pytest.raises(ValueError, match="at least one step"):
        eventops.funnel(ev, [])


def test_funnel_plan_one_hash_exchange(spark):
    """The chained step recurrence runs the window AND the per-user
    aggregate on the same user-hash partitioning: exactly ONE hash
    Exchange, no join operator."""
    ev = _ev(spark, [(1, 1, T(0), "view")])
    plan = (
        eventops.funnel(ev, ["view", "click", "purchase"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for marker in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert marker not in plan, marker


def test_cohort_retention_grid(spark):
    """cohort_day = first active day; offsets count distinct active
    days; retention is the exact ratio."""
    D = lambda d, h=0: dt.datetime(2024, 1, d, h)
    ev = _ev(spark, [
        # u1 first active day1, returns day2 (twice → one distinct)
        (1, 1, D(1), "view"), (2, 1, D(2), "view"), (3, 1, D(2, 5), "click"),
        # u2 first active day1 only
        (4, 2, D(1, 3), "view"),
        # u3 first active day2, returns day4
        (5, 3, D(2), "view"), (6, 3, D(4), "view"),
    ])
    got = {
        (r["cohort_day"], r["offset_days"]): (
            r["n_active"], r["cohort_size"], r["retention"]
        )
        for r in eventops.cohort_retention(ev).collect()
    }
    assert got[("2024-01-01", 0)] == (2, 2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 2, 0.5)
    assert got[("2024-01-02", 0)] == (1, 1, 1.0)
    assert got[("2024-01-02", 2)] == (1, 1, 1.0)
    assert len(got) == 4


def test_transitions_counts_and_probs(spark):
    """Consecutive same-user pairs only; counts exact; rows normalize
    to probability 1 per prev_type; event_id breaks equal-ts ties."""
    ev = _ev(spark, [
        (1, 1, T(0), "a"), (2, 1, T(1), "b"), (3, 1, T(2), "a"),
        (4, 1, T(3), "b"),
        (5, 2, T(0), "a"), (6, 2, T(1), "b"),
        # u3: equal timestamps — event_id orders c before d
        (7, 3, T(0), "c"), (8, 3, T(0), "d"),
    ])
    got = {
        (r["prev_type"], r["next_type"]): (r["n"], r["p"])
        for r in eventops.transitions(ev).collect()
    }
    assert got[("a", "b")] == (3, 1.0)
    assert got[("b", "a")] == (1, 1.0)
    assert got[("c", "d")] == (1, 1.0)
    assert ("d", "c") not in got
    assert len(got) == 3


def test_rate_anomaly_median_mad(spark):
    """Rank-selected lower medians; a burst bucket flags, steady
    buckets do not; all-equal counts give MAD 0 (any deviation
    flags)."""
    H = lambda d, h: dt.datetime(2024, 1, d, h)
    rows = []
    eid = 0
    # type 'a': five steady hours of 2 events, one burst hour of 50
    for h in range(5):
        for _ in range(2):
            rows.append((eid, 1, H(1, h), "a")); eid += 1
    for _ in range(50):
        rows.append((eid, 1, H(1, 6), "a")); eid += 1
    # type 'b': three hours of exactly 3 events — MAD 0, no anomalies
    for h in range(3):
        for _ in range(3):
            rows.append((eid, 2, H(2, h), "b")); eid += 1
    ev = _ev(spark, rows)
    got = {
        (r["event_type"], r["bucket"]): r
        for r in __import__("gocrawl_spark.eventops", fromlist=["eventops"])
        .rate_anomaly(ev).collect()
    }
    burst = got[("a", "2024-01-01 06:00")]
    assert burst["n"] == 50 and burst["median_n"] == 2 and burst["anomaly"]
    steady = got[("a", "2024-01-01 00:00")]
    assert steady["mad"] == 0 and not steady["anomaly"]
    assert all(not got[k]["anomaly"] for k in got if k[0] == "b")


def test_cusum_level_shift(spark):
    """A sustained +4 shift accumulates linearly and alarms from the
    first shifted bucket (MAD 0 on a majority-steady series); the
    steady prefix stays at 0; prefix-sum−running-min reproduces the
    max(0, ...) recurrence including recovery after a dip."""
    rows, eid = [], 0
    for h in range(10):
        for _ in range(5):
            rows.append((eid, 1, dt.datetime(2024, 1, 1, h), "a")); eid += 1
    for h in range(10, 16):
        for _ in range(9):
            rows.append((eid, 1, dt.datetime(2024, 1, 1, h), "a")); eid += 1
    ev = _ev(spark, rows)
    got = {
        r["bucket"]: (r["cusum"], r["alarm"])
        for r in eventops.cusum_changepoints(ev).collect()
    }
    assert got["2024-01-01 05:00"] == (0, False)
    assert got["2024-01-01 10:00"] == (4, True)
    assert got["2024-01-01 15:00"] == (24, True)

    # dip below baseline resets the statistic to 0 (never negative)
    rows2, eid = [], 0
    for h, n in enumerate([5, 5, 5, 1, 5, 5]):
        for _ in range(n):
            rows2.append((eid, 1, dt.datetime(2024, 1, 2, h), "b")); eid += 1
    got2 = {
        r["bucket"]: r["cusum"]
        for r in eventops.cusum_changepoints(_ev(spark, rows2)).collect()
    }
    assert got2["2024-01-02 03:00"] == 0   # max(0, −4) = 0
    assert got2["2024-01-02 04:00"] == 0   # recovered, not −4 + 0


def test_cusum_two_sided_quiet_source(spark):
    """two_sided=True densifies the hourly grid to the corpus span and
    runs a downward CUSUM, so a source going QUIET (zero-count hours,
    invisible to the sparse one-sided detector) accumulates and
    alarms; the steady type alarms on neither side."""
    rows, eid = [], 0
    # 'a' is steady at 5/h for the whole 16-hour span
    for h in range(16):
        for _ in range(5):
            rows.append((eid, 1, dt.datetime(2024, 1, 1, h), "a")); eid += 1
    # 'b' runs at 5/h for 10 hours, then dies — no 'b' rows after h=9
    for h in range(10):
        for _ in range(5):
            rows.append((eid, 2, dt.datetime(2024, 1, 1, h), "b")); eid += 1
    ev = _ev(spark, rows)

    # sparse one-sided mode: 'b' simply has no rows after 09:00 —
    # nothing to alarm on (the documented blind spot)
    sparse = eventops.cusum_changepoints(ev).filter("event_type = 'b'")
    assert sparse.count() == 10
    assert not any(r["alarm"] for r in sparse.collect())

    dense = {
        (r["event_type"], r["bucket"]): r
        for r in eventops.cusum_changepoints(ev, two_sided=True).collect()
    }
    # grid densified: 'b' now has 16 hourly rows, zeros in the tail
    assert len([k for k in dense if k[0] == "b"]) == 16
    assert dense[("b", "2024-01-01 12:00")]["n"] == 0
    # median over 16 rows (10×5, 6×0) = lower median 5, MAD 0 →
    # downward statistic climbs 5/quiet-hour and alarms immediately
    assert dense[("b", "2024-01-01 10:00")]["cusum_down"] == 5
    assert dense[("b", "2024-01-01 10:00")]["alarm"]
    assert dense[("b", "2024-01-01 15:00")]["cusum_down"] == 30
    # steady 'a': flat on both sides, never alarms
    assert not any(r["alarm"] for (t, _), r in dense.items() if t == "a")
    assert all(r["cusum"] == 0 and r["cusum_down"] == 0
               for (t, _), r in dense.items() if t == "a")


def test_funnel_durations_medians(spark):
    """Per-pair converting counts and rank-lower-median gaps in whole
    seconds; non-converting users excluded from that pair only."""
    ev = _ev(spark, [
        (1, 1, T(0), "view"), (2, 1, T(5), "click"), (3, 1, T(9), "purchase"),
        (4, 2, T(0), "view"), (5, 2, T(1), "click"),
        (6, 3, T(0), "view"), (7, 3, T(11), "click"),
        (8, 4, T(2), "view"),
    ])
    got = {
        r["step_index"]: r
        for r in eventops.funnel_durations(
            ev, ["view", "click", "purchase"]
        ).collect()
    }
    # view→click gaps 300/60/660 s → lower median (rank 2 of 3) = 300
    assert (got[0]["n_converted"], got[0]["median_gap_s"]) == (3, 300)
    assert (got[1]["n_converted"], got[1]["median_gap_s"]) == (1, 240)
    assert got[0]["step_from"] == "view" and got[1]["step_to"] == "purchase"

    with pytest.raises(ValueError, match="two steps"):
        eventops.funnel_durations(ev, ["view"])


def test_funnel_conversion_deadline(spark):
    """within_s: a step completing after the deadline does not count,
    a later in-window event still can, and the deadline applies per
    transition from the PREVIOUS step's completion."""
    ev = _ev(spark, [
        # u1: click 5 min after view — inside a 10-min window
        (1, 1, T(0), "view"), (2, 1, T(5), "click"),
        # u2: click 30 min after view — outside
        (3, 2, T(0), "view"), (4, 2, T(30), "click"),
        # u3: late click at 30 min, then another at 8 min? order forces
        # in-window click FIRST at 8 then late at 30 — completes at 8
        (5, 3, T(0), "view"), (6, 3, T(8), "click"), (7, 3, T(30), "click"),
        # u4: purchase 9 min after click which was 9 min after view —
        # both transitions inside the window even though total is 18
        (8, 4, T(0), "view"), (9, 4, T(9), "click"), (10, 4, T(18), "purchase"),
    ])
    got = {
        r["step"]: r["n_users"]
        for r in eventops.funnel(
            ev, ["view", "click", "purchase"], within_s=600
        ).collect()
    }
    assert got == {"view": 4, "click": 3, "purchase": 1}
    # without the deadline u2 converts too
    got2 = {
        r["step"]: r["n_users"]
        for r in eventops.funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert got2["click"] == 4
