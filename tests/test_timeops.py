"""timeops: as-of join, interval containment join, multi-granularity
rollup — semantics (vs hand-computed and pandas-style expectations)
and the plan properties their 100 TB story rests on."""

from __future__ import annotations

import datetime as dt

import pytest

from gocrawl_spark import timeops


def T(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture()
def asof_frames(spark):
    left = spark.createDataFrame(
        [(1, "h1", T(10)), (2, "h1", T(20)), (3, "h2", T(5)), (4, "h3", T(30))],
        "id long, host string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("h1", T(8), 100), ("h1", T(10), 101), ("h1", T(25), 102),
         ("h2", T(7), 200), ("h1", T(10), 103)],
        "host string, ts timestamp, ver long",
    )
    return left, right


def test_asof_backward_semantics(spark, asof_frames):
    """Backward: latest right at-or-before; equal ts matches
    (non-strict); same-(key,ts) right duplicates resolve to the
    payload-largest row; left rows with no prior right drop on inner
    and survive as NULL on left."""
    left, right = asof_frames
    got = {
        r["id"]: r["ver"]
        for r in timeops.asof_join(left, right, on="host", how="left").collect()
    }
    assert got == {1: 103, 2: 103, 3: None, 4: None}
    inner = timeops.asof_join(left, right, on="host").collect()
    assert {r["id"] for r in inner} == {1, 2}
    # matched right timestamp is surfaced (suffixed on collision)
    assert {r["id"]: r["ts_r"] for r in inner} == {1: T(10), 2: T(10)}


def test_asof_forward_and_tolerance(spark, asof_frames):
    """Forward: earliest right at-or-after, same duplicate winner rule;
    tolerance bounds the gap in seconds (backward: left-right)."""
    left, right = asof_frames
    got = {
        r["id"]: r["ver"]
        for r in timeops.asof_join(
            left, right, on="host", direction="forward", how="left"
        ).collect()
    }
    # id1 at ts10: equal-ts duplicates → payload-largest (103), same
    # winner as backward; id2 → first later (ts25); id3 → ts7
    assert got == {1: 103, 2: 102, 3: 200, 4: None}
    got = {
        r["id"]: r["ver"]
        for r in timeops.asof_join(
            left, right, on="host", tolerance=5, how="left"
        ).collect()
    }
    assert got == {1: 103, 2: None, 3: None, 4: None}


def test_asof_plan_no_join_one_shuffle(spark, asof_frames):
    """The as-of join compiles to union + window: NO join operator of
    any kind and exactly ONE hash exchange (the key repartition)."""
    left, right = asof_frames
    plan = (
        timeops.asof_join(left, right, on="host")
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("SortMergeJoin", "BroadcastHashJoin",
                   "BroadcastNestedLoopJoin", "CartesianProduct",
                   "ShuffledHashJoin"):
        assert marker not in plan, marker
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" in plan


def test_interval_join_bounds_and_left(spark):
    """Containment is inclusive on both ends; granule boundaries do
    not lose or duplicate pairs; how='left' keeps empty intervals as
    one NULL row."""
    iv = spark.createDataFrame(
        [(10, "h1", T(5), T(15)), (11, "h1", T(50), T(55)),
         (12, "h2", T(0), T(59))],
        "iid long, host string, start timestamp, end timestamp",
    )
    ev = spark.createDataFrame(
        [("h1", T(5), 1.0), ("h1", T(15), 2.0), ("h1", T(16), 3.0),
         ("h2", T(30), 4.0)],
        "host string, ts timestamp, v double",
    )
    got = sorted(
        (r["iid"], r["v"])
        for r in timeops.interval_join(
            ev, iv, on="host", granule_s=10, how="left"
        ).collect()
    )
    # iid10: both endpoint events (5 and 15, inclusive); 16 excluded;
    # iid11: empty → one NULL row; iid12: the h2 event
    assert got == [(10, 1.0), (10, 2.0), (11, None), (12, 4.0)]
    inner = timeops.interval_join(ev, iv, on="host", granule_s=10).count()
    assert inner == 3
    # granule much larger than every interval: same result
    coarse = sorted(
        (r["iid"], r["v"])
        for r in timeops.interval_join(
            ev, iv, on="host", granule_s=3600, how="left"
        ).collect()
    )
    assert coarse == got

    # malformed interval (end < start): contributes zero matches
    # instead of blowing up sequence() — inner drops it, left keeps
    # it as an empty interval
    bad = iv.unionAll(
        spark.createDataFrame(
            [(13, "h1", T(20), T(10))],
            "iid long, host string, start timestamp, end timestamp",
        )
    )
    inner_bad = sorted(
        (r["iid"], r["v"])
        for r in timeops.interval_join(ev, bad, on="host", granule_s=10).collect()
    )
    assert inner_bad == [(10, 1.0), (10, 2.0), (12, 4.0)]
    left_bad = sorted(
        (r["iid"], r["v"])
        for r in timeops.interval_join(
            ev, bad, on="host", granule_s=10, how="left"
        ).collect()
    )
    assert left_bad == [(10, 1.0), (10, 2.0), (11, None), (12, 4.0), (13, None)]


def test_interval_join_overlapping_windows(spark):
    """An event inside two overlapping same-key intervals pairs with
    both (exactly once each)."""
    iv = spark.createDataFrame(
        [(1, "h", T(0), T(30)), (2, "h", T(10), T(40))],
        "iid long, host string, start timestamp, end timestamp",
    )
    ev = spark.createDataFrame(
        [("h", T(20), 7.0)], "host string, ts timestamp, v double"
    )
    got = sorted(
        r["iid"]
        for r in timeops.interval_join(ev, iv, on="host", granule_s=7).collect()
    )
    assert got == [1, 2]


def test_interval_join_plan_equi_join(spark):
    """The containment join must plan as an equi-join (sort-merge or
    shuffled hash) — never the BroadcastNestedLoopJoin a naive
    non-equi spelling produces."""
    iv = spark.createDataFrame(
        [(1, "h", T(0), T(30))],
        "iid long, host string, start timestamp, end timestamp",
    )
    ev = spark.createDataFrame(
        [("h", T(20), 7.0)], "host string, ts timestamp, v double"
    )
    plan = (
        timeops.interval_join(ev, iv, on="host")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert any(
        m in plan
        for m in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    ), plan


def test_time_rollup_values_and_plan(spark):
    """Hour+day buckets from one pass agree with per-granularity
    group-bys; sums are integer-cents exact; the plan carries ONE
    Expand and ONE hash exchange (map-side combine intact)."""
    events = spark.createDataFrame(
        [(T(10), "click", 1.25), (T(50), "click", 2.50),
         (dt.datetime(2024, 1, 1, 1, 0, 5), "view", 3.0),
         (dt.datetime(2024, 1, 2, 0, 0, 1), "click", 0.10)],
        "ts timestamp, event_type string, value double",
    )
    out = timeops.time_rollup(
        events, keys=["event_type"], value="value",
        granularities=("hour", "day"),
    )
    # plan first: after execution AQE's toString repeats the plan in an
    # "Initial Plan" section, doubling substring counts
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    rows = {
        (r["granularity"], r["bucket"], r["event_type"]):
            (r["n_events"], r["sum_value"])
        for r in out.collect()
    }
    assert rows[("hour", "2024-01-01 00:00", "click")] == (2, 3.75)
    assert rows[("hour", "2024-01-01 01:00", "view")] == (1, 3.0)
    assert rows[("day", "2024-01-01", "click")] == (2, 3.75)
    assert rows[("day", "2024-01-02", "click")] == (1, 0.10)
    assert len(rows) == 6

    # count-only rollup (no value column)
    out2 = timeops.time_rollup(events, granularities=("day",))
    assert {(r["bucket"], r["n_events"]) for r in out2.collect()} == {
        ("2024-01-01", 3), ("2024-01-02", 1)
    }


def test_timeops_bad_args(spark):
    df = spark.createDataFrame([("h", T(0), 1.0)],
                               "host string, ts timestamp, v double")
    with pytest.raises(ValueError, match="direction"):
        timeops.asof_join(df, df, on="host", direction="sideways")
    with pytest.raises(ValueError, match="how"):
        timeops.asof_join(df, df, on="host", how="outer")
    with pytest.raises(ValueError, match="granularity"):
        timeops.time_rollup(df, granularities=("decade",))


def test_rollup_merge_associative(spark):
    """Split rollups in cents form merge to exactly the full rollup;
    the double re-scale happens only after the merge."""
    events = spark.createDataFrame(
        [(T(10), "click", 0.10), (T(50), "click", 0.20),
         (dt.datetime(2024, 1, 2, 0, 0, 1), "click", 0.30)],
        "ts timestamp, event_type string, value double",
    )
    full = timeops.time_rollup(
        events, keys=["event_type"], value="value",
        granularities=("day",), as_cents=True,
    )
    h1 = timeops.time_rollup(
        events.filter("ts < '2024-01-02'"), keys=["event_type"],
        value="value", granularities=("day",), as_cents=True,
    )
    h2 = timeops.time_rollup(
        events.filter("ts >= '2024-01-02'"), keys=["event_type"],
        value="value", granularities=("day",), as_cents=True,
    )
    merged = timeops.rollup_merge(h1, h2)
    a = {tuple(r) for r in full.collect()}
    b = {tuple(r) for r in merged.collect()}
    assert a == b
    # 0.10+0.20 cents-exact: the per-half re-scaled doubles would NOT
    # have added exactly (0.1 is not a binary double)
    day1 = {r["bucket"]: r["sum_cents"] for r in merged.collect()}
    assert day1["2024-01-01"] == 30

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one"):
        timeops.rollup_merge()


def test_asof_nearest(spark, asof_frames):
    """nearest: closer of backward/forward wins, backward on ties;
    tolerance bounds the absolute gap."""
    left, right = asof_frames
    got = {
        r["id"]: r["ver"]
        for r in timeops.asof_join(
            left, right, on="host", direction="nearest", how="left"
        ).collect()
    }
    # id1 ts10: backward gap 0 → 103; id2 ts20: back gap 10 vs fwd
    # gap 5 → 102; id3 ts5: only forward (ts7) → 200; id4: none
    assert got == {1: 103, 2: 102, 3: 200, 4: None}
    got = {
        r["id"]: r["ver"]
        for r in timeops.asof_join(
            left, right, on="host", direction="nearest",
            tolerance=1, how="left",
        ).collect()
    }
    assert got == {1: 103, 2: None, 3: None, 4: None}
    # exact tie: equidistant backward/forward rows → backward wins
    l2 = spark.createDataFrame([(1, "h", T(10))], "id long, host string, ts timestamp")
    r2 = spark.createDataFrame(
        [("h", T(5), 1), ("h", T(15), 2)], "host string, ts timestamp, ver long"
    )
    tie = timeops.asof_join(l2, r2, on="host", direction="nearest").collect()
    assert tie[0]["ver"] == 1


def test_m4_downsample_extremes(spark):
    """Per bucket: first/last by time, min/max by value, struct-order
    deterministic ties; NULL values excluded; bucket via exact DIV."""
    rows = [
        ("a", T(1), 5.0), ("a", T(3), 1.0), ("a", T(5), 9.0), ("a", T(8), 4.0),
        ("a", T(11), 7.0),           # second bucket (10 s buckets)
        ("a", T(12), None),          # excluded
        ("b", T(2), 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    got = {
        (r["k"], r["bucket"]): r
        for r in timeops.m4_downsample(
            df, keys=["k"], bucket_s=10
        ).collect()
    }
    a0 = got[("a", T(1).timestamp().__trunc__() // 10)]
    assert a0["n"] == 4
    assert (a0["v_first"], a0["v_last"]) == (5.0, 4.0)
    assert (a0["v_min"], a0["v_max"]) == (1.0, 9.0)
    assert a0["t_min"] == int(T(3).timestamp() * 1_000_000)
    a1 = got[("a", T(11).timestamp().__trunc__() // 10)]
    assert a1["n"] == 1 and a1["v_first"] == a1["v_max"] == 7.0
    assert got[("b", T(2).timestamp().__trunc__() // 10)]["n"] == 1
