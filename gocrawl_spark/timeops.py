"""Temporal join & rollup operators Spark's DataFrame API lacks.

Three operators a crawl/event warehouse needs constantly and vanilla
Spark expresses badly (the naive spellings are non-equi joins that
plan as BroadcastNestedLoopJoin / CartesianProduct — quadratic at any
real scale):

- :func:`asof_join` — for each left row, the latest right row at or
  before its timestamp per key (pandas ``merge_asof`` / DuckDB
  ``ASOF JOIN`` semantics). Implemented as a tagged UNION + one
  window pass: ONE hash shuffle on the key, a per-partition sort,
  and a last-non-null carry-forward — O(n log n) per key group, no
  join operator at all, no row explosion. This is the
  state-at-fetch-time primitive: "which robots snapshot / host
  config / rate budget was live when this URL was fetched".

- :func:`interval_join` — events joined to the intervals containing
  them. Implemented by exploding each interval into fixed-width time
  granules and equi-joining on (key, granule) before the exact
  bounds filter — Spark gets a shuffled hash/sort-merge join with
  partial pushdown instead of a nested-loop scan. Granule width is
  the scale dial: explosion factor = interval_length/granule, so
  pick granule ≈ the p95 interval length (each interval lands in
  O(1) granules, each event in exactly 1).

- :func:`time_rollup` — one-pass multi-granularity aggregate
  (minute/hour/day hypertable-style continuous-aggregate shape) via
  GROUPING SETS: Spark's Expand replicates each row once per
  granularity BEFORE partial aggregation, so the plan stays a single
  shuffle with map-side combine — versus one scan+shuffle per
  granularity for the UNION-of-group-bys spelling.

The reference has no temporal-join surface (its crawler joins state
imperatively in Go); these follow the warehouse idioms its event log
would need at 10^10-row scale. Sums over double columns go through
integer cents (round(value·100)) so every aggregate is order-exact:
bit-equal across parallelism levels and against the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join", "time_rollup", "rollup_merge", "m4_downsample"]


def _epoch_us(c: Column) -> Column:
    """Epoch microseconds for TIMESTAMP_NTZ columns (the parquet-naive
    type the event tables carry) WITHOUT a session-timezone cast —
    unix_micros rejects NTZ, and casting NTZ→TIMESTAMP goes through
    the session zone, which is non-monotonic across a DST gap (02:59
    → 03:59 but 03:00 → 03:00), enough to mis-bucket a granule.
    timestamp_diff against the NTZ epoch is zone-free and exactly
    DuckDB's epoch_us(naive) semantics."""
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        c.cast("timestamp_ntz"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: for each left row, the single right row with the
    greatest ``right_ts`` ≤ ``left_ts`` (direction="backward"; with
    "forward", the least ``right_ts`` ≥ ``left_ts``; with "nearest",
    whichever of the two is closer, backward on ties) sharing the
    join key(s).

    Plan shape: tag each side, UNION, repartition by key (ONE
    Exchange), sort within partitions by (key, ts, side, right-row
    order), carry the right payload forward with last(ignorenulls)
    over the window — then keep only left rows. No join operator, no
    candidate-pair explosion; a hot key costs one partition-local
    sort, the same cost profile as any windowed aggregate.

    Determinism: at equal timestamps the right row sorts BEFORE the
    left row (non-strict match, as in DuckDB ASOF and pandas
    merge_asof) and right-side duplicates at the same (key, ts) are
    resolved to the row that sorts last by the remaining projected
    columns — the carry-forward therefore picks a unique winner.

    ``tolerance`` (seconds) drops matches farther than the bound.
    ``how="left"`` keeps unmatched left rows with NULL right columns.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"bad direction: {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"bad how: {how!r}")
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    out_right = [f"{c}{suffix}" if c in left.columns else c for c in right_cols]
    rts_out = f"{right_ts}{suffix}" if right_ts in left.columns else right_ts

    payload = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tag.schema["__p"].dataType).alias("__p"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    unioned = r_tag.unionByName(l_tag)

    # backward: scan time-ascending, carry the LATEST right row at-or-
    # before. forward: scan time-descending so the carry holds the
    # EARLIEST right row at-or-after. In both, right rows sort before
    # left rows at equal ts (non-strict match) and same-ts right
    # duplicates resolve to the same last-by-payload winner (asc __p ⇒
    # carry sees the largest payload last). nearest: BOTH carries over
    # the same key partitioning (one Exchange, two in-partition
    # sorts), then the smaller absolute gap wins, backward on ties —
    # pandas merge_asof's nearest rule.
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.asc("__t"), F.asc("__side"), F.asc("__p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.desc("__t"), F.asc("__side"), F.asc("__p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if direction == "backward":
        carried = unioned.withColumn(
            "__m", F.last("__p", ignorenulls=True).over(w_back)
        )
    elif direction == "forward":
        carried = unioned.withColumn(
            "__m", F.last("__p", ignorenulls=True).over(w_fwd)
        )
    else:  # nearest
        both = unioned.withColumn(
            "__mb", F.last("__p", ignorenulls=True).over(w_back)
        ).withColumn("__mf", F.last("__p", ignorenulls=True).over(w_fwd))
        bgap = _epoch_us(F.col("__t")) - _epoch_us(F.col("__mb.__ts"))
        fgap = _epoch_us(F.col("__mf.__ts")) - _epoch_us(F.col("__t"))
        carried = both.withColumn(
            "__m",
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(bgap <= fgap, F.col("__mb"))
            .otherwise(F.col("__mf")),
        ).drop("__mb", "__mf")

    rows = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        tol_us = int(tolerance) * 1_000_000
        gap = _epoch_us(F.col("__t")) - _epoch_us(F.col("__m.__ts"))
        if direction == "forward":
            gap = -gap
        elif direction == "nearest":
            gap = F.abs(gap)
        rows = rows.withColumn(
            "__m", F.when(gap <= F.lit(tol_us), F.col("__m"))
        )
    if how == "inner":
        rows = rows.filter(F.col("__m").isNotNull())
    return rows.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__m.__ts").alias(rts_out),
        *[F.col(f"__m.{c}").alias(o) for c, o in zip(right_cols, out_right)],
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    event_ts: str = "ts",
    start: str = "start",
    end: str = "end",
    granule_s: int = 600,
    how: str = "inner",
) -> DataFrame:
    """Join events to every interval containing them (``start`` ≤ ts ≤
    ``end``, inclusive both ends) sharing the key(s) — as an
    EQUI-join: intervals explode into the fixed-width time granules
    they cover, events map to their single granule, the join runs on
    (keys…, granule), and the exact bounds apply as a post-join
    filter. Each qualifying (event, interval) pair surfaces exactly
    once (an event has one granule; an interval covers it once), so
    no dedup pass is needed.

    ``granule_s`` is the scale dial: an interval spanning L seconds
    lands in ⌈L/granule⌉+1 granule rows. Set it near the typical
    interval length so the explosion factor stays O(1); too small
    explodes the build side, too large degrades the join's
    selectivity (more pairs killed only by the bounds filter).

    Output: every interval column, then the event columns (suffixed
    ``_e`` on collision). ``how="left"`` keeps empty intervals with
    NULL event columns; the empty-interval collapse groups by the full
    interval row, so byte-identical duplicate interval rows collapse
    to one NULL row (give intervals an id column if duplicates are
    meaningful). Malformed rows with ``end < start`` match nothing
    (zero pairs in inner mode, an empty interval in left mode) rather
    than failing the job.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"bad how: {how!r}")
    g = int(granule_s)
    ev_cols = [c for c in events.columns if c not in keys]
    out_ev = [f"{c}_e" if c in intervals.columns else c for c in ev_cols]

    # inverted rows (end < start) guard: sequence() with a negative
    # range and positive step throws at runtime — such rows instead
    # take a NULL granule (explode_outer), which can never equi-match
    # an event granule: they contribute zero pairs in inner mode and
    # surface as an empty interval in left mode.
    iv = intervals.withColumn(
        "__granule",
        F.explode_outer(
            F.when(
                F.col(end) >= F.col(start),
                F.sequence(
                    F.floor(_epoch_us(F.col(start)) / (g * 1_000_000)),
                    F.floor(_epoch_us(F.col(end)) / (g * 1_000_000)),
                    F.lit(1),
                ),
            )
        ),
    )
    ev = events.withColumn(
        "__eg", F.floor(_epoch_us(F.col(event_ts)) / (g * 1_000_000))
    ).select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        "__eg",
        *[F.col(c).alias(f"__e_{c}") for c in ev_cols],
        F.col(event_ts).alias("__et"),
    )
    cond = [iv["__granule"] == ev["__eg"]] + [
        iv[k] == ev[f"__k_{k}"] for k in keys
    ]
    in_bounds = (F.col("__et") >= F.col(start)) & (F.col("__et") <= F.col(end))
    if how == "inner":
        joined = iv.join(ev, cond, "inner").filter(in_bounds)
    else:
        joined = iv.join(ev, cond, "left").withColumns(
            {
                f"__e_{c}": F.when(in_bounds, F.col(f"__e_{c}"))
                for c in ev_cols
            }
        )
        # collapse granule rows: an interval with no in-bounds event
        # in ANY granule keeps one NULL row; matched granule rows that
        # lost their event to the bounds filter drop unless they are
        # that only-NULL survivor
        joined = joined.withColumn(
            "__keep",
            in_bounds
            | (
                F.count(F.when(in_bounds, F.lit(1))).over(
                    Window.partitionBy(*[intervals[c] for c in intervals.columns])
                )
                == 0
            )
            & (
                F.row_number().over(
                    Window.partitionBy(
                        *[intervals[c] for c in intervals.columns]
                    ).orderBy(F.asc("__granule"))
                )
                == 1
            ),
        ).filter(F.col("__keep"))
    return joined.select(
        *[iv[c] for c in intervals.columns],
        *[F.col(f"__e_{c}").alias(o) for c, o in zip(ev_cols, out_ev)],
    )


_TRUNCS = {
    "minute": ("minute", "yyyy-MM-dd HH:mm"),
    "hour": ("hour", "yyyy-MM-dd HH:00"),
    "day": ("day", "yyyy-MM-dd"),
    "week": ("week", "yyyy-MM-dd"),
    "month": ("month", "yyyy-MM"),
}


def time_rollup(
    events: DataFrame,
    ts: str = "ts",
    keys: list[str] | None = None,
    value: str | None = None,
    granularities: tuple[str, ...] = ("hour", "day"),
    as_cents: bool = False,
) -> DataFrame:
    """Multi-granularity rollup in ONE pass: for each granularity g,
    (bucket=date_trunc(g, ts), keys…) → count + order-exact value sum
    (integer cents: round(value·100) summed as BIGINT, re-scaled) —
    the hypertable continuous-aggregate shape.

    GROUPING SETS compiles to a single Expand (+1 row copy per
    granularity) feeding ONE partial+final aggregate — one shuffle
    total, map-side combine intact, versus one scan and shuffle per
    granularity if spelled as a UNION of group-bys.

    Output: granularity (string), bucket (formatted string — minute
    'yyyy-MM-dd HH:mm', hour 'yyyy-MM-dd HH:00', day 'yyyy-MM-dd'),
    keys…, n_events, sum_value (NULL when no value column).
    """
    keys = list(keys or [])
    for gname in granularities:
        if gname not in _TRUNCS:
            raise ValueError(f"bad granularity: {gname!r}")
    pre = events.select(
        *[F.col(k) for k in keys],
        *[
            F.date_format(
                F.date_trunc(_TRUNCS[gname][0], F.col(ts)), _TRUNCS[gname][1]
            ).alias(f"__b_{gname}")
            for gname in granularities
        ],
        *(
            [F.round(F.col(value) * 100, 0).cast("long").alias("__cents")]
            if value
            else []
        ),
    )
    bucket_cols = [f"__b_{g}" for g in granularities]
    sets = [[F.col(b)] + [F.col(k) for k in keys] for b in bucket_cols]
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value:
        # as_cents keeps the sum in exact integer cents — the MERGEABLE
        # form (cents add associatively; the /100.0 re-scale does not:
        # 10¢/100 is not an exact double, so deltas must merge BEFORE
        # the re-scale — see rollup_merge)
        if as_cents:
            aggs.append(F.sum("__cents").cast("long").alias("sum_cents"))
        else:
            aggs.append(
                (F.sum("__cents") / F.lit(100.0)).alias("sum_value")
            )
    rolled = pre.groupingSets(
        sets, *[F.col(c) for c in bucket_cols + keys]
    ).agg(*aggs)
    # each grouping set leaves the other bucket columns NULL — fold
    # them into (granularity, bucket)
    gran = F.coalesce(
        *[
            F.when(F.col(b).isNotNull(), F.lit(g))
            for g, b in zip(granularities, bucket_cols)
        ]
    )
    bucket = F.coalesce(*[F.col(b) for b in bucket_cols])
    return rolled.select(
        gran.alias("granularity"),
        bucket.alias("bucket"),
        *keys,
        "n_events",
        *((["sum_cents"] if as_cents else ["sum_value"]) if value else []),
    ).filter(F.col("bucket").isNotNull())


def rollup_merge(*rollups: DataFrame) -> DataFrame:
    """Incremental-view maintenance for :func:`time_rollup` outputs in
    cents form (``as_cents=True``): counts and integer-cent sums are
    associative, so the rollup of a day's delta merges into yesterday's
    materialized rollup with ONE small aggregate over bucket rows —
    never re-scanning history. Re-scale ``sum_cents/100.0`` only at
    read time (the double re-scale is NOT associative).

    All inputs must share the same schema (granularity, bucket, keys…,
    n_events[, sum_cents])."""
    if not rollups:
        raise ValueError("rollup_merge needs at least one rollup")
    out = rollups[0]
    for r in rollups[1:]:
        out = out.unionByName(r)
    measure_cols = [c for c in ("n_events", "sum_cents") if c in out.columns]
    group_cols = [c for c in out.columns if c not in measure_cols]
    agg = [F.sum(c).cast("long").alias(c) for c in measure_cols]
    return out.groupBy(*group_cols).agg(*agg)


def m4_downsample(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
    bucket_s: int = 3600,
) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., PVLDB 2014): per
    (keys…, fixed-width time bucket) keep exactly the four extreme
    points — first, last, min, max — the smallest reduction that
    renders a pixel-perfect line chart at the bucket resolution, and
    the standard way to ship a billion-point series to a dashboard.

    Unlike LTTB (sequential, depends on the previously selected
    point), M4 is embarrassingly parallel: ONE map-side-combining
    groupBy. Ties resolve by struct ordering — first/last by
    (epoch, value), min/max by (value, epoch) — so the output is
    bit-deterministic at any parallelism and in the SQL twin (rows
    with NULL values are excluded).

    Output: (keys…, bucket, n, t_first, v_first, t_last, v_last,
    t_min, v_min, t_max, v_max) with t_* as epoch microseconds.
    """
    keys = list(keys or [])
    staged = events.filter(F.col(value_col).isNotNull()).select(
        *keys,
        _epoch_us(F.col(ts_col)).alias("__ep"),
        F.col(value_col).cast("double").alias("__v"),
    )
    st_tv = F.struct(F.col("__ep").alias("t"), F.col("__v").alias("v"))
    st_vt = F.struct(F.col("__v").alias("v"), F.col("__ep").alias("t"))
    # exact integer DIV for the bucket index (a double division could
    # drift one ulp at a bucket edge; DuckDB's // is exact)
    bucket = F.expr(f"__ep DIV {int(bucket_s) * 1_000_000}")
    agg = (
        staged
        .groupBy(*keys, bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(st_tv).alias("_f"),
            F.max(st_tv).alias("_l"),
            F.min(st_vt).alias("_mn"),
            F.max(st_vt).alias("_mx"),
        )
    )
    return agg.select(
        *keys,
        "bucket",
        "n",
        F.col("_f.t").alias("t_first"),
        F.col("_f.v").alias("v_first"),
        F.col("_l.t").alias("t_last"),
        F.col("_l.v").alias("v_last"),
        F.col("_mn.t").alias("t_min"),
        F.col("_mn.v").alias("v_min"),
        F.col("_mx.t").alias("t_max"),
        F.col("_mx.v").alias("v_max"),
    )
