"""Event-log analytics: ordered-step funnels, cohort retention,
transition matrices.

The behavioral-analytics triple every event warehouse runs daily,
expressed so each is ONE key shuffle (vs the join-per-step spelling
that shuffles once per funnel stage):

- :func:`funnel` — ordered-step conversion (step k counts a user only
  after steps 1..k-1 completed, in timestamp order). The chained
  "earliest qualifying event per step" recurrence folds into a single
  window pass: a running earliest-completion time per step over the
  user's prefix, then one aggregate on the SAME partitioning — so
  Catalyst plans one Exchange for both the window and the groupBy.

- :func:`cohort_retention` — users grouped by first-active period,
  activity counted per day offset. Two aggregations over the same
  user-keyed shuffle.

- :func:`transitions` — first-order event-type transition counts and
  exact-ratio probabilities from consecutive same-user events.

All counts are integers (order-exact at any parallelism); probability
columns divide two exact integers, so they are bit-equal across
engines too. Complements streaming.sessionize_events (the gap-based
session op) and timeops.time_rollup (the bucketed rollup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["funnel", "cohort_retention", "transitions", "rate_anomaly", "cusum_changepoints", "funnel_durations"]


def _step_rank(steps: list[str], type_col: str) -> Column:
    """Equal-timestamp tie key for the funnel windows: an event's step
    index (first occurrence for repeated types), non-step events after
    all steps. Makes equal-ts completion step-aware — the prior step's
    row always precedes the next step's row in the prefix — instead of
    depending on how the type STRINGS happen to sort."""
    rank: Column = F.lit(len(steps))
    seen: set[str] = set()
    for i, s in enumerate(steps):
        if s in seen:
            continue
        seen.add(s)
        rank = F.when(F.col(type_col) == F.lit(s), F.lit(i)).otherwise(rank)
    return rank


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_s: int | None = None,
) -> DataFrame:
    """Ordered conversion funnel: a user completes step k at the
    earliest event of type ``steps[k]`` at-or-after their step-k-1
    completion time. Output one row per step: (step_index, step,
    n_users) with n_users monotonically non-increasing.

    Single window pass: for each event row, a running
    earliest-completion timestamp per step over the user's
    time-ordered prefix — step k's running value fills in only once
    step k-1's is set, which is exactly the chained recurrence — then
    max(per-step completion flags) per user and one count per step.
    The window and the per-user aggregate share the user-hash
    partitioning: ONE Exchange total (the plan contract).

    Ties: an event at exactly the prior step's completion time
    qualifies (at-or-after), uniformly — equal-timestamp rows order by
    STEP INDEX (earlier funnel stages sort first, non-step events
    last, type name as the final key), so a step-k event at the same
    ts as the step-k−1 completion sees that completion in its prefix
    regardless of how the type strings compare lexicographically. A
    single event can complete several consecutive steps when their
    types coincide — matching the standard windowed-funnel semantics.

    ``within_s`` adds the conversion DEADLINE analytics funnels
    default to: step k counts only if it lands at most ``within_s``
    seconds after the step-k−1 completion (exact integer microsecond
    bound). A too-late event does not complete the step, but a later
    in-window event still can — the deadline is per-transition, not a
    give-up-after cursor.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.asc(ts_col), F.asc(_step_rank(steps, type_col)), F.asc(type_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cur = events.select(user_col, ts_col, type_col)
    prev_done: Column | None = None
    done_cols = []
    for i, step in enumerate(steps):
        qualifies = F.col(type_col) == F.lit(step)
        if prev_done is not None:
            qualifies = qualifies & prev_done.isNotNull() & (
                F.col(ts_col) >= prev_done
            )
            if within_s is not None:
                gap_us = F.timestamp_diff(
                    "MICROSECOND",
                    prev_done.cast("timestamp_ntz"),
                    F.col(ts_col).cast("timestamp_ntz"),
                )
                qualifies = qualifies & (
                    gap_us <= F.lit(int(within_s) * 1_000_000)
                )
        cur = cur.withColumn(
            f"__done_{i}",
            F.min(F.when(qualifies, F.col(ts_col))).over(w),
        )
        prev_done = F.col(f"__done_{i}")
        done_cols.append(f"__done_{i}")
    per_user = cur.groupBy(user_col).agg(
        *[F.max(F.col(c).isNotNull().cast("int")).alias(f"__c_{i}")
          for i, c in enumerate(done_cols)]
    )
    counts = per_user.agg(
        *[F.sum(f"__c_{i}").alias(f"__n_{i}") for i in range(len(steps))]
    )
    rows = [
        F.struct(
            F.lit(i).alias("step_index"),
            F.lit(step).alias("step"),
            F.col(f"__n_{i}").cast("long").alias("n_users"),
        )
        for i, step in enumerate(steps)
    ]
    return counts.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.step_index", "r.step", "r.n_users")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int = 30,
) -> DataFrame:
    """Day-grain cohort retention: cohort_day = a user's first active
    calendar day; for every (cohort_day, offset_days ≤ max) the count
    of cohort users active exactly offset days later, plus
    cohort_size and the exact retention ratio.

    Two aggregations on the user key (first-day, then distinct
    activity) followed by a small (cohort, offset) rollup — the heavy
    shuffles are both user-keyed, the final rollup's cardinality is
    days × offsets.
    """
    days = events.select(
        F.col(user_col).alias("u"), F.to_date(F.col(ts_col)).alias("d")
    ).distinct()
    first = days.groupBy("u").agg(F.min("d").alias("cohort_day"))
    joined = days.join(first, "u").withColumn(
        "offset_days", F.datediff(F.col("d"), F.col("cohort_day"))
    ).filter(F.col("offset_days") <= max_offset_days)
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    grid = joined.groupBy("cohort_day", "offset_days").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    return (
        grid.join(sizes, "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "offset_days",
            "n_active",
            "cohort_size",
            (F.col("n_active") / F.col("cohort_size")).alias("retention"),
        )
    )


def transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str | None = "event_id",
) -> DataFrame:
    """First-order transition matrix over consecutive same-user
    events: (prev_type, next_type, n, p) where p = n / Σ n over the
    prev_type row — the behavior-model input (and, on a crawl log,
    the fetch-outcome chain: ok→retry→ok…). ``order_col`` breaks
    equal-timestamp ties deterministically.

    One window pass (lag over the user's time-ordered events) + one
    small aggregate on (prev, next); probabilities divide two exact
    counts.
    """
    order = [F.asc(ts_col)] + ([F.asc(order_col)] if order_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.select(user_col, ts_col, type_col,
                      *([order_col] if order_col else []))
        .withColumn("__prev", F.lag(type_col).over(w))
        .filter(F.col("__prev").isNotNull())
    )
    counts = pairs.groupBy(
        F.col("__prev").alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    totals = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n") / F.sum("n").over(totals)).alias("p"),
    )


def rate_anomaly(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    k_mad: int = 3,
) -> DataFrame:
    """Hourly-rate anomaly audit per event type — the ops alarm for a
    crawl/event log (a fetch-error burst, a dead feed, a runaway
    host): bucket counts whose deviation from the type's median
    exceeds ``k_mad`` × the median-absolute-deviation.

    Everything is EXACT integer order statistics: the median and the
    MAD are rank-selected lower medians (rank (m+1) DIV 2 under a
    (value, bucket) total order), never interpolated — bit-equal at
    any parallelism and in the SQL twin. Output one row per (type,
    bucket): (event_type, bucket, n, median_n, mad, anomaly).

    Plan: one groupBy to bucket counts, then windows all partitioned
    by the type — a single hash Exchange on (type, bucket) for the
    aggregate and one on type for the windows.
    """
    bucket = F.date_format(
        F.date_trunc("hour", F.col(ts_col)), "yyyy-MM-dd HH:00"
    )
    counts = events.groupBy(
        F.col(type_col).alias("event_type"), bucket.alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))

    wt = Window.partitionBy("event_type")
    ranked = counts.select(
        "*",
        F.row_number()
        .over(wt.orderBy(F.asc("n"), F.asc("bucket")))
        .alias("_rn"),
        F.count(F.lit(1)).over(wt).alias("_m"),
    )
    with_med = ranked.select(
        "*",
        F.max(
            F.when(F.col("_rn") == F.expr("(_m + 1) DIV 2"), F.col("n"))
        )
        .over(wt)
        .alias("median_n"),
    ).withColumn("_dev", F.abs(F.col("n") - F.col("median_n")))
    with_mad = with_med.select(
        "*",
        F.row_number()
        .over(wt.orderBy(F.asc("_dev"), F.asc("bucket")))
        .alias("_rn2"),
    )
    out = with_mad.select(
        "*",
        F.max(
            F.when(F.col("_rn2") == F.expr("(_m + 1) DIV 2"), F.col("_dev"))
        )
        .over(wt)
        .alias("mad"),
    )
    return out.select(
        "event_type",
        "bucket",
        "n",
        "median_n",
        "mad",
        (F.col("_dev") > F.lit(int(k_mad)) * F.col("mad")).alias("anomaly"),
    )


def cusum_changepoints(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    k_h: int = 5,
    two_sided: bool = False,
) -> DataFrame:
    """CUSUM change detection over hourly counts per type — the
    sequential complement to :func:`rate_anomaly` (which flags
    isolated outlier buckets, CUSUM accumulates evidence of a
    SUSTAINED level shift).

    Default (``two_sided=False``): the UPWARD one-sided detector over
    the hours the type was ACTIVE — it accumulates only positive
    deviations (a host ramping errors, a scraper going hot) and,
    because empty hours produce no bucket rows, a source going quiet
    cannot raise an alarm in this mode.

    ``two_sided=True`` adds the quiet-source direction: the hourly
    grid is DENSIFIED to the corpus's full span per type (zero-count
    hours become real n=0 rows — grid size = #types × #hours in span,
    metadata-sized next to the events), and a downward CUSUM
    S⁻_i = max(0, S⁻_{i−1} + (median − n_i − allowance)) runs next to
    the upward one; either side alarms. Output gains ``cusum_down``.

    The textbook recurrence S_i = max(0, S_{i−1} + (n_i − median −
    allowance)) looks sequential, but with P_i the prefix sum of
    (n_i − median − allowance) it equals P_i − min_{j≤i} P_j — two
    window passes (running sum, running min) over each type's
    time-ordered buckets, no recursion, no UDF. Allowance = the
    rank-selected MAD (over the densified series when two-sided),
    alarm when S_i > ``k_h``·MAD — every quantity an exact integer,
    so the report is bit-equal across engines and parallelism.
    Output: (event_type, bucket, n, cusum, alarm) plus ``cusum_down``
    when two-sided.
    """
    bucket = F.date_format(
        F.date_trunc("hour", F.col(ts_col)), "yyyy-MM-dd HH:00"
    )
    counts = events.groupBy(
        F.col(type_col).alias("event_type"), bucket.alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    if two_sided:
        # densify: one broadcast 1-row global span × distinct types,
        # sequence-exploded to the hourly grid, counts left-joined in
        span = events.agg(
            F.date_trunc("hour", F.min(ts_col)).alias("_t0"),
            F.date_trunc("hour", F.max(ts_col)).alias("_t1"),
        )
        grid = (
            events.select(F.col(type_col).alias("event_type")).distinct()
            .join(F.broadcast(span))
            .select(
                "event_type",
                F.explode(
                    F.sequence("_t0", "_t1", F.expr("INTERVAL 1 HOUR"))
                ).alias("_h"),
            )
            .select(
                "event_type",
                F.date_format("_h", "yyyy-MM-dd HH:00").alias("bucket"),
            )
        )
        counts = grid.join(counts, ["event_type", "bucket"], "left").select(
            "event_type", "bucket", F.coalesce("n", F.lit(0)).alias("n")
        )

    wt = Window.partitionBy("event_type")
    ranked = counts.select(
        "*",
        F.row_number()
        .over(wt.orderBy(F.asc("n"), F.asc("bucket")))
        .alias("_rn"),
        F.count(F.lit(1)).over(wt).alias("_m"),
    )
    with_med = ranked.select(
        "*",
        F.max(
            F.when(F.col("_rn") == F.expr("(_m + 1) DIV 2"), F.col("n"))
        ).over(wt).alias("_med"),
    ).withColumn("_dev", F.abs(F.col("n") - F.col("_med")))
    with_mad = with_med.select(
        "*",
        F.row_number()
        .over(wt.orderBy(F.asc("_dev"), F.asc("bucket")))
        .alias("_rn2"),
    ).select(
        "*",
        F.max(
            F.when(F.col("_rn2") == F.expr("(_m + 1) DIV 2"), F.col("_dev"))
        ).over(wt).alias("_mad"),
    )
    wo = wt.orderBy(F.asc("bucket")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = with_mad.withColumn(
        "_x", F.col("n") - F.col("_med") - F.col("_mad")
    ).withColumn("_p", F.sum("_x").over(wo)).withColumn(
        "_pmin", F.min("_p").over(wo)
    )
    # S_i = P_i − min(0, running-min P): the implicit S_0 = 0 start
    # means the reference minimum includes the empty prefix
    s = F.col("_p") - F.least(F.lit(0), F.col("_pmin"))
    if not two_sided:
        return stepped.select(
            "event_type",
            "bucket",
            "n",
            s.cast("long").alias("cusum"),
            (s > F.lit(int(k_h)) * F.col("_mad")).alias("alarm"),
        )
    stepped = stepped.withColumn(
        "_xd", F.col("_med") - F.col("n") - F.col("_mad")
    ).withColumn("_pd", F.sum("_xd").over(wo)).withColumn(
        "_pdmin", F.min("_pd").over(wo)
    )
    sd = F.col("_pd") - F.least(F.lit(0), F.col("_pdmin"))
    bar = F.lit(int(k_h)) * F.col("_mad")
    return stepped.select(
        "event_type",
        "bucket",
        "n",
        s.cast("long").alias("cusum"),
        sd.cast("long").alias("cusum_down"),
        ((s > bar) | (sd > bar)).alias("alarm"),
    )


def funnel_durations(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert between adjacent funnel steps: for each (step
    k → step k+1) pair, how many users completed both and the EXACT
    rank-selected median seconds between their completion times — the
    metric product funnels report next to the counts.

    Reuses :func:`funnel`'s chained running-earliest-completion
    windows (including the step-aware equal-ts tie order); because the
    prefix is time-ordered, each step's running value is stable once
    set, so the per-user completion time is just min(done_k). Gaps are
    integer seconds (epoch diff), medians are lower medians at rank
    (m+1) DIV 2 under a (gap, user) total order — bit-equal at any
    parallelism and in the SQL twin. Output:
    (step_index, step_from, step_to, n_converted, median_gap_s).
    """
    if len(steps) < 2:
        raise ValueError("funnel_durations needs at least two steps")
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.asc(ts_col), F.asc(_step_rank(steps, type_col)), F.asc(type_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cur = events.select(user_col, ts_col, type_col)
    prev_done: Column | None = None
    for i, step in enumerate(steps):
        qualifies = F.col(type_col) == F.lit(step)
        if prev_done is not None:
            qualifies = qualifies & prev_done.isNotNull() & (
                F.col(ts_col) >= prev_done
            )
        cur = cur.withColumn(
            f"__done_{i}", F.min(F.when(qualifies, F.col(ts_col))).over(w)
        )
        prev_done = F.col(f"__done_{i}")
    per_user = cur.groupBy(user_col).agg(
        *[F.min(f"__done_{i}").alias(f"__t_{i}") for i in range(len(steps))]
    )
    outs = []
    for i in range(len(steps) - 1):
        # exact integer microseconds, then DIV to whole seconds — the
        # only gap arithmetic both engines share bit-for-bit (DuckDB's
        # date_diff('second',…) counts boundary CROSSINGS, not floored
        # difference)
        gap_us = F.timestamp_diff(
            "MICROSECOND",
            F.col(f"__t_{i}").cast("timestamp_ntz"),
            F.col(f"__t_{i + 1}").cast("timestamp_ntz"),
        )
        pair = (
            per_user.filter(F.col(f"__t_{i + 1}").isNotNull())
            .select(F.col(user_col).alias("u"), gap_us.alias("_gus"))
            .select("u", F.expr("_gus DIV 1000000").alias("gap_s"))
        )
        wp = Window.partitionBy()
        ranked = pair.select(
            "*",
            F.row_number()
            .over(wp.orderBy(F.asc("gap_s"), F.asc("u")))
            .alias("_rn"),
            F.count(F.lit(1)).over(wp).alias("_m"),
        )
        agg = ranked.agg(
            F.count(F.lit(1)).cast("long").alias("n_converted"),
            F.max(
                F.when(
                    F.col("_rn") == F.expr("(_m + 1) DIV 2"), F.col("gap_s")
                )
            ).cast("long").alias("median_gap_s"),
        ).select(
            F.lit(i).alias("step_index"),
            F.lit(steps[i]).alias("step_from"),
            F.lit(steps[i + 1]).alias("step_to"),
            "n_converted",
            "median_gap_s",
        )
        outs.append(agg)
    out = outs[0]
    for o_ in outs[1:]:
        out = out.unionByName(o_)
    return out
