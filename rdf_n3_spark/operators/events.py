"""Time-series operators over the events stream: as-of join and
tumbling-window rollups.

Beyond-reference per the brief (custom operators Spark lacks): the
as-of join is the canonical "attach the latest prior reference row"
primitive (trades, sensor reads, attribution), and the rollup is the
hypertable-style time-bucketed aggregate.

Scale shapes:

* :func:`asof_join` — the UNION-TAG plan, not a range join: tag both
  sides, union, and carry the latest right-side row forward onto each
  left row with one ``last(..., ignorenulls=True)`` running window
  per join key.  ONE shuffle on the join key, zero row explosion —
  a naive ``l.ts >= r.ts`` theta-join materializes O(|L|·|R|/keys)
  intermediate rows before picking the max, which dies on hot keys at
  100 TB; the union-tag plan is linear in |L|+|R| regardless of skew.

* :func:`event_rollup` — ``date_trunc`` bucketing + one map-side-
  combinable groupBy.  Money stays exact: DOUBLE values become
  bigint cents BEFORE the sum (float sums are order-nondeterministic
  across engines and partitionings; integer sums are associative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str = "user_id",
              ts: str = "ts", right_cols: tuple[str, ...] = ("event_id", "value"),
              prefix: str = "ref_") -> DataFrame:
    """LEFT AS-OF join: every ``left`` row, plus the columns of the
    single ``right`` row with the greatest ``ts`` ≤ the left row's
    ``ts`` for the same ``key`` (NULLs when no prior right row).

    Tie contract (mirrored by the DuckDB ``ASOF LEFT JOIN`` oracle,
    which requires a unique right side per (key, ts)): callers must
    pre-dedup the right side to one row per (key, ts); see
    :func:`latest_per_ts`.  Equal timestamps match (≤, not <), and a
    right row never matches a left row of an earlier timestamp.

    Plan: union-tag + per-key running ``last(ignorenulls)`` ordered by
    (ts, side) — side 0 sorts right rows before left rows at equal ts
    so an equal-ts reference is visible to its left row."""
    rtag = right.select(
        F.col(key).alias("__k"), F.col(ts).alias("__ts"), F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    lcols = left.columns
    ltag = left.select(
        F.col(key).alias("__k"), F.col(ts).alias("__ts"), F.lit(1).alias("__side"),
        *[F.lit(None).cast(rtag.schema[f"__r_{c}"].dataType).alias(f"__r_{c}")
          for c in right_cols],
        *lcols,
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ltag.unionByName(rtag, allowMissingColumns=True).select(
        "*",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
          for c in right_cols],
    )
    return carried.filter(F.col("__side") == 1).select(
        *lcols, *[f"{prefix}{c}" for c in right_cols]
    )


def latest_per_ts(df: DataFrame, key: str = "user_id", ts: str = "ts",
                  order: str = "event_id") -> DataFrame:
    """One row per (key, ts): the max-``order`` row — the deterministic
    right-side pre-dedup :func:`asof_join`'s tie contract needs."""
    w = Window.partitionBy(key, ts).orderBy(F.col(order).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30,
                     key: str = "user_id", ts: str = "ts") -> DataFrame:
    """(event_id, user_id, session_idx, session_event_idx) — batch
    gap-based sessionization, the batch twin of
    ``streaming/sessionize.py``: a new session starts when the gap to
    the previous event of the same key exceeds ``gap_minutes``.

    The classic two-window plan: lag(ts) per key → boolean
    session-start flag → running sum = session index.  Both windows
    share ONE key-ordered exchange (same partition + sort keys, Spark
    plans a single Window node chain), so the whole operator costs one
    shuffle.  Ties are broken by event_id in the sort so the
    assignment is total-order deterministic."""
    w = Window.partitionBy(key).orderBy(ts, "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(F.col(ts)).over(w)
    is_start = (
        prev.isNull()
        | ((F.unix_micros(F.col(ts).cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))) > gap_us)
    ).cast("bigint")
    flagged = events.select(
        "event_id", F.col(key), F.col(ts),
        is_start.alias("__s"),
        (F.row_number().over(w) - 1).cast("bigint").alias("__rank"),
    )
    # running last-start-rank on the SAME window spec — no second
    # exchange (a (key, session_idx)-partitioned window would reshuffle)
    return flagged.select(
        "event_id", key,
        (F.sum("__s").over(run) - 1).cast("bigint").alias("session_idx"),
        (F.col("__rank")
         - F.max(F.when(F.col("__s") == 1, F.col("__rank"))).over(run))
        .cast("bigint").alias("session_event_idx"),
    )


def event_quantiles(events: DataFrame,
                    probs: tuple[int, ...] = (50, 95, 99)) -> DataFrame:
    """(event_type, p, cents_at_p) — EXACT nearest-rank (lower)
    percentiles of the cents-quantized value per event type:
    the element at row_number ``(n-1)·p div 100 + 1`` in (cents,
    event_id) order.  Element selection, not interpolation —
    ``percentile_approx`` sketches differ across engines and
    ``percentile`` interpolates in floats; a selected element is
    bit-portable by construction.

    One event_type-keyed exchange: row_number and the partition count
    share the window spec, and the per-row percent explode is a
    narrow map.  At 100 TB a global sort per type is the exact-answer
    cost floor; for sketch-grade answers the rollup + a t-digest UDF
    would be the cheap path (not needed for the contract)."""
    w = Window.partitionBy("event_type").orderBy("__cents", "event_id")
    ranked = events.select(
        "event_type", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("__cents"),
    ).select(
        "event_type", "__cents",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("__n"),
    )
    return (
        ranked.select(
            "event_type", "__cents", "__rn", "__n",
            F.explode(F.array(*[F.lit(int(p)) for p in probs])).alias("p"),
        )
        .filter(F.col("__rn") == F.expr("((__n - 1) * p) div 100 + 1"))
        .select("event_type", "p", F.col("__cents").alias("cents_at_p"))
    )


def event_rollup(events: DataFrame, unit: str = "hour") -> DataFrame:
    """(bucket_epoch, event_type, n_events, total_cents, max_cents) —
    tumbling-window rollup.  One ``date_trunc`` + one partial-agg
    groupBy; buckets are epoch bigints and money is exact cents, so
    any engine reproduces the row set bit-for-bit."""
    cents = F.round(F.col("value") * 100).cast("bigint")
    return (
        events.select(
            F.date_trunc(unit, F.col("ts")).alias("__b"),
            "event_type",
            cents.alias("__cents"),
        )
        .groupBy("__b", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("__cents").alias("total_cents"),
            F.max("__cents").alias("max_cents"),
        )
        .select(
            # cast handles TIMESTAMP_NTZ sources (instant-preserving
            # under the repo's pinned-UTC session timezone)
            F.unix_timestamp(F.col("__b").cast("timestamp"))
            .cast("bigint").alias("bucket_epoch"),
            "event_type", "n_events", "total_cents", "max_cents",
        )
    )


def histogram_quantiles(events: DataFrame, width_cents: int = 100,
                        bins: int = 64,
                        percentiles: tuple = (50, 90, 99)) -> DataFrame:
    """(event_type, p, bin, est_cents) — approximate percentiles from a
    FIXED-BOUNDARY integer histogram sketch, the 100 TB complement of
    :func:`event_quantiles` (which shuffles every value to its key's
    reducer for the exact nearest-rank pick):

    * sketch: bin = clamp(cents div width_cents, 0, bins-1) → ONE
      map-side-combinable groupBy; per-key state is ≤ ``bins`` counts
      regardless of row count, and two sketches MERGE by adding counts
      (boundaries are data-independent — the property streaming /
      multi-day rollups need);
    * estimate: the smallest bin whose cumulative count reaches the
      SAME nearest-rank(lower) position the exact operator selects
      (⌊p·(n−1)/100⌋ + 1 — matching ranks is what makes the bound
      below hold); ``est_cents`` = that bin's LOWER boundary, so the
      exact quantile lies in [est, est + width) — all-integer,
      bit-identical across engines and partitionings;
    * the cumulative window runs over the TINY histogram
      (#event_types × bins rows), never over the events.

    Clamped top bin: values ≥ bins·width land in the last bin (its
    lower boundary under-estimates them — size ``bins`` to the domain,
    exactly like any fixed-range histogram)."""
    cents = F.round(F.col("value") * 100).try_cast("bigint")
    # floor() explicitly: double→bigint CAST truncates toward zero in
    # Spark but rounds in DuckDB — floor-then-cast agrees in both
    b = F.least(
        F.greatest(F.floor(cents / width_cents).cast("bigint"), F.lit(0)),
        F.lit(bins - 1),
    )
    # null/uncastable values are EXCLUDED, not binned: without the
    # filter, floor(NULL)=NULL and greatest(NULL, 0)=0 (greatest skips
    # NULLs) would count every null event at the bottom of the
    # histogram and drag the low percentiles down
    hist = (
        events.select("event_type", cents.alias("__c"), b.alias("bin"))
        .where(F.col("__c").isNotNull())
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_cum = (
        Window.partitionBy("event_type").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type", "bin",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_tot).alias("total"),
    )
    picks = None
    for p in percentiles:
        need = F.floor(F.lit(p) * (F.col("total") - 1) / 100) + 1
        cand = (
            cum.where(F.col("cum") >= need)
            .groupBy("event_type")
            .agg(F.min("bin").alias("bin"))
            .select(
                "event_type", F.lit(p).cast("int").alias("p"), "bin",
                (F.col("bin") * width_cents).cast("bigint").alias("est_cents"),
            )
        )
        picks = cand if picks is None else picks.unionByName(cand)
    return picks


def props_extract(events: DataFrame,
                  fields: dict[str, str] | None = None) -> DataFrame:
    """(event_id, event_type, <field>…) — schema-on-read extraction of
    the semi-structured ``props`` JSON column into typed columns
    (``fields`` maps JSON key → Spark cast type, default ``{"k":
    "bigint"}``).

    Every event pipeline carries a property bag like this; the Spark
    answer is `get_json_object` (JVM-side JSON path, whole-stage
    codegen) + `try`-semantics cast, a pure narrow map — zero shuffle,
    zero Python, pushdown-friendly (plan-audited).  Malformed JSON,
    a missing key, or an uncastable value degrade to NULL for THAT
    field of THAT row (the per-row poisoned-input contract the N3
    parser established); the DuckDB mirror gets identical semantics
    via ``TRY_CAST(props AS JSON)``.
    """
    fields = fields or {"k": "bigint"}
    cols = [
        F.get_json_object("props", f"$.{name}").try_cast(t).alias(name)
        for name, t in fields.items()
    ]
    return events.select("event_id", "event_type", *cols)


def props_rollup(events: DataFrame, field: str = "k") -> DataFrame:
    """(event_type, n_events, n_with_field, sum_f, min_f, max_f) — the
    per-type aggregate over one extracted props field: ONE map-side-
    combinable groupBy straight on top of :func:`props_extract`
    (integer sums only — exact, associative, engine-portable; a mean
    is ``sum_f / n_with_field`` downstream at whatever precision the
    consumer wants).  NULL-extracted rows count in ``n_events`` but
    not in ``n_with_field``/``sum_f`` — distinguishing "no events"
    from "events without the property"."""
    x = props_extract(events, {field: "bigint"})
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(field).alias("n_with_field"),
        F.sum(field).alias("sum_f"),
        F.min(field).alias("min_f"),
        F.max(field).alias("max_f"),
    )


def funnel_reach(events: DataFrame, steps: list[str]) -> DataFrame:
    """(user_id, reached) — sequential funnel progression: ``reached``
    = how many of ``steps`` the user completed IN ORDER, where step
    ``i`` counts only at a timestamp ≥ the time step ``i-1`` was
    reached (ties allowed: same-timestamp events may complete
    consecutive steps).  Output has one row per user with ≥ 1
    funnel-step event; ``reached = 0`` means the user has later-step
    events but never did step one.

    The naive formulation is k-1 dependent join+groupBy rounds (one
    conditional min per step).  This is the ONE-shuffle plan instead:
    filter to funnel events (pushed to the scan), collect each user's
    (ts, step_idx) pairs, `array_sort`, and fold with the `aggregate`
    HOF — greedy earliest-match over the sorted array, which computes
    exactly the iterative-min chain (the greedy matches the
    lexicographically-earliest completion sequence).  Everything stays
    JVM-side; per-user state is that user's funnel events only (the
    sessionize/event_quantiles per-key memory contract)."""
    idx = None
    for i, s in enumerate(steps):
        c = F.when(F.col("event_type") == s, i)
        idx = c if idx is None else idx.when(F.col("event_type") == s, i)
    arr = (
        events.where(F.col("event_type").isin(list(steps)))
        .select("user_id", F.struct(F.col("ts"), idx.alias("step_idx"))
                .alias("ev"))
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("ev")).alias("evs"))
    )
    reached = F.aggregate(
        "evs", F.lit(0),
        lambda acc, x: F.when(x["step_idx"] == acc, acc + 1).otherwise(acc),
    )
    return arr.select("user_id", reached.cast("int").alias("reached"))


def funnel_counts(events: DataFrame, steps: list[str]) -> DataFrame:
    """(step_idx, step, n_users) — the funnel report: for each step,
    how many users progressed at least that far (sequentially, per
    :func:`funnel_reach`).  One tiny k-row aggregate over the per-user
    reach — monotonically non-increasing down the funnel."""
    r = funnel_reach(events, steps)
    one = r.agg(*[
        F.sum(F.when(F.col("reached") >= i + 1, 1).otherwise(0))
        .cast("bigint").alias(f"s{i}")
        for i in range(len(steps))
    ])  # ONE pass over the reach table, k conditional sums
    stack = ", ".join(
        f"CAST({i} AS INT), '{s}', s{i}" for i, s in enumerate(steps))
    return one.selectExpr(
        f"stack({len(steps)}, {stack}) AS (step_idx, step, n_users)")


def retention_cohorts(events: DataFrame, anchor: str = "signup",
                      activity_types: list[str] | None = None) -> DataFrame:
    """(cohort_epoch, offset_days, n_users) — classic retention
    triangle: users cohorted by the DAY of their first ``anchor``
    event; for each later day-offset, how many of them showed any
    activity (optionally restricted to ``activity_types``).
    ``cohort_epoch`` is the epoch second of the cohort day (the
    `event_rollup` bucket_epoch discipline); offsets are CALENDAR-day
    differences (integer date arithmetic — no epoch division, so the
    row is exact even across DST-shifted days); activity before the
    cohort day is excluded.

    Plan: one user-keyed aggregate for the anchor day, an equi-join
    back onto the activity stream (user-keyed, AQE-broadcastable when
    the anchor cohort is small), one distinct on (user, cohort,
    offset) — a user is counted once per offset however many events
    they fired — and a final tiny (cohort × offset) count."""
    anchors = (
        events.where(F.col("event_type") == anchor)
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select(
            "user_id",
            F.unix_timestamp(F.date_trunc("day", "first_ts"))
            .cast("bigint").alias("cohort_epoch"),
            F.to_date("first_ts").alias("cohort_date"),
        )
    )
    act = events if activity_types is None else events.where(
        F.col("event_type").isin(list(activity_types)))
    return (
        act.select("user_id", F.to_date("ts").alias("d"))
        .join(anchors, "user_id")
        .select(
            "user_id", "cohort_epoch",
            F.datediff("d", "cohort_date").cast("int").alias("offset_days"),
        )
        .where(F.col("offset_days") >= 0)
        .distinct()
        .groupBy("cohort_epoch", "offset_days")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


def moving_daily_stats(events: DataFrame, days: int = 7) -> DataFrame:
    """(event_type, bucket_epoch, n_events, total_cents, trail_n,
    trail_cents, trail_avg_cents) — the daily series per event type
    with a TRAILING ``days``-day window (the smoothing every metrics
    dashboard applies): trailing sums via a RANGE frame over epoch
    seconds, so days with NO events simply don't extend the frame
    (gaps are handled by value range, not row offsets).

    Scale: the corpus collapses to the tiny (event_type × day) rollup
    via one map-side-combinable groupBy FIRST; the range window runs
    over that rollup only.  All integers — counts, exact cents, and a
    floor-div trailing average — so the series replays bit-for-bit in
    any engine."""
    cents = F.round(F.col("value") * 100).cast("bigint")
    daily = (
        events.select(
            "event_type",
            F.unix_timestamp(F.date_trunc("day", "ts"))
            .cast("bigint").alias("bucket_epoch"),
            cents.alias("__c"),
        )
        .groupBy("event_type", "bucket_epoch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("__c").alias("total_cents"),
        )
    )
    w = (
        Window.partitionBy("event_type").orderBy("bucket_epoch")
        .rangeBetween(-(days - 1) * 86400, 0)
    )
    return daily.select(
        "event_type", "bucket_epoch", "n_events", "total_cents",
        F.sum("n_events").over(w).cast("bigint").alias("trail_n"),
        F.sum("total_cents").over(w).cast("bigint").alias("trail_cents"),
        F.expr(f"CAST(sum(total_cents) OVER (PARTITION BY event_type "
               f"ORDER BY bucket_epoch RANGE BETWEEN {(days - 1) * 86400} "
               f"PRECEDING AND CURRENT ROW) DIV sum(n_events) OVER ("
               f"PARTITION BY event_type ORDER BY bucket_epoch RANGE "
               f"BETWEEN {(days - 1) * 86400} PRECEDING AND CURRENT ROW) "
               f"AS BIGINT)").alias("trail_avg_cents"),
    )


def segment_funnel(events: DataFrame, customer: DataFrame,
                   steps: list[str]) -> DataFrame:
    """(mktsegment, step_idx, step, n_users) — the funnel report
    (:func:`funnel_counts` semantics) broken down by the customer
    dimension's market segment: which segments convert and where each
    drops off.  Users without a registry row are reported under
    segment ``'UNKNOWN'`` rather than dropped (left join — the event
    stream is the ground truth, the dim adds attributes).

    Scale shape: the per-user reach is the existing ONE-shuffle sorted
    -array fold; the customer dim joins BROADCAST onto the user-sized
    reach table (never onto the event stream); the report is a tiny
    segments × steps aggregate of conditional sums."""
    r = funnel_reach(events, steps)
    seg = r.join(
        F.broadcast(customer.select(F.col("c_custkey").alias("user_id"),
                                    "c_mktsegment")),
        "user_id", "left",
    ).select(
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("mktsegment"),
        "reached",
    )
    per = seg.groupBy("mktsegment").agg(*[
        F.sum(F.when(F.col("reached") >= i + 1, 1).otherwise(0))
        .cast("bigint").alias(f"s{i}")
        for i in range(len(steps))
    ])
    stack = ", ".join(
        f"CAST({i} AS INT), '{s}', s{i}" for i, s in enumerate(steps))
    return per.selectExpr(
        "mktsegment",
        f"stack({len(steps)}, {stack}) AS (step_idx, step, n_users)")


def event_outliers(events: DataFrame, lo: int = 25, hi: int = 75,
                   iqr_mult: int = 3) -> DataFrame:
    """(event_id, event_type, cents, side) — exact Tukey-fence outlier
    screen per event type: flag events whose cents-quantized value lies
    outside ``[q_lo − m·IQR, q_hi + m·IQR]``, with q_lo/q_hi the EXACT
    nearest-rank percentiles (same ``(n−1)·p div 100 + 1`` element pick
    as :func:`event_quantiles`) and ``m = iqr_mult`` an integer so the
    fences — and therefore the flag set — are bit-identical across
    engines and partitionings (the classic mean±k·σ screen is float-
    order-nondeterministic; a selected-element fence is not).
    Null/uncastable values are excluded, mirroring the histogram
    operators' degradation contract.  ``side`` = 'hi' | 'lo'.

    Scale shape: the fence table is event_type-sized (broadcast into
    the flagging pass, which is a narrow scan); the quantile pick costs
    one per-type sorted window — the exact-answer floor shared with
    :func:`event_quantiles`.  At 100 TB, feed sketch-grade fences from
    :func:`histogram_quantiles` into the same broadcast-join instead;
    the flagging pass is unchanged."""
    cents = F.round(F.col("value") * 100).try_cast("bigint")
    base = events.select(
        "event_id", "event_type", cents.alias("cents")
    ).where(F.col("cents").isNotNull())
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = base.select(
        "event_type", "cents",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("__n"),
    )
    fences = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("__rn") == F.expr(f"((__n - 1) * {int(lo)}) div 100 + 1"),
                     F.col("cents"))).alias("q_lo"),
        F.max(F.when(F.col("__rn") == F.expr(f"((__n - 1) * {int(hi)}) div 100 + 1"),
                     F.col("cents"))).alias("q_hi"),
    ).select(
        "event_type",
        (F.col("q_lo") - iqr_mult * (F.col("q_hi") - F.col("q_lo"))).alias("f_lo"),
        (F.col("q_hi") + iqr_mult * (F.col("q_hi") - F.col("q_lo"))).alias("f_hi"),
    )
    return (
        base.join(F.broadcast(fences), "event_type")
        .where((F.col("cents") > F.col("f_hi")) | (F.col("cents") < F.col("f_lo")))
        .select(
            "event_id", "event_type", "cents",
            F.when(F.col("cents") > F.col("f_hi"), F.lit("hi"))
             .otherwise(F.lit("lo")).alias("side"),
        )
    )
