"""Time-series operators: as-of join (union-tag carry-forward plan)
and tumbling-window rollup.  Semantics pinned on hand-built event
streams; the one-shuffle/no-range-join shape pinned as a plan audit.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from rdf_n3_spark.operators.events import asof_join, event_rollup, latest_per_ts


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double")


def test_asof_picks_latest_prior_per_key(spark):
    left = _events(spark, [(10, _ts(30), 1, 0.0), (11, _ts(30), 2, 0.0)])
    right = _events(spark, [
        (1, _ts(10), 1, 1.0),   # older
        (2, _ts(20), 1, 2.0),   # latest prior for user 1
        (3, _ts(40), 1, 3.0),   # future: must not match
        (4, _ts(25), 2, 4.0),   # user 2's only prior
    ])
    rows = {r["event_id"]: r for r in
            asof_join(left, right).collect()}
    assert rows[10]["ref_event_id"] == 2 and rows[10]["ref_value"] == 2.0
    assert rows[11]["ref_event_id"] == 4


def test_asof_equal_ts_matches_and_no_prior_is_null(spark):
    left = _events(spark, [(10, _ts(30), 1, 0.0), (11, _ts(5), 1, 0.0)])
    right = _events(spark, [(1, _ts(30), 1, 9.0)])
    rows = {r["event_id"]: r for r in asof_join(left, right).collect()}
    # ts equality matches (<=), and a left row before any right row
    # gets NULLs, not a dropped row (LEFT as-of)
    assert rows[10]["ref_event_id"] == 1
    assert rows[11]["ref_event_id"] is None and rows[11]["ref_value"] is None


def test_asof_keys_do_not_leak_across_users(spark):
    left = _events(spark, [(10, _ts(30), 2, 0.0)])
    right = _events(spark, [(1, _ts(10), 1, 1.0)])
    [r] = asof_join(left, right).collect()
    assert r["ref_event_id"] is None


def test_latest_per_ts_keeps_max_order_row(spark):
    df = _events(spark, [
        (1, _ts(10), 1, 1.0), (5, _ts(10), 1, 5.0), (3, _ts(10), 1, 3.0)])
    [r] = latest_per_ts(df).collect()
    assert r["event_id"] == 5 and r["value"] == 5.0


def test_asof_plan_is_single_shuffle_no_range_join(spark):
    left = _events(spark, [(10, _ts(30), 1, 0.0)])
    right = _events(spark, [(1, _ts(10), 1, 1.0)])
    plan = asof_join(left, right)._jdf.queryExecution().executedPlan().toString()
    # the union-tag plan: a window over one key exchange; no joins at all
    assert "Join" not in plan
    assert "Window" in plan


def test_event_rollup_buckets_and_exact_cents(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(10), 1, "purchase", 1.10),
            (2, _ts(50), 1, "purchase", 2.25),
            (3, dt.datetime(2024, 1, 1, 1, 5), 1, "purchase", 4.00),
            (4, _ts(20), 2, "error", 0.55),
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double",
    )
    rows = {(r["bucket_epoch"], r["event_type"]): r
            for r in event_rollup(df, unit="hour").collect()}
    h0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    assert rows[(h0, "purchase")]["n_events"] == 2
    assert rows[(h0, "purchase")]["total_cents"] == 335
    assert rows[(h0, "purchase")]["max_cents"] == 225
    assert rows[(h0 + 3600, "purchase")]["total_cents"] == 400
    assert rows[(h0, "error")]["total_cents"] == 55


def test_sessionize_batch_gap_splits_sessions(spark):
    from rdf_n3_spark.operators.events import sessionize_batch

    df = _events(spark, [
        (1, _ts(0), 1, 0.0),
        (2, _ts(10), 1, 0.0),        # 10 min gap: same session
        (3, _ts(55), 1, 0.0),        # 45 min gap: new session
        (4, _ts(56), 1, 0.0),
        (5, _ts(5), 2, 0.0),         # other user: own numbering
    ])
    rows = {r["event_id"]: (r["session_idx"], r["session_event_idx"])
            for r in sessionize_batch(df, gap_minutes=30).collect()}
    assert rows[1] == (0, 0) and rows[2] == (0, 1)
    assert rows[3] == (1, 0) and rows[4] == (1, 1)
    assert rows[5] == (0, 0)


def test_sessionize_batch_exact_gap_is_same_session(spark):
    from rdf_n3_spark.operators.events import sessionize_batch

    df = _events(spark, [(1, _ts(0), 1, 0.0), (2, _ts(30), 1, 0.0)])
    rows = {r["event_id"]: r["session_idx"]
            for r in sessionize_batch(df, gap_minutes=30).collect()}
    # gap == threshold does NOT start a new session (strict >)
    assert rows[1] == 0 and rows[2] == 0


def test_sessionize_batch_single_exchange(spark):
    from rdf_n3_spark.operators.events import sessionize_batch

    df = _events(spark, [(1, _ts(0), 1, 0.0)])
    plan = sessionize_batch(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_event_quantiles_nearest_rank(spark):
    from rdf_n3_spark.operators.events import event_quantiles

    # 10 purchase rows with cents 100..1000: p50 → rank (9*50)//100+1=5
    # (cents 500), p95 → rank 9, p99 → rank 9
    rows = [(i, _ts(i), 1, "purchase", float(i)) for i in range(1, 11)]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double",
    )
    got = {(r["event_type"], r["p"]): r["cents_at_p"]
           for r in event_quantiles(df).collect()}
    assert got[("purchase", 50)] == 500
    assert got[("purchase", 95)] == 900
    assert got[("purchase", 99)] == 900


def test_event_quantiles_single_row_all_probs(spark):
    from rdf_n3_spark.operators.events import event_quantiles

    df = spark.createDataFrame(
        [(1, _ts(0), 1, "error", 3.5)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double",
    )
    got = event_quantiles(df).collect()
    assert len(got) == 3 and all(r["cents_at_p"] == 350 for r in got)


def test_histogram_quantiles_error_bound_and_merge(spark):
    """The sketch estimate is the exact quantile's bin lower boundary
    (error < width by construction), and histograms MERGE: sketching a
    doubled corpus gives identical picks (counts scale, boundaries
    don't move)."""
    from rdf_n3_spark.operators.events import (
        event_quantiles,
        histogram_quantiles,
    )

    from tests.conftest import SF_SMOKE

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    exact = {(r["event_type"], r["p"]): r["cents_at_p"]
             for r in event_quantiles(ev).collect()}
    rows = histogram_quantiles(ev, width_cents=600).collect()
    approx = {(r["event_type"], r["p"]): r["est_cents"] for r in rows}
    unclamped = {(r["event_type"], r["p"]) for r in rows if r["bin"] < 63}
    assert unclamped  # the width covers the domain: picks aren't clamped
    for key in unclamped & set(exact):
        assert approx[key] <= exact[key] < approx[key] + 600
    # the distributed-merge property: bin boundaries are data-
    # independent and counts add, so ANY partitioning of the input
    # (i.e. any map-side combine grouping) yields the identical sketch
    # and identical picks
    approx2 = {(r["event_type"], r["p"]): r["est_cents"]
               for r in histogram_quantiles(
                   ev.repartition(17), width_cents=600).collect()}
    assert approx2 == approx


# ----------------------------------------------------- props schema-on-read

def test_props_extract_typed_and_poison_tolerant(spark):
    """Well-formed rows extract typed values; malformed JSON, missing
    keys, and uncastable values degrade to NULL for that row only."""
    from rdf_n3_spark.operators.events import props_extract

    df = spark.createDataFrame(
        [(1, "a", '{"k": 7}'),
         (2, "a", '{"j": 1}'),          # missing key
         (3, "b", 'not json'),          # malformed
         (4, "b", '{"k": "x"}'),        # uncastable
         (5, "b", None)],               # null bag
        "event_id bigint, event_type string, props string")
    got = {r["event_id"]: r["k"] for r in props_extract(df).collect()}
    assert got == {1: 7, 2: None, 3: None, 4: None, 5: None}


def test_props_extract_multi_field_and_narrow_plan(spark):
    from rdf_n3_spark.operators.events import props_extract

    df = spark.createDataFrame(
        [(1, "a", '{"k": 7, "tag": "x"}')],
        "event_id bigint, event_type string, props string")
    out = props_extract(df, {"k": "bigint", "tag": "string"})
    assert out.collect()[0].asDict() == {
        "event_id": 1, "event_type": "a", "k": 7, "tag": "x"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan, plan


def test_props_rollup_known_values(spark):
    from rdf_n3_spark.operators.events import props_rollup

    df = spark.createDataFrame(
        [(1, "a", '{"k": 5}'), (2, "a", '{"k": 3}'),
         (3, "a", 'bad'), (4, "b", '{"k": -1}')],
        "event_id bigint, event_type string, props string")
    got = {r["event_type"]: r.asDict() for r in props_rollup(df).collect()}
    assert got["a"]["n_events"] == 3 and got["a"]["n_with_field"] == 2
    assert got["a"]["sum_f"] == 8 and got["a"]["min_f"] == 3
    assert got["b"]["sum_f"] == -1 and got["b"]["max_f"] == -1


def test_props_rollup_partial_aggregation(spark):
    """The rollup must partial-aggregate before the exchange (the
    map-side-combine contract every groupBy in the repo carries)."""
    from rdf_n3_spark.operators.events import props_rollup

    df = spark.createDataFrame(
        [(1, "a", '{"k": 5}')] * 8,
        "event_id bigint, event_type string, props string").repartition(4)
    plan = props_rollup(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, plan


# ------------------------------------------------------------------ funnel

def _fev(spark, rows):
    import datetime
    return spark.createDataFrame(
        [(u, datetime.datetime(2026, 1, 1, 0, 0, s), t)
         for u, s, t in rows],
        "user_id bigint, ts timestamp, event_type string")


def test_funnel_reach_sequential_semantics(spark):
    """Order matters: a purchase BEFORE the signup doesn't count, a
    later one does; same-timestamp consecutive steps progress."""
    from rdf_n3_spark.operators.events import funnel_reach

    steps = ["view", "click", "signup"]
    ev = _fev(spark, [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "signup"),   # full
        (2, 5, "click"), (2, 6, "view"),                     # click early
        (3, 0, "signup"),                                    # no view
        (4, 0, "view"), (4, 0, "click"), (4, 0, "signup"),   # all tied
        (5, 0, "view"), (5, 1, "signup"),                    # skip click
    ])
    got = {r["user_id"]: r["reached"]
           for r in funnel_reach(ev, steps).collect()}
    assert got == {1: 3, 2: 1, 3: 0, 4: 3, 5: 1}


def test_funnel_reach_uses_earliest_chain(spark):
    """Greedy earliest matching equals the iterative-min chain: the
    SECOND view (after the click) must not reset progression."""
    from rdf_n3_spark.operators.events import funnel_reach

    ev = _fev(spark, [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "view"), (1, 3, "signup"),
    ])
    assert funnel_reach(ev, ["view", "click", "signup"]) \
        .collect()[0]["reached"] == 3


def test_funnel_counts_monotone(spark):
    from rdf_n3_spark.operators.events import funnel_counts

    ev = _fev(spark, [
        (1, 0, "view"), (1, 1, "click"),
        (2, 0, "view"),
        (3, 0, "click"),
    ])
    got = {r["step_idx"]: r["n_users"]
           for r in funnel_counts(ev, ["view", "click"]).collect()}
    assert got == {0: 2, 1: 1}


def test_funnel_single_exchange(spark):
    """The reach plan pays ONE user-keyed exchange (the groupBy) —
    no per-step join rounds."""
    from rdf_n3_spark.operators.events import funnel_reach

    ev = _fev(spark, [(1, 0, "view")]).repartition(4)
    plan = funnel_reach(ev, ["view", "click", "signup"]) \
        ._jdf.queryExecution().executedPlan().toString()
    # input repartition contributes 1 Exchange; the operator adds only
    # the single hashpartitioning(user_id) aggregate exchange
    assert plan.count("Exchange") == 2, plan
    assert "Join" not in plan, plan


# --------------------------------------------------------------- retention

def test_retention_cohorts_known_triangle(spark):
    """Two cohort days; activity counted once per (user, offset);
    pre-cohort activity excluded."""
    import datetime
    from rdf_n3_spark.operators.events import retention_cohorts

    def ts(day, hour=0):
        return datetime.datetime(2026, 1, day, hour)

    rows = [
        # user 1 signs up day 1, active day 1 (twice) and day 3
        (1, ts(1), "signup"), (1, ts(1, 5), "click"),
        (1, ts(1, 9), "view"), (1, ts(3), "click"),
        # user 2 signs up day 1, active day 1 only — and a PRE-cohort
        # view on day-0 hour that must not count (offset would be <0)
        (2, ts(1, 2), "signup"), (2, ts(1, 3), "click"),
        # user 3 signs up day 2, active day 3
        (3, ts(2), "signup"), (3, ts(3), "view"),
        # user 4 never signs up — excluded entirely
        (4, ts(1), "click"),
    ]
    ev = spark.createDataFrame(
        [(i, u, t, et, 0.0, "{}") for i, (u, t, et) in enumerate(rows)],
        "event_id bigint, user_id bigint, ts timestamp, "
        "event_type string, value double, props string")
    base = int(datetime.datetime(2026, 1, 1).timestamp())
    got = {(r["cohort_epoch"], r["offset_days"]): r["n_users"]
           for r in retention_cohorts(ev).collect()}
    day = 86400
    assert got == {
        (base, 0): 2,          # users 1, 2 active on their cohort day
        (base, 2): 1,          # user 1 back on day 3
        (base + day, 0): 1,    # user 3's anchor itself is day-0 activity
        (base + day, 1): 1,    # user 3 (cohort day 2) back on day 3
    }


def test_retention_cohorts_activity_filter(spark):
    import datetime
    from rdf_n3_spark.operators.events import retention_cohorts

    ev = spark.createDataFrame(
        [(0, 1, datetime.datetime(2026, 1, 1), "signup", 0.0, "{}"),
         (1, 1, datetime.datetime(2026, 1, 2), "error", 0.0, "{}")],
        "event_id bigint, user_id bigint, ts timestamp, "
        "event_type string, value double, props string")
    offs = {r["offset_days"]
            for r in retention_cohorts(ev, activity_types=["click"])
            .collect()}
    assert offs == set()       # errors don't count as retention
    offs = {r["offset_days"] for r in retention_cohorts(ev).collect()}
    assert offs == {0, 1}      # unrestricted: signup day 0, error day 1


# ----------------------------------------------------- moving daily stats

def test_moving_daily_stats_gap_aware_trailing_window(spark):
    """RANGE framing: a 2-day window over days 1, 2, 5 — day 5's
    trailing stats must NOT include day 2 (value range, not rows)."""
    import datetime
    from rdf_n3_spark.operators.events import moving_daily_stats

    def ev(i, day, v):
        return (i, 1, datetime.datetime(2026, 1, day), "click", v, "{}")

    df = spark.createDataFrame(
        [ev(0, 1, 1.00), ev(1, 1, 2.00), ev(2, 2, 4.00), ev(3, 5, 8.00)],
        "event_id bigint, user_id bigint, ts timestamp, "
        "event_type string, value double, props string")
    got = {r["bucket_epoch"]: r.asDict()
           for r in moving_daily_stats(df, days=2).collect()}
    base = int(datetime.datetime(2026, 1, 1).timestamp())
    day = 86400
    d1, d2, d5 = got[base], got[base + day], got[base + 4 * day]
    assert d1["trail_n"] == 2 and d1["trail_cents"] == 300
    assert d2["trail_n"] == 3 and d2["trail_cents"] == 700   # days 1+2
    assert d5["trail_n"] == 1 and d5["trail_cents"] == 800   # gap: alone
    assert d2["trail_avg_cents"] == 700 // 3
    assert d5["trail_avg_cents"] == 800


def test_moving_daily_stats_window_runs_after_rollup(spark):
    """The range window's child must be the (type, day) aggregate —
    never the raw events (the histogram_quantiles tiny-window rule)."""
    import datetime
    from rdf_n3_spark.operators.events import moving_daily_stats

    df = spark.createDataFrame(
        [(0, 1, datetime.datetime(2026, 1, 1), "click", 1.0, "{}")] * 8,
        "event_id bigint, user_id bigint, ts timestamp, "
        "event_type string, value double, props string")
    plan = moving_daily_stats(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.index("Window") < plan.index("HashAggregate"), plan


def test_segment_funnel_attribution_and_unknown(spark):
    """Per-segment funnel: registry users report under their segment,
    unregistered users under UNKNOWN; counts follow funnel_reach."""
    from rdf_n3_spark.operators.events import segment_funnel

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "view"),
         (1, "2024-01-01 00:01:00", "click"),
         (2, "2024-01-01 00:00:00", "view"),
         (9, "2024-01-01 00:00:00", "view"),      # not in dim
         (9, "2024-01-01 00:01:00", "click"),
         (9, "2024-01-01 00:02:00", "signup")],
        "user_id int, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    cust = spark.createDataFrame(
        [(1, "BUILDING"), (2, "MACHINERY")],
        "c_custkey int, c_mktsegment string")
    out = segment_funnel(ev, cust, ["view", "click", "signup"])
    got = {(r["mktsegment"], r["step"], r["n_users"]) for r in out.collect()}
    assert got == {
        ("BUILDING", "view", 1), ("BUILDING", "click", 1),
        ("BUILDING", "signup", 0),
        ("MACHINERY", "view", 1), ("MACHINERY", "click", 0),
        ("MACHINERY", "signup", 0),
        ("UNKNOWN", "view", 1), ("UNKNOWN", "click", 1),
        ("UNKNOWN", "signup", 1),
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan


# --------------------------------------------------------- event_outliers


def _outlier_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double")


def test_event_outliers_exact_fences(spark):
    """11 rows total (outliers participate in the ranks): sorted cents
    −5000, 100..900, 4000 → q25 = rank (10·25)//100+1 = 3 → 200, q75 =
    rank 8 → 700, IQR 500 → fences [−1300, 2200].  Exactly the 40.00
    and −50.00 rows are flagged."""
    from rdf_n3_spark.operators.events import event_outliers

    rows = [(i, "a", float(i)) for i in range(1, 10)]
    rows += [(100, "a", 40.0), (101, "a", -50.0)]
    got = {(r["event_id"], r["side"]): r["cents"]
           for r in event_outliers(_outlier_events(spark, rows)).collect()}
    assert got == {(100, "hi"): 4000, (101, "lo"): -5000}


def test_event_outliers_nulls_excluded_and_types_isolated(spark):
    """A null value must neither be flagged nor shift the fences, and
    one type's spread must not leak into another's fences."""
    from rdf_n3_spark.operators.events import event_outliers

    rows = [(i, "a", float(i)) for i in range(1, 10)]
    rows += [(100, "a", 20.0), (50, "a", None)]
    # type b: huge spread → 20.0 would be inside ITS fences
    rows += [(200, "b", -1000.0), (201, "b", 1000.0), (202, "b", 0.0),
             (203, "b", 500.0), (204, "b", -500.0)]
    out = event_outliers(_outlier_events(spark, rows)).collect()
    ids = {r["event_id"] for r in out}
    assert ids == {100}


def test_event_outliers_flag_pass_is_broadcast(spark):
    """The fence table is event_type-sized: the flagging join must be a
    broadcast hash join, never a sort-merge exchange of the events."""
    from rdf_n3_spark.operators.events import event_outliers

    rows = [(i, "a", float(i % 7)) for i in range(50)]
    plan = (event_outliers(_outlier_events(spark, rows))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
