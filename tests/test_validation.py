"""Validation / SCD2 / sweep-line operator semantics on hand-checkable
data, plus plan assertions for the shuffle claims the docstrings make."""

from datetime import datetime

from pyspark.sql import functions as F


def _ts(s):
    return datetime.fromisoformat(s)


def test_data_quality_report_counts(spark):
    from datafusion_pinot_spark.operators.validation import data_quality_report

    li = spark.createDataFrame(
        [
            (1, 1, 10.0, 100.0, 0.05, 0.02, "A", "F", _ts("2024-01-01T00:00:00")),
            (1, 2, 60.0, -5.0, 0.20, 0.02, "X", "F", _ts("2024-01-02T00:00:00")),
            (2, 1, 20.0, 50.0, 0.00, 0.00, "N", "O", None),
            (2, 1, 30.0, 70.0, 0.10, 0.01, "R", "O", _ts("2024-01-03T00:00:00")),
        ],
        "l_orderkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    out = {r["check_name"]: r.asDict() for r in data_quality_report(li).collect()}
    assert out["quantity_range_1_50"]["n_fail"] == 1  # 60.0
    assert out["price_positive"]["n_fail"] == 1  # -5.0
    assert out["discount_range_0_01"]["n_fail"] == 1  # 0.20
    assert out["returnflag_domain"]["n_fail"] == 1  # 'X'
    assert out["shipdate_not_null"]["n_fail"] == 1  # None
    assert out["key_unique"]["n_pass"] == 3  # (2,1) duplicated
    assert out["key_unique"]["pass_rate_bp"] == 7500
    assert out["orderkey_not_null"]["pass_rate_bp"] == 10000


def test_data_quality_single_scan(spark, testdata):
    """All row-local constraints share one scan: the plan contains exactly
    one parquet scan for the constraint aggregate plus one for the
    uniqueness aggregate (the 1x1 combine must not rescan)."""
    from datafusion_pinot_spark.operators.validation import data_quality_report
    from datafusion_pinot_spark.plans.queries import t

    li = t(spark, "/root/testdata/sf0.001", "lineitem")
    plan = data_quality_report(li)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 2


def test_scd2_islands(spark):
    from datafusion_pinot_spark.operators.temporal import scd2_user_state

    ev = spark.createDataFrame(
        [
            (1, 7, "a", _ts("2024-01-01T00:00:00")),
            (2, 7, "a", _ts("2024-01-01T01:00:00")),  # same run
            (3, 7, "b", _ts("2024-01-01T02:00:00")),  # new state
            (4, 7, "a", _ts("2024-01-01T03:00:00")),  # back to a => new version
            (5, 9, "b", _ts("2024-01-01T00:30:00")),
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    rows = scd2_user_state(ev).collect()
    u7 = [r for r in rows if r["user_id"] == 7]
    assert [(r["version"], r["state"], r["n_events"]) for r in u7] == [
        (1, "a", 2),
        (2, "b", 1),
        (3, "a", 1),
    ]
    # intervals chain: valid_to of version k == valid_from of k+1; last open
    assert u7[0]["valid_to_us"] == u7[1]["valid_from_us"]
    assert u7[2]["valid_to_us"] is None
    u9 = [r for r in rows if r["user_id"] == 9]
    assert len(u9) == 1 and u9[0]["valid_to_us"] is None


def test_scd2_point_in_time_attribution(spark):
    from datafusion_pinot_spark.operators.temporal import scd2_point_in_time

    ev = spark.createDataFrame(
        [
            # user 1: state 'view' from 00:00, 'click' from 02:00
            (1, 1, "view", _ts("2024-01-01T00:00:00"), 0.0),
            (2, 1, "click", _ts("2024-01-01T02:00:00"), 0.0),
            # purchases: before any state, inside view, at click boundary
            (3, 1, "purchase", _ts("2023-12-31T23:00:00"), 10.0),
            (4, 1, "purchase", _ts("2024-01-01T01:00:00"), 20.0),
            (5, 1, "purchase", _ts("2024-01-01T02:00:00"), 40.0),
        ],
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    )
    out = {r["state"]: (r["n_facts"], r["value_cents"]) for r in
           scd2_point_in_time(ev).collect()}
    assert out["none"] == (1, 1000)
    assert out["view"] == (1, 2000)
    assert out["click"] == (1, 4000)  # boundary ts belongs to the new state


def test_max_concurrency_sweep(spark):
    from datafusion_pinot_spark.operators.temporal import max_concurrency_daily

    ev = spark.createDataFrame(
        [
            # three users overlapping within one hour => concurrency 3
            (1, 1, "e", _ts("2024-01-05T10:00:00"), 0.0),
            (2, 2, "e", _ts("2024-01-05T10:20:00"), 0.0),
            (3, 3, "e", _ts("2024-01-05T10:40:00"), 0.0),
            # same user again 30 min later: merges into one interval, NOT +1
            (4, 1, "e", _ts("2024-01-05T10:30:00"), 0.0),
            # lone user next day, interval crosses midnight (23:40 + 1h)
            (5, 4, "e", _ts("2024-01-06T23:40:00"), 0.0),
        ],
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    )
    rows = {str(r["date"]): r.asDict() for r in max_concurrency_daily(ev).collect()}
    assert rows["2024-01-05"]["max_concurrency"] == 3
    assert rows["2024-01-05"]["n_sessions"] == 3  # user 1's two events merged
    assert rows["2024-01-06"]["max_concurrency"] == 1
    # the crossing interval contributes a clipped session to Jan 7 too
    assert rows["2024-01-07"]["max_concurrency"] == 1


def test_equi_depth_histogram_depths(spark):
    from datafusion_pinot_spark.operators.validation import equi_depth_histogram

    li = spark.createDataFrame(
        [(i, 1, float(i)) for i in range(1, 17)],
        "l_orderkey long, l_linenumber int, l_extendedprice double",
    )
    rows = equi_depth_histogram(li, buckets=4).collect()
    assert [r["n_rows"] for r in rows] == [4, 4, 4, 4]
    assert [r["lo_cents"] for r in rows] == [100, 500, 900, 1300]
    assert [r["hi_cents"] for r in rows] == [400, 800, 1200, 1600]


def test_equi_depth_no_single_partition_sort(spark, testdata):
    """The global rank must come from the bucketed two-pass path: no
    window in the plan may order the full table in one partition. The
    only unpartitioned window runs over the tiny per-range frame."""
    from datafusion_pinot_spark.operators.validation import equi_depth_histogram
    from datafusion_pinot_spark.plans.queries import t

    li = t(spark, "/root/testdata/sf0.001", "lineitem")
    plan = (
        equi_depth_histogram(li)._jdf.queryExecution().executedPlan().toString()
    )
    # exactly one SinglePartition exchange — the tiny per-range prefix
    # frame — and it feeds the range-keyed aggregate, not the table
    assert plan.count("Exchange SinglePartition") == 1
    tail = plan.split("Exchange SinglePartition")[1]
    assert "HashAggregate(keys=[__bucket" in tail
    # the table-side row_number window partitions by the range bucket
    assert "windowspecdefinition(__bucket" in plan


def test_psi_drift_zero_when_identical(spark):
    from datafusion_pinot_spark.operators.validation import psi_drift

    # same category mix in both parities => psi == 0 for every category
    rows = []
    eid = 0
    for day in (1, 8):  # epoch-week parity 0 and 1 (2024-01-01 ≈ week start)
        for cat, n in (("a", 4), ("b", 2)):
            for _ in range(n):
                eid += 1
                rows.append((eid, 1, cat, _ts(f"2024-01-0{day}T00:00:00")))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = psi_drift(ev).collect()
    assert all(r["psi_contrib"] == 0.0 for r in out)
    assert {r["category"]: r["p_ppm"] for r in out} == {
        "a": 666666,
        "b": 333333,
    }


def test_mad_anomaly_flags_spike_only(spark):
    from datafusion_pinot_spark.operators.validation import mad_anomaly_days

    # 9 quiet days (2 events) + one 40-event spike; second category flat
    rows, eid = [], 0
    for d in range(1, 10):
        for _ in range(2):
            eid += 1
            rows.append((eid, 1, "a", _ts(f"2024-01-0{d}T12:00:00")))
    for _ in range(40):
        eid += 1
        rows.append((eid, 1, "a", _ts("2024-01-10T12:00:00")))
    for d in range(1, 10):
        eid += 1
        rows.append((eid, 1, "b", _ts(f"2024-01-0{d}T12:00:00")))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = mad_anomaly_days(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["category"], str(r["date"]), r["n_events"]) == (
        "a",
        "2024-01-10",
        40,
    )
    assert r["median_n"] == 2 and r["mad_n"] == 0


def test_ohlc_deterministic_ties(spark):
    from datafusion_pinot_spark.operators.temporal import ohlc_bars

    # two events at the SAME microsecond: event_id breaks the tie, so
    # open is id 1's value and close is id 4's
    ev = spark.createDataFrame(
        [
            (2, 1, "m", _ts("2024-01-01T00:00:00"), 5.0),
            (1, 1, "m", _ts("2024-01-01T00:00:00"), 3.0),
            (3, 1, "m", _ts("2024-01-01T12:00:00"), 9.0),
            (4, 1, "m", _ts("2024-01-01T23:59:59"), 1.0),
        ],
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    )
    r = ohlc_bars(ev).collect()[0]
    assert (r["open_cents"], r["high_cents"], r["low_cents"], r["close_cents"]) == (
        300,
        900,
        100,
        100,
    )
    assert r["volume_cents"] == 1800 and r["n_events"] == 4


def test_time_weighted_average_step_semantics(spark):
    from datafusion_pinot_spark.operators.temporal import time_weighted_average

    # value 10 holds 3600s, value 20 holds 1800s, final sample drops:
    # twa = (1000*3600 + 2000*1800) / 5400 / 100 = 13.3333
    ev = spark.createDataFrame(
        [
            (1, 1, "m", _ts("2024-01-01T00:00:00"), 10.0),
            (2, 1, "m", _ts("2024-01-01T01:00:00"), 20.0),
            (3, 1, "m", _ts("2024-01-01T01:30:00"), 99.0),
        ],
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    )
    r = time_weighted_average(ev).collect()[0]
    assert r["n_intervals"] == 2
    assert r["total_dur_s"] == 5400
    assert r["twa_value"] == 13.3333


def test_ab_test_median_split(spark):
    from datafusion_pinot_spark.operators.experiment import ab_test_conversion

    # 4 users: spends 10, 20, 30, 40 -> low-median 20; converted = {3, 4}
    # (u=3 odd -> variant B, u=4 even -> variant A)
    rows = []
    eid = 0
    for u, spend in ((1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)):
        eid += 1
        rows.append((eid, u, "purchase", _ts("2024-01-01T00:00:00"), spend))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    r = ab_test_conversion(ev).collect()[0]
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (2, 1, 2, 1)
    assert r["rate_a_ppm"] == 500000 and r["rate_b_ppm"] == 500000
    assert r["z_stat"] == 0.0  # identical rates


def test_rfm_codes(spark):
    from datafusion_pinot_spark.operators.experiment import rfm_segments

    # 4 users, fully ordered on every dimension; quartiles of 4 users
    # put one user per score. User 4: most recent + most events + top
    # spend -> code 111; user 1: oldest, fewest, least -> 444.
    rows = []
    eid = 0
    for u in (1, 2, 3, 4):
        for k in range(u):  # frequency: u events
            eid += 1
            rows.append(
                (eid, u, "purchase", _ts(f"2024-01-0{u}T0{k}:00:00"),
                 float(u) * 10)
            )
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    out = {r["rfm_code"]: r["n_users"] for r in rfm_segments(ev).collect()}
    assert out == {111: 1, 222: 1, 333: 1, 444: 1}
