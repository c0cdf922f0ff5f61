"""As-of / range join operator semantics on hand-checkable data."""

from datetime import datetime

from pyspark.sql import functions as F


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    from datafusion_pinot_spark.operators.temporal import asof_join

    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01T10:00:05")),
            (2, "A", _ts("2024-01-01T10:00:20")),
            (3, "B", _ts("2024-01-01T10:00:01")),
            (4, "A", _ts("2024-01-01T09:59:00")),  # before any quote
        ],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:00"), 100.0),
            ("A", _ts("2024-01-01T10:00:10"), 101.0),
            ("B", _ts("2024-01-01T10:00:01"), 50.0),  # exactly at trade 3 ts
        ],
        "sym string, ts timestamp, px double",
    )
    out = {
        r["trade_id"]: r["px_asof"]
        for r in asof_join(trades, quotes, on="sym", right_cols=["px"]).collect()
    }
    assert out[1] == 100.0  # latest quote at/before 10:00:05
    assert out[2] == 101.0
    assert out[3] == 50.0  # tie: right row at equal ts matches
    assert out[4] is None  # no preceding quote → NULL


def test_asof_join_preserves_left_rowcount(spark, testdata):
    from datafusion_pinot_spark.operators.temporal import asof_join
    from datafusion_pinot_spark.plans.queries import t

    ev = t(spark, "/root/testdata/sf0.001", "events").select("event_id", "user_id", "ts")
    signups = ev.limit(0)  # empty right side
    out = asof_join(ev, signups, on="user_id", right_cols=["event_id"])
    assert out.count() == ev.count()
    assert out.filter(F.col("event_id_asof").isNotNull()).count() == 0


def test_range_join_count_window(spark):
    from datafusion_pinot_spark.operators.temporal import range_join_count

    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00")),
            (2, _ts("2024-01-01T10:00:30")),   # within 60s of 1, 3
            (3, _ts("2024-01-01T10:01:25")),   # within 60s of 2 only
            (4, _ts("2024-01-01T12:00:00")),   # isolated
        ],
        "event_id long, ts timestamp",
    )
    out = {r["event_id"]: r["n_nearby"]
           for r in range_join_count(ev, ev, "ts", "ts", 60, "event_id").collect()}
    assert out == {1: 1, 2: 2, 3: 1}  # event 4 emits no row (no neighbors)


def test_counter_rate_increase_resets_and_rate(spark):
    from datetime import datetime

    from datafusion_pinot_spark.operators.temporal import counter_rate_per_key

    mk = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # u1: 1.00 -> 3.50 -> 2.00 -> 6.00 over 30s
        (1, mk(0), 1, 1.00), (2, mk(10), 1, 3.50),
        (3, mk(20), 1, 2.00), (4, mk(30), 1, 6.00),
        # u2: single sample -> zero span, zero rate
        (5, mk(0), 2, 9.99),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {r["user_id"]: r for r in counter_rate_per_key(ev).collect()}
    r1 = got[1]
    assert r1["n_samples"] == 4
    assert r1["increase_cents"] == 250 + 400   # +2.50 and +4.00
    assert r1["reset_drop_cents"] == 150       # the 3.50 -> 2.00 reset
    assert r1["span_us"] == 30_000_000
    assert r1["rate_milli_cents_per_s"] == 650 * 1_000_000_000 // 30_000_000
    r2 = got[2]
    assert (r2["n_samples"], r2["span_us"], r2["rate_milli_cents_per_s"]) == (
        1, 0, 0,
    )
