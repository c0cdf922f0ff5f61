"""Spark-tier tests for the pinot data source + catalog.

Mirrors the reference's SQL test tier (query_tests.rs / catalog_tests.rs —
SELECT+LIMIT shape, projection shape, COUNT(*), catalog-qualified multi-table
queries), plus pushdown tests for the rebuild improvements."""

import os

import pytest
from pyspark.sql import functions as F

from datafusion_pinot_spark.catalog import PinotCatalog
from datafusion_pinot_spark.sources.pinot_datasource import PinotDataSource


@pytest.fixture(scope="module")
def baseball(spark, pinot_table_dir):
    root, expected = pinot_table_dir
    spark.dataSource.register(PinotDataSource)
    df = spark.read.format("pinot").load(str(root / "baseball_OFFLINE"))
    return df, expected


def test_schema(baseball):
    df, _ = baseball
    assert [f.name for f in df.schema.fields] == ["playerID", "teamID", "hits", "homeRuns"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "string", "int", "int",
    ]
    assert all(not f.nullable for f in df.schema.fields)


def test_count_star(baseball):
    df, expected = baseball
    assert df.count() == len(expected["hits"]) == 1000


def test_full_scan_values(baseball):
    df, expected = baseball
    rows = df.collect()
    assert [r["playerID"] for r in rows] == expected["playerID"]
    assert [r["hits"] for r in rows] == expected["hits"]


def test_partitions_per_segment(spark, baseball):
    df, _ = baseball
    # one task per segment (exec.rs:41 parity)
    assert df.rdd.getNumPartitions() == 3


def test_select_limit(baseball):
    # query_tests.rs:25-35 shape
    df, _ = baseball
    rows = df.limit(10).collect()
    assert len(rows) == 10 and len(rows[0]) == 4


def test_projection_option(spark, pinot_table_dir):
    root, expected = pinot_table_dir
    spark.dataSource.register(PinotDataSource)
    df = (
        spark.read.format("pinot")
        .option("columns", "teamID,hits")
        .load(str(root / "baseball_OFFLINE"))
    )
    assert df.columns == ["teamID", "hits"]
    assert df.count() == 1000


def test_aggregation_sql(spark, baseball):
    df, expected = baseball
    df.createOrReplaceTempView("baseball")
    row = spark.sql(
        "SELECT COUNT(*) AS n, SUM(hits) AS s, MAX(homeRuns) AS m FROM baseball"
    ).collect()[0]
    assert row["n"] == 1000
    assert row["s"] == sum(expected["hits"])
    assert row["m"] == max(expected["homeRuns"])


def test_group_by_topk(spark, baseball):
    df, expected = baseball
    got = (
        df.groupBy("teamID")
        .agg(F.sum("hits").alias("s"))
        .orderBy(F.desc("s"), "teamID")
        .limit(5)
        .collect()
    )
    import collections

    agg = collections.defaultdict(int)
    for t, h in zip(expected["teamID"], expected["hits"]):
        agg[t] += h
    want = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["teamID"], r["s"]) for r in got] == want


def test_filter_pushdown_correctness(spark, baseball):
    df, expected = baseball
    got = df.filter(F.col("hits") > 250).select("playerID", "hits").collect()
    want = [
        (p, h) for p, h in zip(expected["playerID"], expected["hits"]) if h > 250
    ]
    assert sorted((r["playerID"], r["hits"]) for r in got) == sorted(want)


def test_zone_map_segment_pruning(spark, pinot_table_dir):
    """A filter outside every segment's min/max prunes all partitions."""
    from datafusion_pinot_spark.sources.pinot_datasource import (
        PinotDataSourceReader,
    )
    from pyspark.sql.datasource import EqualTo

    root, _ = pinot_table_dir
    spark.dataSource.register(PinotDataSource)
    df = spark.read.format("pinot").load(str(root / "baseball_OFFLINE"))
    assert df.filter(F.col("hits") > 10_000).count() == 0

    # direct check of the pruning logic
    src = PinotDataSource({"path": str(root / "baseball_OFFLINE")})
    reader = PinotDataSourceReader(src.schema(), src._segments())
    list(reader.pushFilters([EqualTo(("hits",), 100_000)]))
    parts = reader.partitions()
    assert len(parts) == 1 and parts[0].segment_dirs == ()  # all pruned → sentinel


def test_timestamp_sink_source_roundtrip(spark, tmp_path):
    """Spark timestamps round-trip through the sink/source at millisecond
    precision (Pinot's TIMESTAMP unit); filters on timestamp columns are
    pushed via the r6 datetime→epoch-millis rewrite (tests/test_ts_pushdown
    pins the rewrite itself) and evaluate exactly."""
    out = str(tmp_path / "ts_OFFLINE")
    spark.dataSource.register(PinotDataSource)
    df = spark.range(0, 3000).selectExpr(
        "id as k",
        "timestamp_millis(1700000000000 + id * 61) as tstamp",
    )
    df.repartition(2).write.format("pinot").mode("overwrite").save(out)
    back = spark.read.format("pinot").load(out)
    assert dict(back.dtypes)["tstamp"] == "timestamp"
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, back.collect()))
    n = back.filter(
        F.col("tstamp") < F.timestamp_millis(F.lit(1700000000000 + 1000 * 61))
    ).count()
    assert n == 1000


def test_selection_decode_mixed_types(spark, tmp_path):
    """A pushed filter routes the read through the selection (doc-id take)
    path — every column family (dict string, dict numeric, RAW numeric,
    nullable, multi-value, timestamp) must survive it with values identical
    to Spark evaluating the same predicate above the parquet original."""
    out = str(tmp_path / "selmix_OFFLINE")
    spark.dataSource.register(PinotDataSource)
    rows = spark.range(0, 5000).selectExpr(
        "id as k",
        "cast(id % 7 as double) as dnum",
        "concat('s', id % 11) as s",
        "case when id % 13 = 0 then null else cast(id % 5 as int) end as nv",
        "array(cast(id % 3 as int), cast(id % 4 as int)) as mv",
        "timestamp_millis(1700000000000 + id * 1000) as tstamp",
    )
    rows.repartition(3).write.format("pinot").mode("overwrite").option(
        "raw", "k"
    ).save(out)
    back = spark.read.format("pinot").load(out)
    pred = (F.col("k") % 10 == 3) & (F.col("k") >= 1000)
    # k % 10 isn't pushable -> k >= 1000 pushes, the rest masks above; use a
    # second, pushable-only variant to force the pure selection path too
    for cond in [F.col("k") >= 4000, pred]:
        got = sorted(map(tuple, back.filter(cond).collect()))
        want = sorted(map(tuple, rows.filter(cond).collect()))
        assert got == want


def test_raw_numeric_zone_map_prunes(spark, tmp_path):
    """RAW numeric columns have no sorted dictionary; the writer's metadata
    minValue/maxValue stats must still drive segment pruning for pushed
    filters."""
    from pyspark.sql.datasource import LessThanOrEqual

    from datafusion_pinot_spark.sources.pinot_datasource import (
        PinotDataSourceReader,
    )

    out = str(tmp_path / "rawn_OFFLINE")
    spark.dataSource.register(PinotDataSource)
    spark.range(0, 80000).selectExpr("id as k", "cast(id as double) * 1.5 as v") \
        .repartitionByRange(8, "k").write.format("pinot").mode("append") \
        .option("raw", "k,v").save(out)

    src = PinotDataSource({"path": out})
    reader = PinotDataSourceReader(src.schema(), src._segments())
    list(reader.pushFilters([LessThanOrEqual(("k",), 9999)]))
    parts = [p for p in reader.partitions() if p.segment_dirs]
    assert 1 <= len(parts) <= 2, f"metadata zone maps did not prune: {len(parts)}"
    got = (
        spark.read.format("pinot").load(out)
        .filter(F.col("k") <= 9999)
        .agg(F.count("*").alias("n"), F.sum("k").alias("s"))
        .collect()[0]
    )
    assert got.n == 10000 and got.s == sum(range(10000))


def test_multivalue_sink_source_roundtrip(spark, tmp_path):
    """array<int>/array<string> columns round-trip through the sink and
    source as MV dictionary columns; element nulls are rejected."""
    out = str(tmp_path / "mv_OFFLINE")
    spark.dataSource.register(PinotDataSource)
    df = spark.range(0, 2000).selectExpr(
        "id as k",
        "array(cast(id % 5 as int), cast(id % 3 as int)) as mi",
        "slice(split('alpha beta gamma delta', ' '), 1, cast(id % 4 as int) + 1) as ms",
    )
    df.repartition(3).write.format("pinot").mode("overwrite").save(out)
    back = spark.read.format("pinot").load(out)
    assert dict(back.dtypes) == {
        "k": "bigint", "mi": "array<int>", "ms": "array<string>",
    }
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, back.collect()))

    with pytest.raises(Exception, match="NULL element"):
        spark.range(0, 10).selectExpr(
            "id as k", "array(cast(id as int), null) as mi"
        ).write.format("pinot").mode("overwrite").save(str(tmp_path / "bad_OFFLINE"))


def test_segments_per_partition_packs_tasks(spark, tmp_path):
    """Many-small-segments tables pack several segments per task (like
    Spark's small-file coalescing): same rows/values, fewer partitions.
    Zone-map pruning stays per-segment underneath the packing."""
    from pyspark.sql.datasource import LessThanOrEqual

    from datafusion_pinot_spark.sources.pinot_datasource import (
        PinotDataSourceReader,
    )

    out = str(tmp_path / "packed_OFFLINE")
    spark.dataSource.register(PinotDataSource)
    spark.range(0, 8000).selectExpr("id as k", "id * 3 as v").repartitionByRange(
        8, "k"
    ).write.format("pinot").mode("append").save(out)

    src = PinotDataSource({"path": out})
    reader = PinotDataSourceReader(src.schema(), src._segments(), 3)
    parts = reader.partitions()
    assert [len(p.segment_dirs) for p in parts] == [3, 3, 2]

    packed = (
        spark.read.format("pinot")
        .option("segments_per_partition", "4")
        .load(out)
    )
    assert packed.rdd.getNumPartitions() == 2
    plain = spark.read.format("pinot").load(out)
    assert packed.count() == plain.count() == 8000
    assert sorted(r.k for r in packed.collect()) == sorted(
        r.k for r in plain.collect()
    )

    # prune-then-pack: a selective filter drops most segments BEFORE packing,
    # so the packed groups are built from survivors only
    pruned_reader = PinotDataSourceReader(src.schema(), src._segments(), 4)
    list(pruned_reader.pushFilters([LessThanOrEqual(("k",), 999)]))
    pruned = [p for p in pruned_reader.partitions() if p.segment_dirs]
    assert sum(len(p.segment_dirs) for p in pruned) <= 2
    got = (
        spark.read.format("pinot")
        .option("segments_per_partition", "4")
        .load(out)
        .filter(F.col("k") <= 999)
        .count()
    )
    assert got == 1000


def test_zone_map_partial_prune_on_range_partitioned_write(spark, tmp_path):
    """The bench layout: range-partitioned segments have disjoint key ranges,
    so a selective key filter plans FEWER partitions (tasks) than segments —
    the 100 TB partition-pruning story, asserted at plan level."""
    from pyspark.sql.datasource import LessThanOrEqual

    from datafusion_pinot_spark.sources.pinot_datasource import (
        PinotDataSourceReader,
    )

    out = str(tmp_path / "rng_OFFLINE")
    spark.dataSource.register(PinotDataSource)
    spark.range(0, 80000).selectExpr("id as k", "id * 2 as v").repartitionByRange(
        8, "k"
    ).write.format("pinot").mode("append").save(out)

    src = PinotDataSource({"path": out})
    assert len(src._segments()) == 8
    reader = PinotDataSourceReader(src.schema(), src._segments())
    list(reader.pushFilters([LessThanOrEqual(("k",), 9999)]))
    parts = [p for p in reader.partitions() if p.segment_dirs]
    assert 1 <= len(parts) <= 2, f"expected ~1 surviving segment, got {len(parts)}"

    # end-to-end: result correct through the pruned plan
    got = (
        spark.read.format("pinot")
        .load(out)
        .filter(F.col("k") <= 9999)
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()[0]
    )
    assert got["n"] == 10000 and got["s"] == 2 * (9999 * 10000 // 2)


def test_catalog_filesystem_discovery(spark, pinot_table_dir):
    root, expected = pinot_table_dir
    cat = PinotCatalog.filesystem(str(root))
    assert cat.schema_names() == ["default"]
    assert cat.table_names() == ["baseball", "dimTeams"]
    assert cat.table_exists("baseball") and not cat.table_exists("nope")
    # tmp dir skipped; 3 segments discovered
    assert len(cat.provider.get_segment_paths("baseball")) == 3

    # metadata-only count helper (reference exec.rs:92-95 shortcut): no job
    assert cat.count_star("baseball") == 1000
    assert cat.count_star("dimTeams") == 30

    registered = cat.register_all(spark)
    assert registered == ["baseball", "dimTeams"]
    # multi-table queries (catalog_tests.rs:37-70 shape)
    assert spark.sql("SELECT COUNT(*) AS n FROM baseball").collect()[0]["n"] == 1000
    assert spark.sql("SELECT COUNT(*) AS n FROM dimTeams").collect()[0]["n"] == 30
    # join across fact + dim — DELEG-U in the reference, free in Spark
    joined = spark.sql(
        """
        SELECT d.teamName, SUM(b.hits) AS s FROM baseball b
        JOIN dimTeams d ON b.teamID = d.teamID
        GROUP BY d.teamName ORDER BY s DESC, d.teamName LIMIT 3
        """
    ).collect()
    assert len(joined) == 3


def test_typed_segment_paths(tmp_path):
    from datafusion_pinot_spark.catalog import FileSystemMetadataProvider

    for side in ("OFFLINE", "REALTIME"):
        os.makedirs(tmp_path / f"ev_{side}" / "seg0" / "v3")
    os.makedirs(tmp_path / "ev_OFFLINE" / "tmp" / "v3")  # tmp is skipped
    p = FileSystemMetadataProvider(str(tmp_path))
    assert len(p.get_segment_paths_typed("ev", "OFFLINE")) == 1
    assert len(p.get_segment_paths_typed("ev", "REALTIME")) == 1
    assert p.get_segment_paths_typed("missing", "OFFLINE") == []


def test_hybrid_table_time_boundary(spark, tmp_path):
    """OFFLINE rows up to the boundary + REALTIME rows after it: the
    overlap ingested into both sides deduplicates by construction, and
    realtime-only rows (which the reference's OFFLINE-preferred fallback
    would drop) are present."""
    spark.dataSource.register(PinotDataSource)
    full = spark.createDataFrame(
        [(i, i * 10, f"u{i % 3}") for i in range(1, 21)], "id long, t long, u string"
    )
    # offline: t <= 120; realtime: t > 60 (overlap 70..120 in both)
    (
        full.filter("t <= 120").coalesce(1)
        .write.format("pinot").mode("append")
        .save(str(tmp_path / "ev_OFFLINE"))
    )
    (
        full.filter("t > 60").coalesce(1)
        .write.format("pinot").mode("append")
        .save(str(tmp_path / "ev_REALTIME"))
    )
    hybrid = PinotCatalog.filesystem(str(tmp_path)).load_hybrid_table(
        spark, "ev", "t"
    )
    got = sorted(r["id"] for r in hybrid.collect())
    assert got == list(range(1, 21))  # exactly the full set, no dupes

    # single-sided tables fall back to a plain load
    solo_dir = tmp_path / "solo"
    os.makedirs(solo_dir, exist_ok=True)
    (
        full.coalesce(1).write.format("pinot").mode("append")
        .save(str(solo_dir / "x_OFFLINE"))
    )
    solo = PinotCatalog.filesystem(str(solo_dir)).load_hybrid_table(
        spark, "x", "t"
    )
    assert solo.count() == 20


def test_controller_catalog_with_stub_http(spark, pinot_table_dir):
    root, _ = pinot_table_dir

    def fake_get(url: str) -> str:
        if url.endswith("/tables"):
            return '{"tables": ["baseball"]}'
        if "/segments/baseball" in url and "type=OFFLINE" in url:
            return '[{"OFFLINE": ["seg0", "seg1", "seg2"]}]'
        if "/segments/baseball" in url and "type=REALTIME" in url:
            return "[]"
        raise AssertionError(f"unexpected url {url}")

    cat = PinotCatalog.controller("http://ctrl:9000", str(root), http_get=fake_get)
    assert cat.table_names() == ["baseball"]
    paths = cat.provider.get_segment_paths("baseball")
    assert len(paths) == 3 and all(p.endswith("v3") for p in paths)
    assert cat.load_table(spark, "baseball").count() == 1000


def test_controller_mode_end_to_end_sql(spark, pinot_table_dir):
    """Entry-point A (reference main.rs lifecycle: controller discovery →
    catalog registration → SQL) over a REAL local HTTP controller stub —
    tables and segments are served over the wire, the catalog registers the
    views, and an aggregate SQL query runs against them."""
    import http.server
    import threading

    root, expected = pinot_table_dir

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/tables":
                body = b'{"tables": ["baseball", "dimTeams"]}'
            elif self.path.startswith("/segments/baseball") and "type=OFFLINE" in self.path:
                body = b'[{"OFFLINE": ["seg0", "seg1", "seg2"]}]'
            elif self.path.startswith("/segments/dimTeams") and "type=OFFLINE" in self.path:
                body = b"[]"
            elif self.path.startswith("/segments/dimTeams") and "type=REALTIME" in self.path:
                body = b'[{"REALTIME": ["seg0"]}]'
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        cat = PinotCatalog.controller(f"http://127.0.0.1:{port}", str(root))
        registered = cat.register_all(spark)
        assert registered == ["baseball", "dimTeams"]

        got = spark.sql(
            """SELECT b.teamID, SUM(b.hits) AS s
               FROM baseball b JOIN dimTeams d ON b.teamID = d.teamID
               GROUP BY b.teamID ORDER BY s DESC, b.teamID LIMIT 5"""
        ).collect()
        agg: dict = {}
        for tid, h in zip(expected["teamID"], expected["hits"]):
            agg[tid] = agg.get(tid, 0) + h
        want = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert [(r["teamID"], r["s"]) for r in got] == want
    finally:
        server.shutdown()


def test_controller_realtime_fallback(pinot_table_dir):
    root, _ = pinot_table_dir

    def fake_get(url: str) -> str:
        if url.endswith("/tables"):
            return '{"tables": ["dimTeams"]}'
        if "type=OFFLINE" in url:
            return "[]"
        if "type=REALTIME" in url:
            return '[{"REALTIME": ["seg0"]}]'
        raise AssertionError(url)

    cat = PinotCatalog.controller("http://ctrl:9000", str(root), http_get=fake_get)
    assert len(cat.provider.get_segment_paths("dimTeams")) == 1


def test_controller_error_paths():
    from datafusion_pinot_spark.catalog import PinotControllerClient

    client = PinotControllerClient("http://x", http_get=lambda u: "not json")
    with pytest.raises(RuntimeError):
        client.list_tables()

    client2 = PinotControllerClient(
        "http://x", http_get=lambda u: '{"other": 1}'
    )
    assert client2.list_tables() == []


# -- write path (df.write.format("pinot")) -----------------------------------


def test_write_round_trip(spark, tmp_path):
    """Write a 3-partition DataFrame → 3 segments → read back identical."""
    out = str(tmp_path / "roundtrip_OFFLINE")
    df = spark.range(0, 300).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("int").alias("small"),
        (F.col("id").cast("double") / 3).alias("d"),
        F.concat(F.lit("name_"), F.col("id")).alias("s"),
    )
    spark.dataSource.register(PinotDataSource)
    df.repartition(3).write.format("pinot").mode("append").save(out)

    back = spark.read.format("pinot").load(out)
    assert back.rdd.getNumPartitions() == 3
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "bigint", "int", "double", "string",
    ]
    got = sorted((r["k"], r["small"], r["d"], r["s"]) for r in back.collect())
    want = sorted((r["k"], r["small"], r["d"], r["s"]) for r in df.collect())
    assert got == want
    # no leftover staging dir
    import os
    assert not os.path.isdir(os.path.join(out, "tmp"))


def test_write_overwrite_replaces_segments(spark, tmp_path):
    out = str(tmp_path / "ow_OFFLINE")
    spark.dataSource.register(PinotDataSource)
    a = spark.range(0, 50).select(F.col("id").alias("k"))
    b = spark.range(100, 120).select(F.col("id").alias("k"))
    a.repartition(2).write.format("pinot").mode("append").save(out)
    b.repartition(1).write.format("pinot").mode("overwrite").save(out)
    back = spark.read.format("pinot").load(out)
    assert sorted(r["k"] for r in back.collect()) == list(range(100, 120))


def test_write_append_accumulates(spark, tmp_path):
    out = str(tmp_path / "app_OFFLINE")
    spark.dataSource.register(PinotDataSource)
    spark.range(0, 10).select(F.col("id").alias("k")).coalesce(1).write.format(
        "pinot"
    ).mode("append").save(out)
    spark.range(10, 20).select(F.col("id").alias("k")).coalesce(1).write.format(
        "pinot"
    ).mode("append").save(out)
    back = spark.read.format("pinot").load(out)
    assert back.rdd.getNumPartitions() == 2
    assert sorted(r["k"] for r in back.collect()) == list(range(20))


def test_write_raw_string_column(spark, tmp_path):
    out = str(tmp_path / "raw_OFFLINE")
    spark.dataSource.register(PinotDataSource)
    df = spark.range(0, 64).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("s")
    )
    df.coalesce(1).write.format("pinot").mode("append").option("raw", "s").save(out)
    # raw column declared no-dictionary in the segment metadata
    from pinot_segment import SegmentMetadata
    import os
    seg = next(
        e for e in os.listdir(out)
        if os.path.isdir(os.path.join(out, e, "v3"))
    )
    md = SegmentMetadata.from_file(os.path.join(out, seg, "v3", "metadata.properties"))
    assert not md.columns["s"].has_dictionary
    back = spark.read.format("pinot").load(out)
    assert sorted(r["s"] for r in back.collect()) == sorted(f"v{i}" for i in range(64))


def test_write_nullable_roundtrip(spark, tmp_path):
    """NULLs round-trip through the sink/source (null-vector index): values,
    schema nullability, and IS [NOT] NULL pushdown all survive."""
    spark.dataSource.register(PinotDataSource)
    nullable = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "k long, s string"
    )
    out = str(tmp_path / "n_OFFLINE")
    nullable.coalesce(1).write.format("pinot").mode("append").save(out)
    back = spark.read.format("pinot").load(out)
    assert back.schema["s"].nullable and not back.schema["k"].nullable
    assert sorted((r["k"], r["s"]) for r in back.collect()) == [
        (1, "a"),
        (2, None),
        (3, "c"),
    ]
    assert back.filter("s IS NULL").count() == 1
    assert back.filter("s IS NOT NULL").count() == 2
    # a comparison never matches the fill at a null position
    assert back.filter(F.col("s") == "").count() == 0


def test_write_rejects_bad_types(spark, tmp_path):
    spark.dataSource.register(PinotDataSource)

    dateish = spark.createDataFrame([(1,)], "k long").selectExpr(
        "k", "current_date() as d"
    )
    with pytest.raises(Exception, match="cannot write column"):
        dateish.write.format("pinot").mode("append").save(str(tmp_path / "d_OFFLINE"))


def test_write_read_binary_and_boolean(spark, tmp_path):
    """binary (RAW var-byte BYTES) and boolean (1-bit dict) columns through
    sink -> source — beyond the reference, which rejects both at scan time
    (exec.rs:136-141); unlocks multimodal payloads in the pinot format."""
    out = str(tmp_path / "bin_OFFLINE")
    spark.dataSource.register(PinotDataSource)
    src = spark.range(0, 500).selectExpr(
        "id as k",
        "encode(concat('payload-', id), 'utf-8') as payload",
        "id % 3 = 0 as flag",
    )
    src.coalesce(2).write.format("pinot").mode("append").save(out)

    back = spark.read.format("pinot").load(out)
    assert dict((f.name, f.dataType.simpleString()) for f in back.schema.fields) == {
        "k": "bigint", "payload": "binary", "flag": "boolean"
    }
    got = back.selectExpr(
        "sum(length(payload)) as total", "sum(cast(flag as int)) as nflag",
        "count(*) as n",
    ).collect()[0]
    want = src.selectExpr(
        "sum(length(payload)) as total", "sum(cast(flag as int)) as nflag",
        "count(*) as n",
    ).collect()[0]
    assert (got["total"], got["nflag"], got["n"]) == (want["total"], want["nflag"], want["n"])
    # value-exact on a sample
    got_rows = {r["k"]: (bytes(r["payload"]), r["flag"]) for r in back.collect()}
    assert got_rows[7] == (b"payload-7", False)
    assert got_rows[9] == (b"payload-9", True)


def test_stream_reader_picks_up_new_segments(spark, tmp_path):
    """readStream over a pinot table dir: segments present at start form
    batch 0; segments landing later (via the sink) arrive in later batches."""
    out = str(tmp_path / "stream_OFFLINE")
    spark.dataSource.register(PinotDataSource)
    spark.range(0, 40).select(F.col("id").alias("k")).coalesce(1).write.format(
        "pinot"
    ).mode("append").save(out)

    stream = spark.readStream.format("pinot").load(out)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("pinot_stream_t")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("pinot_stream_t").count() == 40

        spark.range(40, 100).select(F.col("id").alias("k")).coalesce(1).write.format(
            "pinot"
        ).mode("append").save(out)
        q.processAllAvailable()
        got = sorted(r["k"] for r in spark.table("pinot_stream_t").collect())
        assert got == list(range(100))
    finally:
        q.stop()


def test_stream_reader_packs_segments_and_reads_r3_types(spark, tmp_path):
    """Streaming source over a table with r3 column types (timestamp +
    multi-value), with micro-batch segment packing: 8 tiny segments land
    as 2 tasks (segments_per_partition=4) and every value survives."""
    from datafusion_pinot_spark.sources.pinot_datasource import (
        PinotDataSource as PDS,
    )

    out = str(tmp_path / "streammv_OFFLINE")
    spark.dataSource.register(PinotDataSource)
    df = spark.range(0, 800).selectExpr(
        "id as k",
        "timestamp_millis(1700000000000 + id * 13) as tstamp",
        "array(cast(id % 3 as int), cast(id % 5 as int)) as mi",
    )
    df.repartition(8).write.format("pinot").mode("append").save(out)

    src = PDS({"path": out, "segments_per_partition": "4"})
    reader = src.streamReader(src.schema())
    parts = reader.partitions(reader.initialOffset(), reader.latestOffset())
    assert [len(p.segment_dirs) for p in parts] == [4, 4]

    stream = (
        spark.readStream.format("pinot")
        .option("segments_per_partition", "4")
        .load(out)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pinot_stream_mv")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("pinot_stream_mv")
        assert got.count() == 800
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, df.collect()))
    finally:
        q.stop()


def test_empty_projection_metadata_count(spark, tmp_path):
    """`.option("columns", "")` → zero-column scan whose row count comes from
    segment metadata (reference exec.rs:92-95 count path) — and from the
    filter mask when a filter is pushed."""
    out = str(tmp_path / "cnt_OFFLINE")
    spark.dataSource.register(PinotDataSource)
    spark.range(0, 20000).selectExpr("id as k").coalesce(2).write.format(
        "pinot"
    ).mode("append").save(out)

    empty = spark.read.format("pinot").option("columns", "").load(out)
    assert len(empty.schema.fields) == 0
    assert empty.count() == 20000

    # filtered count still exact: mask computed from the filter columns only
    filtered = (
        spark.read.format("pinot").load(out).filter(F.col("k") < 12345)
    )
    assert filtered.count() == 12345


def test_read_golden_fixture_through_datasource(spark):
    """spark.read.format("pinot") over the COMMITTED golden segment (the
    reference's integration constants — 97,889 docs): the full Spark path on
    bytes no writer touched this session."""
    from tools.make_golden_fixture import FIXTURE_DIR, TOTAL_DOCS, golden_columns

    spark.dataSource.register(PinotDataSource)
    df = spark.read.format("pinot").load(FIXTURE_DIR)
    assert df.count() == TOTAL_DOCS
    expected_sum = sum(
        next(s.values for s in golden_columns() if s.name == "hits")
    )
    got = df.agg(
        F.sum("hits").alias("s"), F.countDistinct("hits").alias("c")
    ).collect()[0]
    assert got["s"] == expected_sum
    assert got["c"] == 250


def test_stream_reader_single_segment_dir(spark, tmp_path):
    """readStream pointed at ONE segment dir (not a table dir): offsets carry
    segment names, so partition paths must come from re-discovery, not
    ``{path}/{name}/v3`` reconstruction (which doesn't exist in this layout)."""
    out = str(tmp_path / "single_OFFLINE")
    spark.dataSource.register(PinotDataSource)
    spark.range(0, 25).select(F.col("id").alias("k")).coalesce(1).write.format(
        "pinot"
    ).mode("append").save(out)
    seg_dir = next(
        os.path.join(out, d)
        for d in os.listdir(out)
        if d != "tmp" and os.path.isdir(os.path.join(out, d, "v3"))
    )

    q = (
        spark.readStream.format("pinot")
        .load(seg_dir)
        .writeStream.format("memory")
        .queryName("pinot_stream_single")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        got = sorted(r["k"] for r in spark.table("pinot_stream_single").collect())
        assert got == list(range(25))
    finally:
        q.stop()


def test_controller_client_over_real_http():
    """Mirror of the reference's wiremock tier (controller_client_tests.rs):
    success, 404, 500, and invalid JSON through a real HTTP round trip."""
    import http.server
    import threading

    from datafusion_pinot_spark.catalog import PinotControllerClient

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/tables":
                body = b'{"tables": ["t1", "t2"]}'
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            elif self.path.startswith("/segments/t1"):
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b'[{"OFFLINE": ["s0", "s1"]}]')
            elif self.path.startswith("/badjson"):
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"not json")
            elif self.path.startswith("/boom"):
                self.send_error(500)
            else:
                self.send_error(404)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        client = PinotControllerClient(f"http://127.0.0.1:{port}")
        assert client.list_tables() == ["t1", "t2"]
        assert client.list_segments("t1", "OFFLINE") == ["s0", "s1"]

        bad = PinotControllerClient(f"http://127.0.0.1:{port}/badjson")
        with pytest.raises(RuntimeError):
            bad.list_tables()

        import urllib.error

        boom = PinotControllerClient(f"http://127.0.0.1:{port}/boom")
        with pytest.raises((RuntimeError, urllib.error.HTTPError)):
            boom.list_tables()

        gone = PinotControllerClient(f"http://127.0.0.1:{port}/nope")
        with pytest.raises((RuntimeError, urllib.error.HTTPError)):
            gone.list_tables()
    finally:
        srv.shutdown()


def test_catalog_error_paths(tmp_path):
    """Mirror of the reference's builder-validation tests (catalog.rs:423-484):
    nonexistent data dir, unknown table, table dir with no valid segments."""
    from datafusion_pinot_spark.catalog import FileSystemMetadataProvider

    with pytest.raises(FileNotFoundError):
        FileSystemMetadataProvider(str(tmp_path / "nope")).list_tables()

    provider = FileSystemMetadataProvider(str(tmp_path))
    with pytest.raises(FileNotFoundError, match="not found"):
        provider.get_segment_paths("ghost")

    # table dir exists but contains no segment with a v3 child
    (tmp_path / "empty_OFFLINE" / "not_a_segment").mkdir(parents=True)
    with pytest.raises(FileNotFoundError, match="No valid segments"):
        provider.get_segment_paths("empty")


def test_stream_writer_lands_segments_per_batch(spark, tmp_path):
    """writeStream.format("pinot"): micro-batches land as committed segment
    sets; a batch read over the table dir sees exactly the streamed rows."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "sw_OFFLINE")
    ckpt = str(tmp_path / "ckpt")
    spark.dataSource.register(PinotDataSource)

    spark.range(0, 500).select(F.col("id").alias("k")).coalesce(2).write.parquet(src)
    stream = spark.readStream.schema("k long").parquet(src)
    q = (
        stream.writeStream.format("pinot")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    back = spark.read.format("pinot").load(out)
    assert sorted(r["k"] for r in back.collect()) == list(range(500))
    import os
    segs = [e for e in os.listdir(out) if os.path.isdir(os.path.join(out, e, "v3"))]
    assert all(e.startswith("b") for e in segs)  # batch-id-prefixed names


def test_upsert_table_last_wins_across_segments(spark, tmp_path):
    """load_upsert_table: a key updated in a later-written segment
    surfaces only its newest record; ties on the comparison column fall
    to the tiebreaker."""
    from datafusion_pinot_spark.catalog import PinotCatalog
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    data_dir = str(tmp_path)
    out = f"{data_dir}/kv_OFFLINE"
    rows_v1 = [(1, 100, "old-a", 10), (2, 100, "old-b", 11)]
    rows_v2 = [(1, 200, "new-a", 12), (3, 150, "only-c", 13)]
    tie = [(2, 100, "tie-b", 14)]  # same key+version as old-b, higher seq
    schema = "k long, version long, payload string, seq long"
    spark.createDataFrame(rows_v1, schema).coalesce(1).write.format(
        "pinot"
    ).mode("overwrite").save(out)
    spark.createDataFrame(rows_v2, schema).coalesce(1).write.format(
        "pinot"
    ).mode("append").save(out)
    spark.createDataFrame(tie, schema).coalesce(1).write.format(
        "pinot"
    ).mode("append").save(out)

    latest = (
        PinotCatalog.filesystem(data_dir)
        .load_upsert_table(spark, "kv", "k", "version", tiebreakers=("seq",))
        .orderBy("k")
        .collect()
    )
    assert [(r["k"], r["payload"]) for r in latest] == [
        (1, "new-a"),  # higher version wins
        (2, "tie-b"),  # version tie -> higher seq wins
        (3, "only-c"),
    ]


def test_schema_evolution_missing_columns_read_as_null(spark, tmp_path):
    """Segments written before a column existed read as all-NULL for it
    (Pinot's add-column behavior): pass the evolved schema explicitly and
    the source fills NULLs per segment, with filters on the new column
    behaving as SQL three-valued logic demands."""
    from pyspark.sql import functions as F

    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = str(tmp_path / "tbl_OFFLINE")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    ).coalesce(1).write.format("pinot").mode("overwrite").save(out)
    spark.createDataFrame(
        [(3, "c", 30.0), (4, "d", 40.0)], "k long, v string, extra double"
    ).coalesce(1).write.format("pinot").mode("append").save(out)

    evolved = "k long, v string, extra double"

    def df():
        # fresh load per logical query (the pinned pattern for the
        # upstream per-df scan-cache hazard — see
        # test_fresh_load_per_query_is_isolated)
        return spark.read.format("pinot").schema(evolved).load(out)

    rows = {r["k"]: (r["v"], r["extra"]) for r in df().collect()}
    assert rows == {
        1: ("a", None),
        2: ("b", None),
        3: ("c", 30.0),
        4: ("d", 40.0),
    }
    # value predicates on the new column never match pre-column rows
    assert {r["k"] for r in df().filter("extra = 30.0").collect()} == {3}
    assert {
        r["k"] for r in df().filter("extra IS NOT NULL").collect()
    } == {3, 4}
    # IS NULL matches exactly the pre-column segment's rows
    assert {r["k"] for r in df().filter("extra IS NULL").collect()} == {1, 2}
    # projecting ONLY the new column still accounts for the old rows
    assert df().select("extra").count() == 4
    assert df().filter("extra IS NULL").select("v").count() == 2


def test_fresh_load_per_query_is_isolated(spark, tmp_path):
    """Pin the safe usage pattern for the upstream scan-cache hazard:
    PySpark caches a Python data source's computed (partitions, read
    function) per DataFrame object and only re-runs filter pushdown when
    the new query carries filters — so on one df object an unfiltered
    action after a filtered one can replay the filtered scan. A fresh
    load() per logical query (what every helper in this repo does) is
    always isolated; successive *filtered* queries on one df are also
    correct because each re-runs pushdown."""
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = str(tmp_path / "tbl_OFFLINE")
    spark.range(0, 100).selectExpr("id AS k").coalesce(1).write.format(
        "pinot"
    ).mode("overwrite").save(out)

    df = spark.read.format("pinot").load(out)
    assert df.filter("k < 10").count() == 10
    assert df.filter("k >= 80").count() == 20  # refiltered: recomputed
    # fresh load after a filtered query: never inherits the old filter
    assert spark.read.format("pinot").load(out).count() == 100


def test_table_nullability_is_or_over_segments(spark, tmp_path):
    """A null-bearing LATER segment must make the table column nullable —
    first-segment-only nullability handed Spark codegen null values under
    a non-nullable schema (JVM NPE on any string expression above the
    scan)."""
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = str(tmp_path / "tbl_OFFLINE")
    rows = [
        (1, "src0"),
        (2, "src1"),
        (3, "src10"),
        (4, "src19"),
        (5, "other"),
        (6, None),  # lands in one of the two segments
    ]
    spark.createDataFrame(rows, "k long, source string").coalesce(
        2
    ).write.format("pinot").mode("overwrite").save(out)

    df = spark.read.format("pinot").load(out)
    assert df.schema["source"].nullable
    # the NPE repro: a JVM-evaluated string expression over the null row
    got = {
        r["k"]
        for r in df.filter("length(source) = 5 OR source IS NULL").collect()
    }
    assert got == {3, 4, 5, 6}


def test_hll_sketch_column_roundtrip_accuracy(spark, tmp_path):
    """HLL sketch binaries survive the BYTES storage round-trip and the
    merged estimate stays within HLL's error envelope of the exact
    distinct count (Pinot's HLL-column pre-aggregation pattern)."""
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    out = str(tmp_path / "sk_OFFLINE")
    rows = spark.range(0, 20000).selectExpr(
        "concat('g', id % 4) AS grp", "id % 5000 AS uid"
    )
    (
        rows.groupBy("grp")
        .agg(F.hll_sketch_agg("uid").alias("sk"))
        .coalesce(2)
        .write.format("pinot")
        .mode("overwrite")
        .option("raw", "sk")
        .save(out)
    )
    est = (
        spark.read.format("pinot")
        .load(out)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("d"))
        .collect()[0]["d"]
    )
    exact = rows.select("uid").distinct().count()
    assert exact == 5000
    assert abs(est - exact) / exact < 0.05  # default lgConfigK ~1.6% rse


def test_stream_reader_schema_evolution(spark, tmp_path):
    """readStream with an evolved schema: pre-column segments stream with
    the new column NULL-filled, same as the batch path."""
    out = str(tmp_path / "sevo_OFFLINE")
    spark.dataSource.register(PinotDataSource)
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").coalesce(
        1
    ).write.format("pinot").mode("append").save(out)

    stream = (
        spark.readStream.format("pinot")
        .schema("k long, v string, extra double")
        .load(out)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sevo_t")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["k"]: (r["v"], r["extra"])
            for r in spark.table("sevo_t").collect()
        }
        assert got == {1: ("a", None), 2: ("b", None)}
        # a post-evolution segment lands with the full schema
        spark.createDataFrame(
            [(3, "c", 3.5)], "k long, v string, extra double"
        ).coalesce(1).write.format("pinot").mode("append").save(out)
        q.processAllAvailable()
        got = {
            r["k"]: (r["v"], r["extra"])
            for r in spark.table("sevo_t").collect()
        }
        assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 3.5)}
    finally:
        q.stop()


def test_upsert_partial_backfills_from_older_versions(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from datafusion_pinot_spark.catalog import PinotCatalog
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    # key 1: v1 sets (a=10, b=x); v2 touches only a; v3 touches only b.
    # partial merge → a from v2, b from v3. full merge → v3's row (a NULL).
    rows = [
        (1, 100, 10.0, "x"),
        (1, 200, 20.0, None),
        (1, 300, None, "z"),
        (2, 100, None, None),  # never-set columns stay NULL
    ]
    df = spark.createDataFrame(rows, "k long, ver long, a double, b string")
    data_dir = str(tmp_path)
    out = os.path.join(data_dir, "kv_OFFLINE")
    df.repartition(2).write.format("pinot").mode("overwrite").save(out)
    cat = PinotCatalog.filesystem(data_dir)
    partial = {
        r["k"]: (r["a"], r["b"], r["ver"])
        for r in cat.load_upsert_table(
            spark, "kv", "k", "ver", mode="partial"
        ).collect()
    }
    assert partial[1] == (20.0, "z", 300)
    assert partial[2] == (None, None, 100)
    full = {
        r["k"]: (r["a"], r["b"])
        for r in cat.load_upsert_table(spark, "kv", "k", "ver").collect()
    }
    assert full[1] == (None, "z")  # last-wins keeps v3's NULL a
    with pytest.raises(ValueError, match="unknown upsert mode"):
        cat.load_upsert_table(spark, "kv", "k", "ver", mode="bogus")


def test_bigdecimal_column_roundtrip_and_guards(spark, tmp_path):
    """BIG_DECIMAL through the sink and scan: exact values (incl. NULLs
    and the RAW var-byte path), DecimalType schema, and the writer's
    scale/precision validation."""
    from decimal import Decimal

    import pytest as _pytest
    from pyspark.sql import functions as F

    from datafusion_pinot_spark.sources import register_pinot_source
    from pinot_segment import SegmentReader
    from pinot_segment.metadata import DataType
    from pinot_segment.writer import ColumnSpec, write_segment

    register_pinot_source(spark)
    df = spark.createDataFrame(
        [
            (1, Decimal("1.25"), "a"),
            (2, Decimal("-3.10"), "b"),
            (3, None, "a"),
            (4, Decimal("99999.99"), "b"),
        ],
        "id long, amount decimal(18,2), tag string",
    )
    out = str(tmp_path / "dec_OFFLINE")
    df.write.format("pinot").mode("overwrite").save(out)
    back = spark.read.format("pinot").load(out)
    assert dict(back.dtypes)["amount"] == "decimal(18,2)"
    got = {
        r["id"]: r["amount"] for r in back.select("id", "amount").collect()
    }
    assert got == {
        1: Decimal("1.25"),
        2: Decimal("-3.10"),
        3: None,
        4: Decimal("99999.99"),
    }
    # exact decimal aggregation (no float in the path)
    s = back.agg(F.sum("amount").alias("s")).collect()[0]["s"]
    assert s == Decimal("99998.14")
    # value predicates are evaluated by Spark above the scan (not pushed)
    assert back.filter(F.col("amount") > 0).count() == 2
    assert back.filter(F.col("amount").isNull()).count() == 1

    # RAW var-byte path
    out2 = str(tmp_path / "dec2_OFFLINE")
    df.write.format("pinot").mode("overwrite").option("raw", "amount").save(
        out2
    )
    assert (
        spark.read.format("pinot").load(out2).filter("amount = -3.10").count()
        == 1
    )

    # writer guards: scale violation and precision overflow
    with _pytest.raises(ValueError, match="does not fit scale"):
        ColumnSpec(
            "m", DataType.BIG_DECIMAL, [Decimal("1.234")], decimal=(18, 2)
        )
    with _pytest.raises(ValueError, match="exceeds precision"):
        ColumnSpec(
            "m", DataType.BIG_DECIMAL, [Decimal("123.45")], decimal=(4, 2)
        )
    # storage-level metadata carries the declared type + (p, s)
    v3 = write_segment(
        tmp_path / "seg",
        "seg",
        "t",
        [
            ColumnSpec(
                "m",
                DataType.BIG_DECIMAL,
                [Decimal("0.10"), Decimal("0.20")],
                decimal=(10, 2),
            )
        ],
    )
    cm = SegmentReader.open(v3).metadata.get_column("m")
    assert cm.data_type is DataType.BIG_DECIMAL
    assert (cm.decimal_precision, cm.decimal_scale) == (10, 2)


def test_bigdecimal_eqnullsafe_and_high_precision(spark, tmp_path):
    """Review regressions: (a) a null-safe comparison on a decimal column
    must fall back to Spark evaluation, not crash pushdown (yielded
    filters must be the ORIGINAL objects); (b) decimals with more than 28
    significant digits are valid up to precision 38 (the writer computes
    under a 40-digit local context, not the default 28)."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from datafusion_pinot_spark.sources import register_pinot_source
    from pinot_segment.metadata import DataType
    from pinot_segment.writer import ColumnSpec

    register_pinot_source(spark)
    df = spark.createDataFrame(
        [(1, Decimal("1.25")), (2, None)], "id long, amount decimal(18,2)"
    )
    out = str(tmp_path / "d_OFFLINE")
    df.write.format("pinot").mode("overwrite").save(out)
    back = spark.read.format("pinot").load(out)
    assert (
        back.filter(F.col("amount").eqNullSafe(F.lit(Decimal("1.25")))).count()
        == 1
    )
    assert (
        back.filter(
            F.col("amount").eqNullSafe(F.lit(None).cast("decimal(18,2)"))
        ).count()
        == 1
    )

    big = Decimal("12345678901234567890123456789.01")  # 31 digits
    spec = ColumnSpec("m", DataType.BIG_DECIMAL, [big], decimal=(31, 2))
    assert len(spec.values) == 1

    # (c) schema evolution: a segment predating a decimal column reads it
    # as all-NULL instead of failing the scan
    old = spark.createDataFrame([(7,)], "id long")
    out2 = str(tmp_path / "evo_OFFLINE")
    old.write.format("pinot").mode("overwrite").save(out2)
    evolved = (
        spark.read.format("pinot")
        .schema("id long, amount decimal(18,2)")
        .load(out2)
    )
    row = evolved.collect()[0]
    assert row["id"] == 7 and row["amount"] is None
