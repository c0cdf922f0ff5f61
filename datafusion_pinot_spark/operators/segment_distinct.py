"""Partition-layout-exploiting exact distinct count.

Pinot's SEGMENTPARTITIONEDDISTINCTCOUNT: when a column is partitioned so
that no value can appear in more than one segment, the exact distinct
count is the SUM of per-segment distinct counts — no cross-segment dedup,
therefore no shuffle at all. At 100 TB with billions of distinct keys
this beats even partial-aggregated ``count(DISTINCT)`` (whose shuffle
still carries every distinct value once); here each task ships one
integer.

Pinot documents the function as unchecked (wrong answers if the layout
assumption is false); this module is stricter — the same
config-checked serve-or-fallback contract as the star-tree router:

- :func:`partition_exclusive_column` proves the layout from the table
  manifest (zero segment opens when fresh; per-segment metadata
  otherwise): every segment declares a partition map for the column,
  all agree on (function, numPartitions), and the declared residue sets
  are PAIRWISE DISJOINT across segments — which makes each value live
  in exactly one segment, so any segments-per-partition packing of the
  scan preserves disjointness across Spark partitions too.
- :func:`distinct_count` serves the summed per-partition count when the
  proof holds and silently falls back to plain exact
  ``count(DISTINCT)`` when it doesn't.

The served path's per-partition distinct runs in one Arrow-batched
``mapInPandas`` pass (a per-partition hash set — the same state a
hash-distinct task would hold, minus the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _partition_infos(table_dir: str, col: str):
    """Per-segment partition maps for ``col``; None if any segment lacks
    one. Manifest-first (zero opens), metadata fallback."""
    from pinot_segment.manifest import _segment_v3_dirs, load_manifest

    segs = load_manifest(table_dir)
    infos = []
    if segs is not None:
        for stats in segs.values():
            cs = stats.get("columns", {}).get(col) or {}
            pm = cs.get("partitions")
            if not pm:
                return None
            infos.append({**pm, "dtype": cs.get("dtype")})
        return infos
    from pinot_segment import SegmentReader

    for v3 in _segment_v3_dirs(table_dir):
        cm = SegmentReader.open(v3).metadata.columns.get(col)
        if cm is None or not cm.partition_function:
            return None
        infos.append(
            {
                "function": cm.partition_function,
                "num": cm.num_partitions,
                "values": list(cm.partition_values),
                "dtype": cm.data_type.value,
            }
        )
    return infos


def partition_exclusive_column(table_dir: str, col: str) -> bool:
    """True iff the table's layout proves each value of ``col`` lives in
    exactly one segment: consistent (function, numPartitions) everywhere
    and pairwise-disjoint residue sets."""
    infos = _partition_infos(table_dir, col)
    if not infos:
        return False
    f0, n0 = infos[0].get("function"), infos[0].get("num")
    if not f0 or not n0:
        return False
    seen: set = set()
    for pm in infos:
        # integer dtypes only: the served path's pandas sets conflate
        # float NaN with SQL NULL (both arrive as NaN in a float64
        # column), while count(DISTINCT) excludes NULL but counts NaN —
        # restricting to INT/LONG keeps "exact" meaning exact. (Modulo
        # partitioning only applies to integer columns anyway.)
        if pm.get("dtype") not in ("INT", "LONG"):
            return False
        if pm.get("function") != f0 or pm.get("num") != n0:
            return False
        vals = set(pm.get("values") or ())
        if not vals or seen & vals:
            return False
        seen |= vals
    return True


def per_partition_distinct_sum(df: DataFrame, col: str) -> DataFrame:
    """SUM of per-Spark-partition distinct counts of ``col`` (nulls
    excluded) — exact iff no value spans two partitions. One integer per
    task crosses the wire."""

    def gen(batches):
        import pandas as pd

        seen: set = set()
        for pdf in batches:
            seen.update(pdf[col].dropna().unique())
        yield pd.DataFrame({"n": [len(seen)]})

    parts = df.select(col).mapInPandas(gen, "n long")
    return parts.agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_distinct"))


def distinct_count(
    spark: SparkSession, table_dir: str, col: str, strategy: str = "auto"
) -> tuple[DataFrame, str]:
    """Exact distinct count of ``col`` over a pinot table — a strategy
    router. ``strategy="auto"`` picks:

    1. ``metadata_cardinality``: layout-proven partition-exclusive AND
       dict-encoded null-free everywhere → the count is the sum of
       per-segment dictionary cardinalities, served from the manifest
       with NO job (the strongest SEGMENTPARTITIONEDDISTINCTCOUNT form).
    2. ``dictionary_union``: dict-encoded null-free everywhere (no
       layout proof) → count(DISTINCT) over the segment dictionaries;
       the forward index never decodes.
    3. ``segment_partitioned``: the layout proves each value lives in
       one segment → sum of per-partition distincts, zero shuffle
       (Pinot's SEGMENTPARTITIONEDDISTINCTCOUNT contract).
    4. ``global_distinct``: plain exact ``count(DISTINCT)``.

    ``strategy="bitmap"`` forces the bounded-domain bitmap merge
    (DISTINCTCOUNTBITMAP shape) when the manifest [min, max] fits
    :data:`BITMAP_MAX_DOMAIN` bits, else raises. r14: when every segment
    stores the column dict-encoded and null-free, the bitmap is built
    from the DICTIONARY entries (decode-free — the forward index never
    opens) and ships word-granular sparse bytes; the row-stream variant
    remains the fallback for raw/nullable columns. Still opt-in, not in
    the auto tier: its shuffle is domain-bounded rather than
    cardinality-bounded, which wins only when distincts-per-segment
    approach the domain (otherwise ``dictionary_union`` ships less).

    Returns (one-row DataFrame, method)."""
    from datafusion_pinot_spark.sources import register_pinot_source

    register_pinot_source(spark)
    df = spark.read.format("pinot").load(table_dir)
    if strategy == "bitmap":
        mm = _table_min_max(table_dir, col)
        if mm is None or mm[1] - mm[0] + 1 > BITMAP_MAX_DOMAIN:
            raise ValueError(
                f"bitmap strategy needs a provable [min, max] domain of "
                f"<= {BITMAP_MAX_DOMAIN} bits for {col}"
            )
        # r14: decode-free input when provable — each segment's dictionary
        # IS its distinct set, so the bitmap is built from dictionary
        # entries (dictionary_only scan: only the dictionary byte-range of
        # columns.psf opens, the forward index never decodes) instead of
        # the row stream. Falls back to the row scan when any segment is
        # raw-encoded or nullable.
        ents = _dictionary_entry_stream(spark, table_dir, col)
        if ents is not None:
            return (
                bitmap_distinct_sum(ents, col, mm[0], mm[1]),
                "bitmap_dictionary_merge",
            )
        return bitmap_distinct_sum(df, col, mm[0], mm[1]), "bitmap_merge"
    if strategy != "auto":
        raise ValueError(f"unknown strategy: {strategy!r}")
    n = metadata_distinct_count(table_dir, col)
    if n is not None:
        # layout-proven + dict-encoded + null-free: the answer is manifest
        # arithmetic — no job at all
        return (
            spark.range(1).select(
                F.lit(int(n)).cast("long").alias("n_distinct")
            ),
            "metadata_cardinality",
        )
    du = dictionary_union_distinct(spark, table_dir, col)
    if du is not None:
        # dict-encoded + null-free everywhere (no layout proof needed):
        # union the dictionaries, never decode the forward index
        return du, "dictionary_union"
    if partition_exclusive_column(table_dir, col):
        return per_partition_distinct_sum(df, col), "segment_partitioned"
    return (
        df.agg(F.count_distinct(F.col(col)).alias("n_distinct")),
        "global_distinct",
    )



def _dict_nullfree_everywhere(table_dir: str, col: str):
    """(segment_v3_dirs, cardinalities) when every segment stores ``col``
    dict-encoded with no nulls — the precondition for serving distinct
    questions from dictionaries alone. Manifest-first (zero opens; needs a
    manifest new enough to carry has_dictionary/cardinality), per-segment
    metadata fallback. None when the precondition fails anywhere."""
    from pinot_segment.manifest import _segment_v3_dirs, load_manifest

    import os

    segs = load_manifest(table_dir)
    if segs is not None:
        dirs, cards = [], []
        for seg_name, stats in segs.items():
            # manifest keys are segment dir names; executors need v3 paths
            v3 = os.path.join(table_dir, seg_name, "v3")
            if stats.get("total_docs", 0) == 0:
                continue
            cs = stats.get("columns", {}).get(col) or {}
            if (
                not cs.get("has_dictionary")
                or cs.get("has_nulls")
                # r11: manifests now carry MV entries too (is_single_value
                # False); the dictionary-scan read is SV-only
                or cs.get("is_single_value", True) is False
                or "cardinality" not in cs
            ):
                return None
            dirs.append(v3)
            cards.append(int(cs["cardinality"]))
        return dirs, cards
    from pinot_segment import SegmentReader

    dirs, cards = [], []
    for v3 in _segment_v3_dirs(table_dir):
        r = SegmentReader.open(v3)
        if r.total_docs() == 0:
            continue
        cm = r.metadata.columns.get(col)
        if (
            cm is None
            or not cm.has_dictionary
            or cm.has_null_values
            or not cm.is_single_value
        ):
            return None
        dirs.append(v3)
        cards.append(int(cm.cardinality))
    return dirs, cards


def metadata_distinct_count(table_dir: str, col: str):
    """Exact distinct count of ``col`` WITHOUT reading any data or even
    launching a job: when the partition layout proves each value lives in
    exactly one segment (:func:`partition_exclusive_column`) AND every
    segment stores the column dict-encoded with no nulls, the answer is
    the SUM of per-segment dictionary cardinalities — a number already
    sitting in metadata.properties / the table manifest. The
    dictionary-equals-distinct-set invariant holds for Pinot-built and
    this writer's segments (dictionaries are built from the segment's
    values, never padded). Returns None when any precondition fails.

    This is the strongest form of Pinot's SEGMENTPARTITIONEDDISTINCTCOUNT
    (the reference delegates all aggregation — README.md:152-154 — so
    this whole module is beyond-parity): the exact global distinct of a
    100 TB key column in O(segments) manifest arithmetic on the driver.
    """
    if not partition_exclusive_column(table_dir, col):
        return None
    got = _dict_nullfree_everywhere(table_dir, col)
    if got is None:
        return None
    return sum(got[1])


def dictionary_union_distinct(
    spark: SparkSession, table_dir: str, col: str
) -> "DataFrame | None":
    """Exact distinct count of ``col`` by unioning per-segment DICTIONARIES
    — the forward index (row data) is never decoded. Needs no layout
    proof: overlapping values across segments are deduped by an ordinary
    ``count(DISTINCT)`` whose input is the dictionary entries, i.e.
    ``sum(cardinality)`` values instead of ``sum(rows)``. On a column
    where rows >> distincts this reads kilobytes per segment instead of
    the whole forward index, and the exchange is identical to what plain
    ``count(DISTINCT)``'s partial-agg shuffle would carry at best (each
    distinct once per segment). Requires dict-encoded + null-free in every
    segment (None otherwise): a nullable column's dictionary contains the
    NULL fill entry, which would overcount.

    Scale shape: the entry stream flows through the normal pinot scan
    (``dictionary_only`` read option — Arrow batches, packed tasks), so
    executors open only the dictionary byte-range of ``columns.psf``;
    the driver ships segment paths, never values."""
    got = _dict_nullfree_everywhere(table_dir, col)
    if got is None:
        return None
    if not got[0]:
        return spark.range(1).select(F.lit(0).cast("long").alias("n_distinct"))
    ents = _dictionary_entry_stream(spark, table_dir, col, _checked=got)
    return ents.agg(F.count_distinct(col).alias("n_distinct"))


def _dictionary_entry_stream(
    spark: SparkSession, table_dir: str, col: str, _checked=None
) -> "DataFrame | None":
    """The per-segment dictionary entries of ``col`` as a DataFrame (one
    row per segment-local distinct value), or None when any segment is
    raw-encoded, nullable, or multi-value — the shared decode-free input
    of :func:`dictionary_union_distinct` and the bitmap strategy."""
    import math

    from datafusion_pinot_spark.sources import register_pinot_source

    got = _checked if _checked is not None else _dict_nullfree_everywhere(
        table_dir, col
    )
    if got is None or not got[0]:
        return None
    dirs = got[0]
    register_pinot_source(spark)
    par = max(spark.sparkContext.defaultParallelism, 1)
    spp = max(1, math.ceil(len(dirs) / par))
    return (
        spark.read.format("pinot")
        .option("dictionary_only", col)
        .option("segments", ",".join(dirs))
        .option("segments_per_partition", str(spp))
        .load()
    )


def _table_min_max(table_dir: str, col: str):
    """Table-wide (min, max) for an INT/LONG column from the manifest
    (zero opens) or per-segment metadata; None when unavailable."""
    from pinot_segment.manifest import _segment_v3_dirs, load_manifest

    segs = load_manifest(table_dir)
    lo = hi = None
    if segs is not None:
        for stats in segs.values():
            cs = stats.get("columns", {}).get(col) or {}
            if cs.get("dtype") not in ("INT", "LONG") or "min" not in cs:
                return None
            lo = cs["min"] if lo is None else min(lo, cs["min"])
            hi = cs["max"] if hi is None else max(hi, cs["max"])
        return None if lo is None else (int(lo), int(hi))
    from pinot_segment import SegmentReader

    for v3 in _segment_v3_dirs(table_dir):
        r = SegmentReader.open(v3)
        cm = r.metadata.columns.get(col)
        if cm is None or cm.data_type.value not in ("INT", "LONG"):
            return None
        mm = r.column_min_max(col)
        if mm is None:
            return None
        lo = mm[0] if lo is None else min(lo, mm[0])
        hi = mm[1] if hi is None else max(hi, mm[1])
    return None if lo is None else (int(lo), int(hi))


def bitmap_distinct_sum(df: DataFrame, col: str, lo: int, hi: int) -> DataFrame:
    """Exact distinct count of a bounded-domain integer column via
    bitmap words (Pinot's DISTINCTCOUNTBITMAP shape), built ENTIRELY
    inside whole-stage codegen: each row becomes its 64-bit word index
    ``(v - lo) div 64`` and single-bit mask ``1 << ((v - lo) % 64)``,
    the partial hash-agg ``bit_or``s masks map-side into at most
    domain/64 word groups, and one ``sum(bit_count(word))`` reads the
    answer. Shuffle volume is bounded by min(distinct_values, domain/8)
    bytes per partition — independent of row count — and needs NO
    layout proof, unlike the segment-partitioned path.

    r14 rewrite: the former implementation packed per-task numpy
    bitmaps behind a ``mapInPandas`` hop; the Arrow transfer alone cost
    ~3x what the saved exchange won (bench ``distinct_bitmap``,
    r7-r13). Two integer ops per row in codegen beat any Python-side
    vectorization here, and the map-side ``bit_or`` combine produces
    exactly the same word-granular partial state the numpy version
    shipped. Out-of-domain values (impossible when the router derives
    [lo, hi] from the manifest, but callers may pass their own) fail
    loudly via ``raise_error`` instead of setting a wrong bit."""
    width = hi - lo + 1
    guarded = (
        df.select(col)
        .where(F.col(col).isNotNull())
        .select(
            F.expr(
                f"CASE WHEN {col} < {lo} OR {col} > {hi} THEN"
                f" CAST(raise_error(concat('{col} value ', CAST({col} AS"
                f" STRING), ' outside declared [{lo}, {hi}] domain'))"
                f" AS BIGINT) ELSE CAST({col} AS BIGINT) - {lo} END"
            ).alias("off")
        )
    )
    parts = guarded.select(
        F.expr("off div 64").alias("idx"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(off % 64 AS INT))"
        ).alias("w"),
    )
    assert width > 0  # caller guards the domain; keep the invariant local
    merged = parts.groupBy("idx").agg(F.expr("bit_or(w)").alias("w"))
    return merged.agg(
        F.coalesce(F.sum(F.bit_count("w")), F.lit(0))
        .cast("long")
        .alias("n_distinct")
    )


# max bitmap domain the router will allocate per task (2^26 bits = 8 MB)
BITMAP_MAX_DOMAIN = 1 << 26


def dictionary_groupby_count(
    spark: SparkSession, table_dir: str, col: str
) -> "DataFrame | None":
    """Exact ``GROUP BY col, COUNT(*)`` served from per-segment
    dictionaries — Pinot's dictionary-based group-by optimization: each
    task emits one (value, count) row per segment-local distinct (counts
    from inverted-index bitmap popcounts when the column carries one,
    else a forward-id bincount — SegmentReader.dict_value_counts; either
    way no per-row value is ever materialized), and the global answer is
    a SUM over those pre-counted rows. The shuffle carries
    sum(per-segment cardinality) rows instead of sum(rows): on a 100 TB
    key-ish column that is the difference between a corpus-volume
    exchange and a dictionary-volume one, and the per-task work drops
    from decode+hash-per-row to one bincount/popcount pass.

    Same serve-or-fallback contract as the distinct strategies: requires
    dict-encoded + null-free in every segment (None otherwise — a NULL
    fill entry would absorb null rows into a real value's count)."""
    import math

    from datafusion_pinot_spark.sources import register_pinot_source

    names = [c.strip() for c in col.split(",")] if isinstance(col, str) else list(col)
    dirs = None
    for name in names:
        got = _dict_nullfree_everywhere(table_dir, name)
        if got is None:
            return None
        # Every column must be provable over the SAME segment set: the
        # helper fails (None) rather than skips absent-column segments
        # today, so the lists can only be identical — assert that
        # invariant instead of silently keeping the last column's list,
        # so a future skip-style change in the helper cannot make this
        # plan scan the wrong segments.
        if dirs is not None and got[0] != dirs:
            return None
        dirs = got[0]
    if not dirs:
        return None
    register_pinot_source(spark)
    par = max(spark.sparkContext.defaultParallelism, 1)
    spp = max(1, math.ceil(len(dirs) / par))
    per_seg = (
        spark.read.format("pinot")
        .option("value_counts", ",".join(names))
        .option("segments", ",".join(dirs))
        .option("segments_per_partition", str(spp))
        .load()
    )
    return per_seg.groupBy(*names).agg(F.sum("cnt").cast("long").alias("n"))


def metadata_min_max_count(spark: SparkSession, table_dir: str, col: str):
    """Zero-data-read ``MIN(col), MAX(col), COUNT(*)`` — Pinot's
    metadata-based aggregation: for an unfiltered query, the global min
    and max are the fold of per-segment zone maps (manifest stats when
    fresh, per-segment metadata.properties otherwise) and the row count
    is the sum of segment doc counts. No job touches columns.psf; on a
    100 TB table this is O(segments) driver arithmetic. None when any
    segment lacks INT/LONG bounds for the column (caller falls back to a
    real scan). SQL semantics match exactly: stored bounds cover NON-NULL
    values (min/max ignore nulls) and doc counts include null rows
    (count(*) counts them)."""
    from pinot_segment.manifest import _segment_v3_dirs, load_manifest

    mm = _table_min_max(table_dir, col)
    if mm is None:
        return None
    segs = load_manifest(table_dir)
    if segs is not None:
        n = sum(int(s.get("total_docs", 0)) for s in segs.values())
    else:
        from pinot_segment import SegmentReader

        n = sum(
            SegmentReader.open(v3).total_docs()
            for v3 in _segment_v3_dirs(table_dir)
        )
    return spark.createDataFrame(
        [(int(mm[0]), int(mm[1]), int(n))],
        "min_v long, max_v long, n long",
    )
