"""Round 12: gate hardening + advice fixes made structural.

- The output-type lint bans timestamp_ntz DELIBERATELY (r11 verdict #6):
  the t() loader casts NTZ parquet reads to session-tz TIMESTAMP at the
  source, so an NTZ output column can only mean a query bypassed the
  loader — and whether the driver's canonicalizer hashes Spark NTZ
  identically to DuckDB's naive TIMESTAMP is unverifiable from here.
- norm_rows sorts on a (class_rank, repr) key so a float column mixing
  finite / NaN / Inf / int-coerced cells stays deterministically
  sortable (r11 advice #2).
- The CDC widest-anchor reorder keeps duplicate segment-dir occurrences
  (r11 advice #3).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, TimestampNTZType

from tools.oracle_check import lint_spark_schema, norm_rows


class TestNtzLint:
    def test_rejects_timestamp_ntz(self):
        schema = StructType([StructField("ts", TimestampNTZType())])
        assert lint_spark_schema("q", schema) == ["ts:timestamp_ntz"]

    def test_rejects_ntz_inside_array(self, spark):
        df = spark.sql(
            "SELECT array(TIMESTAMP_NTZ '2020-01-01 00:00:00') AS xs"
        )
        assert lint_spark_schema("q", df.schema) == [
            "xs:array<timestamp_ntz>"
        ]

    def test_no_registered_query_declares_ntz(self):
        # the t() loader normalizes events.ts to TIMESTAMP regardless of
        # how the parquet reader surfaced it; a grep-level assertion that
        # the catalog itself never constructs NTZ outputs
        import inspect

        from datafusion_pinot_spark.plans import queries as qmod

        src = inspect.getsource(qmod)
        assert "to_timestamp_ntz" not in src
        assert 'cast("timestamp_ntz")' not in src


class TestNormRowsSortKey:
    def test_mixed_nan_inf_int_float_rows_sort(self):
        # one float column whose normalized cells span str ("NaN"/"Inf"),
        # int (integral coercion), and float — the r11 key could only
        # order these because str() flattened everything; the r12 key is
        # explicitly (class_rank, repr)
        rows = [
            (float("nan"),),
            (float("inf"),),
            (float("-inf"),),
            (2.0,),
            (2.5,),
            (None,),
            (-1.0,),
        ]
        out = norm_rows(["v"], rows)
        assert len(out) == 7
        # determinism: same multiset in any input order sorts identically
        assert norm_rows(["v"], list(reversed(rows))) == out
        # None sorts first (class_rank 0)
        assert out[0] == (None,)

    def test_int_and_str_cells_do_not_collide(self):
        # 2 (int) and "2" (str) must get DISTINCT sort keys — with the old
        # str(x) key they collided and kept unstable input order
        a = norm_rows(["v"], [(2,), ("2",)])
        b = norm_rows(["v"], [("2",), (2,)])
        assert a == b
        assert a[0] != a[1]


class TestAnchorReorderKeepsDuplicates:
    def test_duplicate_anchor_occurrences_survive(self, spark, tmp_path):
        # build a 2-segment evolved table where the widest segment sorts
        # LAST, then hand _anchor_widest a dirs list duplicating the
        # anchor: the reorder must keep every occurrence (r11 advice —
        # the old `!= anchor` filter dropped duplicates silently)
        import os

        from datafusion_pinot_spark.maintenance import _anchor_widest
        from datafusion_pinot_spark.sources import register_pinot_source

        register_pinot_source(spark)
        out = str(tmp_path / "t_OFFLINE")
        (
            spark.range(0, 10)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
            .coalesce(1)
            .write.format("pinot")
            .mode("overwrite")
            .save(out)
        )
        (
            spark.range(10, 20)
            .select(
                F.col("id").alias("k"),
                (F.col("id") * 2).alias("v"),
                (F.col("id") * 1.5).alias("extra"),
            )
            .coalesce(1)
            .write.format("pinot")
            .mode("append")
            .save(out)
        )
        # _anchor_widest takes v3 dirs, the shape resolve_segment_dirs yields
        segs = sorted(
            os.path.join(out, d, "v3")
            for d in os.listdir(out)
            if os.path.isdir(os.path.join(out, d, "v3"))
        )
        wide = _anchor_widest(segs)[0]
        narrow = next(d for d in segs if d != wide)

        ordered = _anchor_widest([narrow, wide, wide])
        assert ordered[0] == wide
        assert len(ordered) == 3, "duplicate anchor occurrence was dropped"
        assert sorted(ordered) == sorted([narrow, wide, wide])

        # the evolved-table CDC feed itself still anchors on the wide side
        from datafusion_pinot_spark.maintenance import changes_between
        from pinot_segment.snapshot import load_snapshot_log

        snaps = [s["id"] for s in load_snapshot_log(out)["snapshots"]]
        feed = changes_between(spark, out, snaps[0], snaps[-1])
        assert "extra" in feed.columns
        assert feed.count() == 10


class TestDedupPipelineReport:
    def test_hand_values_exact_dup_components(self, spark):
        # exact duplicates guarantee LSH candidacy (identical signatures
        # -> identical band keys) and verify at jaccard 1.0, so the
        # hand-computable component is {1, 2, 4} with canonical doc 1
        from datafusion_pinot_spark.operators.dedup import (
            dedup_pipeline_report,
        )

        rows = [
            (1, "s1", "the quick brown fox jumps"),
            (2, "s1", "the quick brown fox jumps"),
            (3, "s1", "unrelated text entirely different words"),
            (4, "s2", "the quick brown fox jumps"),
            (5, "s2", "another unique document text here"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = {r.source: r for r in dedup_pipeline_report(docs).collect()}
        s1, s2 = out["s1"], out["s2"]
        assert (s1.n_docs, s1.n_dup_members, s1.n_kept) == (3, 2, 2)
        assert (s2.n_docs, s2.n_dup_members, s2.n_kept) == (2, 1, 1)
        # 5 tokens per doc: s1 keeps docs 1+3 (10 of 15 tokens)
        assert (s1.total_tokens, s1.kept_tokens, s1.retained_ppm) == (
            15, 10, 666666,
        )
        assert (s2.total_tokens, s2.kept_tokens, s2.retained_ppm) == (
            10, 5, 500000,
        )

    def test_degenerate_no_dups(self, spark):
        from datafusion_pinot_spark.operators.dedup import (
            dedup_pipeline_report,
        )

        docs = spark.createDataFrame(
            [
                (1, "s1", "alpha beta gamma delta epsilon"),
                (2, "s1", "one two three four five six"),
            ],
            "doc_id long, source string, text string",
        )
        [r] = dedup_pipeline_report(docs).collect()
        assert (r.n_docs, r.n_dup_members, r.n_kept) == (2, 0, 2)
        assert r.retained_ppm == 1_000_000

    def test_output_passes_type_lint(self, spark):
        from datafusion_pinot_spark.operators.dedup import (
            dedup_pipeline_report,
        )

        docs = spark.createDataFrame(
            [(1, "s1", "a b c")], "doc_id long, source string, text string"
        )
        assert (
            lint_spark_schema("dp", dedup_pipeline_report(docs).schema) == []
        )


class TestTrainingMixtureReport:
    def test_hand_values(self, spark):
        from datafusion_pinot_spark.operators.curation import (
            training_mixture_report,
        )

        # s1: a 20-token good doc duplicated (dedup drops one copy),
        # plus a too-short doc the quality gate drops; s2: one good doc.
        good = " ".join(f"w{i}" for i in range(20))
        good2 = " ".join(f"v{i}" for i in range(20))
        rows = [
            (1, "s1", good, len(good)),
            (2, "s1", good, len(good)),
            (3, "s1", "tiny doc", 8),
            (4, "s2", good2, len(good2)),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string, n_chars int"
        )
        out = {
            r.source: r
            for r in training_mixture_report(docs, budget=100).collect()
        }
        s1, s2 = out["s1"], out["s2"]
        assert (s1.n_docs, s1.n_dedup_kept, s1.n_quality_kept) == (3, 2, 1)
        assert (s2.n_docs, s2.n_dedup_kept, s2.n_quality_kept) == (1, 1, 1)
        assert s1.kept_tokens == 20 and s2.kept_tokens == 20
        # Hamilton split of 100 over equal 20/20 token shares
        assert s1.alloc_tokens + s2.alloc_tokens == 100
        assert s1.alloc_tokens == 50 and s2.alloc_tokens == 50

    def test_degenerate_all_filtered(self, spark):
        # every doc fails the quality gate -> zero kept, zero alloc, but
        # raw/dedup counts still report
        from datafusion_pinot_spark.operators.curation import (
            training_mixture_report,
        )

        docs = spark.createDataFrame(
            [(1, "s1", "too short", 9), (2, "s1", "also tiny", 9)],
            "doc_id long, source string, text string, n_chars int",
        )
        [r] = training_mixture_report(docs).collect()
        assert (r.n_docs, r.n_dedup_kept, r.n_quality_kept) == (2, 2, 0)
        assert r.kept_tokens == 0 and r.alloc_tokens == 0


class TestTemporalSplitLeakage:
    def test_hand_values(self, spark):
        import datetime as dt

        from datafusion_pinot_spark.operators.curation import (
            temporal_split_leakage,
        )

        # days 0..9 (range 10): cut at day 0 + 9*80//100 = day 7.
        # user 1: train-only; user 2: both sides (leak); user 3: valid-only
        def ts(day):
            return dt.datetime(2020, 1, 1) + dt.timedelta(days=day)

        rows = [
            (1, "view", ts(0)),
            (1, "view", ts(3)),
            (2, "view", ts(5)),
            (2, "view", ts(9)),
            (3, "view", ts(8)),
            (3, "view", ts(9)),
        ]
        events = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        [r] = temporal_split_leakage(events).collect()
        assert (r.train_events, r.valid_events) == (3, 3)
        assert (r.train_users, r.valid_users, r.overlap_users) == (2, 2, 1)
        assert r.leak_ppm == 500_000

    def test_degenerate_single_day(self, spark):
        # dmin == dmax: everything lands on the train side, no valid set
        import datetime as dt

        from datafusion_pinot_spark.operators.curation import (
            temporal_split_leakage,
        )

        events = spark.createDataFrame(
            [(1, "view", dt.datetime(2020, 1, 1))],
            "user_id long, event_type string, ts timestamp",
        )
        [r] = temporal_split_leakage(events).collect()
        assert (r.train_events, r.valid_events, r.leak_ppm) == (1, 0, 0)


class TestEmbeddingNormAudit:
    def test_hand_values(self, spark):
        from datafusion_pinot_spark.operators.similarity import (
            embedding_norm_audit,
        )

        rows = [
            (1, [1.0, 0.0], "a"),     # norm2 = 1.0 -> 1_000_000 micro
            (2, [0.0, 0.0], "a"),     # degenerate
            (3, [3.0, 0.0], "a"),     # inflated (9.0)
            (4, [0.6, 0.8], "b"),     # unit: 360000+640000 = 1_000_000
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label string"
        )
        out = {r.label: r for r in embedding_norm_audit(emb).collect()}
        a, b = out["a"], out["b"]
        assert a.n_vecs == 3
        assert (a.min_norm2_micro, a.max_norm2_micro) == (0, 9_000_000)
        assert (a.n_degenerate, a.n_inflated) == (1, 1)
        assert (b.n_vecs, b.min_norm2_micro, b.max_norm2_micro) == (
            1, 1_000_000, 1_000_000,
        )
        assert (b.n_degenerate, b.n_inflated) == (0, 0)


class TestJoinSkewAudit:
    def test_hand_values(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            join_skew_audit,
        )

        # user 1: 6 rows of 10 total over 5 keys -> share 600000 ppm,
        # hot factor 6 / (10/5) = 3x -> 3_000_000 ppm
        rows = [(1,)] * 6 + [(2,), (3,), (4,), (5,)]
        df = spark.createDataFrame(rows, "user_id long")
        out = join_skew_audit(df, ("user_id",), k=3).collect()
        assert [r.user_id for r in out] == [1, 2, 3]
        top = out[0]
        assert (top.rows, top.total_rows, top.n_keys) == (6, 10, 5)
        assert top.share_ppm == 600_000
        assert top.hot_factor_ppm == 3_000_000


class TestNgramNoveltyCurve:
    def test_hand_values(self, spark):
        from datafusion_pinot_spark.operators.dedup import (
            ngram_novelty_curve,
        )

        # 2 buckets over doc_id range [0, 3]: docs 0,1 -> bucket 0,
        # docs 2,3 -> bucket 1. doc2 repeats doc0's shingle (not novel),
        # doc3 brings a new one (novel).
        rows = [
            (0, "a b c"),       # shingle "a b c"
            (1, "d e f"),       # shingle "d e f"
            (2, "a b c"),       # repeat
            (3, "g h i"),       # novel
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.bucket: r for r in ngram_novelty_curve(docs, 3, 2).collect()}
        b0, b1 = out[0], out[1]
        assert (b0.n_shingles, b0.n_novel, b0.novelty_ppm) == (
            2, 2, 1_000_000,
        )
        assert (b1.n_shingles, b1.n_novel, b1.novelty_ppm) == (2, 1, 500_000)

    def test_degenerate_short_docs(self, spark):
        # all docs shorter than the shingle width -> empty result
        from datafusion_pinot_spark.operators.dedup import (
            ngram_novelty_curve,
        )

        docs = spark.createDataFrame(
            [(0, "a b"), (1, "c")], "doc_id long, text string"
        )
        assert ngram_novelty_curve(docs).collect() == []


class TestBpeFertilityByLang:
    def test_hand_values(self, spark):
        from datafusion_pinot_spark.operators.bpe import (
            bpe_fertility_by_lang,
        )

        # corpus dominated by "ab": merges learn (a,b) then (ab, something)
        # — whatever the second merge is, "ab" encodes to 1 symbol while
        # "xy" (never merged unless learned) stays at 2. Use frequencies
        # that force merge 1 = (a,b): "ab ab ab ab" vs one "xz".
        rows = [
            (1, "en", "ab ab ab ab"),
            (2, "fr", "xz"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        out = {r.lang: r for r in bpe_fertility_by_lang(docs).collect()}
        en, fr = out["en"], out["fr"]
        assert en.n_words == 4 and en.n_chars == 8
        # "ab" merged to a single symbol -> fertility 1000 milli/word
        assert en.n_symbols == 4 and en.fertility_milli == 1000
        assert fr.n_words == 1 and fr.n_chars == 2
        assert fr.fertility_milli == fr.n_symbols * 1000


class TestCalibratedRatios:
    def test_uniform_machine_drift_normalizes_to_one(self):
        import bench

        cur = {
            "start": {"numpy_unpack_sec": 0.15, "jvm_agg_sec": 0.30},
            "end": {"numpy_unpack_sec": 0.15, "jvm_agg_sec": 0.30},
        }
        prev = {
            "start": {"numpy_unpack_sec": 0.10, "jvm_agg_sec": 0.20},
            "end": {"numpy_unpack_sec": 0.10, "jvm_agg_sec": 0.20},
        }
        # machine 1.5x slower on both substrates; queries measured 1.5x
        # slower -> calibrated says "no code change"
        raw = {"q1_pricing_summary": 1.5, "pinot_agg": 1.5}
        machine, cal = bench.calibrated_ratios(raw, cur, prev)
        assert machine == {"numpy_unpack_sec": 1.5, "jvm_agg_sec": 1.5}
        assert cal == {"q1_pricing_summary": 1.0, "pinot_agg": 1.0}

    def test_code_regression_survives_normalization(self):
        import bench

        same = {
            "start": {"numpy_unpack_sec": 0.1, "jvm_agg_sec": 0.2},
            "end": {"numpy_unpack_sec": 0.1, "jvm_agg_sec": 0.2},
        }
        machine, cal = bench.calibrated_ratios(
            {"q1_pricing_summary": 1.4}, same, same
        )
        assert machine == {"numpy_unpack_sec": 1.0, "jvm_agg_sec": 1.0}
        assert cal["q1_pricing_summary"] == 1.4

    def test_substrate_routing_and_missing_probe(self):
        import bench

        cur = {
            "start": {"numpy_unpack_sec": 0.2},  # jvm probe missing
            "end": {"numpy_unpack_sec": 0.2},
        }
        prev = {
            "start": {"numpy_unpack_sec": 0.1, "jvm_agg_sec": 0.2},
            "end": {"numpy_unpack_sec": 0.1, "jvm_agg_sec": 0.2},
        }
        machine, cal = bench.calibrated_ratios(
            {"pinot_agg": 2.0, "q1_pricing_summary": 2.0}, cur, prev
        )
        # pinot tier normalized by the numpy probe; jvm tier left raw
        # (factor 1.0) because its probe is missing on one side
        assert machine == {"numpy_unpack_sec": 2.0}
        assert cal == {"pinot_agg": 1.0, "q1_pricing_summary": 2.0}

    def test_pinot_e2e_probe_preferred_when_both_rounds_carry_it(self):
        """r13 (r12 verdict #2): when BOTH rounds have the end-to-end
        datasource probe, the pinot tier normalizes against it instead of
        the numpy kernel probe — the datasource path (Python-worker
        dispatch + Arrow handoff) can drift independently of raw numpy."""
        import bench

        cur = {
            "start": {
                "numpy_unpack_sec": 0.1,
                "jvm_agg_sec": 0.2,
                "pinot_e2e_sec": 0.9,
            },
            "end": {
                "numpy_unpack_sec": 0.1,
                "jvm_agg_sec": 0.2,
                "pinot_e2e_sec": 0.9,
            },
        }
        prev = {
            "start": {
                "numpy_unpack_sec": 0.1,
                "jvm_agg_sec": 0.2,
                "pinot_e2e_sec": 0.3,
            },
            "end": {
                "numpy_unpack_sec": 0.1,
                "jvm_agg_sec": 0.2,
                "pinot_e2e_sec": 0.3,
            },
        }
        machine, cal = bench.calibrated_ratios(
            {"pinot_agg": 3.0, "q1_pricing_summary": 3.0}, cur, prev
        )
        assert machine == {
            "numpy_unpack_sec": 1.0,
            "jvm_agg_sec": 1.0,
            "pinot_e2e_sec": 3.0,
        }
        # pinot tier: 3.0 raw / 3.0 datasource-probe drift = no code change;
        # jvm tier unchanged substrate -> the 3.0 stands as a regression.
        assert cal == {"pinot_agg": 1.0, "q1_pricing_summary": 3.0}

    def test_pinot_e2e_probe_fallback_to_numpy_when_prev_lacks_it(self):
        import bench

        cur = {
            "start": {"numpy_unpack_sec": 0.2, "pinot_e2e_sec": 0.9},
            "end": {"numpy_unpack_sec": 0.2, "pinot_e2e_sec": 0.9},
        }
        prev = {
            "start": {"numpy_unpack_sec": 0.1},
            "end": {"numpy_unpack_sec": 0.1},
        }
        machine, cal = bench.calibrated_ratios({"pinot_agg": 2.0}, cur, prev)
        assert machine == {"numpy_unpack_sec": 2.0}
        assert cal == {"pinot_agg": 1.0}


class TestMvEvolutionNullFill:
    def test_mv_column_added_by_evolution_reads_null_filled(self, spark, tmp_path):
        """End-to-end pin of the r12 census path for MULTI-VALUE columns:
        a segment that predates an MV (array) column must surface it
        all-NULL, the table schema must mark it nullable (answered from
        the manifest alone — the all_columns marker covers MV entries on
        the sink path now), and the evolved segment's arrays decode."""
        from pyspark.sql import functions as F

        from datafusion_pinot_spark.sources import register_pinot_source

        register_pinot_source(spark)
        out = str(tmp_path / "mvevo_OFFLINE")
        (
            spark.range(0, 5)
            .select(F.col("id").alias("k"))
            .coalesce(1)
            .write.format("pinot")
            .mode("overwrite")
            .save(out)
        )
        (
            spark.range(5, 10)
            .select(
                F.col("id").alias("k"),
                F.array(F.col("id"), F.col("id") * 2).alias("tags"),
            )
            .coalesce(1)
            .write.format("pinot")
            .mode("append")
            .save(out)
        )
        # anchor on the EVOLVED segment so `tags` is in the projection
        import os

        segs = sorted(
            os.path.join(out, d, "v3")
            for d in os.listdir(out)
            if os.path.isdir(os.path.join(out, d, "v3"))
        )
        wide = next(
            s
            for s in segs
            if "tags"
            in spark.read.format("pinot").option("segments", s).load().columns
        )
        narrow = next(s for s in segs if s != wide)
        df = (
            spark.read.format("pinot")
            .option("segments", ",".join([wide, narrow]))
            .load()
        )
        by_name = {f.name: f for f in df.schema.fields}
        assert by_name["tags"].nullable, (
            "pre-evolution segments NULL-fill tags -> field must be nullable"
        )
        rows = {r.k: r.tags for r in df.collect()}
        assert len(rows) == 10
        for k in range(5):
            assert rows[k] is None
        for k in range(5, 10):
            assert list(rows[k]) == [k, 2 * k]


class TestStreamOffsetsO1:
    def _reader(self, spark, out):
        from datafusion_pinot_spark.sources.pinot_datasource import (
            PinotDataSource,
        )

        src = PinotDataSource({"path": out})
        return src.streamReader(src.schema())

    def test_sink_written_table_has_o1_offsets(self, spark, tmp_path):
        """r12: the append-only stream's checkpoint state is a snapshot-log
        id + an EMPTY extra list on sink-written tables — one integer no
        matter how many segments exist (the legacy seen-set was
        O(segments) checkpoint state at 100 TB)."""
        import json

        from pyspark.sql import functions as F

        from datafusion_pinot_spark.sources import register_pinot_source

        register_pinot_source(spark)
        out = str(tmp_path / "o1_OFFLINE")
        (
            spark.range(0, 40)
            .select(F.col("id").alias("k"))
            .repartition(4)
            .write.format("pinot")
            .mode("overwrite")
            .save(out)
        )
        r = self._reader(spark, out)
        off = r.latestOffset()
        assert off["log_id"] >= 1
        assert json.loads(off["extra"]) == []
        parts = r.partitions(r.initialOffset(), off)
        assert sum(len(p.segment_dirs) for p in parts) == 4

    def test_legacy_seen_checkpoint_resumes_without_replay(
        self, spark, tmp_path
    ):
        """A pre-r12 checkpoint ({"seen": [...]}) must still be accepted
        as a START offset: only segments NOT in the legacy set stream."""
        import json
        import os

        from pyspark.sql import functions as F

        from datafusion_pinot_spark.sources import register_pinot_source

        register_pinot_source(spark)
        out = str(tmp_path / "legacy_OFFLINE")
        (
            spark.range(0, 10)
            .select(F.col("id").alias("k"))
            .coalesce(1)
            .write.format("pinot")
            .mode("overwrite")
            .save(out)
        )
        first = sorted(
            d
            for d in os.listdir(out)
            if os.path.isdir(os.path.join(out, d, "v3"))
        )
        (
            spark.range(10, 20)
            .select(F.col("id").alias("k"))
            .coalesce(1)
            .write.format("pinot")
            .mode("append")
            .save(out)
        )
        r = self._reader(spark, out)
        legacy_start = {"seen": json.dumps(first)}
        parts = r.partitions(legacy_start, r.latestOffset())
        new_dirs = [d for p in parts for d in p.segment_dirs]
        assert len(new_dirs) == 1  # only the appended segment, no replay
        assert first[0] not in new_dirs[0]

    def test_vacuum_pruned_checkpoint_fails_with_recovery_contract(
        self, spark, tmp_path
    ):
        """If vacuum prunes the snapshot id a stream checkpoint holds,
        the exact processed-set is unrecoverable — the reader must fail
        FAST with the recovery contract (same stance as the CDC reader),
        not wedge on a bare 'Unknown snapshot id' or silently guess."""
        import json

        import pytest

        from pyspark.sql import functions as F

        from pinot_segment.snapshot import vacuum

        from datafusion_pinot_spark.sources import register_pinot_source

        register_pinot_source(spark)
        out = str(tmp_path / "pruned_OFFLINE")
        for lo, hi, mode in ((0, 10, "overwrite"), (10, 20, "append")):
            (
                spark.range(lo, hi)
                .select(F.col("id").alias("k"))
                .coalesce(1)
                .write.format("pinot")
                .mode(mode)
                .save(out)
            )
        res = vacuum(out, keep_last=1)
        assert res["pruned_snapshots"]  # snapshot 1 left the log
        r = self._reader(spark, out)
        stale = {
            "log_id": res["pruned_snapshots"][0],
            "extra": json.dumps([]),
        }
        with pytest.raises(ValueError, match="NEW checkpoint dir"):
            r.partitions(stale, r.latestOffset())

    def test_out_of_band_segments_ride_in_extra(self, spark, tmp_path):
        """A segment written WITHOUT a snapshot append (direct
        write_segment — no log entry) must still stream: it rides in the
        offset's extra list instead of being silently skipped."""
        import json

        import numpy as np

        from pinot_segment.metadata import DataType
        from pinot_segment.writer import ColumnSpec, write_segment

        from datafusion_pinot_spark.sources import register_pinot_source

        register_pinot_source(spark)
        out = tmp_path / "oob_OFFLINE"
        write_segment(
            out / "manual0",
            "manual0",
            "oob",
            [ColumnSpec("k", DataType.LONG, np.arange(7, dtype=np.int64))],
        )
        r = self._reader(spark, str(out))
        off = r.latestOffset()
        assert off["log_id"] == 0  # no log at all
        assert json.loads(off["extra"]) == ["manual0"]
        parts = r.partitions(r.initialOffset(), off)
        assert sum(len(p.segment_dirs) for p in parts) == 1


class TestR12NullHazards:
    def test_temporal_split_ignores_null_ts(self, spark):
        import datetime as dt

        from datafusion_pinot_spark.operators.curation import (
            temporal_split_leakage,
        )

        def ts(day):
            return dt.datetime(2020, 1, 1) + dt.timedelta(days=day)

        events = spark.createDataFrame(
            [(1, "view", ts(0)), (2, "view", None), (3, "view", ts(9))],
            "user_id long, event_type string, ts timestamp",
        )
        [r] = temporal_split_leakage(events).collect()
        # the NULL-ts row contributes to NEITHER side
        assert r.train_events + r.valid_events == 2

    def test_join_skew_excludes_null_keys(self, spark):
        from datafusion_pinot_spark.operators.validation import (
            join_skew_audit,
        )

        df = spark.createDataFrame(
            [(1,), (1,), (None,), (None,), (None,), (2,)],
            "user_id long",
        )
        out = join_skew_audit(df, ("user_id",), k=5).collect()
        # NULLs never match an equi-join; they must not dominate the audit
        assert [r.user_id for r in out] == [1, 2]
        assert out[0].total_rows == 3 and out[0].n_keys == 2
