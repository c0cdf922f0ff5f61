"""Hand-value tests for the round-10 late batch (r11 first-check backlog):
Mann-Whitney rank-sum drift, the Benford first-digit audit, and the
character-class profile. Every expectation below is computed by hand in
the docstrings/comments — not by running either engine — so a shared
bug in the Spark and DuckDB expressions cannot self-certify.
"""

import pytest

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [
            (i, text, "en", source, len(text))
            for i, (source, text) in enumerate(rows)
        ],
        DOCS_SCHEMA,
    )


class TestMannWhitney:
    def test_clean_separation(self, spark):
        """s1 lengths {1,2}, s2 lengths {3,4}: every s1 doc shorter.
        Pooled ranks 1,2,3,4 -> R1 = 3, u2 = 2*R1 - n1(n1+1) = 6-6 = 0,
        CLES = P(len1 > len2) = 0."""
        from datafusion_pinot_spark.operators import validation

        docs = _docs(
            spark, [("s1", "a"), ("s1", "ab"), ("s2", "abc"), ("s2", "abcd")]
        )
        [r] = validation.mann_whitney_length_shift(docs).collect()
        assert (r.s1, r.s2, r.n1, r.n2) == ("s1", "s2", 2, 2)
        assert r.u2 == 0
        assert r.cles_ppm == 0

    def test_reversed_separation(self, spark):
        """s1 strictly longer: U = n1*n2 = 4, u2 = 8, CLES = 1.0."""
        from datafusion_pinot_spark.operators import validation

        docs = _docs(
            spark, [("s1", "abc"), ("s1", "abcd"), ("s2", "a"), ("s2", "ab")]
        )
        [r] = validation.mann_whitney_length_shift(docs).collect()
        assert r.u2 == 8
        assert r.cles_ppm == 1_000_000

    def test_all_tied(self, spark):
        """All four docs the same length: every comparison a tie, so
        U = n1*n2/2 -> u2 = n1*n2 = 4, CLES = 0.5 exactly."""
        from datafusion_pinot_spark.operators import validation

        docs = _docs(
            spark, [("s1", "xx"), ("s1", "yy"), ("s2", "zz"), ("s2", "ww")]
        )
        [r] = validation.mann_whitney_length_shift(docs).collect()
        assert r.u2 == 4
        assert r.cles_ppm == 500_000

    def test_mixed_with_tie(self, spark):
        """s1 = {1, 2}, s2 = {2, 3}. Pairwise: (1<2), (1<3), (2=2 tie),
        (2<3) -> U1 = 0.5, u2 = 1, CLES = 0.125 -> 125000 ppm."""
        from datafusion_pinot_spark.operators import validation

        docs = _docs(
            spark, [("s1", "a"), ("s1", "ab"), ("s2", "cd"), ("s2", "cde")]
        )
        [r] = validation.mann_whitney_length_shift(docs).collect()
        assert r.u2 == 1
        assert r.cles_ppm == 125_000

    def test_three_sources_pair_count(self, spark):
        from datafusion_pinot_spark.operators import validation

        docs = _docs(
            spark,
            [("a", "x"), ("b", "xy"), ("c", "xyz"), ("a", "pq"), ("b", "p")],
        )
        out = validation.mann_whitney_length_shift(docs).collect()
        assert [(r.s1, r.s2) for r in out] == [
            ("a", "b"),
            ("a", "c"),
            ("b", "c"),
        ]

    def test_empty(self, spark):
        from datafusion_pinot_spark.operators import validation

        empty = spark.createDataFrame([], DOCS_SCHEMA)
        assert validation.mann_whitney_length_shift(empty).count() == 0


class TestBenford:
    def test_hand_counts(self, spark):
        """Prices 12.3, 19.9, 190.0, 25.0 -> first digits 1,1,1,2.
        obs(1) = 3/4 = 750000 ppm, obs(2) = 250000 ppm;
        dev(1) = 750000 - 301029, dev(2) = 250000 - 176091."""
        from datafusion_pinot_spark.operators import validation

        li = spark.createDataFrame(
            [(12.3,), (19.9,), (190.0,), (25.0,)], "l_extendedprice double"
        )
        out = {r.digit: r for r in validation.benford_first_digit(li).collect()}
        assert set(out) == {1, 2}
        assert out[1].n_rows == 3 and out[2].n_rows == 1
        assert out[1].obs_ppm == 750_000 and out[2].obs_ppm == 250_000
        assert out[1].benford_ppm == 301_029
        assert out[2].benford_ppm == 176_091
        assert out[1].dev_ppm == 750_000 - 301_029
        assert out[2].dev_ppm == abs(250_000 - 176_091)

    def test_sub_one_rows_excluded(self, spark):
        from datafusion_pinot_spark.operators import validation

        li = spark.createDataFrame(
            [(0.5,), (0.01,), (9.0,)], "l_extendedprice double"
        )
        out = validation.benford_first_digit(li).collect()
        assert len(out) == 1
        assert out[0].digit == 9 and out[0].n_rows == 1
        assert out[0].obs_ppm == 1_000_000
        assert out[0].benford_ppm == 45_757

    def test_empty(self, spark):
        from datafusion_pinot_spark.operators import validation

        li = spark.createDataFrame([], "l_extendedprice double")
        assert validation.benford_first_digit(li).count() == 0


class TestCharclassProfile:
    def test_hand_profile(self, spark):
        """'Ab 12!' -> 6 chars: 2 letters, 2 digits, 1 space, 1 punct.
        ppm = floor(x * 1e6 / 6)."""
        from datafusion_pinot_spark.operators import text

        docs = _docs(spark, [("s1", "Ab 12!")])
        [r] = text.charclass_profile(docs).collect()
        assert r.total_chars == 6
        assert r.letters_ppm == 2_000_000 // 6
        assert r.digits_ppm == 2_000_000 // 6
        assert r.spaces_ppm == 1_000_000 // 6
        assert r.punct_ppm == 1_000_000 // 6
        assert r.nonascii_ppm == 0

    def test_nonascii_and_tabs(self, spark):
        """'é\tz' -> 3 chars: 1 non-ASCII, 1 whitespace, 1 letter."""
        from datafusion_pinot_spark.operators import text

        docs = _docs(spark, [("s1", "é\tz")])
        [r] = text.charclass_profile(docs).collect()
        assert r.total_chars == 3
        assert r.nonascii_ppm == 1_000_000 // 3
        assert r.spaces_ppm == 1_000_000 // 3
        assert r.letters_ppm == 1_000_000 // 3
        assert r.punct_ppm == 0

    def test_classes_partition_exactly(self, spark):
        """The five ppm shares must sum to within 4 units of 1e6 on any
        input (each of up to 5 floors loses < 1 ppm)."""
        from datafusion_pinot_spark.operators import text

        docs = _docs(
            spark,
            [
                ("s1", "Hello, world! 42\nüö"),
                ("s2", "ALLCAPS###   €€€999"),
            ],
        )
        for r in text.charclass_profile(docs).collect():
            total_ppm = (
                r.letters_ppm
                + r.digits_ppm
                + r.spaces_ppm
                + r.punct_ppm
                + r.nonascii_ppm
            )
            assert 1_000_000 - 4 <= total_ppm <= 1_000_000

    def test_empty_text_row(self, spark):
        from datafusion_pinot_spark.operators import text

        docs = _docs(spark, [("s1", "")])
        [r] = text.charclass_profile(docs).collect()
        assert r.total_chars == 0
        assert r.letters_ppm == 0 and r.nonascii_ppm == 0

    def test_empty(self, spark):
        from datafusion_pinot_spark.operators import text

        empty = spark.createDataFrame([], DOCS_SCHEMA)
        assert text.charclass_profile(empty).count() == 0


@pytest.mark.parametrize(
    "name",
    [
        "mann_whitney_length_shift",
        "benford_first_digit",
        "charclass_profile",
        "conversion_attribution",
        "spearman_length_vocab",
        "event_transition_matrix",
    ],
)
def test_registered_with_oracle(name):
    from datafusion_pinot_spark.plans import QUERIES

    assert name in QUERIES
    assert QUERIES[name].oracle is not None


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double"
)


class TestConversionAttribution:
    def _events(self, spark, rows):
        import datetime

        base = datetime.datetime(2026, 1, 1)
        return spark.createDataFrame(
            [
                (i, base + datetime.timedelta(minutes=i), u, t, v)
                for i, (u, t, v) in enumerate(rows)
            ],
            EVENTS_SCHEMA,
        )

    def test_hand_attribution(self, spark):
        """u1: view, click, purchase($5) -> first=view, last=click.
        u2: purchase with no prior touch -> dropped.
        u3: signup, purchase($2.50), click, purchase($1.25) ->
            conv1 first=last=signup; conv2 first=signup, last=click."""
        from datafusion_pinot_spark.operators import funnel

        ev = self._events(
            spark,
            [
                (1, "view", 10.0),
                (1, "click", 0.0),
                (1, "purchase", 5.0),
                (2, "purchase", 3.0),
                (3, "signup", 0.0),
                (3, "purchase", 2.5),
                (3, "click", 0.0),
                (3, "purchase", 1.25),
            ],
        )
        out = {
            r.channel: r
            for r in funnel.conversion_attribution(ev).collect()
        }
        assert set(out) == {"view", "click", "signup"}
        assert (out["view"].n_first, out["view"].cents_first) == (1, 500)
        assert (out["view"].n_last, out["view"].cents_last) == (0, 0)
        assert (out["click"].n_last, out["click"].cents_last) == (2, 625)
        assert out["click"].n_first == 0
        assert (out["signup"].n_first, out["signup"].cents_first) == (2, 375)
        assert (out["signup"].n_last, out["signup"].cents_last) == (1, 250)

    def test_no_conversions(self, spark):
        from datafusion_pinot_spark.operators import funnel

        ev = self._events(spark, [(1, "view", 1.0), (2, "click", 2.0)])
        assert funnel.conversion_attribution(ev).count() == 0

    def test_empty(self, spark):
        from datafusion_pinot_spark.operators import funnel

        empty = spark.createDataFrame([], EVENTS_SCHEMA)
        assert funnel.conversion_attribution(empty).count() == 0


class TestSpearman:
    def test_perfect_monotone(self, spark):
        """Length and distinct-word count perfectly aligned -> s4 = 0,
        rho = 1e6 exactly."""
        from datafusion_pinot_spark.operators import validation

        docs = _docs(spark, [("s1", "a"), ("s1", "a b"), ("s1", "a b c")])
        [r] = validation.spearman_length_vocab(docs).collect()
        assert (r.n_docs, r.s4, r.rho_ppm) == (3, 0, 1_000_000)

    def test_perfect_inverse(self, spark):
        """x up, y down (n=2): doubled ranks (2,4) vs (4,2) -> s4 = 8,
        rho = 1e6 - 1_500_000*8/(2*3) = -1e6."""
        from datafusion_pinot_spark.operators import validation

        docs = _docs(spark, [("s1", "a b"), ("s1", "c c c")])
        [r] = validation.spearman_length_vocab(docs).collect()
        assert (r.s4, r.rho_ppm) == (8, -1_000_000)

    def test_constant_y_midrank_artifact(self, spark):
        """y constant: every y doubled-midrank is 2*1+3-1 = 4; x doubled
        ranks 2,4,6 -> s4 = 8, rho = 1e6 - 12e6/24 = 500000 (the
        documented deterministic value of the no-ties formula under a
        degenerate variable)."""
        from datafusion_pinot_spark.operators import validation

        docs = _docs(spark, [("s1", "a"), ("s1", "a a"), ("s1", "a a a")])
        [r] = validation.spearman_length_vocab(docs).collect()
        assert (r.s4, r.rho_ppm) == (8, 500_000)

    def test_single_doc_source_dropped(self, spark):
        from datafusion_pinot_spark.operators import validation

        docs = _docs(spark, [("s1", "a"), ("s2", "x"), ("s2", "x y")])
        out = validation.spearman_length_vocab(docs).collect()
        assert [r.source for r in out] == ["s2"]

    def test_empty(self, spark):
        from datafusion_pinot_spark.operators import validation

        empty = spark.createDataFrame([], DOCS_SCHEMA)
        assert validation.spearman_length_vocab(empty).count() == 0


class TestTransitionMatrix:
    def test_hand_matrix(self, spark):
        """u1: view->click->purchase, u2: view->view.
        view row: click 500000, view 500000; click row: purchase 1e6."""
        from datafusion_pinot_spark.operators import funnel
        import datetime

        base = datetime.datetime(2026, 1, 1)
        ev = spark.createDataFrame(
            [
                (i, base + datetime.timedelta(minutes=i), u, t, 1.0)
                for i, (u, t) in enumerate(
                    [
                        (1, "view"),
                        (1, "click"),
                        (1, "purchase"),
                        (2, "view"),
                        (2, "view"),
                    ]
                )
            ],
            EVENTS_SCHEMA,
        )
        out = {
            (r.event_type, r.next_type): (r.n_trans, r.row_ppm)
            for r in funnel.event_transition_matrix(ev).collect()
        }
        assert out == {
            ("view", "click"): (1, 500_000),
            ("view", "view"): (1, 500_000),
            ("click", "purchase"): (1, 1_000_000),
        }

    def test_empty(self, spark):
        from datafusion_pinot_spark.operators import funnel

        empty = spark.createDataFrame([], EVENTS_SCHEMA)
        assert funnel.event_transition_matrix(empty).count() == 0
