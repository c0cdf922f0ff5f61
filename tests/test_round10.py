"""Round-10 regression tests.

1. The local oracle gate (tools/oracle_check.norm_value) must compare
   Decimals EXACTLY — the r9 driver failure (halflife_event_mass) slipped
   through four green sf0.01 sweeps because Decimal->float normalization
   collapsed >2^53 values that the driver's hash distinguishes.
2. halflife_event_mass's share_ppm must be pure integer arithmetic:
   bit-identical between Spark's decimal `div` and DuckDB's HUGEINT `//`,
   including masses far above 2^53.
"""

from decimal import Decimal

from tools.oracle_check import norm_rows, norm_value


class TestExactDecimalGate:
    def test_distinguishes_decimals_above_2_53(self):
        # Two decimal(38,0) values that collapse to the SAME float:
        # 2^60 and 2^60 + 1 (float64 has 53 mantissa bits).
        a = Decimal(2**60)
        b = Decimal(2**60 + 1)
        assert float(a) == float(b)  # the r9 gate saw them as equal
        assert norm_value(a) != norm_value(b)  # the r10 gate must not

    def test_decimal_equals_int_of_same_value(self):
        # A BIGINT column in one engine vs decimal(38,0) in the other is
        # a type difference, not a value difference.
        assert norm_value(Decimal(12345)) == norm_value(12345)
        assert norm_value(Decimal(2**61)) == norm_value(2**61)

    def test_nonintegral_decimal_exact_canonical(self):
        assert norm_value(Decimal("1.50")) == norm_value(Decimal("1.5"))
        assert norm_value(Decimal("0.1000000000000000000000001")) != norm_value(
            Decimal("0.1")
        )

    def test_norm_rows_catches_one_ulp_decimal_drift(self):
        cols = ["k", "v"]
        spark_rows = [("a", Decimal(2**60))]
        duck_rows = [("a", Decimal(2**60 + 1))]
        assert norm_rows(cols, spark_rows) != norm_rows(cols, duck_rows)


class TestHalflifeIntegerPpm:
    def test_integer_div_matches_hugeint_floor_above_2_53(self, spark):
        import duckdb

        # masses straddling 2^53 so any float intermediate would collapse
        masses = [2**60 + 3, 2**60 + 1, 2**41, 7]
        total = sum(masses)
        sdf = spark.createDataFrame(
            [(str(m),) for m in masses], "mass_s string"
        ).selectExpr(
            "CAST(mass_s AS DECIMAL(38,0)) AS mass",
            f"CAST('{total}' AS DECIMAL(38,0)) AS total",
        )
        got = sorted(
            r.ppm
            for r in sdf.selectExpr(
                "CAST((mass * CAST(1000000 AS DECIMAL(38,0))) div total"
                " AS BIGINT) AS ppm"
            ).collect()
        )
        duck = sorted(
            r[0]
            for m in masses
            for r in duckdb.sql(
                f"SELECT CAST(CAST('{m}' AS HUGEINT) * 1000000"
                f" // CAST('{total}' AS HUGEINT) AS BIGINT)"
            ).fetchall()
        )
        exact = sorted(m * 1_000_000 // total for m in masses)
        assert got == exact
        assert duck == exact

    def test_halflife_share_ppm_has_no_double_cast(self):
        import inspect

        from datafusion_pinot_spark.operators import validation

        src = inspect.getsource(validation.halflife_event_mass)
        osrc = validation.halflife_event_mass_oracle_sql()
        assert "AS DOUBLE" not in src
        assert "AS DOUBLE" not in osrc


class TestNormValueProperties:
    """Property tests for the exact-comparison gate: norm_value must be
    injective on exact numerics (no two distinct Decimals collapse) and
    must unify only genuine value-equality across type representations."""

    def test_decimal_injective_near_powers_of_two(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @given(
            exp=st.integers(min_value=50, max_value=126),
            delta=st.integers(min_value=-3, max_value=3),
        )
        @settings(max_examples=200, deadline=None)
        def prop(exp, delta):
            a = Decimal(2**exp)
            b = Decimal(2**exp + delta)
            if delta == 0:
                assert norm_value(a) == norm_value(b)
            else:
                assert norm_value(a) != norm_value(b)

        prop()

    def test_decimal_int_unification_is_value_equality(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @given(st.integers(min_value=-(10**30), max_value=10**30))
        @settings(max_examples=200, deadline=None)
        def prop(n):
            assert norm_value(Decimal(n)) == norm_value(n)

        prop()

    def test_scaled_decimal_representations_unify(self):
        # decimal(38,6) '5.000000' from one engine vs decimal(12,1) '5.0'
        # from the other is the same value — must compare equal.
        assert norm_value(Decimal("5.000000")) == norm_value(Decimal("5.0"))
        assert norm_value(Decimal("5.000000")) == norm_value(Decimal(5))


class TestControllerSegmentErrorMatrix:
    """list_segments error-path matrix, mirroring the reference's wiremock
    tier (controller_client_tests.rs:107-212): success per type, empty,
    404/500 HTTP errors, invalid JSON, and requested-type-missing."""

    def _client(self, body=None, exc=None):
        from datafusion_pinot_spark.catalog import PinotControllerClient

        def fake_get(url):
            if exc is not None:
                raise exc
            return body

        return PinotControllerClient("http://ctrl:9000", http_get=fake_get)

    def test_offline_success(self):
        c = self._client('[{"OFFLINE": ["seg_0", "seg_1"]}]')
        assert c.list_segments("t", "OFFLINE") == ["seg_0", "seg_1"]

    def test_realtime_success(self):
        c = self._client('[{"REALTIME": ["seg_r0"]}]')
        assert c.list_segments("t", "REALTIME") == ["seg_r0"]

    def test_empty_response_list(self):
        c = self._client("[]")
        assert c.list_segments("t", "OFFLINE") == []

    def test_type_not_in_response(self):
        # asked for REALTIME, controller only lists OFFLINE
        # (controller_client_tests.rs:193-212: must be [], not an error)
        c = self._client('[{"OFFLINE": ["seg_0"]}]')
        assert c.list_segments("t", "REALTIME") == []

    def test_http_404(self):
        import urllib.error

        err = urllib.error.HTTPError("http://x", 404, "Not Found", {}, None)
        c = self._client(exc=err)
        import pytest

        with pytest.raises(urllib.error.HTTPError) as ei:
            c.list_segments("t", "OFFLINE")
        assert ei.value.code == 404

    def test_http_500(self):
        import urllib.error

        err = urllib.error.HTTPError("http://x", 500, "Server Error", {}, None)
        c = self._client(exc=err)
        import pytest

        with pytest.raises(urllib.error.HTTPError) as ei:
            c.list_segments("t", "OFFLINE")
        assert ei.value.code == 500

    def test_invalid_json(self):
        import pytest

        c = self._client("this is not json")
        with pytest.raises(RuntimeError, match="Invalid JSON"):
            c.list_segments("t", "OFFLINE")

    def test_non_list_payload_is_empty(self):
        # a dict where a list is expected: tolerated as "no segments"
        # rather than a crash (same shape-tolerance as the reference's
        # deserializer defaulting missing sides to empty)
        c = self._client('{"OFFLINE": ["seg_0"]}')
        assert c.list_segments("t", "OFFLINE") == []

