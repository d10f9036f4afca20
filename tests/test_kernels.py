"""Kernel parity tests — cases lifted from the reference's colocated unit tests
(inference.rs:284-387, datetime.rs:222-356, numeric.rs tests)."""

import numpy as np
import pytest

from dataprof_ray.functions import kernels as K


class TestNullBool:
    def test_null_like(self):
        assert K.is_null_like_token("")
        assert K.is_null_like_token("  ")
        assert K.is_null_like_token("NULL")
        assert K.is_null_like_token("NaN")
        assert K.is_null_like_token("\t")
        assert not K.is_null_like_token("0")
        assert not K.is_null_like_token("none")

    def test_strict_bool(self):
        assert K.parse_strict_boolean_token("true") is True
        assert K.parse_strict_boolean_token(" FALSE ") is False
        assert K.parse_strict_boolean_token("1") is None
        assert K.parse_strict_boolean_token("maybe") is None


class TestInference:
    def test_integer(self):
        assert K.infer_type(["1", "2", "3"]) == K.TYPE_INTEGER

    def test_float(self):
        assert K.infer_type(["1.5", "2.3", "3.7"]) == K.TYPE_FLOAT

    def test_mixed_numeric_as_float(self):
        assert K.infer_type(["1", "2.5", "3"]) == K.TYPE_FLOAT

    def test_boolean_90pct(self):
        vals = ["true"] * 9 + ["x"]
        assert K.infer_type(vals) == K.TYPE_BOOLEAN
        vals = ["true"] * 8 + ["x", "y"]
        assert K.infer_type(vals) == K.TYPE_STRING

    def test_pure_01_stays_integer(self):
        assert K.infer_type(["0", "1", "1", "0"]) == K.TYPE_INTEGER

    def test_date_cumulative_formats(self):
        vals = ["2024-01-15", "15/01/2024", "2024-02-01", "2024/03/01"]
        assert K.infer_type(vals) == K.TYPE_DATE

    def test_date_70pct_boundary(self):
        # exactly 70% is NOT enough (strict >)
        vals = ["2024-01-15"] * 7 + ["zzz"] * 3
        assert K.infer_type(vals) == K.TYPE_STRING
        vals = ["2024-01-15"] * 8 + ["zzz"] * 2
        assert K.infer_type(vals) == K.TYPE_DATE

    def test_nulls_filtered(self):
        assert K.infer_type(["", "null", "3", "4"]) == K.TYPE_INTEGER
        assert K.infer_type(["", "null", "NaN"]) == K.TYPE_STRING

    def test_float_80pct_boundary(self):
        vals = ["1.5"] * 8 + ["a", "b"]  # exactly 80% -> strict > fails
        assert K.infer_type(vals) == K.TYPE_STRING
        vals = ["1.5"] * 9 + ["a"]
        assert K.infer_type(vals) == K.TYPE_FLOAT


class TestDates:
    def test_iso(self):
        d, dt = K.parse_flexible_datetime("2023-01-15")
        assert (d.year, d.month, d.day) == (2023, 1, 15)
        assert dt is None

    def test_european_before_us(self):
        d, _ = K.parse_flexible_datetime("05/06/2023")
        assert (d.day, d.month) == (5, 6)  # DD/MM, not MM/DD

    def test_us_fallback(self):
        # 01/15/2023 fails European (month 15) and falls through to US
        d, _ = K.parse_flexible_datetime("01/15/2023")
        assert (d.month, d.day) == (1, 15)

    def test_datetime_formats(self):
        d, dt = K.parse_flexible_datetime("2023-01-15T10:30:00")
        assert dt is not None and dt.hour == 10
        d, dt = K.parse_flexible_datetime("2023-01-15 10:30:00")
        assert dt is not None
        d, dt = K.parse_flexible_datetime("15/01/2023 10:30:00")
        assert d.day == 15 and dt.hour == 10

    def test_rfc3339(self):
        d, dt = K.parse_flexible_datetime("2023-01-15T10:30:00Z")
        assert dt is not None and dt.hour == 10
        d, dt = K.parse_flexible_datetime("2023-01-15T10:30:00+02:00")
        assert dt is not None

    def test_dotted_dashed(self):
        assert K.parse_flexible_datetime("15.01.2023")[0].day == 15
        assert K.parse_flexible_datetime("15-01-2023")[0].day == 15
        assert K.parse_flexible_datetime("2023/01/15")[0].day == 15

    def test_invalid(self):
        assert K.parse_flexible_datetime("not a date") is None
        assert K.parse_flexible_datetime("2024-13-45") is None

    def test_raw_year_untrimmed(self):
        assert K.parse_raw_datetime_year("2024-01-15") == 2024
        assert K.parse_raw_datetime_year(" 2024-01-15") is None  # leading space
        assert K.parse_raw_datetime_year("2024-13-45") is None  # shape ok, calendar bad
        assert K.parse_raw_datetime_year("15/01/2024") == 2024
        assert K.parse_raw_datetime_year("short") is None


class TestNumericKernels:
    def test_quantile_type7(self):
        v = np.array([1.0, 2.0, 3.0, 10.0])
        assert K.quantile_type7(v, 0.25) == pytest.approx(1.75)
        assert K.quantile_type7(v, 0.5) == pytest.approx(2.5)
        assert K.quantile_type7(v, 0.75) == pytest.approx(4.75)

    def test_mode(self):
        assert K.compute_mode(np.array([1.0, 2.0, 2.0, 3.0, 3.0])) == 2.0  # smallest tie
        assert K.compute_mode(np.array([1.0, 2.0, 3.0])) is None  # all unique

    def test_cv(self):
        assert K.coefficient_of_variation(0.0005, 1.0) is None
        assert K.coefficient_of_variation(10.0, 2.0) == pytest.approx(20.0)

    def test_skew_kurt_min_samples(self):
        v = np.array([1.0, 2.0])
        assert K.skewness(v, 1.5, 0.5) is None
        v3 = np.array([1.0, 2.0, 3.0])
        assert K.skewness(v3, 2.0, np.std(v3)) == pytest.approx(0.0)
        assert K.kurtosis_excess(v3, 2.0, 1.0) is None

    def test_tukey(self):
        v = np.array([1.0, 2.0, 3.0, 4.0, 100.0])
        assert K.tukey_outlier_count(v) == 1
        assert K.tukey_outlier_count(np.array([1.0, 2.0, 3.0])) == 0  # min 4

    def test_decimal_scale(self):
        assert K.decimal_scale("1.25") == 2
        assert K.decimal_scale("1.250") == 2  # trailing-zero trim
        assert K.decimal_scale("3") == 0
        assert K.decimal_scale("1.5e-3") == 4
        assert K.decimal_scale("abc") is None

    def test_name_heuristics(self):
        assert K.is_likely_date_column("created_at")
        assert K.is_likely_date_column("birthDate")
        assert not K.is_likely_date_column("amount")
        assert K.is_likely_id_column("user_id")
        assert K.is_likely_id_column("orderKey")
        assert not K.is_likely_id_column("paid")  # the famous case

    def test_int_float_parse(self):
        assert K.parse_i64("42") == 42
        assert K.parse_i64("+7") == 7
        assert K.parse_i64("1.0") is None
        assert K.parse_i64("1_0") is None
        assert K.parse_finite_f64("1.5e3") == 1500.0
        assert K.parse_finite_f64("inf") is None
        assert K.parse_finite_f64("1_0") is None
