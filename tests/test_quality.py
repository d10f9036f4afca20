"""Quality dimension + weighted-score arithmetic — vectors ported from
quality.rs:581-1047 tests and the per-dimension calculator tests (F10)."""

import pytest

from dataprof_ray.functions import quality as Q
from dataprof_ray.functions import kernels as K


def perfect_assessed() -> Q.QualityMetrics:
    return Q.QualityMetrics(
        completeness=Q.CompletenessMetrics(0.0, 100.0, [], 100),
        consistency=Q.ConsistencyMetrics(100.0, 0, 0, 100),
        uniqueness=Q.UniquenessMetrics(0, 100.0, False, 100, None, False),
        accuracy=Q.AccuracyMetrics(0.0, 0, 0, 100),
        timeliness=Q.TimelinessMetrics(0, 0.0, 0, 0, 100, 100),
        validity=Q.ValidityMetrics(100.0, 0, 100),
        precision=Q.PrecisionMetrics(100.0, 0, 100),
    )


class TestScores:
    def test_perfect_is_100(self):
        m = perfect_assessed()
        assert len(m.assessed_dimensions()) == 7
        assert m.overall_score() == pytest.approx(100.0, abs=0.01)

    def test_completeness_zero_gives_75(self):
        m = perfect_assessed()
        m.completeness.missing_values_ratio = 100.0
        m.completeness.complete_records_ratio = 0.0
        assert m.overall_score() == pytest.approx(75.0, abs=0.01)

    def test_all_bad_is_0(self):
        m = perfect_assessed()
        m.completeness.missing_values_ratio = 100.0
        m.completeness.complete_records_ratio = 0.0
        m.consistency.data_type_consistency = 0.0
        m.uniqueness.duplicate_rows = 100
        m.accuracy.outlier_ratio = 100.0
        m.timeliness.stale_data_ratio = 100.0
        m.validity.valid_values_ratio = 0.0
        m.precision.decimal_places_consistency = 0.0
        assert m.overall_score() == pytest.approx(0.0, abs=0.01)

    def test_vacuous_dimensions_renormalize_7222(self):
        m = perfect_assessed()
        m.completeness.missing_values_ratio = 50.0
        m.completeness.complete_records_ratio = 50.0
        m.uniqueness.rows_checked = 0
        m.accuracy.numeric_values_checked = 0
        m.timeliness.date_values_checked = 0
        m.validity.values_checked = 0
        m.precision.numeric_values_checked = 0
        assert m.assessed_dimensions() == ["completeness", "consistency"]
        # (0.25*50 + 0.20*100) / 0.45
        assert m.overall_score() == pytest.approx(72.2222, abs=0.01)

    def test_duplicate_rows_lower_uniqueness(self):
        m = perfect_assessed()
        m.uniqueness.duplicate_rows = 30
        assert m.uniqueness_score() == pytest.approx(70.0, abs=0.01)

    def test_key_only_uniqueness(self):
        m = perfect_assessed()
        m.uniqueness.rows_checked = 0
        m.uniqueness.key_column = "order_id"
        m.uniqueness.key_uniqueness = 90.0
        assert m.uniqueness_score() == pytest.approx(90.0, abs=0.01)

    def test_key_blend_80(self):
        m = perfect_assessed()
        m.uniqueness.duplicate_rows = 30  # row score 70
        m.uniqueness.key_column = "order_id"
        m.uniqueness.key_uniqueness = 90.0
        assert m.uniqueness_score() == pytest.approx(80.0, abs=0.01)

    def test_empty_metrics_nothing_assessed(self):
        m = Q.QualityMetrics(
            completeness=Q.CompletenessMetrics(total_cells=0),
            consistency=Q.ConsistencyMetrics(values_checked=0),
            uniqueness=Q.UniquenessMetrics(rows_checked=0, key_column=None),
            accuracy=Q.AccuracyMetrics(numeric_values_checked=0),
            timeliness=Q.TimelinessMetrics(date_values_checked=0),
            validity=Q.ValidityMetrics(values_checked=0),
            precision=Q.PrecisionMetrics(numeric_values_checked=0),
        )
        assert m.assessed_dimensions() == []
        assert m.overall_score() == 0.0

    def test_custom_weights(self):
        m = perfect_assessed()
        m.completeness.missing_values_ratio = 100.0
        m.completeness.complete_records_ratio = 0.0
        m.score_weights = Q.QualityScoreWeights(1.0, 0, 0, 0, 0, 0, 0)
        assert m.overall_score() == pytest.approx(0.0, abs=0.01)
        assert m.assessed_dimensions() == ["completeness"]


class _P:
    """Minimal profile stub for the calculators."""

    def __init__(self, name, data_type=K.TYPE_STRING, null_count=0, total_count=0,
                 unique_count=None, patterns=None):
        self.name = name
        self.data_type = data_type
        self.null_count = null_count
        self.total_count = total_count
        self.unique_count = unique_count
        self.unique_count_is_approximate = False
        self.patterns = patterns


class TestCalculators:
    def test_completeness_from_profiles(self):
        profiles = [
            _P("a", null_count=2, total_count=10),
            _P("b", null_count=6, total_count=10),
        ]
        cfg = Q.IsoQualityConfig()
        c = Q.calc_completeness_from_profiles(profiles, cfg)
        assert c.missing_values_ratio == pytest.approx(40.0)
        assert c.complete_records_ratio == pytest.approx(20.0)  # (10-8)/10
        assert c.null_columns == ["b"]  # 60% > 50 (strictly greater)
        assert c.total_cells == 20

    def test_null_column_boundary_strictly_greater(self):
        cfg = Q.IsoQualityConfig()
        c = Q.calc_completeness_from_profiles([_P("a", null_count=5, total_count=10)], cfg)
        assert c.null_columns == []  # exactly 50% is not > 50%

    def test_consistency_type_check(self):
        data = {"n": ["1", "2", "x", ""], "created": ["2024-01-01", "01/02/2024"]}
        profiles = [_P("n", K.TYPE_INTEGER), _P("created", K.TYPE_DATE)]
        c = Q.calc_consistency(data, profiles)
        assert c.values_checked == 5
        assert c.data_type_consistency == pytest.approx(4 / 5 * 100)

    def test_consistency_mixed_date_formats(self):
        data = {"created": ["2024-01-01", "2024-01-02", "01/02/2024"]}
        c = Q.calc_consistency(data, [_P("created", K.TYPE_DATE)])
        assert c.format_violations == 1  # minority format

    def test_consistency_decimal_separators(self):
        data = {"x": ["1.5", "2.5", "3,5"]}
        c = Q.calc_consistency(data, [_P("x", K.TYPE_FLOAT)])
        assert c.format_violations == 1

    def test_consistency_encoding(self):
        data = {"t": ["café", "caf�", "IlGattoÃ¡"]}
        c = Q.calc_consistency(data, [_P("t", K.TYPE_STRING)])
        assert c.encoding_issues == 2

    def test_uniqueness_misaligned_not_assessed(self):
        data = {"a": ["1", "2", "3"], "b": ["x", "y"]}
        u = Q.calc_uniqueness(data, [_P("a", total_count=3)], 3, [], Q.IsoQualityConfig())
        assert u.rows_checked == 0 and u.duplicate_rows == 0

    def test_uniqueness_row_tracker_supersedes(self):
        summary = Q.RowDuplicateSummary(5, 100, False)
        u = Q.calc_uniqueness({}, [], 100, [], Q.IsoQualityConfig(), summary)
        assert u.duplicate_rows == 5 and u.rows_checked == 100

    def test_uniqueness_key_column(self):
        profiles = [_P("user_id", total_count=10, unique_count=9)]
        u = Q.calc_uniqueness({}, profiles, 10, [], Q.IsoQualityConfig())
        assert u.key_column == "user_id"
        assert u.key_uniqueness == pytest.approx(90.0)

    def test_high_cardinality_strictly_greater(self):
        cfg = Q.IsoQualityConfig()
        # 95% exactly -> no warning; >95% -> warning; id columns excluded
        p95 = [_P("note", total_count=100, unique_count=95)]
        p96 = [_P("note", total_count=100, unique_count=96)]
        pid = [_P("user_id", total_count=100, unique_count=100)]
        assert not Q.calc_uniqueness({}, p95, 100, [], cfg).high_cardinality_warning
        assert Q.calc_uniqueness({}, p96, 100, [], cfg).high_cardinality_warning
        assert not Q.calc_uniqueness({}, pid, 100, [], cfg).high_cardinality_warning

    def test_accuracy_outliers_and_ranges(self):
        data = {"age": ["10", "20", "30", "25", "200"]}
        profiles = [_P("age", K.TYPE_INTEGER)]
        a = Q.calc_accuracy(data, profiles, Q.IsoQualityConfig())
        assert a.range_violations == 1  # age 200
        assert a.numeric_values_checked == 5
        assert a.outlier_ratio > 0

    def test_accuracy_negative_in_positive(self):
        data = {"amount_eur": ["10", "-5", "3"]}
        a = Q.calc_accuracy(data, [_P("amount_eur", K.TYPE_INTEGER)],
                            Q.IsoQualityConfig(), positive_columns=["amount_eur"])
        assert a.negative_values_in_positive == 1

    def test_timeliness(self):
        data = {
            "observed_on": ["2024-01-15", "2031-01-01", "2010-01-01", "2024-13-45", "null"],
        }
        t = Q.calc_timeliness(data, ["observed_on"], Q.IsoQualityConfig(), now_year=2026)
        assert t.date_values_checked == 4  # null skipped
        assert t.future_dates_count == 1  # 2031
        assert t.invalid_date_values == 1  # 2024-13-45
        assert t.stale_data_ratio == pytest.approx(1 / 3 * 100)  # 2010 of 3 valid

    def test_timeliness_pair_violation(self):
        data = {
            "start": ["2024-01-10", "2024-01-05"],
            "end": ["2024-01-12", "2024-01-01"],
        }
        t = Q.calc_timeliness(data, ["start", "end"], Q.IsoQualityConfig(), now_year=2026)
        assert t.temporal_pairs_checked == 2
        assert t.temporal_violations == 1

    def test_validity_dominant_pattern(self):
        from dataprof_ray.functions.patterns import Pattern

        pat = Pattern("Email", "re", 8, 80.0, "Contact", 0.8)
        profiles = [_P("email", patterns=[pat])]
        data = {"email": ["a@b.com"] * 10}
        v = Q.calc_validity(data, profiles)
        assert v.values_checked == 10
        assert v.valid_values_ratio == pytest.approx(80.0)

    def test_validity_none_vs_empty_patterns(self):
        # patterns=None (never scanned) -> not assessed; [] -> not assessed either
        v = Q.calc_validity({"c": ["x"]}, [_P("c", patterns=None)])
        assert v.values_checked == 0
        low_conf = [__import__("dataprof_ray.functions.patterns", fromlist=["Pattern"]).Pattern(
            "Email", "re", 1, 10.0, "Contact", 0.3)]
        v2 = Q.calc_validity({"c": ["x"]}, [_P("c", patterns=low_conf)])
        assert v2.values_checked == 0  # below 0.5 confidence

    def test_precision(self):
        data = {"x": ["1.25", "2.50", "3.1", "4.75"]}
        p = Q.calc_precision(data, [_P("x", K.TYPE_FLOAT)])
        # scales: 1.25->2, 2.50->1 (trailing zero trim), 3.1->1, 4.75->2 — tie -> dominant 2
        assert p.numeric_values_checked == 4
        assert p.inconsistent_precision_values == 2

    def test_low_sample_warning(self):
        assert Q.low_sample_warning(9)
        assert not Q.low_sample_warning(10)
