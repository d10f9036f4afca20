"""Seven ISO-style quality dimensions + weighted overall score.

Behavior parity with the reference (re-implemented from scratch):
- dimension structs + score formulas:  /root/reference/crates/dataprof-metrics/src/quality.rs:135-411
- completeness (ISO 8000-8):           analysis/metrics/completeness.rs:31-167
- consistency (ISO 8000-61):           analysis/metrics/consistency.rs:24-210
- uniqueness (ISO 8000-110):           analysis/metrics/uniqueness.rs:34-193
- accuracy (ISO 25012):                analysis/metrics/accuracy.rs:32-226
- timeliness:                          analysis/metrics/timeliness.rs:34-165
- validity:                            analysis/metrics/validity.rs:20-72
- precision:                           analysis/metrics/precision.rs:21-72
- weights (0.25/0.20/0.15/0.15/0.10/0.10/0.05) + renormalization over
  *assessed* dimensions only:          quality.rs:379-411, config.rs:24-36

Bifurcated streaming calculation (analysis/metrics/mod.rs:463-741): Phase A
metrics (completeness, key-uniqueness, row duplicates) come exactly from the
merged accumulator counters; Phase B metrics (consistency, accuracy,
timeliness, validity, precision) are computed over the merged reservoir
sample. ``MetricConfidence`` records the provenance.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Optional

import numpy as np

from dataprof_ray.functions import kernels as K

# ------------------------------------------------------------------ config


@dataclass
class QualityScoreWeights:
    completeness: float = 0.25
    consistency: float = 0.20
    uniqueness: float = 0.15
    accuracy: float = 0.15
    timeliness: float = 0.10
    validity: float = 0.10
    precision: float = 0.05


@dataclass
class IsoQualityConfig:
    max_null_percentage: float = 50.0
    null_report_threshold: float = 10.0
    min_type_consistency: float = 95.0
    duplicate_report_threshold: float = 5.0
    high_cardinality_threshold: float = 95.0
    outlier_iqr_multiplier: float = 1.5
    outlier_min_samples: int = 4
    max_data_age_years: float = 5.0
    stale_data_threshold: float = 20.0
    score_weights: QualityScoreWeights = field(default_factory=QualityScoreWeights)

    @classmethod
    def strict(cls) -> "IsoQualityConfig":
        return cls(max_null_percentage=30.0, high_cardinality_threshold=98.0,
                   outlier_min_samples=10, max_data_age_years=2.0)

    @classmethod
    def lenient(cls) -> "IsoQualityConfig":
        return cls(max_null_percentage=70.0, high_cardinality_threshold=90.0,
                   outlier_iqr_multiplier=2.0, max_data_age_years=10.0)


# ------------------------------------------------------------------ dimension structs


@dataclass
class CompletenessMetrics:
    missing_values_ratio: float = 0.0
    complete_records_ratio: float = 100.0
    null_columns: list = field(default_factory=list)
    total_cells: int = 0


@dataclass
class ConsistencyMetrics:
    data_type_consistency: float = 100.0
    format_violations: int = 0
    encoding_issues: int = 0
    values_checked: int = 0


@dataclass
class UniquenessMetrics:
    duplicate_rows: int = 0
    key_uniqueness: float = 100.0
    high_cardinality_warning: bool = False
    rows_checked: int = 0
    key_column: Optional[str] = None
    duplicate_rows_approximate: bool = False


@dataclass
class AccuracyMetrics:
    outlier_ratio: float = 0.0
    range_violations: int = 0
    negative_values_in_positive: int = 0
    numeric_values_checked: int = 0


@dataclass
class TimelinessMetrics:
    future_dates_count: int = 0
    stale_data_ratio: float = 0.0
    temporal_violations: int = 0
    invalid_date_values: int = 0
    date_values_checked: int = 0
    temporal_pairs_checked: int = 0


@dataclass
class ValidityMetrics:
    valid_values_ratio: float = 100.0
    invalid_values: int = 0
    values_checked: int = 0


@dataclass
class PrecisionMetrics:
    decimal_places_consistency: float = 100.0
    inconsistent_precision_values: int = 0
    numeric_values_checked: int = 0


def _clamp(v: float, lo: float = 0.0, hi: float = 100.0) -> float:
    return min(max(v, lo), hi)


@dataclass
class QualityMetrics:
    completeness: Optional[CompletenessMetrics] = None
    consistency: Optional[ConsistencyMetrics] = None
    uniqueness: Optional[UniquenessMetrics] = None
    accuracy: Optional[AccuracyMetrics] = None
    timeliness: Optional[TimelinessMetrics] = None
    validity: Optional[ValidityMetrics] = None
    precision: Optional[PrecisionMetrics] = None
    low_sample_warning: bool = False
    score_weights: QualityScoreWeights = field(default_factory=QualityScoreWeights)

    # ---- dimension scores (None = not assessed; quality.rs:232-334) ----

    def completeness_score(self) -> Optional[float]:
        c = self.completeness
        if c is None or c.total_cells == 0:
            return None
        return _clamp(((100.0 - c.missing_values_ratio) + c.complete_records_ratio) / 2.0)

    def consistency_score(self) -> Optional[float]:
        c = self.consistency
        if c is None or c.values_checked == 0:
            return None
        violation_ratio = (c.format_violations + c.encoding_issues) / c.values_checked
        return _clamp(c.data_type_consistency - violation_ratio * 100.0)

    def uniqueness_score(self) -> Optional[float]:
        u = self.uniqueness
        if u is None:
            return None
        scores = []
        if u.rows_checked > 0:
            scores.append((1.0 - u.duplicate_rows / u.rows_checked) * 100.0)
        if u.key_column is not None:
            scores.append(u.key_uniqueness)
        if not scores:
            return None
        return _clamp(sum(scores) / len(scores))

    def accuracy_score(self) -> Optional[float]:
        a = self.accuracy
        if a is None or a.numeric_values_checked == 0:
            return None
        violation_ratio = (a.range_violations + a.negative_values_in_positive) / a.numeric_values_checked
        return _clamp(100.0 - a.outlier_ratio - violation_ratio * 100.0)

    def timeliness_score(self) -> Optional[float]:
        t = self.timeliness
        if t is None or t.date_values_checked == 0:
            return None
        value_violation_ratio = (t.future_dates_count + t.invalid_date_values) / t.date_values_checked
        temporal_ratio = (
            t.temporal_violations / t.temporal_pairs_checked if t.temporal_pairs_checked > 0 else 0.0
        )
        return _clamp(100.0 - t.stale_data_ratio - (value_violation_ratio + temporal_ratio) * 100.0)

    def validity_score(self) -> Optional[float]:
        v = self.validity
        if v is None or v.values_checked == 0:
            return None
        return _clamp(v.valid_values_ratio)

    def precision_score(self) -> Optional[float]:
        p = self.precision
        if p is None or p.numeric_values_checked == 0:
            return None
        return _clamp(p.decimal_places_consistency)

    def _weighted_scores(self):
        w = self.score_weights
        return [
            ("completeness", w.completeness, self.completeness_score()),
            ("consistency", w.consistency, self.consistency_score()),
            ("uniqueness", w.uniqueness, self.uniqueness_score()),
            ("accuracy", w.accuracy, self.accuracy_score()),
            ("timeliness", w.timeliness, self.timeliness_score()),
            ("validity", w.validity, self.validity_score()),
            ("precision", w.precision, self.precision_score()),
        ]

    def assessed_dimensions(self) -> list[str]:
        return [d for d, w, s in self._weighted_scores() if w > 0.0 and s is not None]

    def dimension_scores(self) -> dict:
        """name -> score (None = not assessed), in weight order."""
        return {d: s for d, _w, s in self._weighted_scores()}

    def overall_score(self) -> float:
        """Weighted mean over assessed dimensions only; weights renormalize
        (quality.rs:395-411)."""
        total_weight = 0.0
        score = 0.0
        for _, weight, value in self._weighted_scores():
            if value is not None:
                total_weight += weight
                score += value * weight
        return min(score / total_weight, 100.0) if total_weight > 0.0 else 0.0


def quality_from_dict(d: dict) -> "QualityMetrics":
    """Rebuild QualityMetrics from its asdict() form (report JSON load
    round-trip; extra keys like the serialized overall_score are ignored)."""

    def sub(cls, key):
        v = d.get(key)
        if v is None:
            return None
        allowed = cls.__dataclass_fields__
        return cls(**{k: val for k, val in v.items() if k in allowed})

    weights = d.get("score_weights") or {}
    return QualityMetrics(
        completeness=sub(CompletenessMetrics, "completeness"),
        consistency=sub(ConsistencyMetrics, "consistency"),
        uniqueness=sub(UniquenessMetrics, "uniqueness"),
        accuracy=sub(AccuracyMetrics, "accuracy"),
        timeliness=sub(TimelinessMetrics, "timeliness"),
        validity=sub(ValidityMetrics, "validity"),
        precision=sub(PrecisionMetrics, "precision"),
        low_sample_warning=bool(d.get("low_sample_warning", False)),
        score_weights=QualityScoreWeights(**{
            k: v for k, v in weights.items()
            if k in QualityScoreWeights.__dataclass_fields__
        }),
    )


# ------------------------------------------------------------------ calculators
#
# All calculators take:
#   data:     dict[column -> list[str]] — the merged reservoir sample
#   profiles: list of profile-like objects with .name .data_type .null_count
#             .total_count .unique_count .unique_count_is_approximate .patterns

_DATE_VALIDATION_RES = [
    __import__("re").compile(p)
    for p in (
        r"^\d{4}-\d{2}-\d{2}$", r"^\d{2}/\d{2}/\d{4}$", r"^\d{2}-\d{2}-\d{4}$",
        r"^\d{4}/\d{2}/\d{2}$", r"^\d{1,2}/\d{1,2}/\d{4}$", r"^\d{4}-\d{1,2}-\d{1,2}$",
        r"^\d{1,2}-\d{1,2}-\d{4}$",
    )
]

_DATE_FORMAT_RES = [
    ("YYYY-MM-DD", __import__("re").compile(r"^\d{4}-\d{2}-\d{2}$")),
    ("DD/MM/YYYY", __import__("re").compile(r"^\d{2}/\d{2}/\d{4}$")),
    ("DD-MM-YYYY", __import__("re").compile(r"^\d{2}-\d{2}-\d{4}$")),
    ("YYYY/MM/DD", __import__("re").compile(r"^\d{4}/\d{2}/\d{2}$")),
]

_ENCODING_ARTIFACTS = ("Ã¡", "Ã©", "Ã­", "Ã³", "Ãº", "Ã±", "Ã§")


def is_valid_date_format(value: str) -> bool:
    return any(r.match(value) for r in _DATE_VALIDATION_RES)


def calc_completeness_from_profiles(profiles, config: IsoQualityConfig) -> CompletenessMetrics:
    """Exact from merged counters; complete_records_ratio is the pessimistic
    lower bound (completeness.rs:115-149)."""
    total_cells = sum(p.total_count for p in profiles)
    null_cells = sum(p.null_count for p in profiles)
    missing_ratio = (null_cells / total_cells * 100.0) if total_cells else 0.0
    total_rows = profiles[0].total_count if profiles else 0
    complete_ratio = (
        max(max(total_rows - null_cells, 0) / total_rows * 100.0, 0.0) if total_rows else 100.0
    )
    threshold = config.max_null_percentage / 100.0
    null_columns = [
        p.name for p in profiles
        if p.total_count > 0 and (p.null_count / p.total_count) > threshold
    ]
    return CompletenessMetrics(missing_ratio, complete_ratio, null_columns, total_cells)


def calc_consistency(data: dict, profiles) -> ConsistencyMetrics:
    by_name = {p.name: p for p in profiles}
    total = 0
    consistent = 0
    for name, profile in by_name.items():
        values = data.get(name)
        if values is None:
            continue
        for value in values:
            trimmed = value.strip()
            if K.is_null_like_token(trimmed):
                continue
            total += 1
            dt = profile.data_type
            if dt == K.TYPE_INTEGER:
                ok = K.parse_i64(trimmed) is not None
            elif dt == K.TYPE_FLOAT:
                ok = _parses_f64(trimmed)
            elif dt == K.TYPE_DATE:
                ok = is_valid_date_format(trimmed)
            elif dt == K.TYPE_BOOLEAN:
                ok = K.parse_strict_boolean_token(trimmed) is not None
            else:  # String / Identifier
                ok = (not K.is_likely_date_column(name)) or is_valid_date_format(trimmed)
            if ok:
                consistent += 1
    type_consistency = (consistent / total * 100.0) if total else 100.0

    violations = 0
    encoding = 0
    for name, values in data.items():
        violations += _count_mixed_date_formats(name, values)
        violations += _count_decimal_separator_violations(values)
        for v in values:
            if "�" in v or any(a in v for a in _ENCODING_ARTIFACTS):
                encoding += 1
    return ConsistencyMetrics(type_consistency, violations, encoding, total)


def _parses_f64(s: str) -> bool:
    # consistency uses plain parse (no finite filter) — consistency.rs:63
    if not s or "_" in s or " " in s:
        return False
    try:
        float(s)
        return True
    except ValueError:
        return False


def _count_mixed_date_formats(column_name: str, values: list) -> int:
    """Minority date formats in a first-50 sample of date-named columns
    (consistency.rs:107-138)."""
    if not K.is_likely_date_column(column_name):
        return 0
    counts: dict[str, int] = {}
    non_empty = [v for v in values if v.strip()]
    for value in non_empty[:50]:
        t = value.strip()
        for fmt_name, rx in _DATE_FORMAT_RES:
            if rx.match(t):
                counts[fmt_name] = counts.get(fmt_name, 0) + 1
                break
    if len(counts) > 1:
        return sum(counts.values()) - max(counts.values())
    return 0


def _count_decimal_separator_violations(values: list) -> int:
    """Mixed-separator values + minority of dot-vs-comma decimals
    (consistency.rs:141-181)."""
    dot = comma = violations = 0
    for value in values:
        if not value:
            continue
        if "." in value and "," in value:
            violations += 1
            continue
        if "." in value:
            if value.count(".") == 1:
                dot += 1
        elif "," in value:
            if value.count(",") == 1:
                comma += 1
    if dot > 0 and comma > 0:
        violations += min(dot, comma)
    return violations


@dataclass
class RowDuplicateSummary:
    duplicate_rows: int
    rows_checked: int
    approximate: bool


def calc_uniqueness(data: dict, profiles, total_rows: int, identifier_columns: list,
                    config: IsoQualityConfig,
                    row_duplicates: Optional[RowDuplicateSummary] = None) -> UniquenessMetrics:
    if row_duplicates is not None and row_duplicates.rows_checked > 0:
        dup, checked, approx = (
            row_duplicates.duplicate_rows, row_duplicates.rows_checked, row_duplicates.approximate,
        )
    else:
        dup, checked = _count_sample_duplicate_rows(data, profiles)
        approx = False

    key_uniqueness, key_column = _key_uniqueness(profiles, identifier_columns)
    threshold = config.high_cardinality_threshold / 100.0
    high_card = False
    if total_rows > 0:
        for p in profiles:
            if p.unique_count is None:
                continue
            is_id = p.name in identifier_columns or K.is_likely_id_column(p.name)
            if not is_id and (p.unique_count / total_rows) > threshold:
                high_card = True
                break
    return UniquenessMetrics(dup, key_uniqueness, high_card, checked, key_column, approx)


def _count_sample_duplicate_rows(data: dict, profiles) -> tuple[int, int]:
    """Sample scan refuses misaligned columns -> (0, 0) 'not assessed'
    (uniqueness.rs:73-122)."""
    if not data:
        return 0, 0
    lengths = {len(v) for v in data.values()}
    if len(lengths) != 1:
        return 0, 0
    total = lengths.pop()
    if profiles and profiles[0].total_count != total:
        return 0, 0
    seen = set()
    dups = 0
    cols = list(data.keys())
    for i in range(total):
        sig = tuple(data[c][i] for c in cols)
        if sig in seen:
            dups += 1
        else:
            seen.add(sig)
    return dups, total


def _key_uniqueness(profiles, identifier_columns: list) -> tuple[float, Optional[str]]:
    key = None
    for name in identifier_columns:
        key = next((p for p in profiles if p.name == name), None)
        if key is not None:
            break
    if key is None:
        key = next((p for p in profiles if K.is_likely_id_column(p.name)), None)
    if key is None or key.unique_count is None:
        return 100.0, None
    if key.total_count == 0:
        return 100.0, None
    return key.unique_count / key.total_count * 100.0, key.name


def calc_accuracy(data: dict, profiles, config: IsoQualityConfig,
                  positive_columns: list = ()) -> AccuracyMetrics:
    total_numeric = 0
    total_outliers = 0
    for p in profiles:
        if p.data_type not in (K.TYPE_INTEGER, K.TYPE_FLOAT):
            continue
        values = data.get(p.name)
        if not values:
            continue
        nums = _parse_numeric(values)
        if len(nums) < config.outlier_min_samples:
            continue
        total_outliers += K.tukey_outlier_count(nums, config.outlier_iqr_multiplier)
        total_numeric += len(nums)
    outlier_ratio = (total_outliers / total_numeric * 100.0) if total_numeric else 0.0

    range_violations = 0
    numeric_checked = 0
    for name, values in data.items():
        v, n = _domain_range_violations(name, values)
        range_violations += v
        numeric_checked += n

    negatives = 0
    for name, values in data.items():
        if name in positive_columns:
            nums = _parse_numeric(values, finite_only=False)
            negatives += int(np.count_nonzero(nums < 0))
    return AccuracyMetrics(outlier_ratio, range_violations, negatives, numeric_checked)


def _parse_numeric(values: list, finite_only: bool = True) -> np.ndarray:
    out = []
    for v in values:
        t = v.strip() if isinstance(v, str) else v
        if isinstance(t, str):
            if K.is_null_like_token(t):
                continue
            f = K.parse_finite_f64(t) if finite_only else _try_float(t)
            if f is not None:
                out.append(f)
        elif t is not None:
            out.append(float(t))
    return np.asarray(out, dtype=np.float64)


def _try_float(t: str):
    try:
        return float(t)
    except ValueError:
        return None


def _domain_range_violations(column_name: str, values: list) -> tuple[int, int]:
    """age 0-150, percent/rate 0-100, count >=0, year 1900-2100
    (accuracy.rs:156-197)."""
    low = column_name.lower()
    violations = 0
    numeric = 0
    for raw in values:
        if not isinstance(raw, str):
            if raw is None:
                continue
            num = float(raw)
        else:
            if K.is_null_like_token(raw.strip()):
                continue
            f = _try_float(raw)
            if f is None or not np.isfinite(f):
                continue
            num = f
        numeric += 1
        if "age" in low and not (0.0 <= num <= 150.0):
            violations += 1
        if ("percent" in low or "rate" in low) and not (0.0 <= num <= 100.0):
            violations += 1
        if "count" in low and num < 0.0:
            violations += 1
        if "year" in low and not (1900.0 <= num <= 2100.0):
            violations += 1
    return violations, numeric


_TEMPORAL_PAIRS = [
    ("start_date", "end_date"),
    ("start", "end"),
    ("created_at", "updated_at"),
    ("created", "updated"),
    ("begin_date", "end_date"),
    ("from_date", "to_date"),
]


def calc_timeliness(data: dict, temporal_columns: list, config: IsoQualityConfig,
                    now_year: Optional[int] = None) -> TimelinessMetrics:
    current_year = now_year if now_year is not None else datetime.now(timezone.utc).year
    threshold_year = current_year - int(config.max_data_age_years)

    future = stale = valid = checked = invalid = 0
    for name in temporal_columns:
        values = data.get(name)
        if values is None:
            continue
        for value in values:
            if K.is_null_like_token(value.strip() if isinstance(value, str) else value):
                continue
            checked += 1
            year = K.parse_raw_datetime_year(value) if isinstance(value, str) else None
            if year is not None:
                valid += 1
                if year > current_year:
                    future += 1
                if year < threshold_year:
                    stale += 1
            else:
                invalid += 1
    stale_ratio = (stale / valid * 100.0) if valid else 0.0

    violations = pairs = 0
    for start_col, end_col in _TEMPORAL_PAIRS:
        start_vals = next(
            (data.get(n) for n in temporal_columns if start_col in n.lower() and data.get(n) is not None),
            None,
        )
        end_vals = next(
            (data.get(n) for n in temporal_columns if end_col in n.lower() and data.get(n) is not None),
            None,
        )
        if start_vals is None or end_vals is None:
            continue
        for s, e in zip(start_vals, end_vals):
            if K.is_null_like_token(s.strip()) or K.is_null_like_token(e.strip()):
                continue
            if K.parse_raw_datetime_year(s) is None or K.parse_raw_datetime_year(e) is None:
                continue
            pairs += 1
            if s > e:  # string comparison works for ISO dates (timeliness.rs:139)
                violations += 1
    return TimelinessMetrics(future, stale_ratio, violations, invalid, checked, pairs)


def calc_validity(data: dict, profiles) -> ValidityMetrics:
    """Per column with a dominant pattern (conf >= 0.5; tie-break
    confidence -> match_count -> name desc); valid = min(match_count, non_null)
    (validity.rs:20-72)."""
    valid_values = 0
    checked = 0
    for p in profiles:
        patterns = getattr(p, "patterns", None)
        if patterns is None:
            continue
        eligible = [pt for pt in patterns if pt.confidence >= 0.5]
        if not eligible:
            continue
        dominant = max(eligible, key=lambda pt: (pt.confidence, pt.match_count, _neg_str(pt.name)))
        values = data.get(p.name)
        if values is None:
            continue
        non_null = sum(1 for v in values if not K.is_null_like_token(v.strip()))
        if non_null == 0:
            continue
        checked += non_null
        valid_values += min(dominant.match_count, non_null)
    invalid = max(checked - valid_values, 0)
    ratio = (valid_values / checked * 100.0) if checked else 100.0
    return ValidityMetrics(ratio, invalid, checked)


class _neg_str:
    """Reverse-ordering wrapper for the name-descending tie-break."""

    def __init__(self, s: str) -> None:
        self.s = s

    def __lt__(self, other: "_neg_str") -> bool:
        return self.s > other.s

    def __eq__(self, other: object) -> bool:
        return isinstance(other, _neg_str) and self.s == other.s


def calc_precision(data: dict, profiles) -> PrecisionMetrics:
    checked = 0
    inconsistent = 0
    for p in profiles:
        if p.data_type != K.TYPE_FLOAT:
            continue
        values = data.get(p.name)
        if not values:
            continue
        scales: dict[int, int] = {}
        for value in values:
            t = value.strip()
            if K.is_null_like_token(t):
                continue
            if K.parse_finite_f64(t) is None:
                continue
            scale = K.decimal_scale(t)
            if scale is not None:
                scales[scale] = scales.get(scale, 0) + 1
        column_count = sum(scales.values())
        dominant = max(scales.values(), default=0)
        checked += column_count
        inconsistent += max(column_count - dominant, 0)
    ratio = ((checked - inconsistent) / checked * 100.0) if checked else 100.0
    return PrecisionMetrics(ratio, inconsistent, checked)


def low_sample_warning(total_rows: int) -> bool:
    """Below 10 rows the scores are directional only (utils.rs:80-96)."""
    return total_rows < 10
