"""Value-level kernels replicating the reference's inference / parsing semantics.

Parity sources (behavior only, re-implemented from scratch):
- null-like / strict-boolean / type-inference thresholds:
  /root/reference/crates/dataprof-metrics/src/analysis/inference.rs:33-114
- multi-format date chain (European before US) + raw quality predicate:
  /root/reference/crates/dataprof-metrics/src/stats/datetime.rs:73-175
- decimal-scale extraction:
  /root/reference/crates/dataprof-metrics/src/analysis/metrics/precision.rs:75-88
- column-name heuristics:
  /root/reference/crates/dataprof-metrics/src/analysis/metrics/utils.rs:107-170

Each scalar function has a vectorized sibling (suffix ``_mask`` / ``_series``)
used inside ``map_batches`` hot paths.
"""

from __future__ import annotations

import math
import re
from datetime import date, datetime
from typing import Optional, Sequence

import numpy as np

I64_MIN = -(2**63)
I64_MAX = 2**63 - 1

# --- null / boolean tokens ---------------------------------------------------

_INT_RE = re.compile(r"^[+-]?[0-9]+$")


def is_null_like_token(value: Optional[str]) -> bool:
    """'' / 'null' / 'nan' case-insensitive after trim (inference.rs:98-103)."""
    if value is None:
        return True
    t = value.strip()
    return t == "" or t.lower() in ("null", "nan")


def parse_strict_boolean_token(value: str) -> Optional[bool]:
    """Only 'true'/'false' case-insensitive after trim (inference.rs:105-114)."""
    t = value.strip().lower()
    if t == "true":
        return True
    if t == "false":
        return False
    return None


def parse_i64(value: str) -> Optional[int]:
    """Rust ``str::parse::<i64>`` semantics on the trimmed token."""
    t = value.strip()
    if not _INT_RE.match(t):
        return None
    v = int(t)
    if v < I64_MIN or v > I64_MAX:
        return None
    return v


_FLOAT_BAD = re.compile(r"[_ ]")


def parse_finite_f64(value: str) -> Optional[float]:
    """Rust ``str::parse::<f64>`` + ``is_finite()`` (no underscores, no thousands sep)."""
    t = value.strip()
    if not t or _FLOAT_BAD.search(t):
        return None
    try:
        v = float(t)
    except ValueError:
        return None
    if not math.isfinite(v):
        return None
    return v


# --- type inference ----------------------------------------------------------

DATE_REGEXES = [
    re.compile(r"^\d{4}-\d{2}-\d{2}$"),
    re.compile(r"^\d{2}/\d{2}/\d{4}$"),
    re.compile(r"^\d{2}-\d{2}-\d{4}$"),
    re.compile(r"^\d{4}/\d{2}/\d{2}$"),
    re.compile(r"^\d{2}\.\d{2}\.\d{4}$"),
    re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?$"),
    re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$"),
    re.compile(r"^\d{2}/\d{2}/\d{4} \d{2}:\d{2}:\d{2}$"),
]

_ANY_DATE_RE = re.compile(
    r"^(?:\d{4}-\d{2}-\d{2}"
    r"|\d{2}/\d{2}/\d{4}"
    r"|\d{2}-\d{2}-\d{4}"
    r"|\d{4}/\d{2}/\d{2}"
    r"|\d{2}\.\d{2}\.\d{4}"
    r"|\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?"
    r"|\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"
    r"|\d{2}/\d{2}/\d{4} \d{2}:\d{2}:\d{2})$"
)

TYPE_STRING = "String"
TYPE_IDENTIFIER = "Identifier"
TYPE_INTEGER = "Integer"
TYPE_FLOAT = "Float"
TYPE_DATE = "Date"
TYPE_BOOLEAN = "Boolean"


def infer_type(values: Sequence[str]) -> str:
    """Threshold inference: all-i64 -> Integer; >80% finite f64 -> Float; >=90%
    strict bool -> Boolean; >70% cumulative date-regex -> Date; else String.
    Pure 0/1 stays Integer because bool tokens are string literals only.
    (inference.rs:33-96)"""
    non_null = [s for s in values if s is not None and not is_null_like_token(s)]
    if not non_null:
        return TYPE_STRING
    n = len(non_null)
    int_count = 0
    float_count = 0
    for s in non_null:
        if parse_i64(s) is not None:
            int_count += 1
            float_count += 1
        elif parse_finite_f64(s) is not None:
            float_count += 1
    if int_count == n:
        return TYPE_INTEGER
    if float_count / n > 0.8:
        return TYPE_FLOAT
    bool_count = sum(1 for s in non_null if parse_strict_boolean_token(s) is not None)
    if bool_count / n >= 0.9:
        return TYPE_BOOLEAN
    date_count = sum(1 for s in non_null if _ANY_DATE_RE.match(s.strip()))
    if date_count / n > 0.7:
        return TYPE_DATE
    return TYPE_STRING


# --- date parsing chain ------------------------------------------------------

_RFC3339_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[Tt](\d{2}):(\d{2}):(\d{2})(\.\d+)?"
    r"(?:[Zz]|[+-]\d{2}:\d{2})$"
)

_DT_FORMATS = [
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S",
    "%d/%m/%Y %H:%M:%S",
]
_DATE_FORMATS = [
    "%Y-%m-%d",
    "%d/%m/%Y",  # European before US (datetime.rs:117-126)
    "%d-%m-%Y",
    "%d.%m.%Y",
    "%Y/%m/%d",
    "%m/%d/%Y",
]


def parse_flexible_datetime(s: str) -> Optional[tuple[date, Optional[datetime]]]:
    """The reference's chrono chain (datetime.rs:73-134): RFC 3339, ISO datetimes,
    DD/MM/YYYY datetime, fractional ISO, then date-only formats European-first.
    Returns (date, datetime-or-None-if-date-only)."""
    t = s.strip()
    m = _RFC3339_RE.match(t)
    if m:
        try:
            frac = m.group(7)
            micro = int(round(float(frac) * 1e6)) if frac else 0
            dt = datetime(
                int(m.group(1)), int(m.group(2)), int(m.group(3)),
                int(m.group(4)), int(m.group(5)), int(m.group(6)), min(micro, 999999),
            )
            return dt.date(), dt
        except ValueError:
            return None
    for fmt in _DT_FORMATS:
        try:
            dt = datetime.strptime(t, fmt)
            return dt.date(), dt
        except ValueError:
            pass
    # %Y-%m-%dT%H:%M:%S%.f (fractional seconds)
    if "T" in t and "." in t:
        try:
            head, frac = t.rsplit(".", 1)
            if frac.isdigit():
                dt = datetime.strptime(head, "%Y-%m-%dT%H:%M:%S")
                dt = dt.replace(microsecond=int((frac + "000000")[:6]))
                return dt.date(), dt
        except ValueError:
            pass
    for fmt in _DATE_FORMATS:
        try:
            d = datetime.strptime(t, fmt)
            # strptime is lenient about zero-padding in some locales; enforce shape
            return d.date(), None
        except ValueError:
            pass
    return None


def looks_like_raw_datetime_candidate(s: str) -> bool:
    """Untrimmed shape pre-check (datetime.rs:155-175): must equal its trim,
    len>=10, and start YYYY<sep>MM<sep> or DD<sep>MM<sep>YYYY with the same
    separator in both positions (sep in -/.)."""
    if s != s.strip() or len(s) < 10:
        return False
    seps = "-/."
    year_first = (
        s[0:4].isdigit() and len(s) > 7 and s[4] in seps and s[7] == s[4]
    )
    year_last = (
        s[6:10].isdigit() and s[2] in seps and len(s) > 5 and s[5] == s[2]
    )
    return year_first or year_last


def parse_raw_datetime_year(s: str) -> Optional[int]:
    """Quality-predicate year extraction over the *untrimmed* raw value with
    calendar validation (rejects 2024-13-45) (datetime.rs:142-153)."""
    if not looks_like_raw_datetime_candidate(s):
        return None
    parsed = parse_flexible_datetime(s)
    if parsed is None:
        return None
    return parsed[0].year


def is_valid_raw_date(s: str) -> bool:
    return parse_raw_datetime_year(s) is not None


# --- decimal scale -----------------------------------------------------------

def decimal_scale(value: str) -> Optional[int]:
    """Effective number of decimal places incl. scientific notation, with
    trailing-zero trim (precision.rs:75-88). Returns None if not numeric."""
    v = parse_finite_f64(value)
    if v is None:
        return None
    t = value.strip().lower()
    mantissa, exp = (t.split("e", 1) + ["0"])[:2] if "e" in t else (t, "0")
    try:
        exponent = int(exp)
    except ValueError:
        return None
    if "." in mantissa:
        frac = mantissa.split(".", 1)[1].rstrip("0")
        scale = len(frac)
    else:
        scale = 0
    return max(0, scale - exponent)


# --- column-name heuristics ---------------------------------------------------

_DATE_NAME_TOKENS = (
    # exactly the reference's indicator set (utils.rs:107-121); broader
    # substrings like "end" would misfire on gender/weekend/trend
    "date", "time", "created", "updated", "timestamp", "birth", "expiry",
)


def is_likely_date_column(name: str) -> bool:
    """Substring heuristic over the lowercased name (utils.rs:107-121)."""
    low = name.lower()
    return any(tok in low for tok in _DATE_NAME_TOKENS)


_WORD_SPLIT_RE = re.compile(r"[_\-\s]+|(?<=[a-z0-9])(?=[A-Z])")
_ID_WORDS = {"id", "key", "pk"}  # exactly utils.rs:124-130 ('code' etc.
# would pick low-cardinality columns like country_code as the key)


def is_likely_id_column(name: str) -> bool:
    """Word-level heuristic via camel/snake split so 'paid' != id
    (utils.rs:124-170)."""
    words = [w.lower() for w in _WORD_SPLIT_RE.split(name) if w]
    return any(w in _ID_WORDS for w in words)


# --- numeric order statistics --------------------------------------------------

def quantile_type7(sorted_vals: np.ndarray, q: float) -> float:
    """R Type-7 linear interpolation (the numpy default) on a pre-sorted array
    (numeric.rs:155-192)."""
    n = len(sorted_vals)
    if n == 0:
        return float("nan")
    if n == 1:
        return float(sorted_vals[0])
    h = (n - 1) * q
    lo = int(math.floor(h))
    hi = min(lo + 1, n - 1)
    frac = h - lo
    return float(sorted_vals[lo] * (1 - frac) + sorted_vals[hi] * frac)


def compute_mode(values: np.ndarray) -> Optional[float]:
    """Smallest most-frequent value at 1e-10 string precision; None when every
    value is unique (numeric.rs:196-227)."""
    if len(values) == 0:
        return None
    keys, counts = np.unique(np.round(values, 10), return_counts=True)
    max_count = counts.max()
    if max_count <= 1:
        return None
    return float(keys[counts == max_count].min())


def coefficient_of_variation(mean: float, std_dev: float) -> Optional[float]:
    """CV = std/|mean| * 100; None when |mean| < 1e-3 (numeric.rs:230-237)."""
    if abs(mean) < 1e-3:
        return None
    return std_dev / abs(mean) * 100.0


def skewness(values: np.ndarray, mean: float, std_dev: float) -> Optional[float]:
    """Population skewness sum(z^3)/n, needs n>=3 and std>0 (numeric.rs:240-257)."""
    n = len(values)
    if n < 3 or std_dev <= 0:
        return None
    z = (values - mean) / std_dev
    return float(np.mean(z**3))


def kurtosis_excess(values: np.ndarray, mean: float, std_dev: float) -> Optional[float]:
    """Excess kurtosis sum(z^4)/n - 3, needs n>=4 and std>0 (numeric.rs:259-275)."""
    n = len(values)
    if n < 4 or std_dev <= 0:
        return None
    z = (values - mean) / std_dev
    return float(np.mean(z**4) - 3.0)


def tukey_outlier_count(values: np.ndarray, multiplier: float = 1.5) -> int:
    """Tukey IQR fence count, k=1.5, minimum 4 samples (numeric.rs:109-121)."""
    n = len(values)
    if n < 4:
        return 0
    s = np.sort(values)
    q1 = quantile_type7(s, 0.25)
    q3 = quantile_type7(s, 0.75)
    iqr = q3 - q1
    lo = q1 - multiplier * iqr
    hi = q3 + multiplier * iqr
    return int(np.count_nonzero((values < lo) | (values > hi)))


def round_half_away(value: float, ndigits: int) -> float:
    """serde round_2/round_4 helper parity: round half away from zero
    (serde_helpers.rs)."""
    factor = 10.0**ndigits
    return math.copysign(math.floor(abs(value) * factor + 0.5) / factor, value)
