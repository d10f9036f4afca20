"""Pipeline configuration + semantic hints.

Behavior parity (not a port) with the reference's config layer:
- Profiler builder knobs:       /root/reference/crates/dataprof/src/profiler.rs:28-313
- SemanticHints fail-loud:      crates/dataprof-core/src/semantic.rs:62-218
- IsoQualityConfig + weights:   crates/dataprof-core/src/config.rs:60-136,565-784
- TOML discovery + env:         config.rs:405-551,1006-1045
- metric packs / dimensions:    crates/dataprof-core/src/quality.rs:60-137

A ``PipelineConfig`` is a plain dataclass — new stages are just
``map_batches`` callables, so the extension surface stays Python."""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace
from typing import Optional

from dataprof_ray.functions.quality import IsoQualityConfig, QualityScoreWeights

METRIC_PACKS = ("schema", "statistics", "patterns", "quality")
QUALITY_DIMENSIONS = (
    "completeness", "consistency", "uniqueness", "accuracy",
    "timeliness", "validity", "precision",
)


@dataclass
class SemanticHints:
    """Column-role hints. Validation is FAIL-LOUD (semantic.rs:62-218):
    unknown column names error against a schema; value-driven hints that
    prove inert over the data error at report time; hints without the
    quality pack error at build time."""

    identifier_columns: tuple = ()
    positive_columns: tuple = ()
    temporal_columns: tuple = ()

    def is_empty(self) -> bool:
        return not (self.identifier_columns or self.positive_columns
                    or self.temporal_columns)

    def all_columns(self) -> set:
        return (set(self.identifier_columns) | set(self.positive_columns)
                | set(self.temporal_columns))

    def validate_against_schema(self, column_names) -> None:
        unknown = self.all_columns() - set(column_names)
        if unknown:
            raise ValueError(
                f"semantic hints reference unknown columns: {sorted(unknown)} "
                f"(available: {sorted(column_names)})"
            )

    def validate_bindings(self, report) -> None:
        """Value-driven hints proven inert over the full data are an error
        (semantic.rs: hints must bind). A positive hint on a column with no
        numeric values, or a temporal hint on a column with no parseable
        dates, never influenced any metric — fail loudly."""
        for col in self.positive_columns:
            p = report[col]
            if p.data_type not in ("Integer", "Float"):
                stats = p.stats
                numeric_seen = getattr(stats, "mean", None) is not None
                if not numeric_seen:
                    raise ValueError(
                        f"positive-column hint on {col!r} bound no numeric values"
                    )
        for col in self.temporal_columns:
            p = report[col]
            if p.data_type != "Date":
                raise ValueError(
                    f"temporal-column hint on {col!r} bound no temporal values "
                    f"(inferred {p.data_type})"
                )


@dataclass
class PipelineConfig:
    """The builder-equivalent knob set (profiler.rs:28-313 -> Ray)."""

    batch_size: Optional[int] = None
    sample_capacity: int = 10_000
    locale: Optional[str] = None
    metric_packs: tuple = METRIC_PACKS
    quality_dimensions: tuple = QUALITY_DIMENSIONS  # empty -> no quality
    hints: SemanticHints = field(default_factory=SemanticHints)
    iso: IsoQualityConfig = field(default_factory=IsoQualityConfig)
    csv_delimiter: Optional[str] = None
    csv_flexible: bool = True
    json_error_policy: str = "skip"
    memory_limit_mb: int = 512
    stop_condition: Optional[object] = None

    def __post_init__(self) -> None:
        bad = set(self.metric_packs) - set(METRIC_PACKS)
        if bad:
            raise ValueError(f"unknown metric packs: {sorted(bad)}")
        bad = set(self.quality_dimensions) - set(QUALITY_DIMENSIONS)
        if bad:
            raise ValueError(f"unknown quality dimensions: {sorted(bad)}")
        if not self.hints.is_empty() and "quality" not in self.metric_packs:
            raise ValueError(
                "semantic hints require the 'quality' metric pack "
                "(semantic.rs: hints without Quality pack error)"
            )
        if self.json_error_policy not in ("skip", "strict"):
            raise ValueError(f"unknown json error policy: {self.json_error_policy}")

    # ---- presets (config.rs builder presets) ----

    @staticmethod
    def ci() -> "PipelineConfig":
        from dataprof_ray.state.stop import StopCondition

        return PipelineConfig(sample_capacity=1_000,
                              stop_condition=StopCondition.max_rows(100_000))

    @staticmethod
    def interactive() -> "PipelineConfig":
        return PipelineConfig(sample_capacity=10_000)

    @staticmethod
    def production() -> "PipelineConfig":
        return PipelineConfig(sample_capacity=10_000, memory_limit_mb=4096)

    def weights(self) -> QualityScoreWeights:
        return self.iso.score_weights


# ------------------------------------------------------------------ discovery


ENV_PREFIX = "DATAPROF_"
_ENV_KEYS = {
    "DATAPROF_BATCH_SIZE": ("batch_size", int),
    "DATAPROF_SAMPLE_CAPACITY": ("sample_capacity", int),
    "DATAPROF_LOCALE": ("locale", str),
    "DATAPROF_CSV_DELIMITER": ("csv_delimiter", str),
    "DATAPROF_JSON_ERROR_POLICY": ("json_error_policy", str),
    "DATAPROF_MEMORY_LIMIT_MB": ("memory_limit_mb", int),
}

CONFIG_FILENAMES = (".dataprof.toml", "dataprof.toml")


def discover_config(start_dir: str = ".", env: Optional[dict] = None) -> PipelineConfig:
    """TOML discovery (walk up from start_dir) + env-var overrides
    (config.rs:405-551 semantics: env beats file beats defaults)."""
    import tomllib

    cfg_kwargs: dict = {}
    d = os.path.abspath(start_dir)
    while True:
        for name in CONFIG_FILENAMES:
            p = os.path.join(d, name)
            if os.path.isfile(p):
                with open(p, "rb") as f:
                    raw = tomllib.load(f)
                section = raw.get("dataprof", raw)
                for key in PipelineConfig.__dataclass_fields__:
                    if key in section:
                        val = section[key]
                        cfg_kwargs[key] = tuple(val) if isinstance(val, list) else val
                d = None
                break
        if d is None:
            break
        parent = os.path.dirname(d)
        if parent == d:
            break
        d = parent

    env = os.environ if env is None else env
    for env_key, (attr, conv) in _ENV_KEYS.items():
        if env_key in env:
            cfg_kwargs[attr] = conv(env[env_key])
    return PipelineConfig(**cfg_kwargs)
