"""PipelineConfig + SemanticHints fail-loud validation + TOML/env discovery."""

import numpy as np
import pyarrow as pa
import pytest

from dataprof_ray.config import (
    CONFIG_FILENAMES,
    PipelineConfig,
    SemanticHints,
    discover_config,
)
from dataprof_ray.pipelines.profile import profile_table


class TestHints:
    def test_unknown_column_errors(self):
        h = SemanticHints(identifier_columns=("nope",))
        with pytest.raises(ValueError, match="unknown columns.*nope"):
            h.validate_against_schema(["a", "b"])

    def test_known_columns_pass(self):
        SemanticHints(positive_columns=("a",)).validate_against_schema(["a", "b"])

    def test_hints_without_quality_pack_error(self):
        with pytest.raises(ValueError, match="quality"):
            PipelineConfig(hints=SemanticHints(identifier_columns=("id",)),
                           metric_packs=("schema", "statistics"))

    def test_inert_positive_hint_errors(self):
        table = pa.table({"name": pa.array(["alpha", "beta", "gamma"] * 10)})
        report = profile_table(table)
        h = SemanticHints(positive_columns=("name",))
        with pytest.raises(ValueError, match="bound no numeric"):
            h.validate_bindings(report)

    def test_inert_temporal_hint_errors(self):
        table = pa.table({"x": pa.array(np.arange(30.0))})
        report = profile_table(table)
        h = SemanticHints(temporal_columns=("x",))
        with pytest.raises(ValueError, match="temporal"):
            h.validate_bindings(report)

    def test_bound_hints_pass(self):
        table = pa.table({
            "amount": pa.array(np.arange(30.0)),
            "when": pa.array(["2024-01-15"] * 30),
        })
        report = profile_table(table)
        SemanticHints(positive_columns=("amount",),
                      temporal_columns=("when",)).validate_bindings(report)


class TestConfig:
    def test_defaults_valid(self):
        cfg = PipelineConfig()
        assert "quality" in cfg.metric_packs

    def test_unknown_pack_rejected(self):
        with pytest.raises(ValueError, match="metric packs"):
            PipelineConfig(metric_packs=("schema", "wat"))

    def test_unknown_dimension_rejected(self):
        with pytest.raises(ValueError, match="dimensions"):
            PipelineConfig(quality_dimensions=("completeness", "vibes"))

    def test_bad_json_policy_rejected(self):
        with pytest.raises(ValueError, match="json"):
            PipelineConfig(json_error_policy="explode")

    def test_presets(self):
        assert PipelineConfig.ci().stop_condition is not None
        assert PipelineConfig.production().memory_limit_mb == 4096


class TestDiscovery:
    def test_toml_discovered_up_the_tree(self, tmp_path):
        (tmp_path / CONFIG_FILENAMES[0]).write_text(
            "[dataprof]\nsample_capacity = 123\nlocale = 'IT'\n"
        )
        nested = tmp_path / "a" / "b"
        nested.mkdir(parents=True)
        cfg = discover_config(str(nested), env={})
        assert cfg.sample_capacity == 123
        assert cfg.locale == "IT"

    def test_env_beats_file(self, tmp_path):
        (tmp_path / CONFIG_FILENAMES[0]).write_text("[dataprof]\nsample_capacity = 123\n")
        cfg = discover_config(str(tmp_path), env={"DATAPROF_SAMPLE_CAPACITY": "77"})
        assert cfg.sample_capacity == 77

    def test_no_file_defaults(self, tmp_path):
        cfg = discover_config(str(tmp_path), env={})
        assert cfg.sample_capacity == 10_000
