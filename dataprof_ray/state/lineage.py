"""Per-partition lineage + resumable runs (the north rule's checkpoint story).

A corpus run over N input shards writes one output directory per shard plus a
manifest entry {shard_id, input_path, row_count, rule/model versions,
content fingerprint}. A re-run diffs the manifest against the input listing
and processes only shards that are missing or whose versions changed —
"resumable from checkpoint with per-partition lineage".

The manifest generalizes the reference's ExecutionMetadata accounting record
(/root/reference/crates/dataprof-core/src/execution.rs:20-88) from one run
to one record per partition. Writes are atomic (temp file + rename).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field
from typing import Optional


@dataclass
class PartitionRecord:
    shard_id: str
    input_path: str
    rows: int
    kept: int
    output_dir: str
    extraction_version: str
    rules_version: str
    completed_at: float = field(default_factory=lambda: time.time())


class LineageManifest:
    def __init__(self, path: str) -> None:
        self.path = path
        self.records: dict[str, PartitionRecord] = {}
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        rec = PartitionRecord(**json.loads(line))
                        self.records[rec.shard_id] = rec

    def is_complete(self, shard_id: str, extraction_version: str, rules_version: str) -> bool:
        rec = self.records.get(shard_id)
        return (
            rec is not None
            and rec.extraction_version == extraction_version
            and rec.rules_version == rules_version
            and os.path.isdir(rec.output_dir)
        )

    def mark_complete(self, record: PartitionRecord) -> None:
        self.records[record.shard_id] = record
        self._flush()

    def _flush(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as f:
            for rec in self.records.values():
                f.write(json.dumps(asdict(rec)) + "\n")
        os.replace(tmp, self.path)  # atomic

    def pending_shards(self, shard_paths: list[str], extraction_version: str,
                       rules_version: str) -> list[str]:
        return [
            p for p in shard_paths
            if not self.is_complete(os.path.basename(p), extraction_version, rules_version)
        ]


def run_resumable_filter(
    input_shards: list[str],
    output_root: str,
    manifest_path: Optional[str] = None,
    config=None,
    batch_size: int = 2048,
) -> dict:
    """Shard-at-a-time resumable quality-filter run.

    Each input shard becomes one output directory (atomic: temp dir +
    rename) and one manifest record. A crashed run re-invoked with the same
    arguments skips completed shards. Returns a summary dict."""
    import shutil

    import ray.data as rd

    from dataprof_ray.functions import docquality as DQ
    from dataprof_ray.pipelines import quality_filter as QF

    manifest = LineageManifest(manifest_path or os.path.join(output_root, "_manifest.jsonl"))
    pending = manifest.pending_shards(input_shards, DQ.EXTRACTION_VERSION, DQ.RULES_VERSION)
    skipped = len(input_shards) - len(pending)

    processed = 0
    for shard_path in pending:
        shard_id = os.path.basename(shard_path)
        out_dir = os.path.join(output_root, shard_id.replace(".parquet", ""))
        tmp_dir = out_dir + ".tmp"
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)

        ds = rd.read_parquet(shard_path)
        filtered = QF.run_quality_filter(ds, config=config, batch_size=batch_size)
        filtered.write_parquet(tmp_dir)
        # kept/rows from the written output (no second pass over input)
        out_ds = rd.read_parquet(tmp_dir, columns=["keep"])
        rows = out_ds.count()
        kept = int(out_ds.sum("keep") or 0)
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.replace(tmp_dir, out_dir)
        manifest.mark_complete(PartitionRecord(
            shard_id=shard_id,
            input_path=shard_path,
            rows=rows,
            kept=kept,
            output_dir=out_dir,
            extraction_version=DQ.EXTRACTION_VERSION,
            rules_version=DQ.RULES_VERSION,
        ))
        processed += 1

    return {
        "shards_total": len(input_shards),
        "shards_processed": processed,
        "shards_skipped": skipped,
        "manifest": manifest.path,
    }
