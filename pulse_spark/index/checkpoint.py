"""Checkpoint-resumable staged index build with per-partition lineage.

The reference resumes nothing — a crashed SPIMI run restarts from zero.
Per the north rule, this build commits each stage as an immutable parquet
directory plus a manifest entry, so a re-run with the same out_dir skips
every committed stage (the analog of Iceberg snapshot commits; plain
parquet + _SUCCESS-style manifest keeps the sandbox dependency-free while
the layout stays Iceberg-shaped: swap `write.parquet` for
`writeTo(...).using("iceberg")` when the catalog jar is present).

manifest.json:
{
  "settings": {...},                       # persisted like stats.bin does
                                           # (engine.go:38-43 reads settings
                                           #  from the index, not the CLI)
  "stages": {
     "docs":     {"rows": N, "partitions": {"0": n0, ...}, "wall_sec": s},
     "postings": {...}, "terms": {...}, "stats": {...}, "segments": {...}
  }
}
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulse_spark.config import IndexingSettings

MANIFEST = "manifest.json"


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST)


def load_manifest(out_dir: str) -> dict:
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"settings": None, "stages": {}}


def save_manifest(out_dir: str, manifest: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir))  # atomic commit


def stage_done(manifest: dict, stage: str) -> bool:
    return stage in manifest["stages"]


def write_stage(
    df: DataFrame,
    out_dir: str,
    stage: str,
    partition_by: list[str] | None = None,
    sort_within: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> float:
    """Parquet write only — the thread-safe half of commit_stage (no
    manifest mutation), so independent stages can write CONCURRENTLY from
    separate driver threads (one SparkContext schedules both job DAGs and
    back-fills each job's straggler tail with the other's tasks).
    Returns wall seconds."""
    path = os.path.join(out_dir, stage)
    t0 = time.time()
    w = df
    if sort_within:
        w = w.sortWithinPartitions(*sort_within)
    writer = w.write.mode("overwrite")
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return round(time.time() - t0, 3)


def record_stage(
    spark: SparkSession, out_dir: str, manifest: dict, stage: str, wall_sec: float
) -> DataFrame:
    """Record lineage for an already-written stage and return the re-read
    DataFrame (downstream stages consume the committed data, making
    boundaries deterministic for resume).  Lineage = rows per committed
    file, read from parquet FOOTERS only — no Spark job, no data scan."""
    path = os.path.join(out_dir, stage)
    part_counts = _footer_row_counts(path)
    manifest["stages"][stage] = {
        "rows": int(sum(part_counts.values())),
        "partitions": part_counts,
        "wall_sec": wall_sec,
    }
    save_manifest(out_dir, manifest)
    return spark.read.parquet(path)


def commit_stage(
    out_dir: str,
    manifest: dict,
    stage: str,
    df: DataFrame,
    partition_by: list[str] | None = None,
    sort_within: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """write_stage + record_stage (the sequential convenience form)."""
    wall = write_stage(df, out_dir, stage, partition_by, sort_within, options)
    return record_stage(df.sparkSession, out_dir, manifest, stage, wall)


def _footer_row_counts(path: str) -> dict[str, int]:
    """{relative_file_path: num_rows} from parquet footers (driver-side,
    metadata-only)."""
    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, path)
                out[rel] = pq.ParquetFile(full).metadata.num_rows
    return out


def read_stage(spark: SparkSession, out_dir: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, stage))


def check_settings(manifest: dict, settings: IndexingSettings) -> None:
    if manifest["settings"] is None:
        manifest["settings"] = settings.to_dict()
        return
    # forward-compatible comparison: a manifest written before a new
    # settings field existed resumes under that field's DEFAULT (strict
    # dict equality would refuse to resume every pre-upgrade index);
    # unknown stored keys are ignored for the same reason.
    import dataclasses

    known = {f.name for f in dataclasses.fields(IndexingSettings)}
    stored = IndexingSettings.from_dict(
        {k: v for k, v in manifest["settings"].items() if k in known}
    ).to_dict()
    if stored != settings.to_dict():
        raise ValueError(
            "index at this path was built with different settings; "
            f"manifest={stored} requested={settings.to_dict()}"
        )
