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


def commit_stage(
    out_dir: str,
    manifest: dict,
    stage: str,
    df: DataFrame,
    partition_by: list[str] | None = None,
    sort_within: list[str] | None = None,
) -> DataFrame:
    """Write `df` as parquet under out_dir/<stage>, record lineage
    (per-file-partition row counts) in the manifest, return the re-read
    DataFrame (so downstream stages consume the committed data, making
    boundaries deterministic for resume)."""
    spark = df.sparkSession
    path = os.path.join(out_dir, stage)
    t0 = time.time()
    w = df
    if sort_within:
        w = w.sortWithinPartitions(*sort_within)
    writer = w.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    committed = spark.read.parquet(path)
    # lineage: rows per committed file, read from parquet FOOTERS only —
    # no Spark job, no data scan (metadata is exact)
    manifest["stages"][stage] = {
        "rows": 0,
        "partitions": {},
        "wall_sec": round(time.time() - t0, 3),
    }
    part_counts = _footer_row_counts(path)
    manifest["stages"][stage]["partitions"] = part_counts
    manifest["stages"][stage]["rows"] = int(sum(part_counts.values()))
    save_manifest(out_dir, manifest)
    return committed


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
    elif manifest["settings"] != settings.to_dict():
        raise ValueError(
            "index at this path was built with different settings; "
            f"manifest={manifest['settings']} requested={settings.to_dict()}"
        )
