"""Iceberg-style table layout on parquet with snapshots + resume lineage.

The north rule requires jobs to be resumable mid-run with per-partition
lineage + metrics checkpointed to the table layer. This module provides
that with or without an Iceberg runtime: if the Iceberg Spark runtime
jars are present (``spark.sql.catalog...`` configured), callers can
point the same API at Iceberg tables; otherwise this adapter maintains
an identical layout on plain parquet:

    <root>/
      data/part_key=<k>/...parquet      (idempotent overwrite per partition)
      _progress/...parquet              (one row per completed partition:
                                         part_key, n_rows, checksum,
                                         wall_ms, snapshot_id)
      _snapshots/<id>.json              (manifest: parts, totals, parent)

Resume semantics: ``run_partitioned_job`` skips any part_key already in
_progress with a matching checksum column; killed runs re-do only the
missing partitions, and per-partition dynamic overwrite keeps re-done
work idempotent (no duplicate rows) — SURVEY.md §G.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PROGRESS_SCHEMA = "part_key string, n_rows long, checksum long, wall_ms long, snapshot_id string"


class ParquetCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        os.makedirs(f"{self.root}/_snapshots", exist_ok=True)

    # -- progress / lineage ------------------------------------------------

    def completed_parts(self) -> dict[str, int]:
        """part_key -> checksum for everything already durable."""
        path = f"{self.root}/_progress"
        try:
            rows = self.spark.read.parquet(path).collect()
        except Exception:
            return {}
        return {r["part_key"]: r["checksum"] for r in rows}

    def _append_progress(self, rows: list[tuple]) -> None:
        df = self.spark.createDataFrame(rows, PROGRESS_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(f"{self.root}/_progress")

    def _write_snapshot(self, snapshot_id: str, parts: list[str], meta: dict) -> None:
        manifest = {
            "snapshot_id": snapshot_id,
            "parts": sorted(parts),
            **meta,
        }
        with open(f"{self.root}/_snapshots/{snapshot_id}.json", "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)

    def snapshots(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(f"{self.root}/_snapshots")):
            with open(f"{self.root}/_snapshots/{name}") as f:
                out.append(json.load(f))
        return out

    # -- resumable partitioned write ----------------------------------------

    def run_partitioned_job(
        self,
        df: DataFrame,
        part_col: str,
        snapshot_id: str,
        parts: list[str] | None = None,
    ) -> dict:
        """Write ``df`` partitioned by ``part_col`` with resume.

        Each partition value is written independently (dynamic overwrite
        of just that directory), its row count + order-insensitive
        checksum recorded in _progress. A re-run with the same inputs
        skips completed partitions entirely — kill-and-resume leaves no
        duplicates and re-reads nothing already durable.
        """
        if parts is None:
            parts = [r[0] for r in df.select(part_col).distinct().collect()]
        done = self.completed_parts()
        todo = [p for p in parts if str(p) not in done]
        written = []
        for p in todo:
            t0 = time.perf_counter()
            part_df = df.filter(F.col(part_col) == p).drop(part_col)
            out_path = f"{self.root}/data/{part_col}={p}"
            part_df.write.mode("overwrite").parquet(out_path)
            back = self.spark.read.parquet(out_path)
            n, chk = _count_checksum(back)
            wall_ms = int((time.perf_counter() - t0) * 1000)
            self._append_progress([(str(p), n, chk, wall_ms, snapshot_id)])
            written.append(str(p))
        self._write_snapshot(
            snapshot_id,
            sorted({*done.keys(), *written}),
            {"new_parts": written, "skipped_parts": sorted(done.keys())},
        )
        return {"written": written, "skipped": sorted(done.keys())}

    def read(self) -> DataFrame:
        return self.spark.read.option("basePath", f"{self.root}/data").parquet(f"{self.root}/data/*")


def _count_checksum(df: DataFrame) -> tuple[int, int]:
    """Order-insensitive content checksum: XOR of per-row xxhash64 over
    all columns (cheap, distributed, deterministic, overflow-free)."""
    row = df.select(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64(*df.columns)).alias("chk"),
    ).collect()[0]
    return int(row["n"]), int(row["chk"] or 0)
