"""Per-partition lineage + checkpoint-resumable runs (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

The reference is strictly batch with no resumability (SURVEY §2.9); the
engine realizes it as:

1. a deterministic partition task list: the job's input is split into
   partitions by a stable key expression (e.g. pmod(hash(image_id), N));
2. a commit log (the `lineage` table — parquet, append-only):
   (run_id, partition_id, status, rows_in, rows_out, checksum, wall_sec)
   written per partition AFTER its output lands;
3. resume = anti-join the task list against committed partitions of the
   same run_id, process only the remainder, append to both tables.
   Output writes are idempotent per partition (partition-dir overwrite).

This is engine-level bookkeeping on top of parquet — on a real cluster the
same records map 1:1 onto Iceberg snapshot metadata (documented in
sources/catalog.py); no Iceberg jar exists in this sandbox.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

LINEAGE_SCHEMA = ("run_id string, partition_id int, status string, "
                  "rows_in long, rows_out long, checksum string, "
                  "wall_sec double, committed_at string")


def partition_ids(df: DataFrame, key: str, n_parts: int) -> DataFrame:
    """Stable partition assignment — deterministic across runs/cluster sizes
    (unlike spark_partition_id, which depends on physical planning)."""
    return df.withColumn("partition_id",
                         F.pmod(F.hash(F.col(key)), F.lit(n_parts)).cast("int"))


def committed_partitions(spark: SparkSession, lineage_dir: str,
                         run_id: str) -> DataFrame:
    if not os.path.exists(lineage_dir):
        return spark.createDataFrame([], "partition_id int")
    log = spark.read.parquet(lineage_dir)
    return (log.filter((F.col("run_id") == run_id)
                       & (F.col("status") == "committed"))
            .select("partition_id").distinct())


def run_resumable(spark: SparkSession, inputs: DataFrame, key: str,
                  n_parts: int, run_id: str, out_dir: str, lineage_dir: str,
                  transform: Callable[[DataFrame], DataFrame],
                  checksum_col: str | None = None) -> dict:
    """Process `inputs` partition-by-partition with commit records; re-runs
    skip committed partitions (idempotent restart).

    Partition granularity trades off restart cost vs commit overhead — at
    100 TB choose n_parts so one partition ≈ minutes of work.  Returns a
    summary dict with counts.
    """
    tasks = partition_ids(inputs, key, n_parts)
    done = committed_partitions(spark, lineage_dir, run_id)
    todo_ids = [r["partition_id"] for r in
                tasks.select("partition_id").distinct()
                .join(done, "partition_id", "left_anti").collect()]
    summary = {"run_id": run_id, "total_parts": n_parts,
               "skipped": n_parts - len(todo_ids), "processed": 0}
    for pid in sorted(todo_ids):
        t0 = time.time()
        part = tasks.filter(F.col("partition_id") == pid).drop("partition_id")
        rows_in = part.count()
        out = transform(part)
        path = os.path.join(out_dir, f"partition_id={pid}")
        out.write.mode("overwrite").parquet(path)
        back = spark.read.parquet(path)
        rows_out = back.count()
        if checksum_col is not None:
            # decimal sum: ANSI mode (Spark 4 default) would overflow a
            # long sum of xxhash64 values
            cs = back.agg(F.sum(F.xxhash64(F.col(checksum_col))
                                .cast("decimal(38,0)")).cast("string")
                          .alias("c")).collect()[0]["c"]
        else:
            cs = hashlib.sha256(f"{pid}:{rows_out}".encode()).hexdigest()[:16]
        rec = [(run_id, pid, "committed", rows_in, rows_out, str(cs),
                time.time() - t0, time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()))]
        spark.createDataFrame(rec, LINEAGE_SCHEMA) \
            .write.mode("append").parquet(lineage_dir)
        summary["processed"] += 1
    return summary
