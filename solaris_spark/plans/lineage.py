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
                  checksum_col: str | None = None,
                  commit_every: int | None = None) -> dict:
    """Process every not-yet-committed partition with per-partition commit
    records; re-runs skip committed partitions (idempotent restart).

    `transform` must be row-wise (no cross-partition aggregation) and must
    preserve the `key` column in its output — the key defines lineage, so
    partition membership is recomputed on the output rows.

    Scale shape (VERDICT r01 #3 — the original version filtered the task
    table once per partition, an O(n_parts × N) input rescan):

    - commit_every=None (default): ONE distributed pass — 1 lightweight agg
      over the input (remaining ids + rows_in), 1 transform+write job with
      dynamic partition overwrite, 1 agg over the written output (rows_out
      + checksum).  Exactly 2 input scans + 1 output scan regardless of
      n_parts.  RESTART GRANULARITY IS THE WHOLE REMAINING SET: commits
      land only after the pass, so a mid-run failure redoes every
      remaining partition (the output writes are idempotent, so this is
      wasted work, never corruption).

    - commit_every=C: bounded restart windows WITHOUT per-chunk input
      rescans — the keyed task table is materialized ONCE, partitioned by
      partition_id (1 full input scan), then chunks of C partitions are
      processed from partition-PRUNED reads of that staging table with a
      commit append after each chunk.  Total input I/O stays O(N); a
      failure loses at most C partitions of work.  At 100 TB choose
      n_parts and C so one chunk ≈ minutes of work.

    `wall_sec` records the enclosing pass/chunk wall clock on every record.
    Returns a summary dict with counts.
    """
    tasks = partition_ids(inputs, key, n_parts)
    done = committed_partitions(spark, lineage_dir, run_id)
    todo = tasks.join(F.broadcast(done), "partition_id", "left_anti")
    # one scan yields BOTH the remaining-partition ids and their rows_in
    in_counts = {r["partition_id"]: r["n"] for r in
                 todo.groupBy("partition_id")
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
    todo_ids = sorted(in_counts)
    summary = {"run_id": run_id, "total_parts": n_parts,
               "skipped": n_parts - len(todo_ids), "processed": 0}
    if not todo_ids:
        return summary

    def process(part_df: DataFrame, ids: list[int]) -> None:
        t0 = time.time()
        out = transform(part_df.drop("partition_id"))
        if key not in out.columns:
            raise ValueError(
                f"transform must preserve the lineage key column {key!r}")
        out = partition_ids(out, key, n_parts)
        # dynamic overwrite: only partitions present in `out` are replaced —
        # previously committed partition dirs are untouched
        (out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("partition_id").parquet(out_dir))

        back = spark.read.parquet(out_dir) \
            .filter(F.col("partition_id").isin(ids))
        aggs = [F.count(F.lit(1)).alias("rows_out")]
        if checksum_col is not None:
            # decimal sum: ANSI mode (Spark 4 default) would overflow a
            # long sum of xxhash64 values
            aggs.append(F.sum(F.xxhash64(F.col(checksum_col))
                              .cast("decimal(38,0)")).cast("string")
                        .alias("cs"))
        out_stats = {r["partition_id"]: r for r in
                     back.groupBy("partition_id").agg(*aggs).collect()}

        wall = time.time() - t0
        now = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        recs = []
        for pid in ids:
            st = out_stats.get(pid)
            rows_out = int(st["rows_out"]) if st is not None else 0
            if checksum_col is not None and st is not None:
                cs = str(st["cs"])
            else:
                cs = hashlib.sha256(
                    f"{pid}:{rows_out}".encode()).hexdigest()[:16]
            recs.append((run_id, pid, "committed",
                         int(in_counts.get(pid, 0)), rows_out, cs, wall, now))
        spark.createDataFrame(recs, LINEAGE_SCHEMA) \
            .write.mode("append").parquet(lineage_dir)
        summary["processed"] += len(ids)

    if commit_every is None:
        process(todo, todo_ids)
        return summary

    # chunked mode: stage the keyed tasks ONCE (full scan), then read each
    # chunk back partition-pruned — no per-chunk input rescan
    stage = os.path.join(out_dir + "_tasks_staging", run_id)
    todo.write.mode("overwrite").partitionBy("partition_id").parquet(stage)
    staged = spark.read.parquet(stage)
    for i in range(0, len(todo_ids), commit_every):
        chunk = todo_ids[i:i + commit_every]
        process(staged.filter(F.col("partition_id").isin(chunk)), chunk)
    # the staging copy is only needed while this run can still be resumed;
    # all chunks committed → delete it (otherwise each run_id leaks a full
    # copy of the input under <out_dir>_tasks_staging)
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(stage)
    p.getFileSystem(spark._jsc.hadoopConfiguration()).delete(p, True)
    return summary
