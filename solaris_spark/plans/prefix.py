"""Distributed prefix (running) aggregation.

``Window.orderBy(...)`` with NO ``partitionBy`` is the classic scale
killer: Spark moves EVERY row to a single partition (``WindowExec: No
Partition Defined`` warns) — fine at 2k rows, fatal at 100 TB.  The
global running sums the reference relies on (mAP's conf-desc cumulative
TP/FP, eval/vector.py:484-492) are still expressible scale-safely as a
textbook distributed prefix sum:

1. bucket every row by RANGE of the ordering key — boundaries come from
   one ``percentile_approx`` pass, computed once driver-side and embedded
   as literals, so bucketing is deterministic across jobs (no
   repartitionByRange re-sampling hazard);
2. run the cumulative window WITHIN each bucket (partitioned window —
   parallel, spill-safe);
3. add each bucket's exclusive prefix offset: per-bucket totals are one
   tiny aggregation (≤ n_buckets rows, bounded driver collect), folded
   in as a literal CASE expression — no extra shuffle, no second window.

Equal ordering-key values always land in the same bucket (bucket index =
count of boundaries strictly below the value), so within-tie behavior is
identical to the single-window plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.storagelevel import StorageLevel

_BKT = "__prefix_bkt"


def global_running_agg(df: DataFrame, order_col: str,
                       aggs: dict[str, Column], *, ascending: bool = True,
                       tie_cols: tuple = (), n_buckets: int = 64,
                       accuracy: int = 10000) -> DataFrame:
    """Append running-SUM columns over a GLOBAL ordering without a
    single-partition window.

    aggs: {output_name: column to sum} (use ``F.lit(1)`` for a running
    count).  Ordering is ``order_col`` asc/desc, then ``tie_cols`` asc —
    the same total order ``Window.orderBy`` would use.  Numeric types are
    preserved (decimal sums stay decimal: offsets are literal values of
    the collected totals, so Spark widens precision exactly as the
    single-window plan does).
    """
    spark = df.sparkSession
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.select(F.percentile_approx(
        F.col(order_col).cast("double"), qs, accuracy).alias("b")).first()
    bounds = sorted(set(row["b"] or [])) if row is not None else []

    if bounds:
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.size(F.filter(
            arr, lambda x: x < F.col(order_col).cast("double")))
    else:
        bucket = F.lit(0)
    # Persist the bucketed frame: the per-bucket totals job (below) and
    # the caller's final job BOTH read this one evaluation, so a
    # nondeterministic upstream (sampling, rand, re-read of a changing
    # source) cannot bucket/sum differently between the two passes.
    # Spark's LRU cache evicts it under pressure; at 100 TB prefer
    # StorageLevel.DISK_ONLY or an upstream checkpoint instead of
    # recomputation-prone MEMORY_AND_DISK defaults.
    d = df.withColumn(_BKT, bucket).persist(StorageLevel.MEMORY_AND_DISK)

    # per-bucket totals: bounded (≤ n_buckets rows) — collect and fold the
    # exclusive prefix back in as literals, not a join.  Computed FROM the
    # persisted bucketed frame (single definition of the bucketing), not a
    # second withColumn over df.
    tot = (d.groupBy(_BKT)
           .agg(*[F.sum(col).alias(name) for name, col in aggs.items()])
           .collect())

    direction = F.asc(order_col) if ascending else F.desc(order_col)
    w = Window.partitionBy(_BKT) \
        .orderBy(direction, *[F.asc(t) for t in tie_cols]) \
        .rowsBetween(Window.unboundedPreceding, 0)

    loc = {name: f"__loc_{name}" for name in aggs}
    for name, col in aggs.items():
        d = d.withColumn(loc[name], F.sum(col).over(w))
    tot.sort(key=lambda r: r[_BKT], reverse=not ascending)
    offsets: dict[str, dict[int, object]] = {name: {} for name in aggs}
    acc: dict[str, object] = {name: None for name in aggs}
    for r in tot:
        for name in aggs:
            offsets[name][r[_BKT]] = acc[name]
            v = r[name]
            if v is not None:
                acc[name] = v if acc[name] is None else acc[name] + v

    for name in aggs:
        off = F.lit(None)
        for bkt, val in offsets[name].items():
            if val is not None:
                off = F.when(F.col(_BKT) == bkt, F.lit(val)).otherwise(off)
        d = d.withColumn(
            name,
            F.when(off.isNull(), F.col(loc[name]))
            .otherwise(F.col(loc[name]) + off))
    return d.drop(_BKT, *loc.values())
