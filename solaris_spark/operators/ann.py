"""Approximate-nearest-neighbor search over embedding columns.

Two tiers (as a 100 TB pipeline needs both):
- brute_force_knn: exact cosine top-k — the correctness baseline and the
  right choice when |queries| × |targets| is small (e.g. rerank stage);
  JVM-side `zip_with`/`aggregate` fold, window top-k.
- ivf_knn: IVF-style scale path — k-means-ish coarse centroids (seeded,
  computed with a few Lloyd iterations ON the cluster), each vector
  assigned to its nearest centroid (+ optional multi-probe), candidates
  restricted to the query's probe cells, exact cosine refine + top-k.
  Search cost drops |targets| → |targets|·probes/n_cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, Window


def _cosine_expr(a: str, b: str):
    dot = F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> "
                 f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
    na = F.expr(f"sqrt(aggregate({a}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))")
    nb = F.expr(f"sqrt(aggregate({b}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))")
    return dot / (na * nb)


def brute_force_knn(queries: DataFrame, targets: DataFrame, k: int = 5,
                    qid: str = "qid", tid: str = "tid",
                    qvec: str = "qv", tvec: str = "tv") -> DataFrame:
    """Exact cosine top-k (crossJoin — use only for bounded query sets)."""
    j = queries.crossJoin(targets).filter(F.col(qid) != F.col(tid))
    j = j.withColumn("cosine", _cosine_expr(qvec, tvec))
    w = Window.partitionBy(qid).orderBy(F.desc("cosine"), F.asc(tid))
    return (j.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid, tid, "rank", "cosine"))


def train_centroids(vectors: DataFrame, vec_col: str, n_cells: int,
                    iters: int = 3, seed: int = 42,
                    sample_fraction: float = 1.0) -> np.ndarray:
    """Seeded Lloyd iterations over a sample.  Returns (n_cells, dim).
    Deterministic: initial centroids are the first n_cells rows by id hash;
    assignment/update loops run as Spark aggregations (scales to any N)."""
    sample = vectors.select(vec_col)
    if sample_fraction < 1.0:
        sample = sample.sample(fraction=sample_fraction, seed=seed)
    first = sample.limit(n_cells).collect()
    cents = np.array([r[0] for r in first], dtype=np.float64)
    for _ in range(iters):
        bc = cents.tolist()
        dim = cents.shape[1]
        assign_expr = _nearest_centroid_expr(vec_col, bc)
        agg = (sample.withColumn("cell", assign_expr)
               .groupBy("cell")
               .agg(F.array(*[
                   F.avg(F.expr(f"CAST({vec_col}[{i}] AS DOUBLE)"))
                   for i in range(dim)]).alias("centroid"),
                   F.count(F.lit(1)).alias("n"))
               .collect())
        new = cents.copy()
        for r in agg:
            new[r["cell"]] = np.array(r["centroid"])
        cents = new
    return cents


def _nearest_centroid_expr(vec_col: str, centroids: list):
    """Column: argmin over centroids of L2 distance — pure SQL expression
    (unrolled; fine for ≤ a few hundred cells; use a pandas UDF beyond)."""
    exprs = []
    for ci, c in enumerate(centroids):
        arr = "array(" + ",".join(f"{v!r}D" for v in c) + ")"
        d = (f"aggregate(zip_with({vec_col}, {arr}, (a, b) -> "
             f"(CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), 0D, (acc, x) -> acc + x)")
        exprs.append(f"struct(({d}) AS d, {ci} AS i)")
    return F.expr("array_min(array(" + ", ".join(exprs) + ")).i")


def ivf_knn(queries: DataFrame, targets: DataFrame, k: int = 5,
            n_cells: int = 16, n_probe: int = 2,
            qid: str = "qid", tid: str = "tid",
            qvec: str = "qv", tvec: str = "tv",
            centroids: np.ndarray | None = None) -> DataFrame:
    """IVF ANN: assign targets to their nearest centroid cell; queries probe
    their n_probe nearest cells; exact cosine refine within probed cells.
    Recall < 1 by design (ANN); brute_force_knn is the oracle."""
    if centroids is None:
        centroids = train_centroids(
            targets.select(F.col(tvec).alias("v")), "v", n_cells)
    cl = centroids.tolist()
    t = targets.withColumn("cell", _nearest_centroid_expr(tvec, cl))

    # query probe cells: n_probe nearest centroids (unrolled distance sort)
    probe_structs = []
    for ci, c in enumerate(cl):
        arr = "array(" + ",".join(f"{v!r}D" for v in c) + ")"
        d = (f"aggregate(zip_with({qvec}, {arr}, (a, b) -> "
             f"(CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), 0D, (acc, x) -> acc + x)")
        probe_structs.append(f"struct(({d}) AS d, {ci} AS i)")
    probes = F.expr(
        "transform(slice(array_sort(array(" + ", ".join(probe_structs)
        + ")), 1, " + str(n_probe) + "), s -> s.i)")
    q = queries.withColumn("cell", F.explode(probes))

    j = q.join(t, "cell").filter(F.col(qid) != F.col(tid))
    j = j.withColumn("cosine", _cosine_expr(qvec, tvec))
    w = Window.partitionBy(qid).orderBy(F.desc("cosine"), F.asc(tid))
    return (j.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid, tid, "rank", "cosine"))
