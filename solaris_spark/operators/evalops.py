"""Evaluation joins + aggregations: IoU matching, per-image scores, rollups.

Re-expresses (Spark-first):
- calculate_iou           → solaris/eval/iou.py:4-44 (IoU per candidate pair)
- eval_iou greedy match   → solaris/eval/base.py:268-287: proposals in order
                            each claim their max-IoU GT (strictly > miniou)
                            and REMOVE it; leftover GT = FN; TP counts >= miniou
- eval_iou_spacenet_csv   → base.py:63-208: per-image loop + min_area filters
                            (GT: area >= min_area, proposals: area > min_area)
                            + per-building max-claimed IoU (get_iou_by_building)
- score rollup            → base.py:157-206 (P/R/F1), challenges.py:62-87
                            (AOI groupby-sum + recompute)
- mAP                     → eval/vector.py:469-513

The sequential claim semantics exist only WITHIN an image group —
images are the parallel axis (10^12 of them at scale), so the engine runs
groupBy(image_id).applyInPandas(greedy) after a cell-key candidate join.
Salting hot images is the caller's knob (plans/skew.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, Window

from ..functions import geom as G

MATCH_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),      # 'pred' | 'gt'
    T.StructField("row_id", T.LongType(), False),
    T.StructField("iou_score", T.DoubleType(), True),
    T.StructField("matched_gt", T.LongType(), True),
    T.StructField("area", T.DoubleType(), True),
])


def _greedy_match_group(pdf: pd.DataFrame, miniou: float, min_area: float) -> pd.DataFrame:
    """One image's greedy match. Exact reference semantics:

    - GT filtered to area >= min_area; proposals to area > min_area
      (base.py:114-120 — note the asymmetric comparison)
    - proposals processed in ascending `order` (conf-desc rank assigned
      upstream); zero-area proposals score 0 (base.py:126)
    - per proposal: IoU vs REMAINING GT; first-max tie-break in GT original
      order (pandas idxmax); claim iff iou > miniou (strict), then drop GT
    - per-GT "iou_score" records the max IoU over proposals whose argmax it
      was, even when below miniou (base.py:138-146 / get_iou_by_building)
    """
    image_id = pdf["image_id"].iloc[0]
    gt = pdf[pdf["kind"] == "gt"].sort_values("row_id")
    pred = pdf[pdf["kind"] == "pred"].sort_values("order", kind="stable")

    gt_rings = [G.polygon_rings(w) if w else [] for w in gt["wkt"]]
    gt_areas = np.array([abs(sum(G.ring_signed_area(r) for r in rr)) if rr else 0.0
                         for rr in gt_rings])
    keep_gt = gt_areas >= min_area
    gt_ids = gt["row_id"].to_numpy()[keep_gt]
    gt_rings = [r for r, k in zip(gt_rings, keep_gt) if k]
    gt_areas = gt_areas[keep_gt]
    gt_bbox = np.array([[*np.vstack(r).min(axis=0), *np.vstack(r).max(axis=0)]
                        if r else [0, 0, -1, -1] for r in gt_rings]) \
        if gt_rings else np.empty((0, 4))

    pred_rings = [G.polygon_rings(w) if w else [] for w in pred["wkt"]]
    pred_areas = np.array([abs(sum(G.ring_signed_area(r) for r in rr)) if rr else 0.0
                           for rr in pred_rings])
    keep_pr = pred_areas > min_area
    pred_ids = pred["row_id"].to_numpy()[keep_pr]
    pred_rings = [r for r, k in zip(pred_rings, keep_pr) if k]
    pred_areas = pred_areas[keep_pr]

    alive = np.ones(len(gt_ids), dtype=bool)
    gt_best = np.zeros(len(gt_ids))
    out_pred_iou = np.zeros(len(pred_ids))
    out_pred_match = np.full(len(pred_ids), -1, dtype=np.int64)

    # one shared local frame per image group: fan decompositions computed
    # ONCE per polygon and reused across every candidate pair (coords stay
    # small, so the cancellation-safety of the per-pair shift is preserved)
    if len(gt_rings) or len(pred_rings):
        allc = np.vstack([np.vstack(r) for r in (gt_rings + pred_rings) if r])
        origin = (float(allc[:, 0].mean()), float(allc[:, 1].mean()))
    else:
        origin = (0.0, 0.0)
    gt_tris = [G.fan_decompose(r, origin) if r else [] for r in gt_rings]
    pred_tris = [G.fan_decompose(r, origin) if r else [] for r in pred_rings]

    for i, rings in enumerate(pred_rings):
        if pred_areas[i] <= 0 or not len(gt_ids):
            continue
        pb = np.vstack(rings)
        pxmin, pymin = pb.min(axis=0)
        pxmax, pymax = pb.max(axis=0)
        cand = alive & (gt_bbox[:, 0] <= pxmax) & (gt_bbox[:, 2] >= pxmin) \
            & (gt_bbox[:, 1] <= pymax) & (gt_bbox[:, 3] >= pymin)
        idxs = np.where(cand)[0]
        if not len(idxs):
            continue
        best_iou, best_j = -1.0, -1
        for j in idxs:
            inter = G.tri_intersection_area(pred_tris[i], gt_tris[j])
            union = pred_areas[i] + gt_areas[j] - inter
            iou = inter / union if union > 0 else 0.0
            if iou > best_iou:  # strict > keeps FIRST max (idxmax semantics)
                best_iou, best_j = iou, j
        if best_j < 0:
            continue
        if best_iou > gt_best[best_j]:
            gt_best[best_j] = best_iou
        if best_iou > miniou:
            out_pred_iou[i] = best_iou
            out_pred_match[i] = gt_ids[best_j]
            alive[best_j] = False

    rows = []
    for i, pid in enumerate(pred_ids):
        rows.append((image_id, "pred", int(pid), float(out_pred_iou[i]),
                     int(out_pred_match[i]) if out_pred_match[i] >= 0 else None,
                     float(pred_areas[i])))
    for j, gid in enumerate(gt_ids):
        rows.append((image_id, "gt", int(gid), float(gt_best[j]),
                     None if alive[j] else int(gid), float(gt_areas[j])))
    return pd.DataFrame(rows, columns=["image_id", "kind", "row_id",
                                       "iou_score", "matched_gt", "area"])


def greedy_iou_match(gt: DataFrame, pred: DataFrame, miniou: float = 0.5,
                     min_area: float = 0.0) -> DataFrame:
    """Distributed greedy IoU matching.

    gt:   (image_id, row_id long, wkt string)
    pred: (image_id, row_id long, wkt string, conf double nullable)

    Proposals are ordered per image by conf desc (stable w.r.t. row_id for
    ties — load_proposal's sort, base.py:532).  Returns MATCH_SCHEMA rows:
    one per surviving proposal (iou_score, matched_gt) and one per surviving
    GT (max-claimed iou, matched flag).
    """
    w = Window.partitionBy("image_id").orderBy(
        F.desc_nulls_last("conf"), F.asc("row_id"))
    p = pred.withColumn("order", F.row_number().over(w)) \
        .select("image_id", "row_id", "wkt", "order", F.lit("pred").alias("kind"))
    g = gt.select("image_id", "row_id", "wkt",
                  F.lit(0).alias("order"), F.lit("gt").alias("kind"))
    both = p.unionByName(g)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return _greedy_match_group(pdf, miniou, min_area)

    return both.groupBy("image_id").applyInPandas(run, schema=MATCH_SCHEMA)


def image_scores(match: DataFrame, miniou: float = 0.5) -> DataFrame:
    """Per-image TP/FP/FN + P/R/F1 — base.py:157-206 exactly:
    TP = preds with iou >= miniou; FP = preds with iou < miniou;
    FN = GT never claimed above miniou AND area > 0 (base.py:182-183
    filters leftover GT to area > 0 before counting FalseNeg, so zero-area
    GT rows — which pass the default min_area=0 `>=` keep filter — must
    not inflate FN; ADVICE r01)."""
    agg = match.groupBy("image_id").agg(
        F.sum(F.when((F.col("kind") == "pred")
                     & (F.col("iou_score") >= miniou), 1).otherwise(0)).alias("TruePos"),
        F.sum(F.when((F.col("kind") == "pred")
                     & (F.col("iou_score") < miniou), 1).otherwise(0)).alias("FalsePos"),
        F.sum(F.when((F.col("kind") == "gt") & F.col("matched_gt").isNull()
                     & (F.col("area") > 0), 1).otherwise(0)).alias("FalseNeg"),
    )
    return with_prf(agg)


def with_prf(df: DataFrame) -> DataFrame:
    """Attach Precision/Recall/F1 from TP/FP/FN counts (0 when undefined —
    reference convention base.py:184-195)."""
    p = F.when(F.col("TruePos") + F.col("FalsePos") > 0,
               F.col("TruePos") / (F.col("TruePos") + F.col("FalsePos"))).otherwise(F.lit(0.0))
    r = F.when(F.col("TruePos") + F.col("FalseNeg") > 0,
               F.col("TruePos") / (F.col("TruePos") + F.col("FalseNeg"))).otherwise(F.lit(0.0))
    df = df.withColumn("Precision", p).withColumn("Recall", r)
    return df.withColumn(
        "F1Score",
        F.when(F.col("Precision") * F.col("Recall") > 0,
               2 * F.col("Precision") * F.col("Recall")
               / (F.col("Precision") + F.col("Recall"))).otherwise(F.lit(0.0)))


def aoi_rollup(image_scores_df: DataFrame, aoi_col: str = "aoi") -> DataFrame:
    """challenges.py:62-87: sum TP/FP/FN per AOI then recompute P/R/F1 from
    the sums (NOT averaging per-image scores)."""
    agg = image_scores_df.groupBy(aoi_col).agg(
        F.sum("TruePos").alias("TruePos"),
        F.sum("FalsePos").alias("FalsePos"),
        F.sum("FalseNeg").alias("FalseNeg"))
    return with_prf(agg)


CLASS_IOU_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("side", T.StringType(), False),   # 'precision' | 'recall'
    T.StructField("class", T.StringType(), False),
    T.StructField("obj_idx", T.LongType(), False),
    T.StructField("iou", T.DoubleType(), False),
    T.StructField("conf", T.DoubleType(), True),
])


def class_matched_ious(gt: DataFrame, pred: DataFrame,
                       classes: list[str] | None = None) -> DataFrame:
    """Per-class IoU lists for precision/recall/mAP —
    solaris/eval/vector.py:98-302 (precision_calc + recall_calc) exactly:

    - precision pass: per image, classes iterated in order; each proposal of
      the class takes its max-IoU candidate over the image's REMAINING gt
      pool (all classes); if the argmax gt's class matches, the iou is
      recorded (even below threshold) and the gt is consumed, else iou=0.
    - recall pass: symmetric with a fresh proposal pool.
    - classes defaults to the GLOBAL distinct gt classes, sorted (the
      reference uses an unordered set — order only matters for cross-class
      pool contention, rare in practice; sorted = deterministic).

    gt: (image_id, row_id, wkt, class); pred adds conf.
    """
    if classes is None:
        classes = sorted(r["class"] for r in
                         gt.select("class").distinct().collect())

    g = gt.select("image_id", "row_id", "wkt", "class",
                  F.lit(None).cast("double").alias("conf"),
                  F.lit("gt").alias("kind"))
    p = pred.select("image_id", "row_id", "wkt", "class", "conf",
                    F.lit("pred").alias("kind"))
    both = g.unionByName(p)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        image_id = pdf["image_id"].iloc[0]
        gt_rows = pdf[pdf["kind"] == "gt"].sort_values("row_id")
        pr_rows = pdf[pdf["kind"] == "pred"].sort_values("row_id")

        allw = list(gt_rows["wkt"]) + list(pr_rows["wkt"])
        if allw:
            allc = np.vstack([np.vstack(G.polygon_rings(w)) for w in allw])
            origin = (float(allc[:, 0].mean()), float(allc[:, 1].mean()))
        else:
            origin = (0.0, 0.0)

        def prep(rows):
            rings = [G.polygon_rings(w) for w in rows["wkt"]]
            areas = np.array([abs(sum(G.ring_signed_area(r) for r in rr))
                              for rr in rings])
            bbox = (np.array([[*np.vstack(r).min(0), *np.vstack(r).max(0)]
                              for r in rings])
                    if rings else np.empty((0, 4)))
            tris = [G.fan_decompose(r, origin) for r in rings]
            edges = [G.polygon_edges(r) for r in rings]
            return rings, areas, bbox, tris, edges

        g_rings, g_areas, g_bbox, g_tris, g_edges = prep(gt_rows)
        p_rings, p_areas, p_bbox, p_tris, p_edges = prep(pr_rows)
        g_cls = list(gt_rows["class"])
        p_cls = list(pr_rows["class"])
        p_conf = list(pr_rows["conf"])

        out = []

        def one_pass(side, query_idx_by_class, q_rings, q_areas, q_tris,
                     q_edges, q_cls_all, pool_rings, pool_areas, pool_bbox,
                     pool_tris, pool_edges, pool_cls, confs):
            alive = np.ones(len(pool_cls), dtype=bool)
            counter = {c: 0 for c in classes}
            for obj in classes:
                for qi in query_idx_by_class.get(obj, []):
                    conf = confs[qi] if confs is not None else None
                    qb = np.vstack(q_rings[qi])
                    qxmin, qymin = qb.min(0)
                    qxmax, qymax = qb.max(0)
                    cand = alive.copy()
                    if len(pool_cls):
                        cand &= ((pool_bbox[:, 0] <= qxmax)
                                 & (pool_bbox[:, 2] >= qxmin)
                                 & (pool_bbox[:, 1] <= qymax)
                                 & (pool_bbox[:, 3] >= qymin))
                    idxs = np.where(cand)[0]
                    # intersects-candidates: keep those actually touching
                    pairs = []
                    for j in idxs:
                        inter = G.tri_intersection_area(q_tris[qi],
                                                        pool_tris[j])
                        if inter > 0 or G.any_segments_intersect(
                                q_edges[qi], pool_edges[j]):
                            union = q_areas[qi] + pool_areas[j] - inter
                            pairs.append((j, inter / union if union > 0 else 0.0))
                    if not pairs:
                        iou_val = 0.0
                    else:
                        best_j, best_iou = max(
                            pairs, key=lambda t: (t[1], -t[0]))
                        # first-max tie-break: pandas idxmax keeps lowest idx
                        for j, v in pairs:
                            if v == best_iou:
                                best_j = j
                                break
                        if pool_cls[best_j] == obj:
                            iou_val = best_iou
                            alive[best_j] = False
                        else:
                            iou_val = 0.0
                    out.append((image_id, side, obj, counter[obj],
                                iou_val, conf))
                    counter[obj] += 1

        p_by_class = {}
        for i, c in enumerate(p_cls):
            p_by_class.setdefault(c, []).append(i)
        g_by_class = {}
        for i, c in enumerate(g_cls):
            g_by_class.setdefault(c, []).append(i)

        one_pass("precision", p_by_class, p_rings, p_areas, p_tris, p_edges,
                 p_cls, g_rings, g_areas, g_bbox, g_tris, g_edges, g_cls,
                 p_conf)
        one_pass("recall", g_by_class, g_rings, g_areas, g_tris, g_edges,
                 g_cls, p_rings, p_areas, p_bbox, p_tris, p_edges, p_cls,
                 None)
        return pd.DataFrame(out, columns=[f.name for f in
                                          CLASS_IOU_SCHEMA.fields])

    return both.groupBy("image_id").applyInPandas(run, schema=CLASS_IOU_SCHEMA)


# boundary-touch test (the `.intersects` candidate semantics when interiors
# don't overlap) lives in geom.any_segments_intersect — numpy-broadcast over
# all edge pairs, no per-pair Python loop.


def class_scores(class_ious: DataFrame, threshold: float = 0.5) -> DataFrame:
    """precision/recall/F1 per class (average_score_by_class + mF1,
    eval/vector.py:9-35, 306-395): score = mean(iou >= t) per class/side."""
    per = (class_ious.groupBy("class", "side")
           .agg(F.avg((F.col("iou") >= threshold).cast("double")).alias("score")))
    pv = per.groupBy("class").pivot("side", ["precision", "recall"]) \
        .agg(F.first("score"))
    pv = pv.na.fill(0.0, ["precision", "recall"])
    return pv.withColumn(
        "f1",
        F.when(F.col("precision") + F.col("recall") > 0,
               2 * F.col("precision") * F.col("recall")
               / (F.col("precision") + F.col("recall"))).otherwise(F.lit(0.0)))


def average_precision_by_class(class_ious: DataFrame,
                               threshold: float = 0.5) -> DataFrame:
    """Interpolated per-class AP (eval/vector.py:469-513 exactly):
    precision-side ious sorted desc by (conf, iou), cumulative TP/FP,
    recall denominator = the class's gt count (recall-side rows), max
    precision at 101 recall thresholds, averaged.  Window + crossJoin —
    relational all the way; returns a (class, ap) DataFrame, so AP
    composes downstream (joins, rollups, sinks) without leaving Spark.
    ``mean_average_precision`` is the driver-side dict convenience."""
    spark = class_ious.sparkSession
    prec = class_ious.filter(F.col("side") == "precision")
    ngt = (class_ious.filter(F.col("side") == "recall")
           .groupBy("class").agg(F.count(F.lit(1)).alias("n_gt")))
    w = Window.partitionBy("class").orderBy(
        F.desc("conf"), F.desc("iou"), F.desc("obj_idx")) \
        .rowsBetween(Window.unboundedPreceding, 0)
    cum = (prec.withColumn("tp", (F.col("iou") >= threshold).cast("int"))
           .withColumn("cum_tp", F.sum("tp").over(w))
           .withColumn("cum_n", F.count(F.lit(1)).over(w))
           .join(ngt, "class")
           .withColumn("precision", F.col("cum_tp") / F.col("cum_n"))
           .withColumn("recall", F.col("cum_tp") / F.col("n_gt")))
    thresholds = spark.range(101).select((F.col("id") / 100.0).alias("rt"))
    interp = (cum.crossJoin(F.broadcast(thresholds))
              .filter(F.col("recall") >= F.col("rt"))
              .groupBy("class", "rt").agg(F.max("precision").alias("pmax")))
    # classes × thresholds with 0 fill for unreachable recalls
    all_rt = ngt.select("class").crossJoin(F.broadcast(thresholds))
    return (all_rt.join(interp, ["class", "rt"], "left")
            .na.fill(0.0, ["pmax"])
            .groupBy("class").agg(F.avg("pmax").alias("ap")))


def mean_average_precision(class_ious: DataFrame,
                           threshold: float = 0.5) -> dict:
    """Driver-side convenience over ``average_precision_by_class``:
    collects the bounded (≤ #classes) AP frame and returns
    {'mAP': float, 'ap_by_class': {...}} (the reference's mAP dict,
    eval/vector.py:469-513)."""
    rows = average_precision_by_class(class_ious, threshold).collect()
    ap_by_class = {r["class"]: r["ap"] for r in rows}
    return {"mAP": float(np.mean(list(ap_by_class.values()))) if ap_by_class else 0.0,
            "ap_by_class": ap_by_class}


def average_precision(pairs: DataFrame, conf_col: str = "conf",
                      tp_col: str = "is_tp",
                      n_gt: int | None = None) -> DataFrame:
    """Interpolated mAP (eval/vector.py:469-513): sort by conf desc →
    cumulative TP/FP → precision @ recall curve → max precision at 101
    recall thresholds → mean.  Pure window + crossJoin(thresholds) —
    no UDF, whole-stage codegen all the way.

    Scale note: the confidence ranking is GLOBAL by contract (the
    reference's single conf-desc ordering), but the running sums are
    computed as a DISTRIBUTED prefix sum (plans/prefix.py: range-bucket
    on conf, per-bucket partitioned window, literal bucket offsets) —
    NOT an unpartitioned Window, which would move the whole corpus to
    one task.  The per-class production variant
    (mean_average_precision) partitions by class natively."""
    from ..plans.prefix import global_running_agg
    cum = global_running_agg(
        pairs, conf_col,
        {"cum_tp": F.col(tp_col).cast("int"), "cum_n": F.lit(1)},
        ascending=False)
    total_gt = F.lit(n_gt) if n_gt is not None else F.lit(None)
    cum = cum.withColumn("precision", F.col("cum_tp") / F.col("cum_n")) \
             .withColumn("recall", F.col("cum_tp") / total_gt)
    spark = pairs.sparkSession
    thresholds = spark.range(101).select((F.col("id") / 100.0).alias("rt"))
    ap = (cum.crossJoin(F.broadcast(thresholds))
          .filter(F.col("recall") >= F.col("rt"))
          .groupBy("rt").agg(F.max("precision").alias("pmax"))
          .agg((F.sum("pmax") / 101.0).alias("ap")))
    return ap
