"""SCOT (SpaceNet Change and Object Tracking) — optimal-assignment matching
join + cross-timestep change/tracking accounting.

Re-expresses solaris/eval/scot.py (match_footprints :5-71, scot_one_aoi
:74-195, scot_multi_aoi :198-237) Spark-first: AOIs are the parallel axis
(groupBy(aoi).applyInPandas); within an AOI the timestep loop is inherently
sequential (cumulative change/track sets) and runs in numpy with the
engine's polygon-intersection and assignment kernels (scipy-free).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from ..functions import geom as G
from ..functions.assign import linear_sum_assignment

SCOT_SCHEMA = T.StructType([
    T.StructField("aoi", T.StringType(), False),
    T.StructField("mismatches", T.LongType(), False),
    T.StructField("track_tp", T.LongType(), False),
    T.StructField("track_fp", T.LongType(), False),
    T.StructField("track_fn", T.LongType(), False),
    T.StructField("track_score", T.DoubleType(), False),
    T.StructField("change_tp", T.LongType(), False),
    T.StructField("change_fp", T.LongType(), False),
    T.StructField("change_fn", T.LongType(), False),
    T.StructField("change_score", T.DoubleType(), False),
    T.StructField("combo_score", T.DoubleType(), False),
])


def match_footprints_np(grnd: pd.DataFrame, prop: pd.DataFrame,
                        threshold: float = 0.25, base_reward: float = 100.0):
    """One timestep's optimal matching — scot.py:5-71 semantics: IoU over
    intersecting pairs, reward = (iou>t)·(base+iou), maximize assignment,
    prune iou<=t."""
    g_ids = sorted(set(grnd["id"]))
    p_ids = sorted(set(prop["id"]))
    g_idx = {v: i for i, v in enumerate(g_ids)}
    p_idx = {v: i for i, v in enumerate(p_ids)}
    ng, np_ = len(grnd), len(prop)
    if ng == 0 or np_ == 0:
        return [], [], ng, np_, 0, np_, ng, 0.0, set(g_ids), set(p_ids)

    g_rings = [G.polygon_rings(w) for w in grnd["wkt"]]
    p_rings = [G.polygon_rings(w) for w in prop["wkt"]]
    g_area = [abs(sum(G.ring_signed_area(r) for r in rr)) for rr in g_rings]
    p_area = [abs(sum(G.ring_signed_area(r) for r in rr)) for rr in p_rings]
    g_bb = np.array([[*np.vstack(r).min(0), *np.vstack(r).max(0)] for r in g_rings])
    p_bb = np.array([[*np.vstack(r).min(0), *np.vstack(r).max(0)] for r in p_rings])

    allc = np.vstack([g_bb[:, :2], p_bb[:, :2]])
    origin = (float(allc[:, 0].mean()), float(allc[:, 1].mean()))
    g_tris = [G.fan_decompose(r, origin) for r in g_rings]
    p_tris = [G.fan_decompose(r, origin) for r in p_rings]

    reward = np.zeros((len(g_ids), len(p_ids)))
    iou_arr = np.zeros_like(reward)
    g_row_ids = list(grnd["id"])
    p_row_ids = list(prop["id"])
    for i in range(ng):
        for j in range(np_):
            if (g_bb[i, 0] > p_bb[j, 2] or p_bb[j, 0] > g_bb[i, 2]
                    or g_bb[i, 1] > p_bb[j, 3] or p_bb[j, 1] > g_bb[i, 3]):
                continue
            inter = G.tri_intersection_area(g_tris[i], p_tris[j])
            if inter <= 0:
                continue
            iou = inter / (g_area[i] + p_area[j] - inter)
            gi, pj = g_idx[g_row_ids[i]], p_idx[p_row_ids[j]]
            iou_arr[gi, pj] = iou
            reward[gi, pj] = (iou > threshold) * (base_reward + iou)

    r, c = linear_sum_assignment(reward, maximize=True)
    iou_match = iou_arr[r, c]
    keep = iou_match > threshold
    g_match = [g_ids[i] for i in r[keep]]
    p_match = [p_ids[j] for j in c[keep]]
    tp = int(keep.sum())
    fp = np_ - tp
    fn = ng - tp
    f1 = (2 * tp) / (2 * tp + fp + fn) if 2 * tp + fp + fn > 0 else 0.0
    return g_match, p_match, ng, np_, tp, fp, fn, f1, set(g_ids), set(p_ids)


def scot_one_aoi_np(pdf: pd.DataFrame, threshold=0.25, base_reward=100.0,
                    beta=2.0) -> dict:
    """scot_one_aoi:74-195 — sequential over sorted timesteps inside one
    AOI group (kind column: 'gt' | 'prop')."""
    aoi = pdf["aoi"].iloc[0]
    grnd = pdf[pdf["kind"] == "gt"]
    prop = pdf[pdf["kind"] == "prop"]
    # timesteps come from GT ONLY — the reference derives both loops from
    # grnd_df (scot.py scot_one_aoi), silently skipping proposals at
    # timesteps with no ground truth; mirror that for score parity
    # (ADVICE r01: union-of-timesteps scored such proposals as FPs).
    timesteps = sorted(set(grnd["timestep"]))

    tp_net = fp_net = fn_net = 0
    all_g, all_p = [], []
    change_tp = change_fp = change_fn = 0
    change_g, change_p = set(), set()
    for i, ts in enumerate(timesteps):
        gts = grnd[grnd["timestep"] == ts]
        pts = prop[prop["timestep"] == ts]
        g_ids, p_ids, ng, np_, tp, fp, fn, f1, g_set, p_set = \
            match_footprints_np(gts, pts, threshold, base_reward)
        tp_net += tp; fp_net += fp; fn_net += fn
        all_g = g_ids + all_g
        all_p = p_ids + all_p
        if i > 0:
            new_g = [g not in change_g for g in g_ids]
            new_p = [p not in change_p for p in p_ids]
            change_tp += sum(g and p for g, p in zip(new_g, new_p))
            change_fp += sum(p and not g for g, p in zip(new_g, new_p))
            change_fn += sum(g and not p for g, p in zip(new_g, new_p))
            change_fp += len(p_set.difference(p_ids).difference(change_p))
            change_fn += len(g_set.difference(g_ids).difference(change_g))
        change_g |= g_set
        change_p |= p_set

    mm = 0
    for i in range(len(all_g)):
        prev_g, prev_p = all_g[i + 1:], all_p[i + 1:]
        g_mm = all_g[i] in prev_g and prev_p[prev_g.index(all_g[i])] != all_p[i]
        p_mm = all_p[i] in prev_p and prev_g[prev_p.index(all_p[i])] != all_g[i]
        if g_mm or p_mm:
            mm += 1

    ttp, tfp, tfn = tp_net - mm, fp_net + mm, fn_net + mm
    track = ttp / (ttp + (tfp + tfn) / 2.0) if ttp + (tfp + tfn) / 2.0 > 0 else 0.0
    change = (change_tp / (change_tp + (change_fp + change_fn) / 2.0)
              if change_tp + (change_fp + change_fn) / 2.0 > 0 else 0.0)
    combo = ((1 + beta * beta) * change * track / (beta * beta * change + track)
             if beta * beta * change + track > 0 else 0.0)
    return dict(aoi=aoi, mismatches=mm, track_tp=ttp, track_fp=tfp,
                track_fn=tfn, track_score=track, change_tp=change_tp,
                change_fp=change_fp, change_fn=change_fn,
                change_score=change, combo_score=combo)


def scot_scores(gt: DataFrame, prop: DataFrame, threshold: float = 0.25,
                base_reward: float = 100.0, beta: float = 2.0) -> DataFrame:
    """Distributed SCOT: gt/prop = (aoi, timestep, id, wkt); one group per
    AOI.  Overall score = avg(combo_score) over AOIs (scot.py:229)."""
    g = gt.select("aoi", "timestep", "id", "wkt", F.lit("gt").alias("kind"))
    p = prop.select("aoi", "timestep", "id", "wkt", F.lit("prop").alias("kind"))
    both = g.unionByName(p)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([scot_one_aoi_np(pdf, threshold, base_reward, beta)])

    return both.groupBy("aoi").applyInPandas(run, schema=SCOT_SCHEMA)
