"""Greedy IoU matching + score parity vs the reference's pinned eval results
(mirrors /root/reference/tests/test_eval/evaluator_test.py)."""

import json

import numpy as np
import pandas as pd
import pytest

from solaris_spark.functions import geom as G
from solaris_spark.operators import evalops

DATA = "/root/reference/solaris/data"


def gj_rows(path, img="img0"):
    gj = json.load(open(path))
    rows = []
    for i, f in enumerate(gj["features"]):
        if f["geometry"]["type"] == "Polygon":
            rings = [np.asarray(r, dtype=np.float64)[:, :2]
                     for r in f["geometry"]["coordinates"]]
            rows.append((img, i, G.wkt_dump("POLYGON", rings)))
    return rows


class TestGreedyMatch:
    def test_pinned_tp_fp_fn(self, spark):
        """TP=8, FP=20, FN=20, P=R=F1=0.2857142857142857."""
        gt = spark.createDataFrame(gj_rows(f"{DATA}/gt.geojson"),
                                   "image_id string, row_id long, wkt string")
        pred = spark.createDataFrame(
            [(a, b, c, 1.0) for a, b, c in gj_rows(f"{DATA}/pred.geojson")],
            "image_id string, row_id long, wkt string, conf double")
        match = evalops.greedy_iou_match(gt, pred, miniou=0.5)
        s = evalops.image_scores(match, miniou=0.5).collect()[0]
        assert (s["TruePos"], s["FalsePos"], s["FalseNeg"]) == (8, 20, 20)
        assert s["Precision"] == 0.2857142857142857
        assert s["Recall"] == 0.2857142857142857
        assert s["F1Score"] == 0.2857142857142857

    def test_per_building_iou_1e9(self, spark):
        """SN2 per-building IoU vs golden CSV to eps=1e-9 (evaluator_test.py:72-94)."""
        tr = pd.read_csv(f"{DATA}/SN2_sample_truth.csv")
        pr = pd.read_csv(f"{DATA}/SN2_sample_preds.csv")
        exp = pd.read_csv(f"{DATA}/SN2_sample_iou_by_building.csv", index_col=0)
        gt = spark.createDataFrame(
            [(r.ImageId, int(i), r.PolygonWKT_Pix) for i, r in tr.iterrows()],
            "image_id string, row_id long, wkt string")
        pred = spark.createDataFrame(
            [(r.ImageId, int(i), r.PolygonWKT_Pix, float(r.Confidence))
             for i, r in pr.iterrows()],
            "image_id string, row_id long, wkt string, conf double")
        match = evalops.greedy_iou_match(gt, pred, miniou=0.5, min_area=20).toPandas()
        got = tr.copy()
        got["iou_score"] = 0.0
        gtm = match[match["kind"] == "gt"].set_index("row_id")
        for rid, iou in gtm["iou_score"].items():
            got.loc[rid, "iou_score"] = iou
        diff = (got["iou_score"] - exp["iou_score"]).abs()
        assert diff.max() < 1e-9

    def test_aoi_rollup_recompute(self, spark):
        """challenges.py:62-87: P/R/F1 recomputed from summed counts."""
        df = spark.createDataFrame(
            [("a", "i1", 5, 5, 0), ("a", "i2", 0, 0, 10), ("b", "i3", 3, 1, 1)],
            "aoi string, image_id string, TruePos long, FalsePos long, FalseNeg long")
        out = {r["aoi"]: r for r in evalops.aoi_rollup(df).collect()}
        # AOI a: TP=5 FP=5 FN=10 -> P=.5 R=1/3 F1=.4 (not mean of per-image)
        assert out["a"]["Precision"] == 0.5
        assert abs(out["a"]["Recall"] - 1 / 3) < 1e-12
        assert abs(out["a"]["F1Score"] - 0.4) < 1e-12
        assert out["b"]["Precision"] == 0.75

    def test_map_interpolated(self, spark):
        """mAP window math on a hand-computed example."""
        # 4 preds conf-desc: TP,FP,TP,FP ; 2 GT total
        pairs = spark.createDataFrame(
            [(0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0)], "conf double, is_tp int")
        ap = evalops.average_precision(pairs, n_gt=2).collect()[0]["ap"]
        # precision@recall curve: r=.5 -> max p = 1.0 ; r=1.0 -> max p = 2/3
        # AP = (51*1.0 + 50*(2/3)) / 101
        expected = (51 * 1.0 + 50 * (2 / 3)) / 101
        assert abs(ap - expected) < 1e-12

    def test_zero_area_gt_excluded_from_fn(self, spark):
        """Reference base.py:182-183 counts FalseNeg only over leftover GT
        with area > 0; zero-area GT rows (which pass the default
        min_area=0 '>=' keep filter) must not inflate FN (ADVICE r01)."""
        sq = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
        degen = "POLYGON ((5 5, 5 5, 5 5, 5 5))"
        gt = spark.createDataFrame(
            [("i", 0, sq), ("i", 1, degen)],
            "image_id string, row_id long, wkt string")
        pred = spark.createDataFrame(
            [("i", 0, sq, 1.0)],
            "image_id string, row_id long, wkt string, conf double")
        m = evalops.greedy_iou_match(gt, pred, miniou=0.5)
        s = evalops.image_scores(m, miniou=0.5).collect()[0]
        assert s["TruePos"] == 1 and s["FalsePos"] == 0
        assert s["FalseNeg"] == 0
