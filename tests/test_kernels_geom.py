"""Geometry kernel parity vs the reference's pinned test values.

Mirrors /root/reference/tests/test_vector/test_polygon.py,
tests/test_utils/test_geo.py and tests/test_eval/iou_test.py.
"""

import json

import numpy as np
import pytest

from solaris_spark.functions import geom as G

AFF = (0.5, 0.0, 733601.0, 0.0, -0.5, 3725139.0)
SQUARE = "POLYGON ((10 20, 10 10, 20 10, 20 20, 10 20))"
FWD = "POLYGON ((733606 3725129, 733606 3725134, 733611 3725134, 733611 3725129, 733606 3725129))"
REV = "POLYGON ((-1467182 7450238, -1467182 7450258, -1467162 7450258, -1467162 7450238, -1467182 7450238))"


def _coords_equal(wkt_a, wkt_b, atol=0.0):
    ta, pa = G.wkt_parse(wkt_a)
    tb, pb = G.wkt_parse(wkt_b)
    assert ta == tb
    return all(np.allclose(a, b, atol=atol) for a, b in zip(pa, pb))


class TestAffine:
    def test_forward(self):
        assert _coords_equal(G.transform_wkt(SQUARE, AFF), FWD)

    def test_inverse(self):
        assert _coords_equal(G.transform_wkt(SQUARE, AFF, inverse=True), REV)

    def test_gdal_order(self):
        gdal = [733601.0, 0.5, 0.0, 3725139.0, 0.0, -0.5]
        assert G.gdal_to_affine(gdal) == AFF
        long9 = [0.5, 0.0, 733601.0, 0.0, -0.5, 3725139.0, 0.0, 0.0, 1.0]
        assert G.gdal_to_affine(long9) == AFF

    def test_roundtrip(self):
        there = G.transform_wkt(SQUARE, AFF)
        back = G.transform_wkt(there, AFF, inverse=True)
        assert _coords_equal(back, SQUARE, atol=1e-9)


# pinned strings from tests/test_utils/test_geo.py:134-151
UTM_POLY = "POLYGON ((736687.5456353347 3722455.06780279, 736686.9301210654 3722464.96326352, 736691.6397869177 3722470.9059681, 736705.5443059544 3722472.614050498, 736706.8992101226 3722462.858909504, 736704.866059878 3722459.457111885, 736713.1443474176 3722452.103498172, 736710.0312805283 3722447.309985571, 736700.3886167214 3722454.263705271, 736698.4577440721 3722451.98534527, 736690.1272768064 3722451.291527834, 736689.4108667439 3722455.113813923, 736687.5456353347 3722455.06780279))"
LL_POLY = "POLYGON ((-84.4487639 33.6156071, -84.44876790000001 33.6156964, -84.4487156 33.61574889999999, -84.44856540000001 33.6157612, -84.44855339999999 33.61567300000001, -84.44857620000001 33.6156428, -84.448489 33.6155747, -84.4485238 33.6155322, -84.4486258 33.615597, -84.4486472 33.61557689999999, -84.4487371 33.6155725, -84.4487438 33.6156071, -84.4487639 33.6156071))"


class TestReproject:
    def test_utm_to_wgs84(self):
        got = G.reproject_wkt(UTM_POLY, 32616, 4326)
        _, pg = G.wkt_parse(got)
        _, pe = G.wkt_parse(LL_POLY)
        sim = G.polygon_intersection_area(pg, pe) / G.polygon_area(LL_POLY)
        assert sim > 0.99999

    def test_wgs84_to_utm(self):
        got = G.reproject_wkt(LL_POLY, 4326, 32616)
        _, pg = G.wkt_parse(got)
        _, pe = G.wkt_parse(UTM_POLY)
        sim = G.polygon_intersection_area(pg, pe) / G.polygon_area(UTM_POLY)
        assert sim > 0.99999

    def test_roundtrip_micron(self):
        got = G.reproject_wkt(UTM_POLY, 32616, 4326)
        back = G.reproject_wkt(got, 4326, 32616)
        _, pb = G.wkt_parse(back)
        _, pi = G.wkt_parse(UTM_POLY)
        assert np.abs(pb[0] - pi[0]).max() < 1e-4  # sub-0.1mm

    def test_zone_epsg(self):
        assert G.utm_zone_epsg(-84.44, 33.61) == 32616
        assert G.utm_zone_epsg(-84.44, -33.61) == 32716


class TestIoU:
    def test_pinned_iou(self):
        """tests/test_eval/iou_test.py:8-19 — 0.073499798744833519 ± 1e-9."""
        gj = json.load(open("/root/reference/solaris/data/gt.geojson"))
        ring = np.asarray(gj["features"][27]["geometry"]["coordinates"][0],
                          dtype=np.float64)[:, :2]
        pred = np.asarray([(736348.0, 3722762.5), (736353.0, 3722762.0),
                           (736354.0, 3722759.0), (736352.0, 3722755.5),
                           (736348.5, 3722755.5), (736346.0, 3722757.5),
                           (736348.0, 3722762.5)])
        iou = G.iou_wkt(G.wkt_dump("POLYGON", [pred]),
                        G.wkt_dump("POLYGON", [ring]))
        assert abs(iou - 0.073499798744833519) < 1e-9

    def test_self_intersection_identity(self):
        gj = json.load(open("/root/reference/solaris/data/gt.geojson"))
        for feat in gj["features"][:10]:
            ring = np.asarray(feat["geometry"]["coordinates"][0],
                              dtype=np.float64)[:, :2]
            area = abs(G.ring_signed_area(ring))
            inter = G.polygon_intersection_area([ring], [ring])
            assert abs(inter - area) <= 1e-9 * max(area, 1.0)

    def test_disjoint(self):
        a = np.array([(0.0, 0.0), (1, 0), (1, 1), (0, 1), (0, 0)])
        b = a + 5.0
        assert G.polygon_intersection_area([a], [b]) == 0.0


class TestGrid:
    def test_fixture_grid_100_tiles(self):
        bounds = (733601.0, 3725139.0 - 450.0, 733601.0 + 450.0, 3725139.0)
        tb = G.split_geom_bounds(bounds, (90, 90), resolution=(0.5, 0.5))
        assert len(tb) == 100
        import os

        ids = sorted(f"sample_geotiff_{int(t[0])}_{int(t[3])}.tif" for t in tb)
        expected = sorted(os.listdir(
            "/root/reference/solaris/data/rastertile_test_expected"))
        assert ids == expected


class TestWkt:
    def test_roundtrip(self):
        w = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
        t, parts = G.wkt_parse(w)
        assert t == "POLYGON" and len(parts) == 2
        assert G.polygon_area(w) == 15.0

    def test_multipolygon(self):
        w = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))"
        t, parts = G.wkt_parse(w)
        assert t == "MULTIPOLYGON" and len(parts) == 2
        assert G.polygon_area(w) == 2.0

    def test_empty(self):
        t, parts = G.wkt_parse("POLYGON EMPTY")
        assert parts == []


class TestHoleOrientation:
    def test_area_and_iou_orientation_insensitive(self):
        """GEOS/shapely area is ring-orientation-insensitive; a hole wound
        like its exterior must still subtract (ADVICE r01: self-IoU was
        inflated to 1.167 by same-wound holes)."""
        ext = "0 0, 10 0, 10 10, 0 10, 0 0"          # CCW
        hole_same = "2 2, 6 2, 6 6, 2 6, 2 2"        # CCW too (invalid winding)
        hole_opp = "2 2, 2 6, 6 6, 6 2, 2 2"         # CW (valid winding)
        w_bad = f"POLYGON (({ext}), ({hole_same}))"
        w_ok = f"POLYGON (({ext}), ({hole_opp}))"
        assert abs(G.polygon_area(w_bad) - 84.0) < 1e-9
        assert abs(G.iou_wkt(w_bad, w_bad) - 1.0) < 1e-12
        assert abs(G.iou_wkt(w_bad, w_ok) - 1.0) < 1e-12
        # intersection with a probe overlapping the hole region: the hole
        # contributes nothing regardless of winding
        probe = "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"
        assert G.iou_wkt(w_bad, probe) == 0.0


class TestBatchedSegmentIntersect:
    def test_matches_scalar_predicate(self):
        """any_segments_intersect ≡ OR of scalar segments_intersect over all
        edge pairs (random + degenerate cases)."""
        import numpy as np
        rng = np.random.default_rng(3)
        for _ in range(200):
            ea = rng.uniform(0, 10, (3, 4))
            eb = rng.uniform(0, 10, (4, 4))
            expect = any(
                G.segments_intersect((e[0], e[1]), (e[2], e[3]),
                                     (f[0], f[1]), (f[2], f[3]))
                for e in ea for f in eb)
            assert G.any_segments_intersect(ea, eb) == expect

    def test_touch_cases(self):
        import numpy as np
        # endpoint touch
        assert G.any_segments_intersect(np.array([[0., 0., 1., 0.]]),
                                        np.array([[1., 0., 2., 5.]]))
        # collinear overlap
        assert G.any_segments_intersect(np.array([[0., 0., 2., 0.]]),
                                        np.array([[1., 0., 3., 0.]]))
        # disjoint parallel
        assert not G.any_segments_intersect(np.array([[0., 0., 2., 0.]]),
                                            np.array([[0., 1., 2., 1.]]))
        # empty
        assert not G.any_segments_intersect(np.empty((0, 4)),
                                            np.array([[0., 0., 1., 1.]]))


class TestAffineGdfGolden:
    def test_sample_csv_affine_golden(self):
        """affine_transform_gdf parity: sample.csv pixel footprints through
        the sample_geotiff affine with precision=0 match aff_gdf_result.csv
        coordinate-for-coordinate (/root/reference/tests/test_vector/
        test_polygon.py:70-77)."""
        import csv

        import numpy as np

        from solaris_spark.functions.tiffio import read_tiff
        DATA = "/root/reference/solaris/data"
        t = tuple(float(v) for v in
                  read_tiff(f"{DATA}/sample_geotiff.tif").transform)
        with open(f"{DATA}/sample.csv") as fh:
            src = [r["PolygonWKT_Pix"] for r in csv.DictReader(fh)]
        with open(f"{DATA}/aff_gdf_result.csv") as fh:
            exp = [r["geometry"] for r in csv.DictReader(fh)]
        assert len(src) == len(exp)
        for wp, we in zip(src, exp):
            got = G.transform_wkt(wp, t)
            rg = [np.round(r, 0) for r in G.wkt_parse(got)[1]]
            re_ = list(G.wkt_parse(we)[1])
            assert len(rg) == len(re_)
            for a, b in zip(rg, re_):
                assert np.array_equal(a, b)


class TestReprojectFullFileGolden:
    def test_gt_geojson_both_directions(self):
        """Full-file reproject parity (test_geo.py:108-127): every gt.geojson
        footprint reprojected UTM16→4326 overlaps its gt_epsg4326.json twin
        with area similarity > 0.99999, and back."""
        import json as _json

        def feats(path):
            gj = _json.load(open(f"/root/reference/solaris/data/{path}"))
            out = []
            for f in gj["features"]:
                if f["geometry"]["type"] != "Polygon":
                    continue
                rings = [np.asarray(r, dtype=np.float64)[:, :2]
                         for r in f["geometry"]["coordinates"]]
                out.append(G.wkt_dump("POLYGON", rings))
            return out

        utm = feats("gt.geojson")
        ll = feats("gt_epsg4326.json")
        assert len(utm) == len(ll) and len(utm) > 20
        for wu, wl in zip(utm, ll):
            got = G.reproject_wkt(wu, 32616, 4326)
            _, pg = G.wkt_parse(got)
            _, pe = G.wkt_parse(wl)
            a = G.polygon_area(wl)
            assert G.polygon_intersection_area(pg, pe) / a > 0.99999
            back = G.reproject_wkt(wl, 4326, 32616)
            _, pb = G.wkt_parse(back)
            _, pu = G.wkt_parse(wu)
            au = G.polygon_area(wu)
            assert G.polygon_intersection_area(pb, pu) / au > 0.99999
