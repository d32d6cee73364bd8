"""Windowed (COG-style byte-range) TIFF reads and file-backed tiling.

Parity contract: raster_tiles_windowed over a manifest of TIFF files
produces byte-identical tiles to raster_tiles over the same pixels as
table blobs — while reading only the strips each tile needs.
"""

import os

import numpy as np
import pytest

from solaris_spark.functions.tiffio import (read_tiff, read_tiff_window,
                                            write_tiff)

FIXTURE = "/root/reference/solaris/data/sample_geotiff.tif"


class TestWindowKernel:
    def test_window_matches_full_decode(self):
        full = read_tiff(FIXTURE)
        win = read_tiff_window(FIXTURE, 100, 200, 256, 300)
        assert np.array_equal(win.array, full.array[:, 100:356, 200:500])

    def test_transform_shifts_to_window_origin(self):
        full = read_tiff(FIXTURE)
        win = read_tiff_window(FIXTURE, 100, 200, 256, 300)
        a, b, c, d, e, f = full.transform
        assert win.transform == (a, 0.0, c + 200 * a, 0.0, e, f + 100 * e)
        assert win.epsg == full.epsg == 32616

    def test_reads_only_window_strips(self):
        """The I/O contract: a 256/900-row window reads a proportional
        slice of the payload, not the whole file."""
        win = read_tiff_window(FIXTURE, 100, 200, 256, 300)
        full_size = os.path.getsize(FIXTURE)
        assert win.tags["bytes_read"] < 0.5 * full_size
        # strips are whole-width, so the floor is ~rows/height of payload
        assert win.tags["bytes_read"] >= 256 / 900 * 0.9 * full_size * 0.5

    def test_edge_window_clamps(self):
        full = read_tiff(FIXTURE)
        win = read_tiff_window(FIXTURE, 890, 880, 64, 64)
        assert np.array_equal(win.array, full.array[:, 890:900, 880:900])
        assert win.tags["window"] == (890, 880, 900, 900)

    def test_multiband_roundtrip(self, tmp_path):
        rng = np.random.default_rng(7)
        arr = rng.integers(0, 255, size=(3, 50, 40), dtype=np.uint8)
        p = str(tmp_path / "mb.tif")
        write_tiff(p, arr)
        win = read_tiff_window(p, 10, 5, 20, 30)
        assert np.array_equal(win.array, arr[:, 10:30, 5:35])

    def test_disjoint_window_raises(self):
        with pytest.raises(ValueError):
            read_tiff_window(FIXTURE, 2000, 0, 64, 64)


class TestWindowedTiling:
    @pytest.fixture(scope="class")
    def tiff_manifest(self, tmp_path_factory):
        """3 deterministic multiband images, written both as TIFF files
        (for the windowed path) and kept as arrays (for the blob path)."""
        d = tmp_path_factory.mktemp("wtiles")
        rng = np.random.default_rng(11)
        rows = []
        for i in range(3):
            h, w = 200 + 17 * i, 240 + 13 * i
            arr = rng.integers(0, 255, size=(3, h, w), dtype=np.uint8)
            p = str(d / f"im{i}.tif")
            write_tiff(p, arr)
            rows.append((f"im{i}", p, arr, w, h))
        return rows

    def _geo(self, i):
        # 0.5 m px, north-up, distinct origins per image
        return dict(a=0.5, b=0.0, c=733601.0 + 1000 * i,
                    d=0.0, e=-0.5, f=3725139.0 - 1000 * i)

    def test_parity_with_blob_tiling(self, spark, tiff_manifest):
        import pyspark.sql.functions as F

        from solaris_spark.operators import tiling

        blob_rows, file_rows = [], []
        for i, (iid, p, arr, w, h) in enumerate(tiff_manifest):
            g = self._geo(i)
            blob_rows.append((iid, bytearray(arr.tobytes()), w, h,
                              "raw-u8-c3", g["a"], g["b"], g["c"], g["d"],
                              g["e"], g["f"], None))
            file_rows.append((iid, p, w, h, g["a"], g["b"], g["c"], g["d"],
                              g["e"], g["f"], None))
        blobs = spark.createDataFrame(
            blob_rows, "image_id string, bytes binary, w int, h int, "
            "fmt string, a double, b double, c double, d double, "
            "e double, f double, nodata double")
        files = spark.createDataFrame(
            file_rows, "image_id string, path string, w int, h int, "
            "a double, b double, c double, d double, e double, f double, "
            "nodata double")

        ref = {r["tile_id"]: r for r in
               tiling.raster_tiles(blobs, (90, 90)).collect()}
        got = {r["tile_id"]: r for r in
               tiling.raster_tiles_windowed(files, (90, 90),
                                            partitions=8).collect()}
        assert set(got) == set(ref) and len(ref) > 0
        for tid, r in got.items():
            b = ref[tid]
            assert bytes(r["pixels"]) == bytes(b["pixels"]), tid
            for col in ("image_id", "tx", "ty", "xmin", "ymin", "xmax",
                        "ymax", "th", "tw", "nchan", "fmt", "nodata_frac"):
                assert r[col] == b[col], (tid, col)

    def test_nodata_threshold_filter_matches(self, spark, tiff_manifest):
        from solaris_spark.operators import tiling

        i, (iid, p, arr, w, h) = 0, tiff_manifest[0]
        g = self._geo(0)
        files = spark.createDataFrame(
            [(iid, p, w, h, g["a"], g["b"], g["c"], g["d"], g["e"], g["f"],
              None)],
            "image_id string, path string, w int, h int, a double, "
            "b double, c double, d double, e double, f double, "
            "nodata double")
        # 90px tiles over a 200-row image: the bottom row of tiles is
        # 70/90 real → nodata_frac > 0.2 for edge tiles filtered at 0.2
        kept = tiling.raster_tiles_windowed(files, (90, 90),
                                            nodata_threshold=0.2).collect()
        allt = tiling.raster_tiles_windowed(files, (90, 90)).collect()
        assert 0 < len(kept) < len(allt)
        assert all(r["nodata_frac"] < 0.2 for r in kept)
