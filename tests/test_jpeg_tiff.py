"""JPEG-in-TIFF (compression 7, TechNote 2) — the layout of most
real-world aerial/satellite COGs: abbreviated baseline JPEG per tile,
shared DQT/DHT tables in tag 347 (JPEGTables), YCbCr photometric with
4:2:0 subsampling.  Reference behavior parity: solaris reads these via
rasterio/GDAL+libjpeg (solaris/utils/io.py); this exercises the native
tiffio+jpeg path end to end."""

import os
import struct

import numpy as np
import pytest

from solaris_spark.functions import jpeg, tiffio


def _smooth_rgb(h, w, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        120 + 60 * np.sin(yy / 23) + 40 * np.cos(xx / 31),
        100 + 50 * np.sin((yy + xx) / 29),
        90 + 70 * np.cos(yy / 17) * np.sin(xx / 41),
    ]) + rng.normal(0, 3, (3, h, w))
    return img.clip(0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255 ** 2 / mse)


class TestRoundTrip:
    def test_tiled_color_cog(self, tmp_path):
        """Tiled + overviews + geo tags; lossy but high-PSNR, and the
        window read fetches only the covered tiles' bytes."""
        img = _smooth_rgb(200, 300)
        p = str(tmp_path / "jt.tif")
        tiffio.write_tiff(p, img, tile=(64, 64), compress="jpeg",
                          jpeg_quality=92, overviews=[2],
                          transform=(0.5, 0, 100.0, 0, -0.5, 200.0),
                          epsg=32633)
        out = tiffio.read_tiff(p)
        assert out.array.shape == (3, 200, 300)
        assert out.array.dtype == np.uint8
        assert out.epsg == 32633
        assert out.transform == (0.5, 0.0, 100.0, 0.0, -0.5, 200.0)
        assert _psnr(out.array, img) > 32
        # windowed read: pixel parity with the full decode, partial I/O
        w = tiffio.read_tiff_window(p, 37, 53, 100, 150)
        assert np.array_equal(w.array, out.array[:, 37:137, 53:203])
        assert w.tags["bytes_read"] < os.path.getsize(p)
        # overview level decodes at half resolution
        ov = tiffio.read_tiff(p, level=1)
        assert ov.array.shape == (3, 100, 150)
        assert _psnr(ov.array, img[:, ::2, ::2]) > 28

    def test_grayscale_strip(self, tmp_path):
        g = _smooth_rgb(96, 130)[0]
        p = str(tmp_path / "g.tif")
        tiffio.write_tiff(p, g, compress="jpeg", jpeg_quality=95)
        out = tiffio.read_tiff(p).array
        assert out.shape == (1, 96, 130)
        assert _psnr(out[0], g) > 36

    def test_quality_knob_moves_size_and_error(self, tmp_path):
        img = _smooth_rgb(128, 128)
        sizes, errs = [], []
        for q in (60, 95):
            p = str(tmp_path / f"q{q}.tif")
            tiffio.write_tiff(p, img, tile=(64, 64), compress="jpeg",
                              jpeg_quality=q)
            sizes.append(os.path.getsize(p))
            errs.append(
                np.abs(tiffio.read_tiff(p).array.astype(int)
                       - img.astype(int)).mean())
        assert sizes[0] < sizes[1]
        assert errs[0] > errs[1]


class TestStructure:
    """Spec-level checks on the emitted container (TechNote 2)."""

    def _meta(self, path):
        rd = tiffio._RangeReader(path)
        try:
            return tiffio._parse_meta(rd)
        finally:
            rd.close()

    def test_shared_tables_abbreviated_tiles(self, tmp_path):
        img = _smooth_rgb(128, 128)
        p = str(tmp_path / "t.tif")
        tiffio.write_tiff(p, img, tile=(64, 64), compress="jpeg")
        meta = self._meta(p)[0]
        assert meta.comp == 7
        assert meta.photometric == 6  # YCbCr
        # tag 347 is a valid tables-only stream: SOI ... EOI with DQT+DHT
        jt = meta.jpeg_tables
        assert jt[:2] == b"\xff\xd8" and jt[-2:] == b"\xff\xd9"
        assert b"\xff\xdb" in jt and b"\xff\xc4" in jt
        # every tile is abbreviated: SOI-led, EOI-terminated, and carries
        # NO quant/huffman tables (they ride tag 347 once)
        with open(p, "rb") as f:
            blob = f.read()
        for off, cnt in zip(meta.offsets, meta.counts):
            tile = blob[off: off + cnt]
            assert tile[:2] == b"\xff\xd8" and tile[-2:] == b"\xff\xd9"
            assert b"\xff\xdb" not in tile and b"\xff\xc4" not in tile
            assert b"\xff\xe0" not in tile  # no per-tile APP0 either

    def test_tile_stream_tables_override_shared(self):
        """TTN2: a tile may redefine tables; last definition wins.  A
        SELF-CONTAINED tile stream merged over mismatched shared tables
        must decode with its own tables."""
        img = _smooth_rgb(64, 64, seed=9)
        self_contained = jpeg.encode_jpeg(img, quality=92)
        want = jpeg.decode_jpeg(self_contained)
        wrong_tables = jpeg.jpeg_tables_stream(quality=25, color=True)
        merged = jpeg.merge_abbreviated(wrong_tables, self_contained)
        assert np.array_equal(jpeg.decode_jpeg(merged), want)

    def test_merge_equals_self_contained(self):
        img = _smooth_rgb(80, 48, seed=5)
        full = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=88))
        abbr = jpeg.encode_jpeg(img, quality=88, omit_tables=True)
        tables = jpeg.jpeg_tables_stream(quality=88, color=True)
        got = jpeg.decode_jpeg(jpeg.merge_abbreviated(tables, abbr))
        assert np.array_equal(got, full)

    def test_photometric_2_skips_color_transform(self, tmp_path):
        """A comp-7 file whose photometric says RGB (2) must NOT get the
        YCbCr→RGB conversion.  Byte-patch tag 262 from 6 to 2 and check
        the reader now returns the raw component planes."""
        img = _smooth_rgb(64, 64, seed=11)
        p = str(tmp_path / "p2.tif")
        tiffio.write_tiff(p, img, tile=(64, 64), compress="jpeg",
                          jpeg_quality=90)
        with open(p, "rb") as f:
            blob = bytearray(f.read())
        # classic little-endian IFD entry: tag 262 (0x0106), type 3
        pat = struct.pack("<HH", 262, 3) + struct.pack("<I", 1) \
            + struct.pack("<H", 6)
        i = blob.find(pat)
        assert i > 0, "photometric entry not found"
        blob[i + 8: i + 10] = struct.pack("<H", 2)
        p2 = str(tmp_path / "p2b.tif")
        with open(p2, "wb") as f:
            f.write(bytes(blob))
        meta = self._meta(p2)[0]
        assert meta.photometric == 2
        got = tiffio.read_tiff(p2).array
        # expected: decode each tile without the transform
        with open(p2, "rb") as f:
            raw = f.read()
        tile = raw[meta.offsets[0]: meta.offsets[0] + meta.counts[0]]
        want = jpeg.decode_jpeg(
            jpeg.merge_abbreviated(meta.jpeg_tables, tile),
            color_transform=False)
        assert np.array_equal(got, want)
        # and it differs from the converted read (proves the tag matters)
        converted = tiffio.read_tiff(p).array
        assert not np.array_equal(got, converted)

    def test_decode_color_transform_false_is_invertible(self):
        """color_transform=False returns the pre-conversion planes: the
        standard JFIF matrix applied on top reproduces the default
        output exactly."""
        img = _smooth_rgb(48, 64, seed=7)
        buf = jpeg.encode_jpeg(img, quality=90)
        rgb = jpeg.decode_jpeg(buf)
        ycc = jpeg.decode_jpeg(buf, color_transform=False).astype(float)
        y, cb, cr = ycc
        manual = np.stack([
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0)])
        manual = np.clip(np.round(manual), 0, 255).astype(np.uint8)
        assert np.array_equal(manual, rgb)


class TestValidation:
    def test_rejects_16bit(self, tmp_path):
        with pytest.raises(ValueError, match="8-bit"):
            tiffio.write_tiff(str(tmp_path / "x.tif"),
                              np.zeros((1, 32, 32), dtype=np.uint16),
                              compress="jpeg")

    def test_rejects_planar2_and_predictor(self, tmp_path):
        img = _smooth_rgb(32, 32)
        with pytest.raises(ValueError, match="planar"):
            tiffio.write_tiff(str(tmp_path / "x.tif"), img,
                              compress="jpeg", planar=2)
        with pytest.raises(ValueError, match="predictor"):
            tiffio.write_tiff(str(tmp_path / "x.tif"), img,
                              compress="jpeg", predictor=2)

    def test_rejects_odd_band_count(self, tmp_path):
        with pytest.raises(ValueError, match="bands"):
            tiffio.write_tiff(str(tmp_path / "x.tif"),
                              np.zeros((4, 32, 32), dtype=np.uint8),
                              compress="jpeg")
