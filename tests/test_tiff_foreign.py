"""Hand-assembled FOREIGN-layout TIFFs — files our writer never emits but
real producers do: big-endian (MM) byte order, multi-strip JPEG with
inline (per-strip) tables and no JPEGTables tag.  Exercises the reader's
spec coverage beyond writer round-trips."""

import struct

import numpy as np

from solaris_spark.functions import jpeg, tiffio


def _classic_tiff(bo, entries, blocks, block_tag_off):
    """Minimal classic-TIFF serializer: header | blocks | IFD.
    ``entries`` = [(tag, type, values-or-bytes)]; ``block_tag_off`` maps
    the offsets tag id to per-block file offsets filled in here."""
    fmt = {1: "B", 3: "H", 4: "I"}
    hdr = (b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
    pos = 8
    offs = []
    body = b""
    for b in blocks:
        offs.append(pos)
        body += b
        pos += len(b)
    ifd_off = pos
    hdr += struct.pack(bo + "I", ifd_off)
    out = bytearray(hdr + body)
    entries = sorted(
        [(t, ty, tuple(offs) if t == block_tag_off else v)
         for t, ty, v in entries])
    ool = bytearray()
    ool_base = ifd_off + 2 + 12 * len(entries) + 4
    ifd = struct.pack(bo + "H", len(entries))
    for tag, typ, vals in entries:
        if isinstance(vals, (bytes, bytearray)):
            raw, cnt = bytes(vals), len(vals)
        else:
            raw = struct.pack(bo + fmt[typ] * len(vals), *vals)
            cnt = len(vals)
        if len(raw) <= 4:
            ifd += struct.pack(bo + "HHI", tag, typ, cnt) + raw.ljust(4, b"\0")
        else:
            ifd += struct.pack(bo + "HHI", tag, typ, cnt) \
                + struct.pack(bo + "I", ool_base + len(ool))
            ool += raw
    ifd += struct.pack(bo + "I", 0)
    out += ifd + ool
    return bytes(out)


class TestBigEndian:
    def test_mm_uncompressed_strip(self, tmp_path):
        """MM byte order end to end: 16-bit samples must byte-swap."""
        a = (np.arange(2 * 6 * 7) * 257 % 65521).astype(">u2") \
            .reshape(2, 6, 7)
        chunky = np.moveaxis(a, 0, -1)
        blob = _classic_tiff(">", [
            (256, 3, (7,)), (257, 3, (6,)), (258, 3, (16, 16)),
            (259, 3, (1,)), (262, 3, (1,)), (277, 3, (2,)),
            (273, 4, ("OFF",)), (278, 3, (6,)),
            (279, 4, (chunky.nbytes,)), (339, 3, (1, 1)),
        ], [np.ascontiguousarray(chunky).tobytes()], 273)
        p = str(tmp_path / "mm.tif")
        with open(p, "wb") as f:
            f.write(blob)
        out = tiffio.read_tiff(p).array
        assert np.array_equal(out.astype(np.uint32),
                              a.astype(np.uint32))

    def test_mm_deflate_predictor2(self, tmp_path):
        import zlib
        a = np.arange(5 * 8, dtype=">u2").reshape(1, 5, 8)
        chunky = np.moveaxis(a, 0, -1)
        d = chunky.copy()
        d[:, 1:, :] = (chunky[:, 1:, :].astype(np.int32)
                       - chunky[:, :-1, :].astype(np.int32)) \
            .astype(">u2")
        comp = zlib.compress(np.ascontiguousarray(d).tobytes())
        blob = _classic_tiff(">", [
            (256, 3, (8,)), (257, 3, (5,)), (258, 3, (16,)),
            (259, 3, (8,)), (262, 3, (1,)), (277, 3, (1,)),
            (273, 4, ("OFF",)), (278, 3, (5,)), (317, 3, (2,)),
            (279, 4, (len(comp),)), (339, 3, (1,)),
        ], [comp], 273)
        p = str(tmp_path / "mm2.tif")
        with open(p, "wb") as f:
            f.write(blob)
        out = tiffio.read_tiff(p).array
        assert np.array_equal(out.astype(np.uint32), a.astype(np.uint32))


class TestMultiStripJpeg:
    def test_self_contained_strips_no_tag_347(self, tmp_path):
        """Two 16-row JPEG strips, each a SELF-CONTAINED stream (inline
        DQT/DHT, no shared JPEGTables) — the layout old libjpeg-based
        writers emit."""
        yy, xx = np.mgrid[0:32, 0:48]
        img = np.stack([(100 + 40 * np.sin(yy / 5.0) + 30 *
                         np.cos(xx / 7.0)).clip(0, 255)] * 3) \
            .astype(np.uint8)
        s0 = jpeg.encode_jpeg(img[:, :16], quality=95)
        s1 = jpeg.encode_jpeg(img[:, 16:], quality=95)
        blob = _classic_tiff("<", [
            (256, 3, (48,)), (257, 3, (32,)), (258, 3, (8, 8, 8)),
            (259, 3, (7,)), (262, 3, (6,)), (277, 3, (3,)),
            (273, 4, ("OFF",)), (278, 3, (16,)),
            (279, 4, (len(s0), len(s1))), (339, 3, (1, 1, 1)),
        ], [s0, s1], 273)
        p = str(tmp_path / "msj.tif")
        with open(p, "wb") as f:
            f.write(blob)
        out = tiffio.read_tiff(p).array
        assert out.shape == (3, 32, 48)
        # strip decodes must equal decoding each stream directly
        want = np.concatenate([jpeg.decode_jpeg(s0), jpeg.decode_jpeg(s1)],
                              axis=1)
        assert np.array_equal(out, want)

    def test_windowed_read_across_strip_boundary(self, tmp_path):
        yy, xx = np.mgrid[0:32, 0:48]
        img = np.stack([(90 + 50 * np.cos(yy / 6.0 + c) +
                         30 * np.sin(xx / 9.0)).clip(0, 255)
                        for c in range(3)]).astype(np.uint8)
        s0 = jpeg.encode_jpeg(img[:, :16], quality=95)
        s1 = jpeg.encode_jpeg(img[:, 16:], quality=95)
        blob = _classic_tiff("<", [
            (256, 3, (48,)), (257, 3, (32,)), (258, 3, (8, 8, 8)),
            (259, 3, (7,)), (262, 3, (6,)), (277, 3, (3,)),
            (273, 4, ("OFF",)), (278, 3, (16,)),
            (279, 4, (len(s0), len(s1))), (339, 3, (1, 1, 1)),
        ], [s0, s1], 273)
        p = str(tmp_path / "msj2.tif")
        with open(p, "wb") as f:
            f.write(blob)
        full = tiffio.read_tiff(p).array
        w = tiffio.read_tiff_window(p, 10, 5, 15, 30)
        assert np.array_equal(w.array, full[:, 10:25, 5:35])
