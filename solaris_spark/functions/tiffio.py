"""Minimal pure-NumPy TIFF reader/writer for uncompressed strip TIFFs.

The reference's golden fixtures (e.g. ``solaris/data/sample_geotiff.tif``,
``rastertile_test_expected/*.tif``, mask goldens in ``test_mask.py``) are all
uncompressed strip TIFFs (compression tag == 1), so a tiny reader suffices to
load them for parity checks in this sandbox where rasterio/PIL are
unavailable.  Reference behavior being mirrored: raster load semantics of
``solaris/utils/core.py:17-25`` (rasterio open) — but only the decode step,
not GDAL itself.

Also parses the GeoTIFF georegistration tags (ModelPixelScale 33550,
ModelTiepoint 33922) into an affine transform ``(a, b, c, d, e, f)`` with
``world_x = a*col + b*row + c``; matches ``rasterio``'s ``.transform`` for
north-up rasters (see ``tests/test_raster/test_image.py:16`` in the
reference: ``Affine(0.5, 0, 733601, 0, -0.5, 3725139)``).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


@dataclass
class TiffImage:
    """Decoded raster: ``array`` is (bands, rows, cols) to match rasterio read order."""

    array: np.ndarray
    transform: tuple[float, float, float, float, float, float] | None = None
    epsg: int | None = None
    nodata: float | None = None
    tags: dict = field(default_factory=dict)


def _read_ifd(data: bytes, bo: str, off: int) -> dict[int, tuple[int, int, bytes]]:
    n = struct.unpack(bo + "H", data[off : off + 2])[0]
    tags = {}
    for i in range(n):
        e = data[off + 2 + 12 * i : off + 2 + 12 * (i + 1)]
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        tags[tag] = (typ, cnt, e[8:12])
    return tags


def _tag_values(data: bytes, bo: str, entry: tuple[int, int, bytes]):
    typ, cnt, raw = entry
    size = _TYPE_SIZE[typ]
    if typ == 5:  # RATIONAL
        off = struct.unpack(bo + "I", raw)[0]
        vals = struct.unpack(bo + "I" * (2 * cnt), data[off : off + 8 * cnt])
        return tuple(vals[2 * i] / vals[2 * i + 1] for i in range(cnt))
    fmt = _TYPE_FMT.get(typ)
    if fmt is None:  # ASCII / UNDEFINED → raw bytes
        if size * cnt <= 4:
            return raw[: size * cnt]
        off = struct.unpack(bo + "I", raw)[0]
        return data[off : off + size * cnt]
    if size * cnt <= 4:
        return struct.unpack(bo + fmt * cnt, raw[: size * cnt])
    off = struct.unpack(bo + "I", raw)[0]
    return struct.unpack(bo + fmt * cnt, data[off : off + size * cnt])


def read_tiff(path_or_bytes) -> TiffImage:
    """Read an uncompressed strip TIFF into a (C, Y, X) numpy array."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    bo = "<" if data[:2] == b"II" else ">"
    off = struct.unpack(bo + "I", data[4:8])[0]
    tags = _read_ifd(data, bo, off)

    def get(tag, default=None):
        return _tag_values(data, bo, tags[tag]) if tag in tags else default

    w = get(256)[0]
    h = get(257)[0]
    comp = get(259, (1,))[0]
    if comp != 1:
        raise NotImplementedError(f"only uncompressed TIFF supported, got compression={comp}")
    spp = get(277, (1,))[0]
    bps = get(258, (1,) * spp)
    sampfmt = get(339, (1,) * spp)
    planar = get(284, (1,))[0]
    strip_offsets = get(273)
    strip_counts = get(279)
    rows_per_strip = get(278, (h,))[0]

    bits = bps[0]
    sf = sampfmt[0]
    dt = {(1, 8): "u1", (1, 16): "u2", (1, 32): "u4", (2, 8): "i1", (2, 16): "i2",
          (2, 32): "i4", (3, 32): "f4", (3, 64): "f8"}[(sf, bits)]
    dtype = np.dtype(bo + dt) if dt[0] != "u" or dt != "u1" else np.dtype(dt)
    dtype = np.dtype(bo + dt)

    buf = b"".join(
        data[o : o + c] for o, c in zip(strip_offsets, strip_counts)
    )
    arr = np.frombuffer(buf, dtype=dtype)
    if planar == 1:
        arr = arr[: h * w * spp].reshape(h, w, spp)
        arr = np.moveaxis(arr, -1, 0)  # (C, Y, X) — rasterio band order
    else:
        arr = arr[: h * w * spp].reshape(spp, h, w)

    transform = None
    scale = get(33550)
    tiepoint = get(33922)
    if scale is not None and tiepoint is not None:
        sx, sy = scale[0], scale[1]
        i, j, _, x, y, _ = tiepoint[:6]
        # world = origin + pixel * scale; y axis points down (north-up raster)
        transform = (sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy)

    epsg = None
    geokeys = get(34735)
    if geokeys:
        # GeoKeyDirectory: groups of 4 shorts; key 3072 = ProjectedCSTypeGeoKey,
        # key 2048 = GeographicTypeGeoKey
        for k in range(4, len(geokeys), 4):
            key_id, loc, cnt, val = geokeys[k : k + 4]
            if key_id in (3072, 2048) and loc == 0:
                epsg = int(val)
                break

    nodata = None
    nd = get(42113)
    if nd is not None:
        try:
            nodata = float(bytes(nd).rstrip(b"\x00").decode())
        except Exception:
            nodata = None

    return TiffImage(array=np.ascontiguousarray(arr), transform=transform, epsg=epsg, nodata=nodata)


class _RangeReader:
    """Byte-range access to a TIFF with I/O accounting — the local-file
    stand-in for COG-style HTTP Range GETs (the reference designed but
    never shipped windowed reads: solaris/utils/tile.py:34-158).  At 100 TB
    the win is reading ~window/image bytes per tile task instead of the
    whole blob; ``bytes_read``/``requests`` make that measurable."""

    def __init__(self, path: str):
        self._f = open(path, "rb")
        self.bytes_read = 0
        self.requests = 0

    def read(self, off: int, n: int) -> bytes:
        self._f.seek(off)
        b = self._f.read(n)
        self.requests += 1
        self.bytes_read += len(b)
        return b

    def close(self):
        self._f.close()


def read_tiff_window(path: str, row_off: int, col_off: int,
                     height: int, width: int) -> TiffImage:
    """Windowed read of an uncompressed strip TIFF: fetches ONLY the header,
    IFD, out-of-line tag values, and the strips overlapping rows
    [row_off, row_off+height) — never the full payload.  Returns (C, h, w)
    clamped to the image extent, with the affine shifted to the window
    origin.  ``tags['bytes_read']`` / ``tags['requests']`` report the I/O
    actually performed (COG/Range-GET cost model)."""
    rd = _RangeReader(path)
    try:
        head = rd.read(0, 8)
        bo = "<" if head[:2] == b"II" else ">"
        ifd_off = struct.unpack(bo + "I", head[4:8])[0]
        n = struct.unpack(bo + "H", rd.read(ifd_off, 2))[0]
        ifd = rd.read(ifd_off + 2, 12 * n)
        tags = {}
        for i in range(n):
            e = ifd[12 * i: 12 * (i + 1)]
            tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
            tags[tag] = (typ, cnt, e[8:12])

        def get(tag, default=None):
            if tag not in tags:
                return default
            typ, cnt, raw = tags[tag]
            size = _TYPE_SIZE[typ]
            if typ == 5:
                off = struct.unpack(bo + "I", raw)[0]
                vals = struct.unpack(bo + "I" * (2 * cnt),
                                     rd.read(off, 8 * cnt))
                return tuple(vals[2 * i] / vals[2 * i + 1]
                             for i in range(cnt))
            fmt = _TYPE_FMT.get(typ)
            if fmt is None:
                if size * cnt <= 4:
                    return raw[: size * cnt]
                off = struct.unpack(bo + "I", raw)[0]
                return rd.read(off, size * cnt)
            if size * cnt <= 4:
                return struct.unpack(bo + fmt * cnt, raw[: size * cnt])
            off = struct.unpack(bo + "I", raw)[0]
            return struct.unpack(bo + fmt * cnt, rd.read(off, size * cnt))

        w = get(256)[0]
        h = get(257)[0]
        comp = get(259, (1,))[0]
        if comp != 1:
            raise NotImplementedError(
                f"only uncompressed TIFF supported, got compression={comp}")
        spp = get(277, (1,))[0]
        planar = get(284, (1,))[0]
        if planar != 1 and spp > 1:
            # planar=2 with one band is byte-identical to chunky
            raise NotImplementedError("windowed read: chunky (planar=1) only")
        bps = get(258, (1,) * spp)
        sampfmt = get(339, (1,) * spp)
        strip_offsets = get(273)
        strip_counts = get(279)
        rows_per_strip = get(278, (h,))[0]

        dt = {(1, 8): "u1", (1, 16): "u2", (1, 32): "u4", (2, 8): "i1",
              (2, 16): "i2", (2, 32): "i4", (3, 32): "f4", (3, 64): "f8"}[
            (sampfmt[0], bps[0])]
        dtype = np.dtype(bo + dt)

        r0 = max(0, int(row_off))
        c0 = max(0, int(col_off))
        r1 = min(h, int(row_off) + int(height))
        c1 = min(w, int(col_off) + int(width))
        if r1 <= r0 or c1 <= c0:
            raise ValueError("window does not intersect the image")

        s0 = r0 // rows_per_strip
        s1 = (r1 - 1) // rows_per_strip
        buf = b"".join(rd.read(strip_offsets[s], strip_counts[s])
                       for s in range(s0, s1 + 1))
        first_row = s0 * rows_per_strip
        n_rows = min((s1 + 1) * rows_per_strip, h) - first_row
        arr = np.frombuffer(buf, dtype=dtype)[: n_rows * w * spp] \
            .reshape(n_rows, w, spp)
        win = arr[r0 - first_row: r1 - first_row, c0:c1, :]
        win = np.ascontiguousarray(np.moveaxis(win, -1, 0))

        transform = None
        scale = get(33550)
        tiepoint = get(33922)
        if scale is not None and tiepoint is not None:
            sx, sy = scale[0], scale[1]
            i, j, _, x, y, _ = tiepoint[:6]
            a, c, e, f = sx, x - i * sx, -sy, y + j * sy
            transform = (a, 0.0, c + c0 * a, 0.0, e, f + r0 * e)

        epsg = None
        geokeys = get(34735)
        if geokeys:
            for k in range(4, len(geokeys), 4):
                key_id, loc, cnt, val = geokeys[k: k + 4]
                if key_id in (3072, 2048) and loc == 0:
                    epsg = int(val)
                    break

        return TiffImage(array=win, transform=transform, epsg=epsg,
                         tags={"bytes_read": rd.bytes_read,
                               "requests": rd.requests,
                               "full_size": (h, w), "window": (r0, c0, r1, c1)})
    finally:
        rd.close()


def write_tiff(path: str, array: np.ndarray) -> None:
    """Write a (C, Y, X) or (Y, X) array as an uncompressed strip TIFF (debug/export)."""
    if array.ndim == 2:
        array = array[None]
    c, h, w = array.shape
    dt = array.dtype
    sf = {"u": 1, "i": 2, "f": 3}[dt.kind]
    bits = dt.itemsize * 8
    pix = np.ascontiguousarray(np.moveaxis(array, 0, -1)).tobytes()
    entries = []

    def entry(tag, typ, cnt, val):
        entries.append((tag, typ, cnt, val))

    data_off = 8
    ifd_off = data_off + len(pix)
    entry(256, 3, 1, w)
    entry(257, 3, 1, h)
    entry(258, 3, 1, bits) if c == 1 else None
    entry(259, 3, 1, 1)
    entry(262, 3, 1, 1)
    entry(273, 4, 1, data_off)
    entry(277, 3, 1, c)
    entry(278, 3, 1, h)
    entry(279, 4, 1, len(pix))
    entry(284, 3, 1, 1)
    entry(339, 3, 1, sf)
    extra = b""
    if c > 1:
        # BitsPerSample needs c shorts — place after IFD
        pass
    entries.sort()
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += pix
    out += struct.pack("<H", len(entries) + (1 if c > 1 else 0))
    all_entries = entries[:]
    if c > 1:
        bps_off = ifd_off + 2 + 12 * (len(entries) + 1) + 4
        all_entries.append((258, 3, c, bps_off))
        all_entries.sort()
        extra = struct.pack("<" + "H" * c, *([bits] * c))
    for tag, typ, cnt, val in all_entries:
        raw = struct.pack("<I", val) if _TYPE_SIZE[typ] * cnt > 4 or typ == 4 else (
            struct.pack("<H", val) + b"\x00\x00" if typ == 3 else struct.pack("<I", val)
        )
        out += struct.pack("<HHI", tag, typ, cnt) + raw
    out += struct.pack("<I", 0)
    out += extra
    with open(path, "wb") as f:
        f.write(bytes(out))
