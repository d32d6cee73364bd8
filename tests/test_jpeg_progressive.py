"""Progressive JPEG (SOF2, T.81 G.2) — functions/jpeg.py.

Correctness is anchored the same three independent ways as the baseline
codec (no libjpeg in this sandbox):

1. HAND-BUILT progressive streams — markers, minimal Huffman tables, and
   entropy bits assembled byte-by-byte here — covering every scan kind:
   DC first + DC refinement, AC first with an EOB run spanning blocks,
   AC refinement with a history-correction bit, a new insertion, and an
   EOB-run correction tail.  Expected pixels come from the DC closed
   form or the naive O(N^4) direct IDCT written in test_jpeg.py.
2. Progressive-vs-sequential BIT parity: both encoder modes quantize
   coefficients identically, so decode(encode(progressive=True)) must be
   byte-identical to decode(encode(progressive=False)) — any slip in
   point transforms, EOB-run bookkeeping, or correction-bit order breaks
   this exactly.
3. Structural checks: the progressive stream really is SOF2 with the
   10-scan (color) / 6-scan (gray) libjpeg progression script.
"""

import struct

import numpy as np
import pytest

from solaris_spark.functions.jpeg import decode_jpeg, encode_jpeg
from tests.test_jpeg import _naive_idct, _smooth_rgb


def _gray_prog_headers(h, w, qt_val=16):
    """SOI + DQT(all qt_val) + SOF2 single gray component."""
    buf = bytearray(b"\xff\xd8")
    buf += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" \
        + bytes([qt_val]) * 64
    buf += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1) \
        + bytes([1, 0x11, 0])
    return buf


def _dht(tc, th, bits, values):
    return (b"\xff\xc4" + struct.pack(">H", 19 + len(values))
            + bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))


def _sos1(ss, se, ah, al, td=0, ta=0):
    """Single-component scan header (component id 1)."""
    return (b"\xff\xda" + struct.pack(">HB", 8, 1)
            + bytes([1, (td << 4) | ta, ss, se, (ah << 4) | al]))


class TestHandBuiltProgressive:
    def test_dc_first_plus_refine(self):
        """8×8 gray, QT=16.  Scan 1 (DC, Ah=0, Al=1): 1-bit DC table
        code '0'→category 3, bits 0|101 → DIFF=EXTEND(5,3)=5 → coef
        5<<1 = 10.  Scan 2 (DC refine, Ah=1, Al=0): one bit '1' → coef
        11.  Dequantized 11·16=176; DC-only IDCT = 176/8 = 22; +128 →
        every sample exactly 150."""
        buf = _gray_prog_headers(8, 8)
        buf += _dht(0, 0, [1] + [0] * 15, [3])
        buf += _sos1(0, 0, 0, 1)
        buf += bytes([0b01011111])          # 0|101 + 1-padding
        buf += _sos1(0, 0, 1, 0)
        buf += bytes([0xFF, 0x00])          # single '1' bit + 1-padding,
        buf += b"\xff\xd9"                  # 0xFF needs zero stuffing
        out = decode_jpeg(bytes(buf))
        assert out.shape == (1, 8, 8)
        assert (out == 150).all()

    def test_ac_first_with_eob_run(self):
        """8×16 gray (two blocks), QT=16.  DC scan leaves DC=0 (category
        0 per block).  AC scan (band 1..63, Al=0), 2-symbol AC table:
        '0'→0x02 (run 0 / size 2), '10'→0x11 EOB1... rebuilt: '10'→0x10
        (EOB, n=1).  Block 1 bits: 0|01 (coef at k=1 = EXTEND(1,2) =
        -2), then 10|0 (EOB1, ext bit 0 → run = 2-1+0 = 1) — covering
        block 1's tail and all of block 2.  Expected: block 1 is the
        IDCT of S[0,1] = -32, block 2 flat 128."""
        buf = _gray_prog_headers(8, 16)
        buf += _dht(0, 0, [1] + [0] * 15, [0])          # DC cat 0
        buf += _dht(1, 0, [1, 1] + [0] * 14, [0x02, 0x10])
        buf += _sos1(0, 0, 0, 0)
        buf += bytes([0b00111111])          # DC cat0 ×2 blocks + padding
        buf += _sos1(1, 63, 0, 0)
        # 0|01|10|0 + pad '11'
        buf += bytes([0b00110011])
        buf += b"\xff\xd9"
        out = decode_jpeg(bytes(buf))
        assert out.shape == (1, 8, 16)
        S = np.zeros((8, 8))
        S[0, 1] = -2 * 16
        want1 = np.clip(np.round(_naive_idct(S) + 128), 0, 255)
        assert np.array_equal(out[0, :, :8], want1.astype(np.uint8))
        assert (out[0, :, 8:] == 128).all()

    def test_ac_refine_with_history_and_insertion(self):
        """8×8 gray, QT=16.  AC first scan at Al=1 sets the k=1
        coefficient to +1 (→ stored 2).  AC refine scan (Ah=1, Al=0),
        table '0'→0x01 (run 0 / size 1), '10'→0x00 (EOB0): bits
        0|0|0|10 = new coefficient at k=2 with sign '-', preceded by the
        history coefficient's correction bit 0 (buffered behind the
        symbol), then EOB0 whose correction tail reads no bits (no more
        history).  Final: k=1 → 2, k=2 → -1."""
        buf = _gray_prog_headers(8, 8)
        buf += _dht(0, 0, [1] + [0] * 15, [0])
        buf += _dht(1, 0, [1, 1] + [0] * 14, [0x01, 0x10])
        buf += _sos1(0, 0, 0, 0)
        buf += bytes([0b01111111])          # DC cat 0 + padding
        # AC first, Al=1: symbol 0x01 (run0/size1), value bit 1 → +1<<1
        # then EOB0 ('10'):  0|1|10 + pad
        buf += _sos1(1, 63, 0, 1)
        buf += bytes([0b01101111])
        # AC refine, Ah=1→Al=0: symbol 0x01 (new coef, run 0), sign 0
        # (negative), correction bit 0 for the k=1 history coef, EOB0.
        buf += _sos1(1, 63, 1, 0)
        buf += bytes([0b00010111])          # 0|0|0|10 + pad '111'
        buf += b"\xff\xd9"
        out = decode_jpeg(bytes(buf))
        S = np.zeros((8, 8))
        S.reshape(64)[1] = 2 * 16           # zigzag k=1 → natural 1
        S.reshape(64)[8] = -1 * 16          # zigzag k=2 → natural 8
        want = np.clip(np.round(_naive_idct(S) + 128), 0, 255)
        assert np.array_equal(out[0], want.astype(np.uint8))


class TestProgressiveSequentialParity:
    """The two encoder modes quantize identically → decoding must agree
    bit-for-bit.  This crosses every scan kind the standard progression
    script uses (DC/AC first+refine at two successive-approximation
    levels) against the independently spec-vector-anchored sequential
    path."""

    @pytest.mark.parametrize("hw", [(8, 8), (40, 56), (33, 47), (17, 9)])
    def test_gray(self, hw):
        rng = np.random.default_rng(hw[0] * 100 + hw[1])
        arr = rng.integers(0, 255, size=(1, *hw)).astype(np.uint8)
        for q in (50, 90):
            seq = decode_jpeg(encode_jpeg(arr, quality=q))
            pro = decode_jpeg(encode_jpeg(arr, quality=q, progressive=True))
            assert np.array_equal(seq, pro)

    @pytest.mark.parametrize("subsample", [False, True])
    @pytest.mark.parametrize("hw", [(32, 32), (37, 45)])
    def test_color(self, subsample, hw):
        arr = _smooth_rgb(*hw)
        for q in (75, 95):
            seq = decode_jpeg(encode_jpeg(arr, quality=q,
                                          subsample=subsample))
            pro = decode_jpeg(encode_jpeg(arr, quality=q,
                                          subsample=subsample,
                                          progressive=True))
            assert np.array_equal(seq, pro)

    def test_noise_color(self):
        """Noise maximizes AC population — stresses ZRL-in-refine and
        EOB-run bookkeeping far harder than smooth content."""
        rng = np.random.default_rng(99)
        arr = rng.integers(0, 255, size=(3, 24, 40)).astype(np.uint8)
        for q in (30, 85):
            seq = decode_jpeg(encode_jpeg(arr, quality=q))
            pro = decode_jpeg(encode_jpeg(arr, quality=q, progressive=True))
            assert np.array_equal(seq, pro)

    def test_flat_image_long_eob_runs(self):
        """A flat image makes every AC scan one long EOB run."""
        arr = np.full((3, 64, 48), 77, dtype=np.uint8)
        pro = decode_jpeg(encode_jpeg(arr, quality=90, progressive=True))
        seq = decode_jpeg(encode_jpeg(arr, quality=90))
        assert np.array_equal(seq, pro)


class TestProgressiveStructure:
    def test_sof2_and_scan_count(self):
        buf = encode_jpeg(_smooth_rgb(24, 24), progressive=True)
        assert b"\xff\xc2" in buf and b"\xff\xc0" not in buf
        assert buf.count(b"\xff\xda") == 10      # color script
        gbuf = encode_jpeg(np.zeros((1, 16, 16), np.uint8),
                           progressive=True)
        assert gbuf.count(b"\xff\xda") == 6      # gray script
        # progressive ignores restart_interval (no DRI)
        rbuf = encode_jpeg(_smooth_rgb(24, 24), progressive=True,
                           restart_interval=4)
        assert b"\xff\xdd" not in rbuf

    def test_quality_envelope(self):
        """Full progressive round-trip stays inside the same q-table
        error envelope the sequential codec is held to."""
        arr = _smooth_rgb(48, 64)
        out = decode_jpeg(encode_jpeg(arr, quality=95, subsample=False,
                                      progressive=True))
        assert np.abs(out.astype(int) - arr.astype(int)).max() <= 14

    def test_truncated_progressive_raises(self):
        enc = encode_jpeg(_smooth_rgb(32, 32), quality=90,
                          progressive=True)
        with pytest.raises(Exception):
            decode_jpeg(enc[: int(len(enc) * 0.4)])


class TestSparkIntegrationProgressive:
    def test_image_features_on_progressive_jpeg(self, spark):
        from solaris_spark.operators import multimodal
        arr = _smooth_rgb(33, 41)
        images = spark.createDataFrame(
            [("p0", bytearray(encode_jpeg(arr, quality=95,
                                          progressive=True)),
              41, 33, "jpeg")],
            "image_id string, bytes binary, w int, h int, fmt string")
        feats = multimodal.image_features(images).collect()
        assert len(feats) == 1
        exp = [float(c.mean()) for c in arr.astype(np.float64)]
        assert all(abs(a - b) < 1.5
                   for a, b in zip(feats[0]["mean"], exp))
