"""SAR band math + RGB↔HSV/HSL kernels (numpy-only, no Spark imports).

Re-expresses solaris/preproc/sar.py:17-170 (BandMath, Amplitude, Intensity,
InPhase, Quadrature, Phase, Conjugate, Decibels, Multilook) and
solaris/preproc/optical.py:9-92 (RGBToHSV/HSVToRGB/RGBToHSL/HSLToRGB) —
the reference runs colorsys through np.vectorize (per-pixel Python) and
scipy filters; these are fully vectorized numpy with identical arithmetic.

All kernels take/return (C, Y, X) arrays.
"""

from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------------------
# SAR band math (sar.py:17-128)
# ---------------------------------------------------------------------------

def amplitude(arr: np.ndarray) -> np.ndarray:
    return np.absolute(arr)


def intensity(arr: np.ndarray) -> np.ndarray:
    if np.iscomplexobj(arr):
        return np.square(np.absolute(arr))
    return np.square(arr)


def in_phase(arr: np.ndarray) -> np.ndarray:
    return np.real(arr)


def quadrature(arr: np.ndarray) -> np.ndarray:
    return np.imag(arr)


def phase(arr: np.ndarray) -> np.ndarray:
    return np.angle(arr)


def conjugate(arr: np.ndarray) -> np.ndarray:
    return np.conj(arr)


def decibels(arr: np.ndarray, flag="min") -> np.ndarray:
    """10·log10 with the reference's nonpositive-input flag semantics
    (sar.py:104-127: 'min' → log of smallest positive value, 'nan' → NaN,
    number → flag/10)."""
    if isinstance(flag, str) and flag.lower() == "min":
        flagval = 10.0 * np.log10(arr[arr > 0].min())
    elif isinstance(flag, str) and flag.lower() == "nan":
        flagval = math.nan
    else:
        flagval = flag / 10.0
    return 10.0 * np.log10(
        arr, out=np.full(np.shape(arr), flagval).astype(arr.dtype),
        where=arr > 0)


def multilook(arr: np.ndarray, kernel_size=5, method="avg") -> np.ndarray:
    """Speckle-reduction filter (sar.py:130-156): per-band centered sliding
    window, reflect boundary — 'avg' (uniform), 'med' (median), 'max'."""
    if isinstance(kernel_size, int):
        ky = kx = kernel_size
    else:
        ky, kx = kernel_size
    out = np.zeros_like(arr)
    for c in range(arr.shape[0]):
        band = arr[c]
        pad = np.pad(band, ((ky // 2, ky - 1 - ky // 2),
                            (kx // 2, kx - 1 - kx // 2)), mode="symmetric")
        win = np.lib.stride_tricks.sliding_window_view(pad, (ky, kx))
        if method == "avg":
            v = win.mean(axis=(2, 3))
        elif method == "med":
            v = np.median(win, axis=(2, 3))
        elif method == "max":
            v = win.max(axis=(2, 3))
        else:
            raise ValueError(f"invalid multilook method {method!r}")
        out[c] = v.astype(arr.dtype, copy=False)
    return out


# ---------------------------------------------------------------------------
# RGB ↔ HSV / HSL (optical.py:9-92 — colorsys formulas, vectorized).
# Channel order conventions match the reference exactly: HSL stacks
# (h, s, l) on output (colorsys returns h, l, s; the reference reorders),
# HSV stacks (h, s, v).
# ---------------------------------------------------------------------------

def rgb_to_hsv(arr: np.ndarray, rgbmax: float = 255.0) -> np.ndarray:
    r = np.clip(arr[0] / rgbmax, 0, 1)
    g = np.clip(arr[1] / rgbmax, 0, 1)
    b = np.clip(arr[2] / rgbmax, 0, 1)
    maxc = np.maximum(np.maximum(r, g), b)
    minc = np.minimum(np.minimum(r, g), b)
    v = maxc
    span = maxc - minc
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.where(maxc > 0, span / maxc, 0.0)
        rc = np.where(span > 0, (maxc - r) / span, 0.0)
        gc = np.where(span > 0, (maxc - g) / span, 0.0)
        bc = np.where(span > 0, (maxc - b) / span, 0.0)
    h = np.where(r == maxc, bc - gc,
                 np.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = np.where(span > 0, (h / 6.0) % 1.0, 0.0)
    return np.stack([h, s, v])


def hsv_to_rgb(arr: np.ndarray, rgbmax: float = 255.0) -> np.ndarray:
    h = np.clip(arr[0], 0, 1)
    s = np.clip(arr[1], 0, 1)
    v = np.clip(arr[2], 0, 1)
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(np.int64) % 6
    r = np.choose(i, [v, q, p, p, t, v])
    g = np.choose(i, [t, v, v, q, p, p])
    b = np.choose(i, [p, p, t, v, v, q])
    return rgbmax * np.stack([r, g, b])


def rgb_to_hsl(arr: np.ndarray, rgbmax: float = 255.0) -> np.ndarray:
    """Returns (h, s, l) — the reference's channel order (optical.py:27
    reorders colorsys's (h, l, s))."""
    r = np.clip(arr[0] / rgbmax, 0, 1)
    g = np.clip(arr[1] / rgbmax, 0, 1)
    b = np.clip(arr[2] / rgbmax, 0, 1)
    maxc = np.maximum(np.maximum(r, g), b)
    minc = np.minimum(np.minimum(r, g), b)
    sumc = maxc + minc
    span = maxc - minc
    l = sumc / 2.0
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.where(span == 0, 0.0,
                     np.where(l <= 0.5, span / sumc,
                              span / (2.0 - sumc)))
        rc = np.where(span > 0, (maxc - r) / span, 0.0)
        gc = np.where(span > 0, (maxc - g) / span, 0.0)
        bc = np.where(span > 0, (maxc - b) / span, 0.0)
    h = np.where(r == maxc, bc - gc,
                 np.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = np.where(span > 0, (h / 6.0) % 1.0, 0.0)
    return np.stack([h, s, l])


def hsl_to_rgb(arr: np.ndarray, rgbmax: float = 255.0) -> np.ndarray:
    """Input (h, s, l) channel order (reference HSLToRGB reads hband=0,
    sband=1, lband=2; optical.py:31-49)."""
    h = np.clip(arr[0], 0, 1)
    s = np.clip(arr[1], 0, 1)
    l = np.clip(arr[2], 0, 1)
    m2 = np.where(l <= 0.5, l * (1.0 + s), l + s - l * s)
    m1 = 2.0 * l - m2

    def _v(m1, m2, hue):
        hue = hue % 1.0
        return np.where(
            hue < 1.0 / 6.0, m1 + (m2 - m1) * hue * 6.0,
            np.where(hue < 0.5, m2,
                     np.where(hue < 2.0 / 3.0,
                              m1 + (m2 - m1) * (2.0 / 3.0 - hue) * 6.0, m1)))

    r = np.where(s == 0, l, _v(m1, m2, h + 1.0 / 3.0))
    g = np.where(s == 0, l, _v(m1, m2, h))
    b = np.where(s == 0, l, _v(m1, m2, h - 1.0 / 3.0))
    return rgbmax * np.stack([r, g, b])
