"""S2-style spherical cell keys (numpy, no external libs).

Implements the public S2 geometry construction for cell addressing:
lat/lng → unit-sphere xyz → cube face (0-5) → gnomonic (u, v) on the face
→ the S2 QUADRATIC st-transform (area-equalizing) → quad-tree (i, j) at a
level.  The Hilbert-curve bit interleaving that S2 uses for RANGE locality
is intentionally omitted: the engine consumes cells as EQUI-JOIN keys
(SURVEY §2.3 cell-key joins), where only equality and the parent/child
prefix property matter — both hold for (face, i, j, level) tuples, and the
whole computation stays re-derivable in plain SQL (the DuckDB oracle
recomputes it bit-for-bit).

Reference formulas: S2 geometry library docs (s2geometry.io) — faces are
+x,+y,+z,-x,-y,-z in order; st = (1+3u)^.5/2 for u ≥ 0 else 1-(1-3u)^.5/2.
"""

from __future__ import annotations

import numpy as np


def lat_lng_to_xyz(lat_deg: np.ndarray, lng_deg: np.ndarray):
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    theta = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def xyz_to_face_uv(x, y, z):
    """Largest-|component| cube face + gnomonic (u, v) — S2 face layout:
    face 0:+x, 1:+y, 2:+z, 3:-x, 4:-y, 5:-z."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az), np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4),
                 np.where(z >= 0, 2, 5)))
    u = np.empty_like(x)
    v = np.empty_like(x)
    # canonical S2 XYZtoFaceUV (negative-face denominators stay signed)
    for f, (uexp, vexp, den) in enumerate([
            (lambda: y, lambda: z, lambda: x),      # 0: +x
            (lambda: -x, lambda: z, lambda: y),     # 1: +y
            (lambda: -x, lambda: -y, lambda: z),    # 2: +z
            (lambda: z, lambda: y, lambda: x),      # 3: -x
            (lambda: z, lambda: -x, lambda: y),     # 4: -y
            (lambda: -y, lambda: -x, lambda: z)]):  # 5: -z
        m = face == f
        d = den()
        with np.errstate(divide="ignore", invalid="ignore"):
            u = np.where(m, uexp() / d, u)
            v = np.where(m, vexp() / d, v)
    return face, u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2 QUADRATIC projection: equalizes cell areas across a face."""
    # clip each sqrt argument at 0: np.where evaluates BOTH branches, so the
    # discarded branch would hit sqrt(negative) and spray RuntimeWarnings
    # into executor logs for |u| > 1/3 (the result was already correct)
    u = np.asarray(u, dtype=np.float64)
    return np.where(u >= 0,
                    0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
                    1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)))


def st_to_uv(s: np.ndarray) -> np.ndarray:
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5, (4.0 * s * s - 1.0) / 3.0,
                    (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0)


def cell_ij(lat_deg, lng_deg, level: int):
    """(face, i, j) quad coordinates at `level` (i, j ∈ [0, 2^level))."""
    x, y, z = lat_lng_to_xyz(lat_deg, lng_deg)
    face, u, v = xyz_to_face_uv(x, y, z)
    n = 1 << level
    i = np.clip(np.floor(uv_to_st(u) * n), 0, n - 1).astype(np.int64)
    j = np.clip(np.floor(uv_to_st(v) * n), 0, n - 1).astype(np.int64)
    return face.astype(np.int64), i, j


def cell_token(lat_deg, lng_deg, level: int) -> np.ndarray:
    """String join key 'f{face}_{i}_{j}@{level}'.  Parent at level-1 is
    'f{face}_{i>>1}_{j>>1}@{level-1}' (prefix/containment property)."""
    face, i, j = cell_ij(lat_deg, lng_deg, level)
    return np.array([f"f{f}_{a}_{b}@{level}"
                     for f, a, b in zip(face, i, j)], dtype=object)


def parent_token(token: str) -> str:
    head, lvl = token.split("@")
    f, i, j = head[1:].split("_")
    return f"f{f}_{int(i) >> 1}_{int(j) >> 1}@{int(lvl) - 1}"


def cell_center_lat_lng(face: int, i: int, j: int, level: int):
    """Center of a cell, for round-trip checks."""
    n = 1 << level
    u = st_to_uv((i + 0.5) / n)
    v = st_to_uv((j + 0.5) / n)
    axes = {0: (1.0, u, v), 1: (-u, 1.0, v), 2: (-u, -v, 1.0),
            3: (-1.0, -v, -u), 4: (v, -1.0, -u), 5: (v, u, -1.0)}
    x, y, z = axes[int(face)]
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lng = np.degrees(np.arctan2(y, x))
    return float(lat), float(lng)
