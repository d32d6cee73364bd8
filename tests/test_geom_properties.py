"""Property-based invariants for the geometry kernels (hypothesis).

Complements the golden-pinned parity tests: whatever the polygon, IoU must
be symmetric, bounded, 1 on self; intersection area can't exceed either
operand or the clip rect; affine round trips are exact to float.
Polygons are convex hulls of random point clouds (always simple/valid)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from solaris_spark.functions import geom as G


def _hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain convex hull, closed ring CCW."""
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2],
                                             p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out
    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.array(lower[:-1] + upper[:-1], dtype=np.float64)
    return np.vstack([ring, ring[:1]])


@st.composite
def polygons(draw, max_coord=100.0):
    n = draw(st.integers(min_value=3, max_value=12))
    seed = draw(st.integers(min_value=0, max_value=10_000))
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, max_coord, size=(n, 2))
    # degenerate clouds (collinear) give sub-3-vertex hulls — resample
    h = _hull(np.unique(pts, axis=0))
    if len(h) < 4:
        pts = rng.uniform(0, max_coord, size=(12, 2))
        h = _hull(pts)
    return G.wkt_dump("POLYGON", [h])


@settings(max_examples=150, deadline=None)
@given(polygons(), polygons())
def test_iou_bounded_symmetric_self(wa, wb):
    iou_ab = G.iou_wkt(wa, wb)
    iou_ba = G.iou_wkt(wb, wa)
    assert 0.0 <= iou_ab <= 1.0 + 1e-12
    assert abs(iou_ab - iou_ba) < 1e-9
    assert abs(G.iou_wkt(wa, wa) - 1.0) < 1e-9
    ra, rb = G.polygon_rings(wa), G.polygon_rings(wb)
    inter = G.polygon_intersection_area(ra, rb)
    assert inter <= G.polygon_area(wa) + 1e-6
    assert inter <= G.polygon_area(wb) + 1e-6


@settings(max_examples=100, deadline=None)
@given(polygons())
def test_clip_and_affine_invariants(w):
    rings = G.polygon_rings(w)
    rect = (20.0, 20.0, 70.0, 60.0)
    ca = G.clip_polygon_rect_area(rings, rect)
    assert -1e-9 <= ca <= G.polygon_area(w) + 1e-6
    assert ca <= (70 - 20) * (60 - 20) + 1e-6
    t = (0.5, 0.0, 733601.0, 0.0, -0.5, 3725139.0)
    back = G.transform_wkt(G.transform_wkt(w, t), G.affine_invert(t))
    a = np.vstack(G.polygon_rings(w))
    b = np.vstack(G.polygon_rings(back))
    assert np.allclose(a, b, atol=1e-6)
    assert abs(G.polygon_area(w)
               - abs(G.ring_signed_area(rings[0]))) < 1e-9
