"""Mask → polygon extraction (GDAL features.shapes equivalent):
connected-component labeling + crack-following boundary tracing producing
pixel-boundary rings (exterior + holes) per component.

Re-expresses solaris/vector/mask.py:718-818 (mask_to_poly_geojson):
polygonize connected regions of equal value, then buffer(0)/min_area/
simplify post-steps.  Geometry-set parity with the reference's golden
(gdf_from_mask_1.geojson) is asserted by tests (same component count,
identical areas, IoU == 1 per matched polygon); vertex ORDER is not part
of the engine's contract.

Pure NumPy; components via BFS on a 4-connected grid; boundaries by
directed-crack stitching (interior kept on the left, so exteriors and
holes come out with opposite orientations automatically).
"""

from __future__ import annotations

import numpy as np


def label_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """4-connected component labels (0 = background). BFS, vectorized-ish."""
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    cur = 0
    fg = mask != 0
    stack = []
    for r0 in range(h):
        row = fg[r0]
        for c0 in np.where(row & (labels[r0] == 0))[0]:
            if labels[r0, c0]:
                continue
            cur += 1
            stack.append((r0, c0))
            labels[r0, c0] = cur
            while stack:
                r, c = stack.pop()
                if r > 0 and fg[r - 1, c] and not labels[r - 1, c]:
                    labels[r - 1, c] = cur
                    stack.append((r - 1, c))
                if r + 1 < h and fg[r + 1, c] and not labels[r + 1, c]:
                    labels[r + 1, c] = cur
                    stack.append((r + 1, c))
                if c > 0 and fg[r, c - 1] and not labels[r, c - 1]:
                    labels[r, c - 1] = cur
                    stack.append((r, c - 1))
                if c + 1 < w and fg[r, c + 1] and not labels[r, c + 1]:
                    labels[r, c + 1] = cur
                    stack.append((r, c + 1))
    return labels, cur


def _trace_rings(region: np.ndarray) -> list[np.ndarray]:
    """All boundary rings of a boolean region as (n,2) closed arrays of
    (x, y) pixel-corner coords.  Directed cracks keep the region on the
    LEFT; loops are stitched with a left-turn preference at 4-way corners
    so diagonal-touching regions produce separate rings."""
    h, w = region.shape
    pad = np.zeros((h + 2, w + 2), dtype=bool)
    pad[1:-1, 1:-1] = region
    # directed edges between corners; corner (x, y) with x∈[0,w], y∈[0,h]
    # horizontal cracks: between pad[y, x+1] (above? careful) …
    # For cell (r, c) filled and (r-1, c) empty: top crack, direction +x
    # (region below the crack = left of +x direction in y-down coords).
    edges = {}  # (x0, y0, dx, dy) start corner + dir → present

    filled = pad[1:-1, 1:-1]
    up_empty = ~pad[:-2, 1:-1]
    down_empty = ~pad[2:, 1:-1]
    left_empty = ~pad[1:-1, :-2]
    right_empty = ~pad[1:-1, 2:]

    # top cracks: dir +x; start corner (c, r)
    rs, cs = np.where(filled & up_empty)
    starts = {}
    def add(x0, y0, x1, y1):
        starts.setdefault((x0, y0), []).append((x1, y1))
    for r, c in zip(rs, cs):
        add(c, r, c + 1, r)
    # bottom cracks: dir -x; start corner (c+1, r+1)
    rs, cs = np.where(filled & down_empty)
    for r, c in zip(rs, cs):
        add(c + 1, r + 1, c, r + 1)
    # left cracks: dir -y (upward); start (c, r+1) → (c, r)
    rs, cs = np.where(filled & left_empty)
    for r, c in zip(rs, cs):
        add(c, r + 1, c, r)
    # right cracks: dir +y; start (c+1, r) → (c+1, r+1)
    rs, cs = np.where(filled & right_empty)
    for r, c in zip(rs, cs):
        add(c + 1, r, c + 1, r + 1)

    rings = []
    while starts:
        (x0, y0), nxts = next(iter(starts.items()))
        ring = [(x0, y0)]
        cur = (x0, y0)
        prev_dir = None
        while True:
            outs = starts.get(cur)
            if not outs:
                break
            if len(outs) == 1 or prev_dir is None:
                nxt = outs.pop()
            else:
                # ambiguous corner (diagonal touch): prefer the LEFT turn
                # relative to incoming direction to keep loops separate
                dx, dy = prev_dir
                # left turn in y-down coords: (dy, -dx)
                want = (cur[0] + dy, cur[1] - dx)
                if want in outs:
                    outs.remove(want)
                    nxt = want
                else:
                    nxt = outs.pop()
            if not outs:
                del starts[cur]
            prev_dir = (nxt[0] - cur[0], nxt[1] - cur[1])
            cur = nxt
            ring.append(cur)
            if cur == (x0, y0):
                break
        if len(ring) >= 5:
            arr = np.asarray(ring, dtype=np.float64)
            # collapse collinear runs
            keep = [0]
            for i in range(1, len(arr) - 1):
                v1 = arr[i] - arr[keep[-1]]
                v2 = arr[i + 1] - arr[i]
                if v1[0] * v2[1] - v1[1] * v2[0] != 0:
                    keep.append(i)
            keep.append(len(arr) - 1)
            rings.append(arr[keep])
    return rings


def mask_to_polygons(mask: np.ndarray, min_area: float = 40.0,
                     transform=None, simplify_tol: float | None = None):
    """Connected regions of mask > 0 → list of (rings, value, area_px).

    rings: exterior first (positive signed area in pixel axes per the crack
    orientation), holes after.  min_area filters in the OUTPUT coordinate
    space like the reference (mask.py:782-801: area filter applied after
    transform).  transform maps pixel → geo coords; simplify_tol runs
    Douglas-Peucker per ring (reference default tolerance 0.5)."""
    from . import geom as G

    labels, n = label_components(mask)
    out = []
    for k in range(1, n + 1):
        region = labels == k
        value = float(mask[region][0])
        rings = _trace_rings(region)
        if not rings:
            continue
        # exterior = ring with max |area|; verify holes nest inside
        areas = [G.ring_signed_area(r) for r in rings]
        ext_i = int(np.argmax(np.abs(areas)))
        ordered = [rings[ext_i]] + [r for i, r in enumerate(rings) if i != ext_i]
        if transform is not None:
            ordered = [G.affine_apply(r, transform) for r in ordered]
        # reference order (mask.py:795-808): min_area filter on the RAW
        # polygon, simplification afterwards
        area = abs(G.ring_signed_area(ordered[0])) - sum(
            abs(G.ring_signed_area(r)) for r in ordered[1:])
        if area < min_area:
            continue
        if simplify_tol:
            ordered = [G.simplify_dp(r, simplify_tol) for r in ordered]
            area = abs(G.ring_signed_area(ordered[0])) - sum(
                abs(G.ring_signed_area(r)) for r in ordered[1:])
        out.append((ordered, value, area))
    return out
