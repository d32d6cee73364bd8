#!/usr/bin/env python
"""Mega-image stress evidence for the windowed (COG) tiling path.

One ~8k×8k tiled+deflate GeoTIFF — far bigger than any fixture — through
``raster_tiles_windowed`` at two parallelism levels.  This is the
operator's raison d'être: a single mega-image's tiles FAN OUT across the
cluster instead of serializing inside one whole-image decode task, and
each task range-reads only its tile's file blocks.  A 1-row manifest is
deliberately the input: without the operator's internal
``repartition(partitions, tile_id)`` every tile job would sit in one
task and the 2→8 scaling below would be ~0.25, not ~1.

Writes BENCH/megaimage.json (per-trial walls + loadavg so noisy-host
runs are adjudicable).  Best-of-windows merge across invocations, keyed
by engine_rev, same as bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = int(os.environ.get("MEGA_PX", "8192"))
TILE = int(os.environ.get("MEGA_TILE", "256"))
TRIALS = int(os.environ.get("MEGA_TRIALS", "2"))
N_LO = int(os.environ.get("MEGA_N_LO", "2"))
N_HI = int(os.environ.get("MEGA_N_HI", "8"))
PATH = os.environ.get("MEGA_PATH", "/tmp/solaris_spark_megaimage.tif")


def ensure_image() -> None:
    """Deterministic ~SIZE² 3-band COG (tiled+deflate+predictor).  Written
    once; content is seeded so every run/round benches identical bytes."""
    import numpy as np

    from solaris_spark.functions.tiffio import read_tiff_window, write_tiff
    if os.path.exists(PATH):
        try:
            probe = read_tiff_window(PATH, 0, 0, 1, 1)
            if probe.tags["full_size"] == (SIZE, SIZE):
                return
        except Exception:
            pass
    rng = np.random.default_rng(99)
    # blockwise structure (not pure noise) so deflate+predictor do real
    # work, like imagery does — pure random would bench the incompressible
    # corner case
    base = rng.integers(0, 255, size=(3, SIZE // 8, SIZE // 8),
                        dtype=np.uint8)
    arr = np.repeat(np.repeat(base, 8, axis=1), 8, axis=2)
    arr += rng.integers(0, 8, size=arr.shape, dtype=np.uint8)
    write_tiff(PATH, arr, tile=(TILE, TILE), compress="deflate",
               predictor=2,
               transform=(0.5, 0.0, 733601.0, 0.0, -0.5, 3725139.0),
               epsg=32616)


def run_at(cores: int) -> dict:
    from solaris_spark.operators import tiling
    from solaris_spark.session import get_spark

    spark = get_spark(app_name=f"megaimage_{cores}", cores=cores,
                      shuffle_partitions=cores * 4)
    files = spark.createDataFrame(
        [("mega", PATH, SIZE, SIZE, 0.5, 0.0, 733601.0, 0.0, -0.5,
          3725139.0, None)],
        "image_id string, path string, w int, h int, a double, b double, "
        "c double, d double, e double, f double, nodata double")
    walls = []
    n_tiles = 0
    for _ in range(TRIALS):
        t0 = time.time()
        n_tiles = tiling.raster_tiles_windowed(
            files, (TILE, TILE), partitions=cores * 4).count()
        walls.append(round(time.time() - t0, 2))
    spark.stop()
    best = min(walls)
    return {"cores": cores, "wall_sec": best, "trial_walls": walls,
            "n_tiles": n_tiles,
            "tiles_per_sec": round(n_tiles / best, 2),
            "mb_per_sec": round(n_tiles * TILE * TILE * 3 / 1e6 / best, 1)}


def _engine_rev() -> str:
    import hashlib
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "solaris_spark")
    h = hashlib.sha256()
    for dirpath, _dirs, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.endswith(".py"):
                with open(os.path.join(dirpath, f), "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()[:16]


def main():
    ensure_image()
    rev = _engine_rev()
    lo_runs, hi_runs = [], []
    out_path = "BENCH/megaimage.json"
    if os.path.exists(out_path) and not os.environ.get("MEGA_FRESH"):
        with open(out_path) as f:
            prev = json.load(f)
        if (prev.get("engine_rev") == rev and prev.get("size_px") == SIZE
                and prev.get("n_lo") == N_LO and prev.get("n_hi") == N_HI):
            lo_runs.append(prev["lo"])
            hi_runs.append(prev["hi"])
    lo_runs.append(run_at(N_LO))
    hi_runs.append(run_at(N_HI))
    lo = max(lo_runs, key=lambda r: r["tiles_per_sec"])
    hi = max(hi_runs, key=lambda r: r["tiles_per_sec"])
    eff = hi["tiles_per_sec"] / (N_HI / N_LO * lo["tiles_per_sec"])
    result = {
        "size_px": SIZE, "tile_px": TILE,
        "file_mb": round(os.path.getsize(PATH) / 1e6, 1),
        "n_lo": N_LO, "n_hi": N_HI, "lo": lo, "hi": hi,
        "scaling_efficiency": round(eff, 3),
        "engine_rev": rev,
        "loadavg": [round(v, 2) for v in os.getloadavg()],
    }
    print(json.dumps(result))
    os.makedirs("BENCH", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
