#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Covers the two north-rule throughput axes (tiles+masks produced/sec,
spatial-join rows/sec on the synthetic image+caption table) plus the
headline relational/pipeline queries at $SPARK_GRAFT_SF_DIR.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32),
     BENCH_IMAGES       (default 64 synthetic images for the tile pipeline).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_full(df):
    """Force full execution of every column (noop sink, no driver collect)."""
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_images = int(os.environ.get("BENCH_IMAGES", "64"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1

    import __spark_entry__ as E
    from solaris_spark.operators import masks, tiling
    from solaris_spark.session import get_spark
    from solaris_spark.sources import synth

    spark = get_spark(app_name="solaris_spark_bench", cores=cpus)
    timings: dict[str, float] = {}

    # -- geometry pipeline: tiles + masks + spatial join ------------------
    # SpaceNet-like density (hundreds of footprints per image) and explicit
    # repartition before CPU-heavy UDF stages (see BENCH/BASELINE.md)
    ncores = 32 if cpus in ("*",) else int(cpus)
    images = synth.images_table(spark, n_images, include_fixture=True,
                                min_px=512, max_px=1024)
    geo = synth.image_geo_table(spark, images)
    ig = tiling.with_geo(images, geo).repartition(ncores * 4, "image_id").persist()
    n_img = ig.count()  # materialize input before the timed section

    # best-of-N per timed section: this host is shared (external load
    # bursts 1-15), single-shot walls carry +-2-3x noise; N disclosed in
    # the output as "trials"
    trials = int(os.environ.get("BENCH_TRIALS", "2"))

    def best_of(fn):
        best = None
        for _ in range(trials):
            t0 = time.time()
            n = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return n, best

    tiles = tiling.raster_tiles(ig, (90, 90))
    n_tiles, timings["raster_tiles"] = best_of(tiles.count)

    labels = synth.labels_table(spark, images, min_labels=100,
                                max_labels=250).persist()
    labels.count()
    lg = tiling.labels_geo(labels, geo).repartition(ncores * 4, "image_id").persist()
    n_labels = lg.count()
    grid = tiling.tile_grid(ig, (90, 90)).persist()
    grid.count()

    ltiles = tiling.vector_tiles(lg, grid)
    n_join_rows, timings["vector_tile_join"] = best_of(ltiles.count)

    mk = masks.image_masks(labels, ig,
                           channels=["footprint", "boundary", "contact"],
                           num_partitions=ncores * 4)
    n_masks, timings["masks_fbc"] = best_of(mk.count)

    tiles_masks_per_sec = (n_tiles + n_masks * 3) / (
        timings["raster_tiles"] + timings["masks_fbc"])
    join_rows_per_sec = n_join_rows / max(timings["vector_tile_join"], 1e-9)
    ig.unpersist(); lg.unpersist(); grid.unpersist()

    # -- headline relational / pipeline queries at sf_dir -----------------
    qs = E.queries()
    headline = ["pricing_rollup", "score_rollup", "topk_per_group",
                "conf_cumsum", "broadcast_lookup", "semi_anti",
                "percentiles", "event_windows", "dedup_exact",
                "minhash_lsh", "simhash", "embedding_knn", "token_counts"]
    total = 0.0
    for name in headline:
        best = None
        for _ in range(trials):
            t0 = time.time()
            run_full(qs[name](spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        total += best

    out = {
        "metric": "tiles+masks_per_sec",
        "value": round(tiles_masks_per_sec, 2),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "extra": {
            "join_rows_per_sec": round(join_rows_per_sec, 2),
            "n_images": n_img, "n_tiles": n_tiles, "n_masks": n_masks,
            "n_label_tile_rows": n_join_rows, "n_labels": n_labels,
            "relational_total_sec": round(total, 3),
            "cpus": cpus,
            "trials": trials,
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
