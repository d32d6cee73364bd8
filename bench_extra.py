#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1.4).

NOT the driver-timed bench (bench.py is frozen): this file exists to
- time each bench section in isolation with the noop sink,
- capture .explain("formatted") for every timed query
  (plans/r06/<name>_<suffix>.txt),
- label jobs so the timings are attributable.

Usage:
  python bench_extra.py [--queries a,b,c] [--trials 2]
                        [--explain-dir plans/r06] [--suffix before]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_full(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None,
                    help="comma list; default = all bench sections")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--skip-tiles", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as E
    from solaris_spark.operators import masks, tiling
    from solaris_spark.session import get_spark
    from solaris_spark.sources import synth

    spark = get_spark(app_name="solaris_spark_bench_extra", cores=cpus)
    sc = spark.sparkContext
    ncores = 32 if cpus in ("*",) else int(cpus)

    headline = ["pricing_rollup", "score_rollup", "topk_per_group",
                "conf_cumsum", "broadcast_lookup", "semi_anti",
                "percentiles", "event_windows", "dedup_exact",
                "minhash_lsh", "simhash", "embedding_knn", "token_counts"]
    tile_sections = ["raster_tiles", "vector_tile_join", "masks_fbc"]
    wanted = (args.queries.split(",") if args.queries
              else tile_sections + headline)

    qs = E.queries()
    timings: dict[str, list[float]] = {}
    explains: dict[str, str] = {}

    def timed(name, mk_df, action="noop"):
        if name not in wanted:
            return
        walls = []
        df = mk_df()
        explains[name] = df._sc is not None and df._jdf.queryExecution() \
            .explainString(spark._jvm.org.apache.spark.sql.execution
                           .ExplainMode.fromString("formatted"))
        for t in range(args.trials):
            sc.setJobDescription(f"{name} trial {t}")
            d = mk_df()
            t0 = time.time()
            if action == "count":
                d.count()
            else:
                run_full(d)
            walls.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        timings[name] = walls
        print(f"{name}: {walls}", flush=True)

    if not args.skip_tiles and any(s in wanted for s in tile_sections):
        n_images = int(os.environ.get("BENCH_IMAGES", "64"))
        images = synth.images_table(spark, n_images, include_fixture=True,
                                    min_px=512, max_px=1024)
        geo = synth.image_geo_table(spark, images)
        ig = tiling.with_geo(images, geo).repartition(ncores * 4,
                                                      "image_id").persist()
        ig.count()
        timed("raster_tiles",
              lambda: tiling.raster_tiles(ig, (90, 90)), action="count")
        labels = synth.labels_table(spark, images, min_labels=100,
                                    max_labels=250).persist()
        labels.count()
        lg = tiling.labels_geo(labels, geo).repartition(ncores * 4,
                                                        "image_id").persist()
        lg.count()
        grid = tiling.tile_grid(ig, (90, 90)).persist()
        grid.count()
        timed("vector_tile_join",
              lambda: tiling.vector_tiles(lg, grid), action="count")
        timed("masks_fbc",
              lambda: masks.image_masks(
                  labels, ig, channels=["footprint", "boundary", "contact"],
                  num_partitions=ncores * 4), action="count")
        ig.unpersist(); lg.unpersist(); grid.unpersist(); labels.unpersist()

    for name in headline:
        timed(name, lambda name=name: qs[name](spark, sf_dir))

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name, txt in explains.items():
            with open(f"{args.explain_dir}/{name}_{args.suffix}.txt", "w") as f:
                f.write(txt)

    out = {"timings": timings,
           "min": {k: min(v) for k, v in timings.items()},
           "load": list(os.getloadavg())}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
