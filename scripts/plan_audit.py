#!/usr/bin/env python
"""Plan audit: captures the physical plans of the headline operators and
asserts the 100 TB-shape properties (predicate pushdown into the parquet
scan, broadcast joins for dims, single Arrow UDF evaluation, no
CartesianProduct outside the documented brute-force baseline).

Writes BENCH/PLANS.md.  Run: python scripts/plan_audit.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from solaris_spark.operators import tiling
    from solaris_spark.session import get_spark
    from solaris_spark.sources import synth

    spark = get_spark(app_name="plan_audit", cores=4, shuffle_partitions=8)
    qs = E.queries()
    sections = []
    checks = []

    def audit(name, df, expect=(), forbid=(), count=()):
        plan = df._jdf.queryExecution().executedPlan().toString()
        ok = True
        notes = []
        for pat in expect:
            hit = pat in plan
            ok &= hit
            notes.append(f"{'✓' if hit else '✗ MISSING'} expects `{pat}`")
        for pat in forbid:
            hit = pat in plan
            ok &= not hit
            notes.append(f"{'✓ absent' if not hit else '✗ PRESENT'} forbids `{pat}`")
        for pat, n in count:
            c = plan.count(pat)
            good = c == n
            ok &= good
            notes.append(f"{'✓' if good else '✗'} `{pat}` x{c} (want {n})")
        checks.append((name, ok))
        head = "\n".join(ln for ln in plan.splitlines()
                         if any(k in ln for k in
                                ("Scan", "Exchange", "Broadcast", "ArrowEval",
                                 "PushedFilters", "Cartesian", "SortMerge",
                                 "FlatMapGroupsInPandas", "MapInPandas")))
        sections.append(f"## {name} — {'PASS' if ok else 'FAIL'}\n\n"
                        + "\n".join(f"- {n}" for n in notes)
                        + f"\n\n```\n{head[:4000]}\n```\n")

    # 1. pricing_rollup: filter must reach the parquet scan
    audit("pricing_rollup (pushdown)", qs["pricing_rollup"](spark, sf_dir),
          expect=("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate",),
          forbid=("CartesianProduct",))

    # 2. broadcast_lookup: dim side must broadcast
    audit("broadcast_lookup (broadcast join)",
          qs["broadcast_lookup"](spark, sf_dir),
          expect=("BroadcastHashJoin",), forbid=("CartesianProduct",))

    # 3. vector_tiles: exactly ONE clip evaluation, no cartesian
    images = synth.fixture_image_df(spark)
    geo = synth.image_geo_table(spark, images)
    ig = tiling.with_geo(images, geo)
    grid = tiling.tile_grid(ig, (90, 90))
    lab = spark.createDataFrame(
        [(synth.FIXTURE_IMAGE_ID, 0,
          "POLYGON ((733610 3725100, 733640 3725100, 733640 3725130, "
          "733610 3725130, 733610 3725100))")],
        "image_id string, label_id int, wkt_geo string")
    audit("vector_tiles (single clip eval)",
          tiling.vector_tiles(lab, grid),
          forbid=("CartesianProduct",),
          count=(("clip(", 1),))

    # 4. minhash_lsh: equi-join on buckets, one md5 per shingle family
    audit("minhash_lsh (bucket equi-join)", qs["minhash_lsh"](spark, sf_dir),
          forbid=("CartesianProduct",))

    # 5. dedup_exact: single hash aggregate, no join at all
    audit("dedup_exact (single agg)", qs["dedup_exact"](spark, sf_dir),
          forbid=("Join", "CartesianProduct"))

    # 6. knn_join: cell equi-join, no cartesian.  Audited in SINGLE-PASS
    # mode (adaptive=False): adaptive mode localCheckpoints eagerly, so
    # its executedPlan is just 'Scan ExistingRDD' and auditing it would be
    # vacuous — the single-pass plan contains the same _knn_pass join
    # shape every adaptive ring runs.
    from solaris_spark.operators import joins as J
    pts = spark.range(500).selectExpr(
        "id as qid", "cast(id % 37 as double) as x",
        "cast(id % 53 as double) as y")
    tgt = spark.range(500).selectExpr(
        "id as tid", "cast(id % 41 as double) as x",
        "cast(id % 59 as double) as y")
    audit("knn_join single-pass (cell equi-join)",
          J.knn_join(pts, tgt, k=3, cell_size=8.0, adaptive=False),
          expect=("Join",), forbid=("CartesianProduct",))

    # 7. SRP embedding sketch: plan size must be independent of embedding
    # dim (the hyperplanes ride a broadcast consumed by one pandas UDF —
    # NOT n_planes × dim SQL literal arrays; VERDICT r02 #3)
    import pyspark.sql.functions as F

    from solaris_spark.operators import dedup

    def srp_plan_len(dim):
        df = spark.range(64).select(
            F.col("id").alias("vec_id"),
            F.expr(f"transform(sequence(1, {dim}), "
                   "i -> cast(id * i % 97 as double))").alias("embedding"))
        q = dedup.embedding_near_dup_pairs(df)
        return len(q._jdf.queryExecution().executedPlan().toString())

    l16, l768 = srp_plan_len(16), srp_plan_len(768)
    srp_ok = l768 <= int(l16 * 1.5)
    checks.append(("srp_sketch plan size dim-independent", srp_ok))
    sections.append(
        f"## srp_sketch plan size — {'PASS' if srp_ok else 'FAIL'}\n\n"
        f"- executedPlan chars at dim=16: {l16}; at dim=768: {l768} "
        f"(bound: ≤1.5×) — hyperplanes are a broadcast, not literals\n")

    # 8. NO unpartitioned window anywhere: an unpartitioned WindowExec
    # moves the whole input through ONE task.  Detector: inside every
    # windowspecdefinition(...), the arguments before the first ordering
    # spec (" ASC NULLS"/" DESC NULLS") are the partition columns — if the
    # FIRST top-level argument is already an ordering spec, the window has
    # no partition key.  Applied to the prefix-sum query, the road-graph
    # node-id assignment, and the challenges CSV loader (the three places
    # r4's audit missed).
    def unpartitioned_windows(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        bad = []
        i = 0
        while True:
            i = plan.find("windowspecdefinition(", i)
            if i < 0:
                break
            j = i + len("windowspecdefinition(")
            depth, start = 1, j
            while depth and j < len(plan):
                depth += {"(": 1, ")": -1}.get(plan[j], 0)
                j += 1
            args = plan[start: j - 1]
            # first top-level comma-separated argument
            d = 0
            first = args
            for k, ch in enumerate(args):
                if ch in "([":
                    d += 1
                elif ch in ")]":
                    d -= 1
                elif ch == "," and d == 0:
                    first = args[:k]
                    break
            if " ASC NULLS" in first or " DESC NULLS" in first:
                bad.append(args[:120])
            i = j
        return bad

    def audit_windows(name, df):
        bad = unpartitioned_windows(df)
        ok = not bad
        checks.append((f"{name} windows all partitioned", ok))
        sections.append(
            f"## {name} window partitioning — {'PASS' if ok else 'FAIL'}\n\n"
            "- every windowspecdefinition carries a partition key "
            "(no single-partition WindowExec)\n"
            + ("".join(f"- ✗ windowspecdefinition({ln})\n" for ln in bad)))

    audit_windows("conf_cumsum", qs["conf_cumsum"](spark, sf_dir))

    from solaris_spark.operators import challenges, graph as graphops
    roads = spark.createDataFrame(
        [(1, "LINESTRING (0 0, 3 4, 6 8)"),
         (2, "LINESTRING (6 8, 10 8, 10 12)")], "road_id long, wkt string")
    g_nodes, g_edges = graphops.build_graph(roads)
    audit_windows("road_graph nodes", g_nodes)
    audit_windows("road_graph edges", g_edges)

    ref_data = "/root/reference/solaris/data"
    if os.path.isdir(ref_data):
        per_bin, per_image = challenges.spacenet_buildings_eval(
            spark, f"{ref_data}/SN2_sample_preds.csv",
            f"{ref_data}/SN2_sample_truth.csv")
        audit_windows("spacenet_eval per_image", per_image)
        audit_windows("spacenet_eval per_bin", per_bin)

    md = ["# BENCH/PLANS — physical-plan audit of headline operators\n",
          "Auto-generated by scripts/plan_audit.py — asserts the plan",
          "properties that matter at 100 TB: filters pushed into the scan,",
          "dim joins broadcast, Arrow UDFs evaluated once, no accidental",
          "cartesian products (the only crossJoin in the engine is the",
          "documented ANN brute-force baseline).\n"]
    md += [f"- {'PASS' if ok else 'FAIL'}: {name}" for name, ok in checks]
    md.append("")
    md += sections
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/PLANS.md", "w") as f:
        f.write("\n".join(md))
    bad = [n for n, ok in checks if not ok]
    print("FAIL:" if bad else "ALL PASS;", bad if bad else len(checks),
          "checks -> BENCH/PLANS.md")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
