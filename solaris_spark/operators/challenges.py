"""SpaceNet challenge scoring helpers: chip-id extraction + off-nadir bins.

Re-expresses solaris/eval/challenges.py:
- get_chip_id (:299-331) as pure column expressions per challenge;
- the SpaceNet-4 off-nadir imageID → nadir-category mapping (:144-177,
  the public Atlanta catalog-id table) as a broadcast lookup join;
- eval_off_nadir's per-bin rollup (:256-284) via the existing
  evalops.aoi_rollup (sum counts, recompute P/R/F1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# public SpaceNet-4 Atlanta collect ids → nadir bin (challenges.py:144-177)
OFF_NADIR_BINS = {
    **{f"Atlanta_nadir{n}_catid_{c}": "Nadir" for n, c in [
        (7, "1030010003D22F00"), (8, "10300100023BC100"),
        (10, "1030010003993E00"), (10, "1030010003CAF100"),
        (13, "1030010002B7D800"), (14, "10300100039AB000"),
        (16, "1030010002649200"), (19, "1030010003C92000"),
        (21, "1030010003127500"), (23, "103001000352C200"),
        (25, "103001000307D800")]},
    **{f"Atlanta_nadir{n}_catid_{c}": "Off-Nadir" for n, c in [
        (27, "1030010003472200"), (29, "1030010003315300"),
        (30, "10300100036D5200"), (32, "103001000392F600"),
        (34, "1030010003697400"), (36, "1030010003895500"),
        (39, "1030010003832800")]},
    **{f"Atlanta_nadir{n}_catid_{c}": "Very-Off-Nadir" for n, c in [
        (42, "10300100035D1B00"), (44, "1030010003CCD700"),
        (46, "1030010003713C00"), (47, "10300100033C5200"),
        (49, "1030010003492700"), (50, "10300100039E6200"),
        (52, "1030010003BDDC00"), (53, "1030010003193D00"),
        (53, "1030010003CD4300")]},
}

_NADIR_RE = r"(Atlanta_nadir[0-9]{1,2}_catid_[0-9A-Z]{16})"


def chip_id_col(image_col, challenge: str = "spacenet_2"):
    """Column expression: unique chip-location id from a SpaceNet image
    name (get_chip_id, challenges.py:299-331)."""
    c = F.col(image_col) if isinstance(image_col, str) else image_col
    if challenge in ("spacenet_2", "spacenet_3"):
        # '_'.join(name.split('_')[:-1])
        parts = F.split(c, "_")
        return F.array_join(F.slice(parts, 1, F.size(parts) - 1), "_")
    if challenge == "spacenet_off_nadir":
        return F.regexp_extract(c, _NADIR_RE, 1)
    if challenge == "spacenet_6":
        # '_'.join(name.split('_')[-4:]).split('.')[0]
        parts = F.split(c, "_")
        joined = F.array_join(
            F.slice(parts, F.size(parts) - 3, F.lit(4)), "_")
        return F.split(joined, r"\.")[0]
    raise ValueError(f"unknown challenge {challenge!r}")


def spacenet_buildings_eval(spark, prop_csv: str, truth_csv: str,
                            miniou: float = 0.5, min_area: float = 20,
                            challenge: str = "spacenet_2"
                            ) -> tuple[DataFrame, DataFrame]:
    """SpaceNet buildings competition scoring from proposal/truth CSVs —
    spacenet_buildings_2 / off_nadir_buildings (challenges.py:8-109,
    183-254): per-image greedy IoU eval, AOI/nadir-bin rollup with P/R/F1
    recomputed from summed counts.  Returns (per_bin_df, per_image_df)."""
    from . import evalops

    def load(path, with_conf):
        df = (spark.read.option("header", True).option("quote", '"')
              .option("escape", '"').csv(path))
        # row_id encodes CSV row order (the reference's per-building
        # index).  monotonically_increasing_id is partition-ordered —
        # splits of ONE file come out in offset order — so it preserves
        # the CSV row order as a SORT KEY without funnelling the load
        # through a single-partition window.  Downstream (greedy match
        # tie-break, per-row identity) only compares row_ids, never
        # requires them dense, so the sparse ids are equivalent.
        # API contract (ADVICE r5): the offset-order guarantee does NOT
        # hold across MULTIPLE files (Spark bin-packs splits by size), so
        # the input must resolve to a single CSV — asserted here rather
        # than silently changing reference tie-break order.
        files = df.inputFiles()
        if len(files) != 1:
            raise ValueError(
                f"challenge CSV loader requires a single file for "
                f"row-order-stable ids; {path!r} resolved to "
                f"{len(files)} files")
        cols = [F.col("ImageId").alias("image_id"),
                F.monotonically_increasing_id().alias("row_id"),
                F.col("PolygonWKT_Pix").alias("wkt")]
        if with_conf:
            cols.append(F.col("Confidence").cast("double").alias("conf"))
        return df.select(*cols)

    gt = load(truth_csv, with_conf=False)
    pred = load(prop_csv, with_conf=True)
    # the reference iterates TRUTH imageIDs (base.py eval_iou_spacenet_csv):
    # proposals for images absent from truth are ignored
    pred = pred.join(gt.select("image_id").distinct(), "image_id",
                     "left_semi")
    match = evalops.greedy_iou_match(gt, pred, miniou=miniou,
                                     min_area=min_area)
    per_image = evalops.image_scores(match, miniou=miniou)
    # every truth imageID gets a row, all-zero when nothing survives the
    # area filters (the reference's empty-image convention — e.g. a chip
    # whose truth rows are all POLYGON EMPTY scores 0/0/0)
    per_image = (gt.select("image_id").distinct()
                 .join(per_image, "image_id", "left")
                 .na.fill(0))
    bin_col = (chip_id_col("image_id", challenge)
               if challenge != "spacenet_off_nadir" else None)
    if challenge == "spacenet_off_nadir":
        per_image_b = with_nadir_bin(per_image).withColumnRenamed(
            "nadir_category", "AOI")
    else:
        per_image_b = per_image.withColumn("AOI", bin_col)
    per_bin = evalops.aoi_rollup(per_image_b, aoi_col="AOI")
    return per_bin, per_image


def with_nadir_bin(scores: DataFrame, image_col: str = "image_id",
                   image_columns: dict[str, str] | None = None,
                   strict: bool = True) -> DataFrame:
    """Attach `nadir_category` to per-image score rows via the broadcast
    chip-id → bin lookup (the SpaceNet-4 default table unless overridden).
    Compose with evalops.aoi_rollup(df, 'nadir_category') for the per-bin
    score rollup (challenges.py:256-284).

    strict (default): raise if any imageID fails the chip-id regex or maps
    to no catalog bin — the reference's dict lookup KeyErrors on unknown
    ids, and a silent NULL bin would exclude those rows from every real
    bin's score.  strict=False keeps the unmatched rows with
    nadir_category NULL."""
    spark = scores.sparkSession
    mapping = image_columns or OFF_NADIR_BINS
    lut = spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], "chip_id string, nadir_category string")
    s = scores.withColumn(
        "chip_id", chip_id_col(image_col, "spacenet_off_nadir"))
    out = s.join(F.broadcast(lut), "chip_id", "left")
    if strict:
        bad = out.filter(F.col("nadir_category").isNull()) \
            .select(image_col).limit(5).collect()
        if bad:
            names = [r[image_col] for r in bad]
            raise ValueError(
                f"imageIDs with no nadir-bin mapping (first 5): {names}; "
                "pass image_columns with their chips or strict=False")
    return out
