"""Table layout + catalog conventions for the images/tiles/labels tables.

The north rule targets an Iceberg table of image+caption pairs at 10^12
rows.  This sandbox has no Iceberg runtime jar, so the engine uses an
Iceberg-COMPATIBLE physical layout on plain parquet and keeps its own
snapshot/lineage records (plans/lineage.py).  On a real cluster, add:

    spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.lake.type = glue | hive | hadoop
    spark.sql.extensions = org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions

and the writers below map 1:1 onto:

    CREATE TABLE lake.geo.images (
        image_id string, bytes binary, w int, h int, fmt string,
        caption string, phash bigint)
    USING iceberg
    PARTITIONED BY (bucket(4096, image_id))
    TBLPROPERTIES ('write.target-file-size-bytes'='536870912')

Layout rationale at 10^12 rows:
- images: bucket(image_id) — uniform, no hot partitions, co-locates the
  images⋈labels⋈geo joins when all three bucket identically (bucketed
  joins skip the shuffle entirely);
- tiles/label_tiles: partition by (cell_z prefix) — Z-order cell prefix
  gives spatial partition pruning for bbox queries (SELECT .. WHERE cell
  BETWEEN z0 AND z1 prunes files via min/max stats);
- lineage: tiny append-only log, partitioned by run_id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

IMAGES_BUCKETS = 64  # sandbox-sized; 4096 at cluster scale


def write_images(images: DataFrame, path: str, buckets: int = IMAGES_BUCKETS,
                 mode: str = "overwrite") -> None:
    """Bucket-equivalent layout on plain parquet: stable hash partition dirs
    (partition column = pmod(hash(image_id), buckets)) so re-runs land rows
    deterministically and readers can prune by bucket."""
    (images.withColumn("bucket", F.pmod(F.hash("image_id"), F.lit(buckets)))
     .write.mode(mode).partitionBy("bucket").parquet(path))


def read_images(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("bucket")


def write_tiles(tiles: DataFrame, path: str, cell_col: str = "tx",
                mode: str = "overwrite") -> None:
    """Tiles partitioned by a coarse spatial prefix for partition pruning."""
    (tiles.withColumn("cell_prefix",
                      (F.col("tx").cast("long") * 73856093
                       + F.col("ty").cast("long") * 19349663) % 256)
     .write.mode(mode).partitionBy("cell_prefix").parquet(path))


def register_views(spark: SparkSession, base_dir: str, tables=None) -> None:
    """Register the engine tables as temp views for spark.sql queries."""
    import os
    tables = tables or ["images", "image_geo", "labels", "tiles",
                        "label_tiles", "lineage"]
    for t in tables:
        p = os.path.join(base_dir, t)
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)
