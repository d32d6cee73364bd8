"""Dataset-manifest builder: image/label file matching → (image, label) CSV.

Re-expresses solaris/utils/data.py:8-160 (make_dataset_csv +
utils/core.py:138-152 get_files_recursively) Spark-first: the listing is a
driver-side directory walk (same as the reference — a manifest build is
metadata work), but the match-key extraction, the image⋈label join, and the
mismatch policy run as DataFrame operations, so a 10M-file manifest joins
distributed instead of in pandas."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def list_files(path: str, extension: str, recursive: bool = False) -> list[str]:
    """get_files_recursively parity (utils/core.py:138-152): non-recursive
    endswith(ext); recursive walks subdirs with lower().endswith(ext)."""
    if recursive:
        out = []
        for root, _dirs, files in os.walk(path):
            out += [os.path.join(root, f) for f in files
                    if f.lower().endswith(extension)]
        return out
    return [os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(extension)]


def make_dataset_manifest(spark: SparkSession, im_dir: str,
                          im_ext: str = "tif",
                          label_dir: str | None = None,
                          label_ext: str = "json",
                          stage: str = "train", match_re: str | None = None,
                          recursive: bool = False,
                          ignore_mismatch: str | None = None) -> DataFrame:
    """make_dataset_csv (utils/data.py:8-160) semantics:

    - ``stage='infer'`` → one `image` column, no labels required;
    - otherwise images join labels on a match key: either ``match_re``'s
      first capture group over the filename, or the filename sans extension;
    - a non-1:1 match raises unless ``ignore_mismatch='skip'`` (which drops
      every image whose key matches != 1 label).

    Returns a DataFrame with `image` (+ `label`) columns, sorted by image.
    """
    ims = spark.createDataFrame(
        [(p,) for p in list_files(im_dir, im_ext, recursive)], "image string")
    if stage == "infer":
        return ims.orderBy("image")
    if label_dir is None:
        raise ValueError("label_dir must be provided if stage is not infer.")
    labs = spark.createDataFrame(
        [(p,) for p in list_files(label_dir, label_ext, recursive)],
        "label string")

    def key(col):
        fname = F.element_at(F.split(col, "/"), -1)
        if match_re:
            return F.regexp_extract(fname, match_re, 1)
        # filename without its (last) extension
        return F.regexp_replace(fname, r"\.[^.]*$", "")

    ims = ims.withColumn("match_str", key(F.col("image")))
    labs = labs.withColumn("match_str", key(F.col("label")))
    joined = ims.join(labs, "match_str", "inner")

    # per-KEY multiplicity, not aggregate counts: with totals alone a
    # duplicate match and a missing match cancel out (2 images, one matching
    # two labels and one matching none → n_join == n_im) and a corrupt
    # manifest would pass silently
    lab_counts = labs.groupBy("match_str").agg(
        F.count(F.lit(1)).alias("_n"))
    per_key = ims.join(lab_counts, "match_str", "left") \
        .select("match_str", F.coalesce(F.col("_n"), F.lit(0)).alias("_n"))
    if ignore_mismatch is None:
        n_unmatched = per_key.filter(F.col("_n") == 0).count()
        if n_unmatched:
            raise ValueError(
                "There is not a perfect 1:1 match of images to label files "
                f"({n_unmatched} image(s) without a label). To allow this "
                "behavior, use ignore_mismatch='skip'.")
        n_dup = per_key.filter(F.col("_n") > 1).count()
        if n_dup:
            raise ValueError(
                "There are multiple label files matching at least one "
                f"image file ({n_dup} image(s) affected).")
    elif ignore_mismatch == "skip":
        joined = joined.join(
            lab_counts.filter(F.col("_n") == 1).select("match_str"),
            "match_str")
    return joined.select("image", "label").orderBy("image")


def write_dataset_csv(manifest: DataFrame, output_path: str) -> None:
    """Write the manifest as ONE csv file (the reference's dataset.csv
    artifact).  Driver-side streaming write — the manifest is metadata; the
    distributed form is the DataFrame itself (or .write.csv for sharded
    output at scale)."""
    cols = manifest.columns
    with open(output_path, "w") as fh:
        fh.write(",".join(cols) + "\n")
        for r in manifest.toLocalIterator():
            fh.write(",".join(str(r[c]) for c in cols) + "\n")
