"""Structured Streaming ingest test: availableNow drain with exactly-once
file tracking via the checkpoint."""

import os

import numpy as np
import pytest

from solaris_spark.streaming import ingest


class TestIngest:
    def test_available_now_exactly_once(self, spark, tmp_path):
        src = tmp_path / "landing"
        src.mkdir()
        rng = np.random.default_rng(4)
        for i in range(3):
            w, h = 8, 6
            px = rng.integers(0, 255, size=(3, h, w), dtype=np.uint8)
            (src / f"img{i:03d}__{w}x{h}__raw-u8-c3.bin").write_bytes(px.tobytes())

        table = str(tmp_path / "images")
        ckpt = str(tmp_path / "ckpt")
        stream = ingest.with_phash(
            ingest.stream_images_from_files(spark, str(src)))
        ingest.ingest_available_now(stream, table, ckpt)
        out = spark.read.parquet(table)
        rows = {r["image_id"]: r for r in out.collect()}
        assert set(rows) == {"img000", "img001", "img002"}
        assert all(r["w"] == 8 and r["h"] == 6 and r["phash"] is not None
                   for r in rows.values())

        # second drain: no new files → no new rows (checkpoint dedup)
        stream2 = ingest.with_phash(
            ingest.stream_images_from_files(spark, str(src)))
        ingest.ingest_available_now(stream2, table, ckpt)
        assert spark.read.parquet(table).count() == 3

        # new file arrives → only it is ingested
        px = rng.integers(0, 255, size=(3, 6, 8), dtype=np.uint8)
        (src / "img003__8x6__raw-u8-c3.bin").write_bytes(px.tobytes())
        stream3 = ingest.with_phash(
            ingest.stream_images_from_files(spark, str(src)))
        ingest.ingest_available_now(stream3, table, ckpt)
        assert spark.read.parquet(table).count() == 4
