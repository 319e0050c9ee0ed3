"""Multimodal suite: binary-column plumbing with the deterministic
fake decoder (multimodal/media.py) — schema, Arrow batch shape, and
feature math are the real 100 TB path; only the codec line is a stub.

The media table is fabricated from ``documents`` (text bytes as the
opaque binary payload) identically in both engines, so the md5-derived
feature vector is oracle-checkable end to end: every intermediate is
integer-exact until the final unit-normalization, which both engines
perform in the same textual order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark import catalog
from miba_2023_capstone_rb_nlp_spark.multimodal.media import (
    FEATURE_DIM,
    extract_features,
)
from miba_2023_capstone_rb_nlp_spark.suite import register


def _sql_feature_terms() -> tuple[str, str]:
    """(norm_expr, select_exprs) mirroring multimodal._fake_decode:
    r_i = int16(md5_digest[2i:2i+2]) - 32768 (big-endian) — recovered
    from the hex string; norm = sqrt(Σ r_i²) (integer-exact sum)."""
    rs = [
        f"(CAST(('0x' || substr(h, {4 * i + 1}, 4)) AS BIGINT) - 32768)"
        for i in range(FEATURE_DIM)
    ]
    norm = "sqrt(" + " + ".join(f"{r}*{r}" for r in rs) + ")"
    return norm, rs


_NORM, _RS = _sql_feature_terms()

_MEDIA_ORACLE = f"""
WITH m AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS h
  FROM documents
),
f AS (
  SELECT media_id, kind, n_bytes,
         CASE WHEN {_NORM} = 0 THEN 1.0 ELSE {_NORM} END AS nrm,
         {_RS[0]} AS r0, {_RS[1]} AS r1
  FROM m
)
SELECT media_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(r0 AS DOUBLE) / nrm AS f0,
       CAST(r1 AS DOUBLE) / nrm AS f1
FROM f
"""


@register("media_features", oracle=_MEDIA_ORACLE)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fabricate media rows (binary payload = utf-8 text bytes) →
    mapInPandas decode-stub → feature columns."""
    docs = catalog.cpu_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
    )
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.col("features").getItem(0).alias("f0"),
        F.col("features").getItem(1).alias("f1"),
    )


_FRAMES_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(1 + (doc_id % 240) AS INT) AS n_frames
  FROM documents
  WHERE CAST(doc_id % 3 AS INT) = 2
),
f AS (
  SELECT media_id, n_frames,
         unnest(range(0, greatest(n_frames - 1, 0) + 1, 10)) AS frame_index
  FROM m
)
SELECT media_id,
       CAST(row_number() OVER (PARTITION BY media_id ORDER BY frame_index)
            - 1 AS INT) AS sample_pos,
       CAST(frame_index AS INT) AS frame_index
FROM f
"""


@register("video_frame_sample", oracle=_FRAMES_ORACLE)
def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling BEFORE decode (posexplode of a stepped index
    sequence): only 1/every_n frames ever reach a decoder — the core
    cost lever for video at 100 TB. Fabricated n_frames metadata is
    identical in both engines."""
    from miba_2023_capstone_rb_nlp_spark.multimodal.media import sample_frames

    docs = catalog.cpu_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.lit(1) + (F.col("doc_id") % 240)).cast("int").alias("n_frames"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )
    return sample_frames(media, every_n=10).select(
        "media_id", "sample_pos", "frame_index"
    )
