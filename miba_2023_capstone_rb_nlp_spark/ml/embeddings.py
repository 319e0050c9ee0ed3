"""Embedding stages (SURVEY M1/M2).

Two paths:
1. ``hash_embeddings`` — deterministic feature-hashing stand-in
   (signed bucket counts, L2-normalized). Pure relational (explode +
   groupBy), engine-deterministic → used by correctness gates, and
   genuinely useful as a cheap featurizer at 100 TB.
2. ``transformer_embeddings`` — iterator-style ``mapInPandas`` so the
   model loads ONCE per executor (vs the reference's per-row loop,
   word_wizard.py:191); Arrow-batched. Gated behind import-try: this
   container has no torch/sentence-transformers, so the UDF raises a
   clear error at *execution* time while the plan/schema plumbing
   stays testable.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

from miba_2023_capstone_rb_nlp_spark.functions.numeric import fixed
from miba_2023_capstone_rb_nlp_spark.functions.text import md5_long, tokens

if TYPE_CHECKING:
    import pandas as pd


def hash_embeddings(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 8,
    scale: int = 6,
    out_col: str = "hash_embedding",
    salt: str = "",
) -> DataFrame:
    """Signed feature-hashing embedding: bucket = h mod dim, sign from
    bit 10 of h; vector = per-bucket signed counts, L2-normalized and
    quantized.

    One explode + one groupBy(id) with dim partial-agg sums — scales
    like a word count. Oracle mirror: same arithmetic in SQL.
    ``salt`` prefixes every token hash — distinct salts are distinct
    deterministic models (the wizard's M1-vs-M2 stand-in pair); the
    default "" keeps md5(token) exactly, so every existing oracle is
    untouched.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t"))
    hv = md5_long(F.concat(F.lit(salt), F.col("t"))) if salt else md5_long(F.col("t"))
    h = tok.withColumn("hv", hv)
    signed = h.withColumn("bucket", (F.col("hv") % dim).cast("int")).withColumn(
        "sign",
        F.when(F.shiftright("hv", 10).bitwiseAND(1) == 1, F.lit(1)).otherwise(-1),
    )
    sums = signed.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("bucket") == d, F.col("sign")).otherwise(0)).alias(
                f"s{d}"
            )
            for d in range(dim)
        ]
    )
    norm_sq = None
    for d in range(dim):
        term = F.col(f"s{d}").cast("double") * F.col(f"s{d}")
        norm_sq = term if norm_sq is None else norm_sq + term
    normed = sums.withColumn("_n", F.sqrt(norm_sq))
    vec = F.array(
        *[
            F.when(F.col("_n") > 0, fixed(F.col(f"s{d}") / F.col("_n"), scale))
            .otherwise(F.lit(0.0))
            for d in range(dim)
        ]
    )
    out = normed.select(F.col(id_col), vec.alias(out_col))
    return df.join(out, id_col, "inner")


def _default_st_loader(model_name: str):
    """Gated sentence-transformers import; returns an object with
    ``.encode(texts, batch_size=..., convert_to_numpy=True)``."""
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError as e:  # pragma: no cover - env without torch
        raise NotImplementedError(
            "transformer_embeddings requires sentence-transformers; "
            "use hash_embeddings for a deterministic stand-in"
        ) from e
    return SentenceTransformer(model_name)


def transformer_embeddings(
    df: DataFrame,
    text_col: str,
    out_col: str = "sentence_embedding",
    model_name: str = "all-MiniLM-L6-v2",
    dim: int = 384,
    batch_size: int = 64,
    model_loader=None,
) -> DataFrame:
    """Real sentence-transformer path (M2). mapInPandas iterator form:
    the model is loaded once per executor process (``model_loader``
    runs inside the UDF, before the batch loop) and reused across
    Arrow batches; weights come from the local HF cache.

    The default loader raises at execution time if
    sentence-transformers isn't installed (this test container); tests
    exercise the identical plan/schema/batching plumbing by injecting
    a fake loader.
    """
    loader = model_loader or _default_st_loader
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(FloatType()), True)]
    )

    def infer(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        model = loader(model_name)  # once per executor
        for pdf in batches:
            vecs = model.encode(
                pdf[text_col].tolist(), batch_size=batch_size, convert_to_numpy=True
            )
            pdf = pdf.copy()
            pdf[out_col] = [v.astype("float32").tolist() for v in vecs]
            yield pdf

    return df.mapInPandas(infer, schema=out_schema)
