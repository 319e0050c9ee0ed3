"""Medoid summarization (SURVEY M6): filter medoid rows (tiny), run
the summarizer only there, join back — computation narrowing per the
reference (word_wizard.py:348) made explicit in the plan.

Stand-in summarizer = head-truncation (deterministic, oracle-able);
real BART path gated behind transformers availability.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from miba_2023_capstone_rb_nlp_spark.functions.text import tokens

if TYPE_CHECKING:
    import pandas as pd


def summarize_medoids_stub(
    df: DataFrame,
    text_col: str,
    id_col: str,
    medoid_col: str = "is_medoid",
    out_col: str = "summary",
    n_tokens: int = 12,
) -> DataFrame:
    """Deterministic extractive stand-in: first n tokens of each
    medoid row; non-medoid rows get NULL (reference stores summaries
    only on medoid rows, word_wizard.py:346-359).

    The summary is a conditional COLUMN EXPRESSION, not the
    filter→compute→join-back shape the transformer path uses: that
    narrowing exists to bound model inference to the tiny medoid set,
    but for a token-slice expression the join-back DOUBLES the whole
    upstream plan (both join inputs re-derive the medoid window) and
    adds a per-row shuffle to reattach rows the expression could have
    produced in place — measured 2× the entry cost at sf0.1 and a
    full extra exchange of the corpus at any scale. ``when`` already
    evaluates the slice only on medoid rows, so the computation
    narrowing the reference documents is preserved row-wise.
    ``id_col`` stays in the signature: the lean/full paths are
    call-compatible (wizard.py switches on one flag)."""
    del id_col  # inline expression needs no join-back key
    return df.withColumn(
        out_col,
        F.when(
            F.col(medoid_col),
            F.concat_ws(" ", F.slice(tokens(F.col(text_col)), 1, n_tokens)),
        ),
    )


def _default_bart_loader(model_name: str):
    """Gated transformers import; returns a summarization pipeline
    callable: texts → [{'summary_text': ...}, ...]."""
    try:
        from transformers import pipeline
    except ImportError as e:  # pragma: no cover - env without torch
        raise NotImplementedError(
            "summarize_medoids_transformer requires transformers; "
            "use summarize_medoids_stub"
        ) from e
    return pipeline("summarization", model=model_name)


def summarize_medoids_transformer(
    df: DataFrame,
    text_col: str,
    id_col: str,
    medoid_col: str = "is_medoid",
    out_col: str = "summary",
    model_name: str = "facebook/bart-large-cnn",
    model_loader=None,
) -> DataFrame:
    """Real abstractive path (gated): mapInPandas over ONLY the medoid
    rows (a few rows per cluster), then broadcast-join back. The model
    loads once per executor via ``model_loader(model_name)``; tests
    inject a fake loader through the same plumbing."""
    loader = model_loader or _default_bart_loader
    medoids = df.filter(F.col(medoid_col)).select(id_col, text_col)
    out_schema = StructType(
        [medoids.schema[id_col], StructField(out_col, StringType(), True)]
    )

    def infer(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        summarizer = loader(model_name)  # once per executor
        for pdf in batches:
            outs = summarizer(pdf[text_col].tolist(), truncation=True)
            yield pdf[[id_col]].assign(**{out_col: [o["summary_text"] for o in outs]})

    summaries = medoids.mapInPandas(infer, schema=out_schema)
    return df.join(F.broadcast(summaries), id_col, "left")
