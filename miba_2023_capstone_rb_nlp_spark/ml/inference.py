"""The distinct→infer→join rewrite (SURVEY §4's "most important
custom rewrite"; reference J4, word_wizard.py:410-426) plus sentiment
stages.

The reference deduped texts before sentiment inference and fanned the
result back out by POSITIONAL adjacency — fragile under any
parallelism. Here the fan-out is an exact equi-join on the text
value (order-independent, shuffle-safe), and the rewrite is a
reusable combinator around ANY expensive per-row function.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from miba_2023_capstone_rb_nlp_spark.functions.text import md5_long

if TYPE_CHECKING:
    import pandas as pd


def apply_on_distinct(
    df: DataFrame,
    in_col: str,
    fn: Callable[[DataFrame], DataFrame],
    out_cols: list[str],
) -> DataFrame:
    """Compute ``fn`` only on DISTINCT values of ``in_col``, then
    equi-join the results back (J4 rewrite).

    ``fn`` maps DataFrame[in_col] → DataFrame[in_col, *out_cols].
    Worth it whenever fn's per-row cost ≫ a shuffle of the distinct
    set (model inference, HTTP fetch, decode).
    """
    distinct = df.select(in_col).distinct()
    inferred = fn(distinct).select(in_col, *out_cols)
    return df.join(inferred, on=in_col, how="left")


def sentiment_stub(df: DataFrame, text_col: str, out_col: str = "sentiment") -> DataFrame:
    """Deterministic 3-class sentiment stand-in (class = md5 mod 3,
    stored as double — the reference stores float class ids,
    word_wizard.py:408). Engine-deterministic → oracle-checkable."""
    return df.withColumn(out_col, (md5_long(F.col(text_col)) % 3).cast("double"))


def sentiment_transformer(
    df: DataFrame,
    text_col: str,
    out_col: str = "sentiment",
    model_name: str = "Seethal/sentiment_analysis_generic_dataset",
) -> DataFrame:
    """Real-model sentiment (M7) as iterator mapInPandas; model loads
    once per executor. Raises at execution time without transformers
    (this container); combine with apply_on_distinct for the J4 plan.
    """
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, DoubleType(), True)]
    )

    def infer(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        try:
            import torch  # noqa: F401
            from transformers import (
                AutoModelForSequenceClassification,
                AutoTokenizer,
            )
        except ImportError as e:  # pragma: no cover - env without torch
            raise NotImplementedError(
                "sentiment_transformer requires torch/transformers; "
                "use sentiment_stub for a deterministic stand-in"
            ) from e
        tok = AutoTokenizer.from_pretrained(model_name)
        model = AutoModelForSequenceClassification.from_pretrained(model_name)
        model.eval()
        import torch

        for pdf in batches:
            with torch.no_grad():
                enc = tok(
                    pdf[text_col].tolist(),
                    truncation=True,
                    padding=True,
                    return_tensors="pt",
                )
                cls = model(**enc).logits.argmax(dim=1).tolist()
            pdf = pdf.copy()
            pdf[out_col] = [float(c) for c in cls]
            yield pdf

    return df.mapInPandas(infer, schema=out_schema)
