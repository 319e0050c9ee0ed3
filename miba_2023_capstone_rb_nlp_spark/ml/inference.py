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
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

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


def _default_sentiment_loader(model_name: str) -> Callable[[list[str]], list[float]]:
    """Gated import + model build; returns texts → class ids. Swapped
    out by tests (and by callers with a custom model) via the
    ``model_loader`` parameter of :func:`sentiment_transformer`."""
    try:
        import torch
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

    def classify(texts: list[str]) -> list[float]:
        with torch.no_grad():
            enc = tok(texts, truncation=True, padding=True, return_tensors="pt")
            return [float(c) for c in model(**enc).logits.argmax(dim=1).tolist()]

    return classify


def sentiment_transformer(
    df: DataFrame,
    text_col: str,
    out_col: str = "sentiment",
    model_name: str = "Seethal/sentiment_analysis_generic_dataset",
    model_loader: Callable[[str], Callable[[list[str]], list[float]]] | None = None,
) -> DataFrame:
    """Real-model sentiment (M7) as iterator mapInPandas; the model
    loads once per executor (``model_loader(model_name)`` inside the
    UDF, before the batch loop). Default loader raises at execution
    time without transformers (this container); tests inject a fake
    loader through the identical plumbing. Combine with
    apply_on_distinct for the J4 plan.
    """
    loader = model_loader or _default_sentiment_loader
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, DoubleType(), True)]
    )

    def infer(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        classify = loader(model_name)  # once per executor
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = classify(pdf[text_col].tolist())
            yield pdf

    return df.mapInPandas(infer, schema=out_schema)


def _default_ner_loader(model_name: str) -> Callable[[list[str]], list[list[str]]]:
    """Gated spaCy pipeline (reference ``word_wizard.py:430-511``):
    texts → per-text list of ORG entity strings."""
    try:
        import spacy
    except ImportError as e:  # pragma: no cover - env without spacy
        raise NotImplementedError(
            "ner_transformer requires spacy; use the gazetteer "
            "extractor (operators.ner.gazetteer_entities) instead"
        ) from e
    nlp = spacy.load(model_name)

    def extract(texts: list[str]) -> list[list[str]]:
        return [
            [ent.text for ent in doc.ents if ent.label_ == "ORG"]
            for doc in nlp.pipe(texts)
        ]

    return extract


def ner_transformer(
    df: DataFrame,
    text_col: str,
    out_col: str = "entities",
    model_name: str = "en_core_web_sm",
    model_loader: Callable[[str], Callable[[list[str]], list[list[str]]]] | None = None,
) -> DataFrame:
    """Model-path entity extraction (M8, reference word_wizard.py:
    430-511): adds ``out_col`` array<string> of ORG mentions per row
    via iterator mapInPandas (model loads once per executor).

    Drop-in replacement for the gazetteer expression: run this first,
    then pass ``extractor=lambda c: F.col(out_col)`` to
    ``operators.ner.weighted_top_entities`` — the downstream weighted
    aggregation plan is unchanged (pinned by tests/test_plans.py).
    """
    loader = model_loader or _default_ner_loader
    out_schema = StructType(
        df.schema.fields
        + [StructField(out_col, ArrayType(StringType()), True)]
    )

    def infer(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        extract = loader(model_name)  # once per executor
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = extract(pdf[text_col].tolist())
            yield pdf

    return df.mapInPandas(infer, schema=out_schema)
