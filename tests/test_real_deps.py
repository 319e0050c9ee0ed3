"""Optional-dependency smoke lane (VERDICT r6 next-round #3, r5 #9).

Every gated real-model path in the package is exercised here when its
dependency is importable, and cleanly SKIPPED when it isn't — so the
gated code stops being executed-never without making this container's
suite red. On a deps-present box run:

    python -m pytest tests/test_real_deps.py -v

Tests that would download multi-GB weights additionally require
SPARK_GRAFT_REAL_HEAVY=1 (documented per test) so a deps-present CI
box can still run the cheap lane by default. The fake-loader twins in
tests/test_ml_plumbing.py pin the identical plan/schema/batching
plumbing in every environment; THIS module proves the real loaders
drive that plumbing end-to-end.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

HEAVY = os.environ.get("SPARK_GRAFT_REAL_HEAVY") == "1"


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffles the join keys across the cluster"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "berlin and paris announced a joint research effort"),
        ],
        "doc_id bigint, text string",
    )


def _vectors(spark, n=40, dim=8):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.gauss(1.0 if i % 2 else -1.0, 0.3) for _ in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_real_sentence_transformer_embeddings(spark):
    """M2's real path: sentence-transformers through the SAME iterator
    mapInPandas plumbing the hash stand-in uses."""
    pytest.importorskip("sentence_transformers")
    from miba_2023_capstone_rb_nlp_spark.ml.embeddings import (
        transformer_embeddings,
    )

    out = transformer_embeddings(
        _docs(spark), "text", model_name="all-MiniLM-L6-v2"
    )
    rows = out.collect()
    assert len(rows) == 3
    vecs = {r["doc_id"]: r["sentence_embedding"] for r in rows}
    assert all(len(v) == 384 for v in vecs.values())
    # real embeddings are normalized-ish and content-dependent
    assert vecs[1] != vecs[2]


def test_real_sentiment_transformer(spark):
    """M7's real path (torch+transformers classify) through
    apply_on_distinct's distinct→infer→join rewrite."""
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    if not HEAVY:
        pytest.skip("set SPARK_GRAFT_REAL_HEAVY=1 to download weights")
    from miba_2023_capstone_rb_nlp_spark.ml.inference import (
        apply_on_distinct,
        sentiment_transformer,
    )

    out = apply_on_distinct(
        _docs(spark), "text", lambda d: sentiment_transformer(d, "text")
    )
    rows = out.collect()
    assert len(rows) == 3
    assert all(r["sentiment"] is not None for r in rows)


def test_real_spacy_ner(spark):
    """M8's real path: spaCy NER through the scatter→broadcast-join
    shape (gazetteer stand-in's twin)."""
    spacy = pytest.importorskip("spacy")
    try:
        spacy.load("en_core_web_sm")
    except OSError:
        pytest.skip("spacy model en_core_web_sm not downloaded")
    from miba_2023_capstone_rb_nlp_spark.ml.inference import ner_transformer

    out = ner_transformer(_docs(spark), "text", model_name="en_core_web_sm")
    rows = {r["doc_id"]: r["entities"] for r in out.collect()}
    assert len(rows) == 3
    assert all(r is not None for r in rows.values())


def test_real_bart_summaries(spark):
    """M6's real path: BART over ONLY medoid rows, joined back."""
    pytest.importorskip("transformers")
    if not HEAVY:
        pytest.skip("set SPARK_GRAFT_REAL_HEAVY=1 to download BART")
    from miba_2023_capstone_rb_nlp_spark.ml.summarize import (
        summarize_medoids_transformer,
    )

    df = _docs(spark).withColumn("is_medoid", F.col("doc_id") == 1)
    out = summarize_medoids_transformer(df, "text", "doc_id")
    rows = {r["doc_id"]: r["summary"] for r in out.collect()}
    assert rows[1] and rows[2] is None


def test_real_hdbscan(spark):
    """M4's real path: driver-side HDBSCAN fit on reduced coords."""
    pytest.importorskip("hdbscan")
    from miba_2023_capstone_rb_nlp_spark.ml.clustering import hdbscan_assign

    df = _vectors(spark)
    out = hdbscan_assign(df, "embedding", "vec_id", min_cluster_size=5)
    labels = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert len(labels) == 40
    assert len({v for v in labels.values() if v >= 0}) >= 2


def test_real_umap(spark):
    """M9's real path: driver-side UMAP fit, coords joined back."""
    pytest.importorskip("umap")
    from miba_2023_capstone_rb_nlp_spark.ml.reduce import umap_reduce

    out = umap_reduce(_vectors(spark), "embedding", "vec_id")
    rows = out.collect()
    assert len(rows) == 40
    assert all(len(r["reduced_dimensions"]) == 2 for r in rows)


def test_real_transform_with_state(spark):
    """§2.10's transformWithStateInPandas real runner (needs
    google.protobuf): register_tws_entry() promotes the gated entry,
    then the entry must agree with its DuckDB oracle at sf0.001."""
    pytest.importorskip("google.protobuf")
    from miba_2023_capstone_rb_nlp_spark import suite as suite_mod
    from miba_2023_capstone_rb_nlp_spark.suite.streaming_live import (
        register_tws_entry,
    )
    from tests.parity import compare, duckdb_conn

    if "events_tws_profiles" not in suite_mod.REGISTRY:
        register_tws_entry()
    q = suite_mod.REGISTRY["events_tws_profiles"]
    sf = "/root/testdata/sf0.001"
    spark_df = q.fn(spark, sf)
    con = duckdb_conn(sf)
    compare(spark_df, con.sql(q.oracle).df(), "events_tws_profiles/real")
