"""The gated transformer paths (M1/M2/M6/M7/M8) never execute in this
container — so these tests inject FAKE model loaders through the real
mapInPandas plumbing and assert the plan, schema, and batching all
hold. The loader runs inside the UDF on the worker (cloudpickled), so
this exercises exactly what a real model would ride on."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.ml.embeddings import transformer_embeddings
from miba_2023_capstone_rb_nlp_spark.ml.inference import (
    ner_transformer,
    sentiment_transformer,
)
from miba_2023_capstone_rb_nlp_spark.ml.summarize import (
    summarize_medoids_transformer,
)
from miba_2023_capstone_rb_nlp_spark.operators.ner import (
    gazetteer_entities,
    weighted_top_entities,
)


@pytest.fixture()
def texts_df(spark):
    rows = [(i, f"spark row number {i} stream") for i in range(10)]
    return spark.createDataFrame(rows, "id bigint, text string").repartition(2)


def test_transformer_embeddings_plumbing(texts_df):
    # fakes live INSIDE the test so cloudpickle ships them by value
    # (a module-level fake pickles by reference to the test module,
    # which Spark workers cannot import)
    def loader(name):
        class FakeSentenceModel:
            def encode(self, texts, batch_size=64, convert_to_numpy=True):
                return np.array(
                    [[len(t), t.count(" "), 0.0, 1.0] for t in texts],
                    dtype=np.float32,
                )

        return FakeSentenceModel()

    out = transformer_embeddings(texts_df, "text", model_loader=loader)
    assert dict(out.dtypes)["sentence_embedding"] == "array<float>"
    rows = {r["id"]: r["sentence_embedding"] for r in out.collect()}
    assert len(rows) == 10
    for i, vec in rows.items():
        assert len(vec) == 4
        assert vec[0] == float(len(f"spark row number {i} stream"))


def test_sentiment_transformer_plumbing(texts_df):
    def loader(name):
        assert name == "fake-model"
        return lambda texts: [float(len(t) % 3) for t in texts]

    out = sentiment_transformer(
        texts_df, "text", model_name="fake-model", model_loader=loader
    )
    assert dict(out.dtypes)["sentiment"] == "double"
    rows = {r["id"]: r["sentiment"] for r in out.collect()}
    assert rows == {
        i: float(len(f"spark row number {i} stream") % 3) for i in range(10)
    }


def test_summarize_transformer_plumbing(spark):
    rows = [(i, f"document body {i} with many words", i < 2) for i in range(8)]
    df = spark.createDataFrame(rows, "id bigint, text string, is_medoid boolean")

    def loader(name):
        return lambda texts, truncation=True: [
            {"summary_text": t[:13]} for t in texts
        ]

    out = summarize_medoids_transformer(
        df, "text", "id", model_loader=loader
    ).collect()
    got = {r["id"]: r["summary"] for r in out}
    # only medoid rows carry a summary; the rest are NULL
    assert got[0] == "document body" and got[1] == "document body"
    assert all(got[i] is None for i in range(2, 8))


def _make_fake_ner_loader():
    """Factory called at test time: the returned loader (and the
    extractor it builds) are defined in a local scope, so cloudpickle
    ships them by value to the workers."""

    def loader(name):
        lex = {"spark", "stream", "customer"}
        return lambda texts: [
            [w for w in t.split() if w in lex] for t in texts
        ]

    return loader


def test_ner_transformer_plumbing(texts_df):
    out = ner_transformer(texts_df, "text", model_loader=_make_fake_ner_loader())
    assert dict(out.dtypes)["entities"] == "array<string>"
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["entities"] == ["spark", "stream"] for r in rows)


@pytest.fixture()
def section_df(spark):
    rows = [
        (0, 3, "spark spark customer"),
        (0, 1, "stream"),
        (1, 2, "customer stream"),
        (1, 1, "spark customer customer"),
    ]
    return spark.createDataFrame(rows, "_cluster int, w int, t string")


def test_weighted_agg_same_result_model_vs_gazetteer(spark, section_df):
    """The weighted aggregation must give identical results whether
    entities come from the gazetteer expression or arrive through the
    model UDF plumbing (word-boundary regex ≡ whitespace-token lookup
    on this input)."""
    via_gaz = weighted_top_entities(section_df, top_n=5)
    with_ents = ner_transformer(
        section_df, "t", out_col="_ents", model_loader=_make_fake_ner_loader()
    )
    via_model = weighted_top_entities(
        with_ents, top_n=5, extractor=lambda c: F.col("_ents")
    )
    a = sorted(map(tuple, via_gaz.collect()))
    b = sorted(map(tuple, via_model.collect()))
    assert a == b
    assert a  # non-vacuous


def test_umap_reduce_plumbing(spark, monkeypatch):
    """umap_reduce is a gated DRIVER-side fit (collect → fit → join
    back by id): inject a fake ``umap`` module via sys.modules and
    assert the collect/join plumbing, schema, and row alignment."""
    import sys
    import types

    class FakeUMAP:
        def __init__(self, n_components=2, **kw):
            self.n_components = n_components

        def fit_transform(self, vecs):
            # deterministic: coord = (first element, row L1 norm)
            return np.array([[v[0], float(np.abs(v).sum())] for v in vecs])

    fake = types.ModuleType("umap")
    fake.UMAP = FakeUMAP
    monkeypatch.setitem(sys.modules, "umap", fake)

    from miba_2023_capstone_rb_nlp_spark.ml.reduce import umap_reduce

    rows = [(i, [float(i), 1.0, -2.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "id bigint, emb array<double>").repartition(3)
    out = umap_reduce(df, "emb", "id")
    assert dict(out.dtypes)["reduced_dimensions"] == "array<double>"
    got = {r["id"]: r["reduced_dimensions"] for r in out.collect()}
    assert len(got) == 10
    for i in range(10):
        assert got[i] == [float(i), float(i) + 3.0]


def test_hdbscan_assign_plumbing(spark, monkeypatch):
    """hdbscan_assign (gated driver-side): inject a fake ``hdbscan``
    module; assert labels (including the −1 noise label,
    word_wizard.py:288) join back to the right ids."""
    import sys
    import types

    class FakeHDBSCAN:
        def __init__(self, min_cluster_size=5, **kw):
            self.min_cluster_size = min_cluster_size

        def fit_predict(self, coords):
            # x < 0 → noise (−1), else cluster = int(x) % 2
            return np.array(
                [-1 if c[0] < 0 else int(c[0]) % 2 for c in coords]
            )

    fake = types.ModuleType("hdbscan")
    fake.HDBSCAN = FakeHDBSCAN
    monkeypatch.setitem(sys.modules, "hdbscan", fake)

    from miba_2023_capstone_rb_nlp_spark.ml.clustering import hdbscan_assign

    rows = [(i, [float(i - 2), 0.5]) for i in range(8)]
    df = spark.createDataFrame(rows, "id bigint, xy array<double>").repartition(2)
    out = hdbscan_assign(df, "xy", "id")
    got = {r["id"]: r["cluster"] for r in out.collect()}
    assert got == {i: (-1 if i - 2 < 0 else (i - 2) % 2) for i in range(8)}


def test_weighted_agg_plan_unchanged_by_extractor(spark, section_df):
    """Swapping the extractor must not reshape the weighted
    aggregation: same aggregate/window skeleton, the model path only
    adds its one Python-worker node below it."""
    via_gaz = weighted_top_entities(section_df, top_n=5)
    with_ents = ner_transformer(
        section_df, "t", out_col="_ents", model_loader=_make_fake_ner_loader()
    )
    via_model = weighted_top_entities(
        with_ents, top_n=5, extractor=lambda c: F.col("_ents")
    )

    def skeleton(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return [
            line.strip().split(" ")[0].lstrip("+-: ")
            for line in plan.splitlines()
            if any(k in line for k in ("Aggregate", "Window", "Generate"))
        ]

    assert skeleton(via_gaz) == skeleton(via_model)
    gaz_plan = via_gaz._jdf.queryExecution().optimizedPlan().toString()
    model_plan = via_model._jdf.queryExecution().optimizedPlan().toString()
    assert "MapInPandas" not in gaz_plan
    assert model_plan.count("MapInPandas") == 1


def test_pca_reduce_precomputed_components_match_refit(spark):
    """The fit/transform split (r11): passing pca_components' output
    back through ``components=`` must produce row-identical coords to
    the internal refit — and spares the second moment pass the
    witness entry used to pay (pinned plan-side in test_plans)."""
    from miba_2023_capstone_rb_nlp_spark.ml.reduce import (
        pca_components,
        pca_reduce,
    )

    rng = np.random.RandomState(11)
    base = rng.randn(60, 4)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(base)],
        "id bigint, v array<double>",
    ).repartition(3)
    comps = pca_components(df, "v", 2)
    via_components = {
        r["id"]: r["reduced_dimensions"]
        for r in pca_reduce(df, "v", 2, components=comps).collect()
    }
    via_refit = {
        r["id"]: r["reduced_dimensions"]
        for r in pca_reduce(df, "v", 2, fit_df=df).collect()
    }
    assert via_components == via_refit


def test_pca_reduce_math_properties(spark):
    """One-pass PCA invariants: components orthonormal, projected
    coords mean-centered (~0), and the first component carries at
    least as much variance as the second — checked against numpy's
    full eigendecomposition on the same data."""
    from miba_2023_capstone_rb_nlp_spark.ml.reduce import (
        pca_components,
        pca_reduce,
    )

    rng = np.random.RandomState(7)
    base = rng.randn(200, 5) @ np.diag([5.0, 3.0, 1.0, 0.5, 0.1])
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(base)], "id bigint, v array<double>"
    ).repartition(4)

    mean, w = pca_components(df, "v", 2)
    assert np.allclose(mean, base.mean(axis=0), atol=1e-9)
    assert np.allclose(w.T @ w, np.eye(2), atol=1e-9)  # orthonormal

    out = pca_reduce(df, "v", 2, fit_df=df)
    coords = np.array(
        [r["reduced_dimensions"] for r in out.orderBy("id").collect()]
    )
    assert np.allclose(coords.mean(axis=0), 0.0, atol=1e-8)
    assert coords[:, 0].var() >= coords[:, 1].var()
    # parity with numpy eigh on the exact covariance
    cov = np.cov(base, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, np.argsort(evals)[::-1][:2]]
    for j in range(2):
        i = int(np.abs(top[:, j]).argmax())
        if top[i, j] < 0:
            top[:, j] = -top[:, j]
    ref = (base - base.mean(axis=0)) @ top
    assert np.allclose(coords, ref, atol=1e-8)


def test_pca_reduce_null_and_shortvec_semantics(spark):
    """ADVICE r4: NULL / wrong-length vectors must yield a NULL output
    array (explicit contract), not a silent array of per-element
    nulls; valid rows are unaffected by the presence of bad rows in
    the transform input."""
    from miba_2023_capstone_rb_nlp_spark.ml.reduce import pca_reduce

    good = [(i, [float(i), 1.0, -1.0]) for i in range(6)]
    bad = [(100, None), (101, [1.0])]  # null + wrong length
    df = spark.createDataFrame(good + bad, "id bigint, v array<double>")
    fit = spark.createDataFrame(good, "id bigint, v array<double>")
    out = {r["id"]: r["reduced_dimensions"]
           for r in pca_reduce(df, "v", 2, fit_df=fit).collect()}
    assert out[100] is None and out[101] is None
    for i in range(6):
        assert out[i] is not None and len(out[i]) == 2
        assert all(x is not None for x in out[i])


def test_pca_pandas_fallback_matches_codegen_path(spark, monkeypatch):
    """Wide-embedding projection (d×k over the codegen budget) must be
    bit-identical to the expression path — same left-assoc
    accumulation order — and carry the same NULL contract."""
    import miba_2023_capstone_rb_nlp_spark.ml.reduce as reduce_mod

    rng = np.random.RandomState(11)
    base = rng.randn(60, 16)
    rows = [(i, row.tolist()) for i, row in enumerate(base)]
    rows += [(100, None), (101, [1.0, 2.0])]
    df = spark.createDataFrame(rows, "id bigint, v array<double>").repartition(3)
    fit = spark.createDataFrame(rows[:60], "id bigint, v array<double>")

    via_expr = {r["id"]: r["reduced_dimensions"]
                for r in reduce_mod.pca_reduce(df, "v", 3, fit_df=fit).collect()}
    monkeypatch.setattr(reduce_mod, "MAX_CODEGEN_DIM_TERMS", 1)
    via_pandas = {r["id"]: r["reduced_dimensions"]
                  for r in reduce_mod.pca_reduce(df, "v", 3, fit_df=fit).collect()}
    assert via_pandas[100] is None and via_pandas[101] is None
    assert set(via_expr) == set(via_pandas)
    for i in range(60):
        assert via_expr[i] == via_pandas[i]  # bit-identical, not approx

    plan = reduce_mod.pca_reduce(df, "v", 3, fit_df=fit)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "ArrowEvalPython" in plan  # fallback really is the Arrow UDF


def test_model_loader_called_once_per_partition_across_batches(spark, tmp_path):
    """The iterator-UDF contract the gated paths rely on: the model
    loads ONCE per mapInPandas task (per executor in practice) and is
    reused across every Arrow batch — the reference re-ran per row
    (word_wizard.py:191). Marker files count loader vs batch calls on
    the shared local FS."""
    marker_dir = str(tmp_path)

    def loader(name):
        import pathlib
        import uuid

        pathlib.Path(marker_dir, f"load-{uuid.uuid4().hex}").touch()

        class M:
            def encode(self, texts, batch_size=64, convert_to_numpy=True):
                pathlib.Path(marker_dir, f"batch-{uuid.uuid4().hex}").touch()
                return np.array([[float(len(t))] for t in texts], dtype=np.float32)

        return M()

    rows = [(i, f"some text number {i}") for i in range(40)]
    df = spark.createDataFrame(rows, "id bigint, text string").repartition(2)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        assert transformer_embeddings(df, "text", model_loader=loader).count() == 40
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    loads = len(list(tmp_path.glob("load-*")))
    batches = len(list(tmp_path.glob("batch-*")))
    assert loads == 2, f"model loaded {loads}x for 2 partitions"
    assert batches >= 4 and batches > loads  # many batches rode one load


def test_apply_on_distinct_infers_each_distinct_text_once(spark, tmp_path):
    """J4 fan-out through the REAL model plumbing: inference runs once
    per DISTINCT text (not per row), and the joined-back frame equals
    the stand-in exactly (the fake classifier replicates the stub's
    md5%3 math)."""
    import hashlib

    from miba_2023_capstone_rb_nlp_spark.ml.inference import (
        apply_on_distinct,
        sentiment_stub,
    )

    marker_dir = str(tmp_path)

    def loader(name):
        def classify(texts):
            import pathlib
            import uuid

            for _ in texts:
                pathlib.Path(marker_dir, f"scored-{uuid.uuid4().hex}").touch()
            return [
                float(int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 3)
                for t in texts
            ]

        return classify

    rows = [(i, f"repeated text {i % 3}") for i in range(12)]
    df = spark.createDataFrame(rows, "id bigint, text string").repartition(4)
    out = apply_on_distinct(
        df,
        "text",
        lambda d: sentiment_transformer(d, "text", model_loader=loader),
        ["sentiment"],
    )
    via_model = sorted((r["id"], r["sentiment"]) for r in out.collect())
    via_stub = sorted(
        (r["id"], r["sentiment"]) for r in sentiment_stub(df, "text").collect()
    )
    assert via_model == via_stub  # exact, incl. every duplicate row
    scored = len(list(tmp_path.glob("scored-*")))
    assert scored == 3, f"inference ran {scored}x for 3 distinct texts"


def test_wizard_chain_model_path_equals_stub_path(spark):
    """Full-chain equivalence (VERDICT r4 #4): run the wizard chain
    with lean stand-ins vs with the GATED model paths fed fake loaders
    that replicate the stand-ins' math — identical viz_summary frames.
    This executes the gated halves (distinct→infer→join sentiment,
    medoid-only summarization, model-extractor NER) end-to-end inside
    the real chain."""
    import hashlib
    import re

    from miba_2023_capstone_rb_nlp_spark.operators.ner import ORG_PATTERN
    from miba_2023_capstone_rb_nlp_spark.wizard import WordWizard

    lex = ["spark", "customer", "stream", "window", "vector", "quiet"]
    rows = []
    for a in range(8):
        for p in range(3):
            words = [lex[(a + p + j) % len(lex)] for j in range(6)]
            rows.append(
                (
                    a,
                    f"title {lex[a % len(lex)]} item {a}",
                    f"description {lex[(a + 1) % len(lex)]} body {a}",
                    f"paragraph {a} {p} " + " ".join(words),
                )
            )
    df = spark.createDataFrame(
        rows, "article_index bigint, title string, description string, paragraph string"
    ).repartition(3)

    pat = ORG_PATTERN  # ship the pattern by value into the fakes

    def ner_loader(name):
        return lambda texts: [re.findall(pat, t) for t in texts]

    def bart_loader(name):
        return lambda texts, truncation=True: [
            {"summary_text": " ".join(t.split(" ")[:12])} for t in texts
        ]

    def sent_loader(name):
        return lambda texts: [
            float(int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 3)
            for t in texts
        ]

    def run(model_path: bool):
        wiz = WordWizard(df, interest="paragraph").create_sentence_embeddings()
        wiz = wiz.cluster_embeddings(k=3)
        if model_path:
            wiz = (
                wiz.entitiy_recognition(lean=False, model_loader=ner_loader)
                .summarize_medoids(lean=False, model_loader=bart_loader)
                .find_sentiment(lean=False, model_loader=sent_loader)
            )
        else:
            wiz = wiz.entitiy_recognition().summarize_medoids().find_sentiment()
        wiz = wiz.topic_modelling().reduce_demensionality()
        out = wiz.viz_summary()
        return sorted(
            map(
                tuple,
                out.select(
                    "cluster", "size", "x", "y", "sentiment",
                    F.to_json("entities").alias("entities"),
                    F.to_json("topics").alias("topics"),
                    "paragraph",
                ).collect(),
            )
        )

    via_stub = run(False)
    via_model = run(True)
    assert via_stub == via_model
    assert via_stub  # non-vacuous


def test_choose_k_silhouette_sweep(spark):
    """The model-selection sweep returns the k_min floor on clearly
    3-clustered data (best silhouette k=3 < k_min=5 floors to 5 per
    word_wizard.py:715), and the raw argmax when unfloored."""
    from miba_2023_capstone_rb_nlp_spark.ml.clustering import (
        choose_k_silhouette,
    )

    rng = np.random.RandomState(3)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    pts = np.vstack([c + 0.1 * rng.randn(30, 2) for c in centers])
    df = spark.createDataFrame(
        [(row.tolist(),) for row in pts], "v array<double>"
    ).coalesce(1)

    k, scores = choose_k_silhouette(df, "v", k_min=2, k_max=6)
    assert k == 3 and max(scores, key=lambda kk: (scores[kk], -kk)) == 3
    k_floored, _ = choose_k_silhouette(df, "v", k_min=5, k_max=6)
    assert k_floored == 5


def test_kmeans_fit_placement_adaptive(spark):
    """kmeans_assign routes tiny fits driver-side (seeded numpy
    Lloyd's + codegen nearest-center expression — no Python workers,
    no MLlib jobs) and keeps the distributed MLlib fit for large or
    unknown n — BOTH branches execute here, so neither is ever an
    executed-never path."""
    import random

    from miba_2023_capstone_rb_nlp_spark.ml.clustering import kmeans_assign

    rng = random.Random(3)
    rows = [
        (i, [rng.gauss(float(i % 3) * 4.0, 0.25) for _ in range(4)])
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "id bigint, v array<double>")

    local = kmeans_assign(df, "v", k=3, n_hint=90, out_col="c")
    plan = local._jdf.queryExecution().executedPlan().toString()
    assert "_features" not in plan  # no MLlib lineage in the local path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    got = {r["id"]: r["c"] for r in local.collect()}
    # the three well-separated generators each land in one cluster
    by_gen = {g: {got[i] for i in got if i % 3 == g} for g in range(3)}
    assert all(len(s) == 1 for s in by_gen.values())
    assert len({next(iter(s)) for s in by_gen.values()}) == 3

    mllib = kmeans_assign(df, "v", k=3, n_hint=None, out_col="c")
    got_m = {r["id"]: r["c"] for r in mllib.collect()}
    by_gen_m = {g: {got_m[i] for i in got_m if i % 3 == g} for g in range(3)}
    assert all(len(s) == 1 for s in by_gen_m.values())
    # identical partition of the ids, modulo label permutation
    groups = lambda m: sorted(  # noqa: E731
        tuple(sorted(i for i in m if m[i] == c)) for c in set(m.values())
    )
    assert groups(got) == groups(got_m)


# --- wizard witness sensitivity (mid-r11) ---------------------------
# The witness conversion's claim is "a silent value bug in ANY stage
# flips a witness to 0.0". The driver/parity lanes only ever see the
# happy path, so the claim itself is pinned here: feed the factored
# witness derivation CORRUPTED viz tables and assert each invariant
# actually flips (and ONLY the targeted one, so a flip localizes the
# bug), plus the totals track their inputs and the empty-input case
# is vacuously green on both sides (matching the oracle's COALESCEs).

_VIZ_SCHEMA = (
    "cluster int, size bigint, x double, y double, sentiment double, "
    "entities array<string>, "
    "topics array<struct<word string, score double>>, paragraph string"
)


def _viz_rows():
    """2 clusters, sizes 3+2=5, sentiments 1.0/2.0 → weighted sum 7."""
    t = [("alpha", 0.9), ("beta", 0.5)]
    return [
        (0, 3, 0.1, -0.2, 1.0, ["OrgA"], t, "p one"),
        (0, 3, 0.3, 0.4, 1.0, ["OrgA"], t, "p two"),
        (1, 2, -1.0, 2.0, 2.0, None, None, "p three"),
    ]


def _clean_df(spark, paragraphs=("p one", "p two", "p three", "p x")):
    return spark.createDataFrame(
        [(p,) for p in paragraphs], "paragraph string"
    )


def _witnesses(spark, rows, paragraphs=("p one", "p two", "p three", "p x")):
    from miba_2023_capstone_rb_nlp_spark.suite.ml import (
        wizard_chain_witnesses,
    )

    out = spark.createDataFrame(rows, _VIZ_SCHEMA)
    got = wizard_chain_witnesses(out, _clean_df(spark, paragraphs)).collect()
    return {r["witness"]: r["value"] for r in got}


def test_wizard_witnesses_happy_path(spark):
    w = _witnesses(spark, _viz_rows())
    assert w == {
        "clusters_le_k": 1.0,
        "coords_finite": 1.0,
        "enrichment_present": 1.0,
        "entities_le_5": 1.0,
        "medoid_paragraphs_in_corpus": 1.0,
        "medoids_per_cluster_le_2": 1.0,
        "sentiment_sum_q": 7.0,  # 3*1.0 + 2*2.0
        "topics_top5_sorted": 1.0,
        "total_size": 5.0,  # 3 + 2, sizes counted once per cluster
    }


@pytest.mark.parametrize(
    "mutate,flipped",
    [
        # x → +Inf: the review-fix case round()/isnan alone missed
        (lambda r: r.__setitem__(0, r[0][:2] + (float("inf"),) + r[0][3:]),
         "coords_finite"),
        # y → NaN
        (lambda r: r.__setitem__(0, r[0][:3] + (float("nan"),) + r[0][4:]),
         "coords_finite"),
        # 6 entities on one row
        (lambda r: r.__setitem__(
            0, r[0][:5] + (["a", "b", "c", "d", "e", "f"],) + r[0][6:]),
         "entities_le_5"),
        # topic scores out of rank order
        (lambda r: r.__setitem__(
            0, r[0][:6] + ([("w1", 0.1), ("w2", 0.9)],) + r[0][7:]),
         "topics_top5_sorted"),
        # 6 topics
        (lambda r: r.__setitem__(
            0, r[0][:6] + ([("w", 0.9 - 0.1 * i) for i in range(6)],)
            + r[0][7:]),
         "topics_top5_sorted"),
        # a paragraph not present in the corpus
        (lambda r: r.__setitem__(0, r[0][:7] + ("FORGED",)),
         "medoid_paragraphs_in_corpus"),
        # third medoid row in cluster 0
        (lambda r: r.append((0, 3, 0.5, 0.5, 1.0, ["OrgA"],
                             [("alpha", 0.9)], "p x")),
         "medoids_per_cluster_le_2"),
        # ADVICE r11 #2: a regression nulling the entities column
        # CORPUS-WIDE previously passed every witness vacuously — the
        # existential presence witness flips while entities_le_5
        # stays (correctly) vacuous-green
        (lambda r: [r.__setitem__(i, r[i][:5] + (None,) + r[i][6:])
                    for i in range(len(r))],
         "enrichment_present"),
        # same for a corpus-wide NULL topics column
        (lambda r: [r.__setitem__(i, r[i][:6] + (None,) + r[i][7:])
                    for i in range(len(r))],
         "enrichment_present"),
    ],
)
def test_wizard_witnesses_flip_on_corruption(spark, mutate, flipped):
    rows = _viz_rows()
    mutate(rows)
    w = _witnesses(spark, rows)
    assert w[flipped] == 0.0, f"{flipped} did not flip"
    # the flip localizes: every OTHER boolean witness stays green
    for name, v in w.items():
        if name in (flipped, "sentiment_sum_q", "total_size"):
            continue
        assert v == 1.0, f"{name} flipped collaterally ({v})"


def test_wizard_witnesses_flip_on_sixth_cluster(spark):
    rows = _viz_rows() + [
        (c, 1, 0.0, 0.0, 0.0, None, None, "p x") for c in (2, 3, 4, 5)
    ]
    w = _witnesses(spark, rows)
    assert w["clusters_le_k"] == 0.0
    # totals track the corrupted input, localizing the damage
    assert w["total_size"] == 9.0  # 3 + 2 + 4×1


def test_wizard_witnesses_track_totals(spark):
    # shrink cluster 1's recorded size: total_size and the weighted
    # sentiment both move — a wrong window count cannot hide
    rows = _viz_rows()
    rows[2] = (1, 1, -1.0, 2.0, 2.0, None, None, "p three")
    w = _witnesses(spark, rows)
    assert w["total_size"] == 4.0
    assert w["sentiment_sum_q"] == 5.0  # 3*1.0 + 1*2.0


def test_wizard_witnesses_vacuous_on_empty(spark):
    # 0-row viz + 0-row clean: totals 0.0, every invariant vacuously
    # true — mirrors the oracle's COALESCE(…, 0.0) so both sides stay
    # green instead of mismatching NULL vs pinned constants
    w = _witnesses(spark, [], paragraphs=())
    assert w == {
        "clusters_le_k": 1.0,
        "coords_finite": 1.0,
        "enrichment_present": 1.0,
        "entities_le_5": 1.0,
        "medoid_paragraphs_in_corpus": 1.0,
        "medoids_per_cluster_le_2": 1.0,
        "sentiment_sum_q": 0.0,
        "topics_top5_sorted": 1.0,
        "total_size": 0.0,
    }
