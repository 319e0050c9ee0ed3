"""The kNN query-side size contract is executable (VERDICT r4 #2):
the query frame is collected to the driver (broadcast side), so an
oversized query set must fail fast with a clear error instead of
OOM-ing the driver at scale. The guard rides the same job as the
collect (limit bound+1) — no extra scan."""

from __future__ import annotations

import pytest

from miba_2023_capstone_rb_nlp_spark.similarity.knn import (
    knn_bruteforce,
    knn_ivf_cells,
    knn_ivf_multiprobe,
)

DIM = 4


@pytest.fixture()
def vec_df(spark):
    rows = [
        (i, [float(i % 5), 1.0, float((i * 3) % 7), 0.5], i % 3)
        for i in range(30)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, v array<float>, cell int"
    ).repartition(3)


def test_bruteforce_guard_trips(vec_df):
    with pytest.raises(ValueError, match="max_query_rows"):
        knn_bruteforce(
            vec_df, vec_df, "v", "vec_id", DIM, k=3, max_query_rows=10
        )


def test_bruteforce_under_bound_unchanged(vec_df):
    queries = vec_df.filter("vec_id < 5")
    bounded = knn_bruteforce(
        vec_df, queries, "v", "vec_id", DIM, k=3, max_query_rows=5
    )
    unbounded = knn_bruteforce(
        vec_df, queries, "v", "vec_id", DIM, k=3, max_query_rows=None
    )
    assert sorted(map(tuple, bounded.collect())) == sorted(
        map(tuple, unbounded.collect())
    )
    assert bounded.count() > 0


def test_ivf_cells_guard_trips(vec_df):
    with pytest.raises(ValueError, match="knn_ivf_cells"):
        knn_ivf_cells(
            vec_df, vec_df, "v", "vec_id", "cell", DIM, k=3, max_query_rows=3
        )


def test_ivf_multiprobe_guard_trips(vec_df):
    with pytest.raises(ValueError, match="knn_ivf_multiprobe"):
        knn_ivf_multiprobe(
            vec_df, vec_df, "v", "vec_id", "cell", DIM, k=3, max_query_rows=3
        )


def test_guard_boundary_exact_bound_passes(vec_df):
    queries = vec_df.filter("vec_id < 10")  # exactly 10 rows
    out = knn_bruteforce(
        vec_df, queries, "v", "vec_id", DIM, k=2, max_query_rows=10
    )
    assert out.select("query_id").distinct().count() == 10


# ---- quadratic-baseline guards (VERDICT r4 "perf-weak" pair) -------
# The two deliberate O(n²) precision baselines carry the same
# executable-contract treatment: jaccard_pairs bounds the exact
# shared-shingle candidate count, cosine_pairs bounds input rows.


@pytest.fixture()
def text_df(spark):
    rows = [
        (i, "the quick brown fox jumps over the lazy dog num %d" % (i % 4))
        for i in range(12)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_jaccard_candidate_budget_trips(text_df):
    from miba_2023_capstone_rb_nlp_spark.dedup.jaccard import jaccard_pairs

    with pytest.raises(ValueError, match="candidate_budget"):
        # every doc shares the leading shingles → Σ df·(df−1)/2 ≫ 3
        jaccard_pairs(text_df, "text", "doc_id", n=3, candidate_budget=3)


def test_jaccard_under_budget_unchanged(text_df):
    from miba_2023_capstone_rb_nlp_spark.dedup.jaccard import jaccard_pairs

    guarded = jaccard_pairs(text_df, "text", "doc_id", n=3)
    unguarded = jaccard_pairs(
        text_df, "text", "doc_id", n=3, candidate_budget=None
    )
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, unguarded.collect())
    )
    assert guarded.count() > 0


def test_cosine_pairs_max_rows_trips(vec_df):
    from miba_2023_capstone_rb_nlp_spark.dedup.embedding import cosine_pairs

    with pytest.raises(ValueError, match="max_rows"):
        cosine_pairs(vec_df, "v", "vec_id", DIM, max_rows=10)


def test_cosine_pairs_under_bound_unchanged(vec_df):
    from miba_2023_capstone_rb_nlp_spark.dedup.embedding import cosine_pairs

    guarded = cosine_pairs(vec_df, "v", "vec_id", DIM, max_rows=30)
    unguarded = cosine_pairs(vec_df, "v", "vec_id", DIM, max_rows=None)
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, unguarded.collect())
    )


def test_hard_negatives_null_groups_excluded(spark):
    """ADVICE r8 #2: NULL-group rows must be excluded from BOTH sides,
    matching the SQL oracle's `a.label <> q.label` (NULL never
    compares unequal) — a numpy equality mask alone would emit
    None-vs-value pairs."""
    from miba_2023_capstone_rb_nlp_spark.similarity.knn import (
        knn_hard_negatives,
    )

    rows = [
        (i, [float(i % 5), 1.0, float((i * 3) % 7), 0.5],
         None if i % 4 == 0 else f"g{i % 3}")
        for i in range(24)
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, v array<float>, grp string"
    ).repartition(3)
    out = knn_hard_negatives(
        df, df, "v", "vec_id", "grp", DIM, k=3, max_query_rows=None
    ).collect()
    null_ids = {i for i in range(24) if i % 4 == 0}
    assert out  # non-null anchors still mined
    assert not ({r.query_id for r in out} & null_ids)
    assert not ({r.neighbor_id for r in out} & null_ids)
