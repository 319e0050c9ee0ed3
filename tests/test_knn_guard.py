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
