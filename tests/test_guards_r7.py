"""Round-7 guard/parity fixes, executable:

- events_streaming_upsert's cross-batch merge keeps NULL user_ids as
  ONE state group, like its oracle's GROUP BY (ADVICE r6 #1): the
  merge joins with eqNullSafe, so a NULL key can't fragment into one
  state row per micro-batch.
- guard_max_basket memoizes its scalar per source fingerprint
  (ADVICE r6 #3): the second check for unchanged data must not run a
  Spark job at all.
- hybrid_rrf_search's dense tokenizer lowercases like the sparse side
  (ADVICE r6 #5): a capitalized occurrence of a query term ranks
  identically to its lowercase form.
- ensure_merge_layout re-registers an existing bucketed layout in a
  fresh catalog WITHOUT rewriting the files (VERDICT r6 #4's
  amortized steady-state).
- phrase_match_docs joins one branch per PHRASE POSITION, so phrases
  with repeated terms stay correct under the rarest-first join order
  (round-7 code-review finding).
"""

from __future__ import annotations

import decimal
import os

from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark import catalog, suite
from miba_2023_capstone_rb_nlp_spark.suite.streaming_live import (
    merge_user_state,
)

SUITE = suite.load_suite()
SF = "/root/testdata/sf0.001"


def _batch(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, value double")


def _agg(df):
    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("b_n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("b_sum"),
    )


def test_upsert_merge_null_keys_stay_one_group(spark):
    """Two micro-batches, both containing NULL user_ids: the merged
    state must hold exactly ONE NULL row whose totals equal the
    one-shot aggregate — not one fragment per batch."""
    b1 = _batch(spark, [(None, 1.5), (None, 2.5), (7, 1.0)])
    b2 = _batch(spark, [(None, 4.0), (7, 2.0), (8, 3.0)])
    empty = spark.createDataFrame(
        [], "user_id bigint, n_events bigint, sum_dec decimal(18,2)"
    )
    state = merge_user_state(merge_user_state(empty, _agg(b1)), _agg(b2))
    rows = {r["user_id"]: r for r in state.collect()}
    assert len(rows) == 3  # NULL, 7, 8 — NOT two NULL fragments
    assert rows[None]["n_events"] == 3
    assert rows[None]["sum_dec"] == decimal.Decimal("8.00")
    assert rows[7]["n_events"] == 2 and rows[8]["n_events"] == 1
    # and batch-split invariance: one-shot == two-batch composition
    oneshot = merge_user_state(empty, _agg(b1.unionAll(b2)))
    assert sorted(
        oneshot.collect(), key=lambda r: (r["user_id"] is None, r["user_id"])
    ) == sorted(
        state.collect(), key=lambda r: (r["user_id"] is None, r["user_id"])
    )


def test_basket_guard_memoized_no_second_scan(spark):
    """After one check for a given (fingerprint, cap), the guard must
    answer from the memo: a second call gets a DataFrame that would
    THROW if any job ran over it."""
    from miba_2023_capstone_rb_nlp_spark.suite.relational import (
        _BASKET_GUARD_MEMO,
        guard_max_basket,
    )

    li = catalog.table(spark, SF, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    guard_max_basket(basket, "memo-test", sf_dir=SF)
    fp = catalog.source_fingerprint(SF, "lineitem")
    assert any(k[0] == fp for k in _BASKET_GUARD_MEMO)
    # poisoned frame: the GROUPING KEY itself is the raise_error
    # expression (ADVICE r7 #4 — a poison in a non-grouping column
    # could be pruned by Catalyst, making the test vacuous), with the
    # same column set as the first call so the derivation-token memo
    # key matches. A pass proves no job ran over it.
    poisoned = spark.range(1).select(
        F.raise_error(F.lit("guard re-scanned")).cast("bigint").alias(
            "l_orderkey"
        ),
        F.col("id").alias("l_partkey"),
    )
    # liveness control: the poison DOES fire when evaluated, so the
    # memo assertion below cannot pass by accident
    import pytest as _pytest

    with _pytest.raises(Exception, match="guard re-scanned"):
        poisoned.groupBy("l_orderkey").count().collect()
    guard_max_basket(poisoned, "memo-test", sf_dir=SF)  # must not raise


def test_hybrid_dense_side_case_insensitive(spark, tmp_path):
    """'Spark' and 'spark' corpora must produce IDENTICAL hybrid
    rankings — the dense tokenizer lowercases like the sparse one."""
    results = []
    for variant, text in (("cap", "Spark join window"), ("low", "spark join window")):
        d = str(tmp_path / variant)
        os.makedirs(d, exist_ok=True)
        spark.createDataFrame(
            [(1, text), (2, "filter scan loop"), (3, "alpha beta gamma")],
            "doc_id bigint, text string",
        ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        results.append(
            sorted(
                SUITE["hybrid_rrf_search"].fn(spark, d).collect(),
                key=lambda r: r["doc_id"],
            )
        )
    assert results[0] == results[1]
    # and the query-term doc actually outranks the non-matching ones
    by_rrf = sorted(results[0], key=lambda r: -r["rrf"])
    assert by_rrf[0]["doc_id"] == 1


def test_merge_layout_reregisters_without_rewrite(spark):
    """Dropping the catalog entries (a fresh session) must NOT force
    a rewrite: ensure_merge_layout re-registers the bucketed tables
    over the existing files via CREATE TABLE ... LOCATION."""
    from miba_2023_capstone_rb_nlp_spark.suite.relational import (
        ensure_merge_layout,
    )

    b, c = ensure_merge_layout(spark, SF)  # materialize once
    root = catalog.warehouse_dir("merge_bucketed", catalog.sf_name(SF))
    stamps = [os.path.join(root, t, catalog._FINGERPRINT_FILE) for t in (b, c)]
    mtimes = [os.stat(s).st_mtime_ns for s in stamps]
    for t in (b, c):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    b2, c2 = ensure_merge_layout(spark, SF)
    assert (b2, c2) == (b, c)
    assert [os.stat(s).st_mtime_ns for s in stamps] == mtimes  # no rewrite
    n_orders = catalog.table(spark, SF, "orders").count()
    assert spark.table(b2).count() == n_orders
    # the re-registered table still carries bucket metadata: the
    # steady merge over it must stay exchange-free
    df = SUITE["orders_merge_steady"].fn(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_phrase_match_handles_repeated_terms(spark, tmp_path, monkeypatch):
    """A phrase with a REPEATED term needs one join branch per
    POSITION, not per distinct term (code-review r7): with
    PHRASE=('a','b','a'), 'a b a b a' matches at head positions 1 and
    3, and 'a b c' matches nowhere."""
    from miba_2023_capstone_rb_nlp_spark.suite import retrieval

    monkeypatch.setattr(retrieval, "PHRASE", ("a", "b", "a"))
    monkeypatch.setattr(retrieval, "_PHRASE_DF_MEMO", {})
    d = str(tmp_path / "corpus")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(1, "a b a b a"), (2, "a b c"), (3, "x a b a y")],
        "doc_id bigint, text string",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in retrieval.q_phrase_match_docs(spark, d).collect()
    }
    assert rows == {1: (2, 1), 3: (1, 2)}


def test_sf_name_distinguishes_same_basename_dirs(tmp_path):
    """Two different directories sharing a leaf name must not share
    layout keys (code-review r7): sf_name suffixes an absolute-path
    hash."""
    a = tmp_path / "one" / "sf0.1"
    b = tmp_path / "two" / "sf0.1"
    a.mkdir(parents=True)
    b.mkdir(parents=True)
    na, nb = catalog.sf_name(str(a)), catalog.sf_name(str(b))
    assert na != nb
    assert na.startswith("sf0_1_") and nb.startswith("sf0_1_")
    # stable for the same path
    assert catalog.sf_name(str(a)) == na


def test_source_fingerprint_missing_table_raises(tmp_path):
    """A missing source table must raise, not hash to the shared
    empty-input sentinel (which would alias every absent table into
    one memo/layout key)."""
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        catalog.source_fingerprint(str(tmp_path), "lineitem")


def test_merge_layout_invalidates_on_bucket_count_change(spark, monkeypatch):
    """The layout stamp covers the BUCKET COUNT, not just source
    data: declaring INTO 16 BUCKETS over files physically bucketed
    mod 8 would silently pair wrong buckets in the exchange-free
    join, so a bucket-count change must force a rewrite."""
    from miba_2023_capstone_rb_nlp_spark.suite import relational

    b, c = relational.ensure_merge_layout(spark, SF)
    root = catalog.warehouse_dir("merge_bucketed", catalog.sf_name(SF))
    stamp = os.path.join(root, b, catalog._FINGERPRINT_FILE)
    mtime = os.stat(stamp).st_mtime_ns
    relational.ensure_merge_layout(spark, SF)
    assert os.stat(stamp).st_mtime_ns == mtime  # unchanged params reuse
    monkeypatch.setattr(relational, "_MERGE_BUCKETS", 16)
    b2, _ = relational.ensure_merge_layout(spark, SF)
    assert b2 == b
    assert os.stat(stamp).st_mtime_ns != mtime  # rewrite forced
    # restore the mod-8 layout for any later test in this session
    monkeypatch.undo()
    relational.ensure_merge_layout(spark, SF)
