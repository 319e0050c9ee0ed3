"""Kernel tests for the curation/text map-only operators:

- the sorted-run-length mode scan behind ``gopher_repetition_flags``
  (the bigram mode MUST equal a plain Counter max for any token list);
- the BPE-ish pretokenizer count (Java-regex semantics must equal the
  Python ``re`` reference on the portable pattern subset);
- plan-shape pins: the per-doc statistics queries stay map-only (zero
  exchanges), and the corpus-prep chain keeps its broadcast/anti-join
  /persist structure.
"""

from __future__ import annotations

import random
import re
from collections import Counter

from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.functions import text as T
from miba_2023_capstone_rb_nlp_spark.suite import load_suite
from miba_2023_capstone_rb_nlp_spark.suite.curation import _max_run_length
from tests.conftest import SF_TEST_DIR

SUITE = load_suite()


def _mode_count(tokens: list[str], n: int = 2) -> int:
    grams = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    return max(Counter(grams).values()) if grams else 0


def test_run_length_mode_matches_counter(spark):
    rng = random.Random(7)
    cases = [
        "a b",
        "a a a a",
        "a b a b a b",
        "x y z x y z x y",
        "one two three",
        "t t t s t t t",
    ]
    for _ in range(40):
        vocab = ["u", "v", "w", "xx"][: rng.randint(1, 4)]
        cases.append(" ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30))))
    df = spark.createDataFrame([(c,) for c in cases], ["text"])
    got = df.select(
        "text",
        _max_run_length(F.array_sort(T.word_ngrams(F.col("text"), 2))).alias("m"),
    ).collect()
    for row in got:
        assert row["m"] == _mode_count(row["text"].split(" ")), row["text"]


def test_bpe_count_matches_python_re(spark):
    pat = re.compile(T.BPE_PATTERN)
    cases = [
        "hello world",
        "it's a test, isn't it?",
        "we'll we've we'd I'm you're",
        "abc123 def-456  double  space",
        "...!!! ??? (parens) [brackets]",
        "CamelCase UPPER lower 0x1f 3.14",
        "trailing space ",
        " leading",
        "tab\tand\nnewline",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["text"])
    got = df.select("text", T.bpe_token_count(F.col("text")).alias("n")).collect()
    for row in got:
        assert row["n"] == len(pat.findall(row["text"])), repr(row["text"])


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_map_only(plan: str) -> None:
    """No key-based exchange: the only allowed Exchange is the
    deliberate round-robin input spread from catalog.cpu_table (one
    parquet file → n_cpu partitions, data-independent)."""
    for line in plan.splitlines():
        if "Exchange" in line and "ReusedExchange" not in line:
            assert "RoundRobinPartitioning" in line, line


def test_gopher_flags_map_only_no_exchange(spark):
    """The headline claim: a per-doc statistic never costs a corpus
    shuffle (no hash/range exchange anywhere in the plan)."""
    plan = _executed_plan(SUITE["gopher_repetition_flags"].fn(spark, SF_TEST_DIR))
    _assert_map_only(plan)


def test_bpe_token_stats_map_only_no_exchange(spark):
    plan = _executed_plan(SUITE["bpe_token_stats"].fn(spark, SF_TEST_DIR))
    _assert_map_only(plan)


def test_corpus_prep_chain_shape(spark):
    """Decontamination joins broadcast (eval side), survivors leave by
    anti-join, and the fan-out base is served from the persisted
    in-memory relation rather than recomputed per branch."""
    plan = _executed_plan(SUITE["corpus_prep_chain"].fn(spark, SF_TEST_DIR))
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan


# --- BPE merge learning ---------------------------------------------


def test_bpe_scan_replace_engine_agreement(spark):
    """The merge-application kernel is literal replace on the
    boundary-padded encoding. Both engines must implement the same
    leftmost non-overlapping source-string scan — pinned here on
    adversarial same-symbol runs (where the scan deviates from
    canonical BPE's restart-after-merge, deterministically) and on
    boundary-anchored false-match bait ('ba a a': the 'a' inside
    'ba' must not merge)."""
    import duckdb

    from pyspark.sql import functions as F

    cases = [
        " a a a ",          # odd run
        " a a a a ",        # even run
        " b a a a b ",      # run flanked
        " ba a a ",         # left-boundary bait
        " a a ab ",         # right-boundary bait
        " x y a a x y ",    # unrelated context
    ]
    pat, rep = " a a ", " aa "
    py = [s.replace(pat, rep) for s in cases]
    con = duckdb.connect()
    dd = [
        con.execute("SELECT replace(?, ?, ?)", [s, pat, rep]).fetchone()[0]
        for s in cases
    ]
    sdf = spark.createDataFrame([(s,) for s in cases], "s string").select(
        F.replace(F.col("s"), F.lit(pat), F.lit(rep)).alias("r")
    )
    sp = [r["r"] for r in sdf.collect()]
    assert py == dd == sp


def test_bpe_merge_learn_planted_signal(spark):
    """A corpus where 'qz' is the overwhelmingly dominant digraph:
    the first learned merge must be (q, z), and its pair_count must
    equal the exact weighted occurrence count (overlap-free here)."""
    from miba_2023_capstone_rb_nlp_spark.suite.text import q_bpe_merge_learn

    docs = spark.createDataFrame(
        [(i, "qzqzqz qzqz") for i in range(10)],
        "doc_id bigint, text string",
    )
    import miba_2023_capstone_rb_nlp_spark.suite.text as textmod

    orig = textmod._docs
    textmod._docs = lambda _spark, _sf: docs
    try:
        out = q_bpe_merge_learn(spark, "unused").collect()
    finally:
        textmod._docs = orig
    first = out[0]
    assert (first["pa"], first["pb"], first["merged"]) == ("q", "z", "qz")
    # qzqzqz has 3 qz pairs, qzqz has 2 → 5 per doc × 10 docs
    assert first["pair_count"] == 50


def test_fuzzy_match_planted_pairs(spark):
    """Known near-names must match; distant names must not; the
    count filter must not drop a true pair (no false negatives on
    the planted set)."""
    from miba_2023_capstone_rb_nlp_spark.suite import load_suite

    out = {
        (r["na"], r["nb"]): r["dist"]
        for r in load_suite()["fuzzy_name_matches"]
        .fn(spark, SF_TEST_DIR)
        .collect()
    }
    assert out[("cold rod", "old rod")] == 1
    assert ("blue rod", "cold widget") not in out
    assert all(d <= 2 for d in out.values())
    assert len(out) > 0
