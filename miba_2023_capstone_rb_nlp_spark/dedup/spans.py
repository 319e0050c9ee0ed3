"""Exact-substring (span-level) dedup over token windows.

Two corpus-level operators from the training-data-dedup literature
that the document-level passes (exact.py, minhash.py, simhash.py)
cannot express, because their unit is the *span*, not the document:

- ``duplicate_span_stats`` — the detection half of Lee et al. 2022,
  "Deduplicating Training Data Makes Language Models Better": flag
  the fraction of each document covered by token windows that also
  occur verbatim in another document. The paper builds a suffix
  array; the Spark-native equivalent is hashed fixed-width windows
  (stride 1) with a group-count — same cross-doc-duplicated-substring
  signal, expressible as two partial-agg shuffles instead of a
  global sort.
- ``remove_repeated_chunks`` — the removal half, in the C4 shape
  (Raffel et al. 2020 §2.2 removed every three-sentence span that
  occurred more than once in the corpus): drop every fixed-width
  token chunk whose exact text occurs ≥ min_count times corpus-wide,
  then REASSEMBLE each document from its surviving chunks in
  original order. The reassembly is the interesting plan: posexplode
  → hash-keyed anti-join → order-restoring re-aggregation.

Scale notes (100 TB):
- Window/chunk payloads shuffled for the frequency count are 60-bit
  md5 hashes (8 bytes), never span text; with stride-1 windows the
  exploded row count is ~n_tokens per doc, and the count aggregate
  is partial (map-side combine) so the shuffle carries one row per
  DISTINCT hash per partition, not per occurrence.
- The duplicated-hash set joins back via left_semi/left_anti on the
  same hash key as the count — AQE reuses the exchange, and at scale
  the frequent-chunk side is ≪ corpus size (it is the output of a
  HAVING count filter), so AQE may further demote it to broadcast.
- ``remove_repeated_chunks`` must shuffle chunk TEXT exactly once —
  the groupBy(doc_id) that reassembles documents. That shuffle is
  irreducible: the rebuilt corpus IS the output. Stride-1 spans are
  never reassembled, so ``duplicate_span_stats`` stays hash-only.
- Both operators count *cross-doc* duplication the way the papers
  do; a span repeated only within one document is not flagged
  (min_docs counts distinct documents).

Hash-vs-text equivalence: the DuckDB oracles group by span TEXT
while this module groups by 60-bit md5 (functions/text.md5_long).
Collision odds among ~10^5 spans per sf are ~10^-10; the same
accepted idiom as dedup/exact.py and dedup/jaccard.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.functions.numeric import fixed
from miba_2023_capstone_rb_nlp_spark.functions.text import (
    md5_long,
    tokens,
    word_ngrams,
)


def duplicate_span_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    width: int = 8,
    min_docs: int = 2,
    max_frac: float = 0.5,
) -> DataFrame:
    """Per-document cross-corpus duplicated-span statistics.

    Columns: ``n_spans`` (stride-1 windows of ``width`` tokens),
    ``n_dup_spans`` (window positions whose text occurs in ≥
    ``min_docs`` distinct documents), ``dup_span_frac``, and a
    ``keep`` flag (frac ≤ ``max_frac`` — a doc that is mostly
    someone else's text is dropped, Lee et al.'s policy).

    Plan — the text is tokenized and hashed exactly ONCE (a naive
    count-then-semi-join formulation re-scans and re-hashes the
    corpus per consumer; profiled 1.5× slower at sf0.1):
      1. map-side window hashing (transform over a sequence — no
         explode until the hash array exists) → explode to
         (doc, hash) and partial-agg to per-(hash, doc) counts;
      2. an unordered window over hash marks cross-doc duplication
         (count of docs per hash ≥ min_docs) — sort on the 8-byte
         hash only, rows already collapsed to distinct (hash, doc);
      3. partial-agg the flagged counts back per doc.
    The n_spans denominator comes from a hash-free arithmetic-only
    second scan (size(tokens) − width + 1 — no md5, no explode).
    """
    spans = F.transform(word_ngrams(F.col(text_col), width), md5_long)
    pairs = (
        df.select(F.col(id_col), F.explode(spans).alias("h"))
        .groupBy("h", id_col)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nd = F.count(F.lit(1)).over(Window.partitionBy("h"))
    per = (
        pairs.withColumn("nd", nd)
        .filter(F.col("nd") >= min_docs)
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_dup_spans"))
    )
    base = df.select(
        F.col(id_col),
        F.greatest(
            F.size(tokens(F.col(text_col))) - (width - 1), F.lit(0)
        ).alias("n_spans"),
    )
    frac = F.col("n_dup_spans").cast("double") / F.greatest(
        F.col("n_spans"), F.lit(1)
    )
    return (
        base.join(per, id_col, "left")
        .na.fill({"n_dup_spans": 0})
        .select(
            id_col,
            "n_spans",
            "n_dup_spans",
            fixed(frac, 6).alias("dup_span_frac"),
            (frac <= max_frac).alias("keep"),
        )
    )


def _chunks(text_col: Column, chunk_tokens: int) -> Column:
    """Non-overlapping ``chunk_tokens``-wide token chunks as
    space-joined strings; the last chunk may be shorter (slice
    clamps). Pure column expression — no explode, no shuffle."""
    t = tokens(text_col)
    n_chunks = F.ceil(F.size(t) / F.lit(chunk_tokens)).cast("int")
    return F.when(F.size(t) < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_chunks),
            lambda i: F.concat_ws(
                " ", F.slice(t, (i - 1) * chunk_tokens + 1, chunk_tokens)
            ),
        )
    )


def remove_repeated_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 5,
    min_count: int = 3,
) -> DataFrame:
    """C4-style corpus-frequency chunk removal with document
    reassembly.

    Every non-overlapping ``chunk_tokens``-token chunk whose exact
    text occurs ≥ ``min_count`` times across the whole corpus (any
    document, including repeats within one) is deleted from every
    document; survivors are re-joined in original order into
    ``clean_text``. Columns: ``n_chunks``, ``n_removed``,
    ``clean_text`` ('' when everything was removed).

    Plan: posexplode(chunks) → hash-only frequency count (partial
    agg) → left_anti on the same hash key (exchange reuse) → ONE
    text-carrying shuffle: groupBy(doc_id) with an order-restoring
    array_sort(collect_list(struct(pos, chunk))) re-aggregation.
    """
    base = df.select(
        F.col(id_col), _chunks(F.col(text_col), chunk_tokens).alias("_cs")
    ).select(F.col(id_col), F.size("_cs").alias("n_chunks"), F.col("_cs"))
    e = base.select(
        id_col, F.posexplode("_cs").alias("pos", "chunk")
    ).withColumn("h", md5_long(F.col("chunk")))
    freq = (
        e.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select("h")
    )
    rebuilt = (
        e.join(freq, "h", "left_anti")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "chunk"))
                    ),
                    lambda x: x["chunk"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    return (
        base.drop("_cs")
        .join(rebuilt, id_col, "left")
        .na.fill({"n_kept": 0, "clean_text": ""})
        .select(
            id_col,
            "n_chunks",
            (F.col("n_chunks") - F.col("n_kept")).cast("int").alias("n_removed"),
            "clean_text",
        )
    )
