"""Kernel-level edge cases for dedup/spans.py that the corpus-level
parity test cannot isolate: short docs, intra-doc-only repeats,
full-removal reassembly, and exact reconstruction."""

from __future__ import annotations

from miba_2023_capstone_rb_nlp_spark.dedup.spans import (
    duplicate_span_stats,
    remove_repeated_chunks,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_short_doc_has_zero_spans_and_keeps(spark):
    rows = [(1, "a b c"), (2, "a b c")]  # 3 tokens < width=8 → no spans
    out = {
        r["doc_id"]: r
        for r in duplicate_span_stats(_df(spark, rows), "text", "doc_id").collect()
    }
    assert out[1]["n_spans"] == 0
    assert out[1]["n_dup_spans"] == 0
    assert out[1]["dup_span_frac"] == 0.0
    assert out[1]["keep"] is True


def test_intra_doc_repeat_not_flagged_cross_doc_is(spark):
    eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [
        (1, eight + " x " + eight),  # same span twice, ONE doc
        (2, "q1 q2 q3 q4 q5 q6 q7 q8 q9"),
        (3, "q1 q2 q3 q4 q5 q6 q7 q8 z9"),  # shares one 8-window with 2
    ]
    out = {
        r["doc_id"]: r
        for r in duplicate_span_stats(_df(spark, rows), "text", "doc_id").collect()
    }
    assert out[1]["n_dup_spans"] == 0  # min_docs counts DISTINCT docs
    assert out[2]["n_dup_spans"] == 1 and out[3]["n_dup_spans"] == 1


def test_mostly_duplicated_doc_is_dropped(spark):
    base = " ".join(f"t{i}" for i in range(20))
    rows = [(1, base), (2, base + " unique tail")]
    out = {
        r["doc_id"]: r
        for r in duplicate_span_stats(_df(spark, rows), "text", "doc_id").collect()
    }
    assert out[1]["keep"] is False  # 100% of doc 1's spans are shared
    assert out[1]["dup_span_frac"] == 1.0


def test_rebuild_reconstructs_untouched_doc_exactly(spark):
    # 11 tokens → chunks of 5,5,1; nothing repeats ≥3 times
    text = "a b c d e f g h i j k"
    out = remove_repeated_chunks(
        _df(spark, [(1, text)]), "text", "doc_id"
    ).collect()[0]
    assert out["n_chunks"] == 3
    assert out["n_removed"] == 0
    assert out["clean_text"] == text


def test_rebuild_full_removal_yields_empty_text(spark):
    chunk = "c1 c2 c3 c4 c5"
    rows = [(i, chunk) for i in range(1, 4)]  # chunk occurs 3× corpus-wide
    out = {
        r["doc_id"]: r
        for r in remove_repeated_chunks(_df(spark, rows), "text", "doc_id").collect()
    }
    for i in range(1, 4):
        assert out[i]["n_removed"] == 1
        assert out[i]["clean_text"] == ""


def test_rebuild_preserves_order_of_survivors(spark):
    bad = "r1 r2 r3 r4 r5"
    rows = [
        (1, "a1 a2 a3 a4 a5 " + bad + " z1 z2 z3 z4 z5"),
        (2, bad),
        (3, bad),
    ]
    out = {
        r["doc_id"]: r
        for r in remove_repeated_chunks(_df(spark, rows), "text", "doc_id").collect()
    }
    assert out[1]["clean_text"] == "a1 a2 a3 a4 a5 z1 z2 z3 z4 z5"
    assert out[1]["n_removed"] == 1


def test_int8_quantize_clamps_and_floors():
    import numpy as np

    from miba_2023_capstone_rb_nlp_spark.similarity.knn import quantize_int8

    x = np.array([[0.0, 1.0, -1.0, 2.5, -2.5, 0.015, -0.015]])
    out = quantize_int8(x)
    assert out.dtype == np.int64
    # floor(x*64) then clamp to [-127, 127]
    assert out.tolist() == [[0, 64, -64, 127, -127, 0, -1]]
