"""MinHash signatures + banded LSH candidate pairs — the scale path
for near-dup detection (sub-quadratic: candidates only on band
collisions).

Hash family: Kirsch-Mitzenmacher double hashing
h_i(s) = md5_60("A:"+s) + i * md5_56("B:"+s) — two md5 evaluations
per shingle instead of k (the signature build is md5-bound), the
classic two-hash construction whose LSH behavior matches independent
hashes, engine-identical (oracle parity), and stable across cluster
runs (unlike JVM-seeded murmur). i ≤ 15 keeps h_i < 2^61: no BIGINT
overflow in any engine.

Scale: signature build is one explode + one groupBy(doc) with k
min-aggregates (map-side partial); band join shuffles on (band,
signature) which is uniform by construction — no skew mitigation
needed. k=16, bands=4×4 targets the jaccard≈0.3+ regime
(P[collide] = 1-(1-j^4)^4).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miba_2023_capstone_rb_nlp_spark.functions.numeric import fixed

K = 16
BANDS = 4
ROWS_PER_BAND = K // BANDS


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, k: int = K
) -> DataFrame:
    """→ DataFrame[doc, h0..h{k-1}].

    One narrow mapInPandas pass: shingle, hash, and take the k mins
    per document in numpy — no explode and no k-column aggregate
    shuffle (the relational form ships n_shingles×k hash values
    through a groupBy; this ships k values per doc). All arithmetic is
    integer-exact, so the SQL oracle (which keeps the relational
    explode+min form) matches bit-for-bit. Tokenization (single-space
    split), distinct-shingle semantics, and the double-hash formula
    mirror functions.text / dedup.jaccard exactly.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    ii = np.arange(k, dtype=np.int64)

    def compute(batches):
        for pdf in batches:
            ids = pdf["doc"].to_numpy()
            keep: list[int] = []
            sigs: list[np.ndarray] = []
            for r, text in enumerate(pdf["txt"]):
                toks = text.split(" ")
                if len(toks) < n:
                    continue  # no shingles → no signature row (oracle drops too)
                shingles = list(
                    dict.fromkeys(
                        " ".join(toks[i : i + n])
                        for i in range(len(toks) - n + 1)
                    )
                )
                m1 = np.fromiter(
                    (
                        int(hashlib.md5(("A:" + s).encode()).hexdigest()[:15], 16)
                        for s in shingles
                    ),
                    dtype=np.int64,
                    count=len(shingles),
                )
                m2 = np.fromiter(
                    (
                        int(hashlib.md5(("B:" + s).encode()).hexdigest()[:14], 16)
                        for s in shingles
                    ),
                    dtype=np.int64,
                    count=len(shingles),
                )
                keep.append(r)
                sigs.append((m1[:, None] + m2[:, None] * ii).min(axis=0))
            out = (
                np.stack(sigs) if sigs else np.empty((0, k), dtype=np.int64)
            )
            yield pd.DataFrame(
                {"doc": ids[keep], **{f"h{i}": out[:, i] for i in range(k)}}
            )

    base = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("txt"))
    schema = "doc bigint, " + ", ".join(f"h{i} bigint" for i in range(k))
    return base.mapInPandas(compute, schema=schema)


def _band_sig(band: int) -> F.Column:
    cols = [F.col(f"h{band * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
    return F.md5(F.concat_ws(",", *[c.cast("string") for c in cols]))


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    k: int = K,
    bands: int = BANDS,
    scale: int = 6,
) -> DataFrame:
    """→ DataFrame[da, db, est_jaccard]: distinct pairs colliding in
    ≥1 band; est_jaccard = matching minhashes / k (exact multiple of
    1/k — engine-deterministic)."""
    sig = minhash_signatures(df, text_col, id_col, n, k)
    # one self-join on (band_index, band_signature) after posexplode —
    # both sides share the shuffle exchange so the signature build runs
    # once (a union of per-band joins recomputes it per branch)
    banded = sig.select(
        "doc",
        *[F.col(f"h{i}") for i in range(k)],
        F.posexplode(
            F.array(*[_band_sig(b) for b in range(bands)])
        ).alias("bi", "bv"),
    )
    # SHUFFLE_HASH: exchange-reuse computes the signature build once
    a = banded.hint("SHUFFLE_HASH").alias("a")
    bb = banded.alias("b")
    # est_jaccard is computed BEFORE the pair dedup (r15, guide §2.3):
    # it is a pure function of the two signatures, so duplicate
    # band-collision rows carry identical values and dropDuplicates
    # keeps the same result — but the dedup exchange now moves
    # (da, db, est) = 3 columns instead of the 2k+3 signature columns
    # (32 bigints ≈ 256 bytes/row of dead shuffle weight at any scale).
    matches = reduce(
        lambda acc, i: acc
        + F.when(F.col(f"a.h{i}") == F.col(f"b.h{i}"), 1).otherwise(0),
        range(k),
        F.lit(0),
    )
    pairs = a.join(
        bb,
        (F.col("a.bi") == F.col("b.bi"))
        & (F.col("a.bv") == F.col("b.bv"))
        & (F.col("a.doc") < F.col("b.doc")),
    ).select(
        F.col("a.doc").alias("da"),
        F.col("b.doc").alias("db"),
        fixed(matches.cast("double") / k, scale).alias("est_jaccard"),
    )
    return pairs.dropDuplicates(["da", "db"])
