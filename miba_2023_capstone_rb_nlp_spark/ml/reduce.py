"""Dimensionality reduction (SURVEY M9): one-pass distributed PCA as
the scale path; UMAP as a gated driver-side stub (no distributed UMAP
exists — it needs a global kNN graph; reference runs it in-process,
word_wizard.py:513-559).

PCA design (replaces the earlier MLlib ``pyspark.ml.feature.PCA``
path): the fit is ONE mapInPandas pass emitting per-partition moments
(n, Σx, XᵀX — a d×d matrix per partition, the classic combiner
pattern), combined on the driver into the covariance whose
eigendecomposition is a d×d numpy call. The projection is then a pure
column expression (whole-stage codegen, no Python) over the input.
MLlib's RowMatrix path schedules several jobs (tree-aggregated
covariance + gram) and a row-at-a-time transform; this is one job +
codegen, and the moments output is ~d² doubles per partition
regardless of data size, so it holds at 100 TB unchanged. Dimension
bounds: the moment pass carries d² doubles per partition (see
``_moment_pass``), and the expression-tree projection is used only
while d×k ≤ ``MAX_CODEGEN_DIM_TERMS`` — wider embeddings project via
an Arrow-batched pandas UDF with identical accumulation order.

Output column named ``reduced_dimensions`` — normalizing the
reference's misleading ``*_word_embeddings`` suffix reuse
(word_wizard.py:557, documented deviation). Deviation from MLlib
transform semantics: coordinates are mean-centered before projection
(MLlib projects raw vectors; here the centering is algebraically
folded into per-component constant offsets so the projection is a
pure dot-product expression), and each component's sign is fixed so
its largest-magnitude loading is positive — deterministic across
partitionings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Codegen ceiling for the expanded projection expression: each output
# component is a d-term multiply-add chain, so the expression tree has
# d×k leaf pairs. Past a few hundred dims the generated method risks
# the JVM's 64 KB bytecode-per-method limit and Spark silently falls
# back out of whole-stage codegen (SURVEY notes the same hazard for
# the 64-dim blas expressions). Above this bound the projection runs
# as ONE Arrow-batched pandas UDF instead — same accumulation order
# (left-assoc over dims), so results are bit-identical across paths.
MAX_CODEGEN_DIM_TERMS = 2048  # d × k budget for the expression path


def _moment_pass(fit_df: DataFrame, vec_col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass → (n, Σx, XᵀX), combined driver-side.
    Emits one row of d + d² doubles per partition — constant-size
    output, so the collect is bounded by partition count, not rows."""

    # Scale bound: the per-partition payload is d² doubles (8 MB at
    # d=1000). For very wide embeddings beyond that, replace the
    # single collect with a treeAggregate-style two-level combine
    # (partition → executor → driver); the math is unchanged.
    def moments(batches):
        import pandas as pd

        n = 0
        s = None
        xtx = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            xtx = g if xtx is None else xtx + g
        if n == 0:
            return
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "xtx": [xtx.ravel().tolist()]}
        )

    rows = (
        fit_df.select(F.col(vec_col).cast("array<double>").alias(vec_col))
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(moments, schema="n long, s array<double>, xtx array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("pca_reduce: empty fit input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    d = s.shape[0]
    xtx = np.sum([np.asarray(r["xtx"]).reshape(d, d) for r in rows], axis=0)
    return n, s, xtx


def pca_components(
    fit_df: DataFrame, vec_col: str, n_components: int
) -> tuple[np.ndarray, np.ndarray]:
    """→ (mean[d], W[d, k]): top-k covariance eigenvectors, sign-fixed
    (largest-|loading| entry positive) for determinism."""
    n, s, xtx = _moment_pass(fit_df, vec_col)
    mean = s / n
    denom = max(n - 1, 1)
    cov = (xtx - np.outer(mean, s)) / denom
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:n_components]
    w = eigvecs[:, order]
    for j in range(w.shape[1]):
        i = int(np.abs(w[:, j]).argmax())
        if w[i, j] < 0:
            w[:, j] = -w[:, j]
    return mean, w


def pca_reduce(
    df: DataFrame,
    vec_col: str,
    n_components: int = 2,
    out_col: str = "reduced_dimensions",
    fit_df: DataFrame | None = None,
    components: tuple[np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """Distributed PCA → array<double> coords (see module docstring
    for the one-pass design).

    Bad-input contract: NULL vectors are excluded from the fit, and
    the transform emits NULL (whole array) for NULL or wrong-length
    vectors — never a silent array-of-nulls row.

    ``fit_df``: optional frame to fit the model on instead of ``df``
    — pass a persisted upstream base with the same rows (1:1 lineage)
    so the fit action scans the cache rather than recomputing every
    enrichment join stacked on top of it. The transform still applies
    to ``df``.

    ``components``: optional precomputed ``(mean, W)`` from
    ``pca_components`` — the fit/transform split for callers that
    already ran (and perhaps inspected) the fit, so the moment pass
    over the corpus is not paid a second time; takes precedence over
    ``fit_df``.
    """
    mean, w = (
        components
        if components is not None
        else pca_components(fit_df if fit_df is not None else df,
                            vec_col, n_components)
    )
    d, k = w.shape
    # Mean-centering folded into per-component constants:
    #   Σᵢ (vᵢ−mᵢ)·wᵢⱼ ≡ Σᵢ vᵢ·wᵢⱼ − Σᵢ mᵢ·wᵢⱼ
    # The offsets are computed ONCE here (left-assoc, the same order
    # both execution paths accumulate in), halving the projection
    # expression — plan compile time is the dominant cost of this
    # query at bench scale, and every term removed is compile saved.
    offsets = []
    for j in range(k):
        acc = 0.0
        for i in range(d):
            acc = acc + float(mean[i]) * float(w[i, j])
        offsets.append(acc)
    if d * k > MAX_CODEGEN_DIM_TERMS:
        return _project_pandas(df, vec_col, out_col, w, offsets)
    # cast the array ONCE into a temp column — inlining the cast into
    # every v[i] reference would repeat it d×k times in the plan
    tmp = "_pca_cast_tmp"
    v = F.col(tmp)
    coords = F.array(
        *[
            sum(v[i] * F.lit(float(w[i, j])) for i in range(d))
            - F.lit(offsets[j])
            for j in range(k)
        ]
    )
    # Null semantics (explicit, both paths): a NULL or wrong-length
    # vector yields a NULL output array — never a silent array of
    # nulls (the fit already excludes NULL vectors; the old behavior
    # produced garbage rows where MLlib failed loudly). Interior NULL
    # elements still propagate per-component, as in any SQL sum.
    return (
        df.withColumn(tmp, F.col(vec_col).cast("array<double>"))
        .withColumn(
            out_col,
            F.when(v.isNotNull() & (F.size(v) == F.lit(d)), coords),
        )
        .drop(tmp)
    )


def _project_pandas(
    df: DataFrame, vec_col: str, out_col: str, w: np.ndarray, offsets: list
) -> DataFrame:
    """Arrow-batched projection for wide embeddings (d×k above the
    codegen budget). Accumulates component sums dim-by-dim in the same
    left-assoc order as the expression path and subtracts the same
    driver-computed mean offsets, so the two paths are bit-identical;
    NULL/wrong-length vectors yield NULL (same contract as the
    expression path)."""
    from pyspark.sql.types import ArrayType, DoubleType

    d, k = w.shape
    w_l, off_l = w.tolist(), list(offsets)  # ship plain lists, not np

    @F.pandas_udf(ArrayType(DoubleType()))
    def proj(s: pd.Series) -> pd.Series:
        ww = np.asarray(w_l)
        off = np.asarray(off_l)
        valid = np.array(
            [vec is not None and len(vec) == d for vec in s], dtype=bool
        )
        out = [None] * len(s)
        if valid.any():
            x = np.stack(
                [np.asarray(vec, dtype=np.float64) for vec in s[valid]]
            )
            acc = np.zeros((x.shape[0], k))
            for i in range(d):  # left-assoc over dims == codegen order
                acc = acc + x[:, i][:, None] * ww[i]
            acc = acc - off
            for pos, row in zip(np.nonzero(valid)[0], acc):
                out[pos] = row.tolist()
        return pd.Series(out)

    return df.withColumn(out_col, proj(F.col(vec_col).cast("array<double>")))


def umap_reduce(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_components: int = 2,
    out_col: str = "reduced_dimensions",
) -> DataFrame:
    """Driver-side UMAP (gated): collect embeddings, fit, join coords
    back by id. Documented scale ceiling — prefer pca_reduce beyond
    ~1M rows."""
    try:
        import umap
    except ImportError as e:  # pragma: no cover - env without umap
        raise NotImplementedError(
            "umap-learn is not installed; use pca_reduce for the "
            "distributed path"
        ) from e
    import numpy as np

    rows = df.select(id_col, vec_col).collect()
    ids = [r[0] for r in rows]
    vecs = np.array([r[1] for r in rows])
    coords = umap.UMAP(
        n_components=n_components, n_neighbors=15, min_dist=0.0, metric="cosine",
        random_state=42,
    ).fit_transform(vecs)
    label_df = df.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in zip(ids, coords)],
        [id_col, out_col],
    )
    return df.join(label_df, id_col, "left")
