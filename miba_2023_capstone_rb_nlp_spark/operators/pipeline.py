"""Pipeline shaping (SURVEY §3.1 steps 3/5): P1 link filter, J1
links⋈content equi-join, paragraph explode with stable ordering, and
deterministic row identity.

Reference parity: ``pipeline_executor.py:106-118``. Deviations (per
SURVEY §7 hard-parts): row identity is the *join key* (not a
positional ``reset_index``) and paragraph order is materialized as an
explicit ``pos`` column via ``posexplode`` — Spark gives no implicit
row order, so order-bearing state must be a column.

Scale: the join shuffles on the URL key (or broadcasts the links side
when small — Catalyst/AQE decides); explode is pipelined, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_articles(
    links: DataFrame,
    content: DataFrame,
    paragraph_col: str = "bs_paragraph",
    id_col: str = "article_index",
) -> DataFrame:
    """links ⋈ content → one row per paragraph with (id, pos).

    Output columns: id_col, pos, paragraph + all non-array columns of
    both inputs (n3k_published dropped, pipeline_executor.py:117).
    """
    filtered = links.filter(F.col("se_link").isNotNull())  # P1
    joined = filtered.join(
        content, filtered["se_link"] == content["bs_link"], "inner"
    )  # J1
    if "n3k_published" in joined.columns:
        joined = joined.drop("n3k_published")  # P3
    keep = [c for c in joined.columns if c != paragraph_col]
    return joined.select(
        *keep, F.posexplode(F.col(paragraph_col)).alias("pos", "paragraph")
    )
