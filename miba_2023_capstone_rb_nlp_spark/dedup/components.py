"""Connected components over the near-dup pair graph: turns pairwise
dedup output (exact / Jaccard / MinHash / SimHash candidates) into
duplicate GROUPS — the form a training-data pipeline actually
consumes (keep one canonical doc per component).

Algorithm: iterative min-label propagation on the symmetrized edge
list. Each round is one equi-join (labels onto edge sources) + one
min-aggregate (per destination) + one label update — two shuffles,
all spillable, no driver-side graph. Rounds needed = graph diameter;
near-dup graphs are dense clusters with tiny diameter (2-4 here).
For adversarial long-chain graphs swap in the alternating
large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) which converges in O(log^2 n)
rounds; the propagation step below is the same building block.

Per-round DataFrames are persisted and the previous round unpersisted
so lineage stays O(1) deep (no exponential re-execution under lazy
eval); convergence is detected by counting changed labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str,
    src: str,
    dst: str,
    max_iter: int = 20,
) -> DataFrame:
    """→ [id_col, component] where component = min vertex id reachable
    in the undirected graph (isolated vertices: their own id).
    Raises if not converged within ``max_iter`` rounds.
    """
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionAll(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # localCheckpoint each round: ``labels`` appears twice per
    # iteration (message build + update join), so the logical plan
    # doubles every round — persist alone caches data but analysis/
    # planning cost still grows 2^rounds. Checkpointing resets the
    # plan to a leaf; on a real cluster use reliable checkpoint() to
    # HDFS for fault tolerance instead.
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("lbl")
    ).localCheckpoint(eager=True)
    try:
        for _ in range(max_iter):
            msgs = (
                sym.join(labels, sym["s"] == labels["id"])
                .groupBy("d")
                .agg(F.min("lbl").alias("mlbl"))
            )
            upd = (
                labels.join(msgs, labels["id"] == msgs["d"], "left")
                .select(
                    labels["id"],
                    F.least("lbl", "mlbl").alias("lbl"),  # least skips nulls
                    (F.col("mlbl") < F.col("lbl")).alias("__chg"),
                )
                .localCheckpoint(eager=True)
            )
            changed = upd.where(F.col("__chg")).count()
            labels = upd.drop("__chg")
            if changed == 0:
                return labels.select(
                    F.col("id").alias(id_col), F.col("lbl").alias("component")
                )
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    finally:
        sym.unpersist()
