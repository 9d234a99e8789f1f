"""Iterative graph operators: connected components by min-label
propagation — the transitive closure step that turns pairwise near-dup
candidates (MinHash/LSH edges) into duplicate CLUSTERS (a pair-wise
threshold alone is not transitive).

Spark-first iteration: each round is one join + one aggregate; lineage
is cut with localCheckpoint so the plan does not grow with the iteration
count. Converges in graph-diameter rounds — near-dup clusters are
shallow (diameter 2-3), so this is 3-4 cheap jobs, not a long loop. At
cluster scale the same loop runs with the edge list partitioned by src;
each round is a shuffle on id (GraphFrames' connectedComponents uses the
same alternating big-star/small-star idea).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Return (id, component) with component = min node id reachable.
    Nodes absent from any edge form singleton components."""
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            edges.select(
                F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).localCheckpoint()

    for _ in range(max_iter):
        msgs = sym.join(labels, sym.src == labels.id).select(
            F.col("dst").alias("id"), F.col("component")
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
