"""Connected components — dup-cluster resolution for near-dedup.

After candidate generation (MinHash bands / simhash prefixes) and pair
verification, duplicates form a GRAPH: doc A ~ B, B ~ C means {A,B,C} is
one cluster even if A ~ C was never scored. Cluster id = the component's
minimum doc id (deterministic canonical representative — the reference's
"keep first seen" generalized).

Algorithm: iterative min-label propagation — each round every node adopts
the smallest label among itself and its neighbors; converges in O(diameter)
rounds. Each round is one shuffle (join labels⋈edges + min-aggregate);
the driver only reads a single convergence counter per round (a control
scalar, not data). Lineage is truncated per round with localCheckpoint so
plans don't grow with iterations. For pathological diameters at 100 TB,
swap in the large-star/small-star variant (same join shapes, O(log n)
rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """(node, component) with component = min node id reachable.

    `nodes` must contain every vertex (isolated docs form singleton
    clusters); `edges` is undirected input (symmetrized here).
    """
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("comp")
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
                (F.coalesce("nbr_comp", F.col("comp")) < F.col("comp")).alias(
                    "_changed"
                ),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = updated.filter(F.col("_changed")).count()  # control scalar
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    return labels.select(F.col("node"), F.col("comp").alias("component"))


def dup_clusters(
    candidates: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Near-dup candidate pairs -> (doc_id, cluster_id, is_representative).

    Keep-policy downstream: filter is_representative to retain one doc per
    cluster (the minimum id — deterministic under any partitioning).
    """
    comp = connected_components(
        all_ids, candidates, node_col=id_col, src_col=a_col, dst_col=b_col
    )
    return comp.select(
        F.col("node").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_representative"),
    )
