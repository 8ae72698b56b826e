"""Connected components — dup-cluster resolution for near-dedup.

After candidate generation (MinHash bands / simhash prefixes) and pair
verification, duplicates form a GRAPH: doc A ~ B, B ~ C means {A,B,C} is
one cluster even if A ~ C was never scored. Cluster id = the component's
minimum doc id (deterministic canonical representative — the reference's
"keep first seen" generalized).

Algorithm: alternating large-star / small-star contraction (the
MapReduce-era two-phase star algorithm; public literature: Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14):

  * large-star(u): every neighbor v > u re-links to m = min(N(u) ∪ {u})
  * small-star(u): every neighbor v <= u (and u itself) links to m

Each phase is ONE exchange of the edge list with a window MIN over the
star key (min + member rows from the same exchange — the groupBy+join
formulation computed the input subtree once per side) — the same shuffle
volume as one round of label propagation — and the alternation converges
in O(log n) rounds instead of O(diameter). A 1000-node path
graph converges in ~10 rounds where plain min-label propagation needs 999
(and would silently hit the iteration cap). The driver only ever reads a
two-scalar convergence fingerprint per round; edge data never leaves the
executors. Lineage is truncated per round with localCheckpoint so plans
don't grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _round_fingerprint(dir_edges: DataFrame) -> tuple[int, int]:
    """(edge_count, xor-of-edge-hashes): one tiny action per round.

    Equal fingerprints => the canonical edge set is unchanged (a 64-bit
    xor collision between *different* consecutive edge sets is the only
    false-stop, and the alternation is monotone toward the star fixpoint,
    so the practical risk is nil versus the cost of an exact set compare).
    """
    row = dir_edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.expr("bit_xor(xxhash64(hi, lo))"), F.lit(0).cast("long")
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _star_round(dir_edges: DataFrame) -> DataFrame:
    """One alternation round: large-star then small-star over a canonical
    hi->lo edge frame; returns the next canonical edge frame
    (pre-checkpoint). Exposed for tools/capture_body_plans.py so the
    committed iteration-body plan is BUILT FROM this exact code.

    Each star phase needs, per grouping key, BOTH the per-key minimum
    and every member row. groupBy+self-join computed the (non-reusable,
    checkpoint-rooted but union-heavy) input subtree once PER SIDE —
    the r11 before-body plan shows 22 Exchanges per round, the whole
    large-star output duplicated under mins2 and under the relink join.
    A window MIN partitioned by the key delivers min+members from ONE
    exchange of the frame (guide §2.4: operations keyed the same way
    share one exchange); values are identical (same min over the same
    partition). Skew caveat: a mega-degree key lands in one window
    partition, but the SMJ alternative sorted the same partition on the
    same key, so nothing is lost vs the join formulation.
    """
    # -- large-star: v > u re-links to m = min(N(u) ∪ {u}) -------------
    sym = dir_edges.select(
        F.col("hi").alias("a"), F.col("lo").alias("b")
    ).unionByName(dir_edges.select(F.col("lo").alias("a"), F.col("hi").alias("b")))
    large = (
        sym.withColumn("mn", F.min("b").over(Window.partitionBy("a")))
        .where(F.col("b") > F.col("a"))
        # b > a >= m, so (b, m) is already hi->lo canonical
        .select(
            F.col("b").alias("hi"),
            F.least(F.col("a"), F.col("mn")).alias("lo"),
        )
    )

    # -- small-star: u and its smaller neighbors link to m -------------
    l2 = large.withColumn("mn", F.min("lo").over(Window.partitionBy("hi")))
    # Emit BOTH output kinds from one pass over l2 (a union of a relink
    # branch and a self-link branch would root two plan branches at the
    # same window subtree — computed once per branch unless runtime
    # exchange reuse happens to fire): per member row, always (hi, mn)
    # [self-link; one per key after distinct], plus (lo, mn) when
    # lo != mn [relink; lo > mn so canonical]. Set output identical.
    both = F.when(
        F.col("lo") != F.col("mn"),
        F.array(
            F.struct(F.col("lo").alias("hi"), F.col("mn").alias("lo")),
            F.struct(F.col("hi").alias("hi"), F.col("mn").alias("lo")),
        ),
    ).otherwise(
        F.array(F.struct(F.col("hi").alias("hi"), F.col("mn").alias("lo")))
    )
    return (
        l2.select(F.explode(both).alias("e"))
        .select("e.hi", "e.lo")
        .where(F.col("hi") != F.col("lo"))
        .distinct()
    )


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
    clusters); `edges` is undirected input (direction-normalized here).
    """
    # canonical directed edges hi -> lo (hi > lo); self-loops dropped.
    # localCheckpoint is LAZY: the fingerprint action right below is the
    # round's one job and materializes the checkpoint as a side effect —
    # eager=True would run a second, redundant materialization job per
    # round (guide §1.2: the driver-side job count is the cost here, the
    # per-round data is candidate-pair-sized).
    dir_edges = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("hi"), F.least("u", "v").alias("lo"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_fp = _round_fingerprint(dir_edges)

    for _ in range(max_iterations):
        # Lazy checkpoint: the fingerprint below is the round's single
        # action — it materializes the checkpoint and reads the two
        # convergence scalars in ONE job (eager=True cost a second
        # full-round job purely to materialize first).
        new_dir = _star_round(dir_edges).localCheckpoint(eager=False)

        fp = _round_fingerprint(new_dir)
        dir_edges = new_dir
        if fp == prev_fp:
            break
        prev_fp = fp

    # fixpoint = star forest: every non-root points straight at its
    # component minimum; isolated nodes label themselves
    star = dir_edges.select(F.col("hi").alias("node"), F.col("lo").alias("comp"))
    return (
        nodes.select(F.col(node_col).alias("node"))
        .join(star, "node", "left")
        .select("node", F.coalesce("comp", F.col("node")).alias("component"))
    )


def leakage_safe_split(
    clusters: DataFrame,
    cluster_col: str = "cluster_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Add a train/val/test `split` column keyed on the CLUSTER id.

    The standard random split leaks: near-duplicate documents land on
    both sides of the train/test boundary and the eval set scores
    memorization. Splitting by the dup-cluster representative instead
    of the document id guarantees a whole near-dup cluster moves as one
    unit — no member of a train cluster can appear in val/test.

    The bucket is the first 15 md5 hex nibbles of the cluster id mod
    100 — engine-portable, deterministic under any partitioning, and
    stable across runs (re-splitting a grown corpus keeps every old
    cluster's assignment unless its representative changed).
    """
    b = (
        F.conv(
            F.substring(F.md5(F.col(cluster_col).cast("string")), 1, 15),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return clusters.withColumn("split", split)


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
