"""Quantized-integer PageRank — graph ranking with bit-exact,
engine-portable iterations.

Why it exists: the dedup tier already builds graphs (candidate pairs ->
connected components, operators/graph.py); curation also needs graph
*ranking* — picking authoritative/representative records from a linked
corpus (citation graphs, host link graphs, user-item interaction
graphs). PageRank is the canonical such ranking (public literature:
Brin & Page 1998; the MapReduce formulation is the textbook iterative
Spark workload).

Determinism contract (the `_q9` lesson from SCALE.md round 9: float
summation order and cross-engine rounding are NOT portable): every
quantity here is a scaled BIGINT numerator, every division is integer
floor division on non-negative operands, every aggregate is an exact
integer SUM. Both engines therefore compute the IDENTICAL lattice
point at every iteration — equality holds BY CONSTRUCTION, not by data
luck. The price is a documented quantization: each `div` drops its
remainder, so total mass decays by < N units per iteration (at the
default total mass of 10^15 that is a ~1e-9 relative loss per step —
far below any ranking-relevant signal).

Update rule, all integer (d = damping_num/damping_den, default 85/100):

    s            = total_mass div N                  (per-node seed)
    contrib(u,v) = r(u) div outdeg(u)                (u -> v edge)
    dangling     = sum of r(u) where outdeg(u) = 0
    r'(v)        = ((den-num)*s) div den
                 + (num * (dangling div N)) div den
                 + (num * insum(v)) div den

Spark-first / 100 TB posture:
  * The edge list is the only corpus-sized frame. It is joined with its
    out-degree table ONCE and localCheckpoint'ed; per iteration the work
    is one |nodes|-row join shuffle (ranks into edges), one map-side-
    combinable hash agg back to |nodes| rows, and a 1-row dangling agg
    that broadcasts via the crossJoin(1-row) pattern
    (operators/sampling.py precedent) — the driver never materializes
    data.
  * Plans stay flat across iterations via per-step localCheckpoint
    (the operators/graph.py / operators/clustering.py discipline).
  * Overflow headroom: with total_mass = 10^15, every intermediate is
    <= damping_num * total_mass ~ 8.5e16 << 2^63; node count only
    *divides* mass, so the contract holds at any graph size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rag_pipelines_spark.operators.concurrency import checkpoint_all

__all__ = ["pagerank", "personalized_pagerank"]

TOTAL_MASS = 1_000_000_000_000_000  # 10^15: shared with the oracle

# Deliberate join-strategy gate (guide §3.1): the per-iteration frames
# (ranks, insum) are |nodes|-row, but they sit behind localCheckpoint —
# ExistingRDD has no stats, so Catalyst can never pick the broadcast
# join on its own and every iteration pays a full edge-list shuffle for
# a sort-merge join against a frame thousands of times smaller. Below
# this node count we supply the hint ourselves (restoring the stats the
# checkpoint erased); above it the shuffle join is the right plan and
# nothing changes. ~24 B/row -> the 4M default is a ~100 MB broadcast,
# inside Spark's own 8 GB broadcast ceiling with wide margin.
_BCAST_NODES_CAP = int(
    os.environ.get("SPARK_GRAFT_PAGERANK_BCAST_NODES", "4000000")
)


def _maybe_bcast(df: DataFrame, small: bool) -> DataFrame:
    return F.broadcast(df) if small else df


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 8,
    total_mass: int = TOTAL_MASS,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """(node, rank): quantized-integer PageRank after `iters` steps.

    `nodes` must contain every vertex (isolated vertices are dangling
    and receive teleport + dangling share only); `edges` is a DIRECTED
    (src, dst) list — deduplicate upstream if multiplicity is not
    intended (parallel edges weight the contribution).
    """
    # The node projection and the raw edge derivation are independent
    # job chains — materialize them overlapped (guide §2.6) instead of
    # back to back. The edge list is the ONLY corpus-sized frame;
    # materialize the raw (src, dst) derivation exactly once. Before r10
    # the out-degree table was lazy, so the per-iteration dangling
    # aggregate recomputed the entire upstream edge derivation (at the
    # registered graph: the orders x lineitem join + distinct) EVERY
    # iteration — ~8 corpus passes the profile showed as ~2.3 s of each
    # step's wall. Nothing edge-sized is joined-and-rematerialized
    # either: out-degrees ride the |nodes|-row frame below, so
    # contributions are computed per NODE (r div outdeg on |nodes| rows)
    # before the edge join, not per edge occurrence.
    n1, ec = checkpoint_all(
        nodes.select(F.col(node_col).alias("node")),
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")),
    )
    # 1-row parameter frame: n, s — broadcast everywhere it is needed,
    # so no driver-side count() action exists in the plan. Checkpointed
    # so the per-iteration broadcast re-reads 1 row, not the node agg.
    params = n1.agg(
        F.count("*").alias("n"),
        F.expr(f"CAST({total_mass} AS BIGINT) div count(*)").alias("s"),
    ).localCheckpoint(eager=True)
    deg = ec.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    # Static per-node frame: outdeg (NULL = dangling — never a divisor,
    # because dangling nodes match no edge src). The dangling set is
    # STATIC across iterations: resolved once here instead of an
    # anti-join per step.
    nd = n1.join(deg, "node", "left").localCheckpoint(eager=True)

    # node count for the join-strategy gate: params is already a
    # materialized 1-row frame, so this is a 1-row driver read (the
    # operators/graph.py convergence-scalar precedent), not a data
    # collect.
    small = params.first()["n"] <= _BCAST_NODES_CAP

    ranks = nd.crossJoin(F.broadcast(params)).select(
        "node", "outdeg", F.col("s").cast("long").alias("r")
    ).localCheckpoint(eager=True)

    base = (
        F.expr(f"(({damping_den - damping_num}) * s) div {damping_den}")
        + F.expr(f"({damping_num} * (dang div n)) div {damping_den}")
    )
    for _ in range(iters):
        # |nodes|-row contributions frame broadcast into the edge join
        # when the gate allows: the edge list (the one corpus-sized
        # frame) is then scanned in place — zero edge shuffle per
        # iteration; only the map-side-combined (dst, m) partials move.
        insum = (
            _maybe_bcast(
                ranks.select("node", F.expr("r div outdeg").alias("c")),
                small,
            )
            .join(ec, F.col("node") == ec["src"])
            .groupBy("dst")
            .agg(F.sum("c").alias("m"))
        )
        dang1 = (
            ranks.filter(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang"))
        )
        ranks = (
            nd.crossJoin(F.broadcast(params))
            .crossJoin(F.broadcast(dang1))
            .join(_maybe_bcast(insum, small), nd["node"] == insum["dst"], "left")
            .select(
                "node",
                "outdeg",
                (
                    base
                    + F.expr(
                        f"({damping_num} * coalesce(m, CAST(0 AS BIGINT)))"
                        f" div {damping_den}"
                    )
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank"))


def personalized_pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    iters: int = 8,
    total_mass: int = TOTAL_MASS,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """(node, rank): personalized PageRank — teleport and dangling mass
    return to the SEED SET only, so rank measures proximity to a curated
    set of nodes (curated-set expansion: 'find more records like these'
    — the graph analog of DSIR's frozen target distribution).

    Same quantized-integer contract as `pagerank`: seeds each start with
    `total_mass div n_seeds`; non-seeds start at 0; per iteration the
    teleport share `((den-num)*s) div den` and the dangling share
    `(num*(dang div n_seeds)) div den` are paid to seeds alone, while
    link mass flows to anyone. All floor divisions on non-negative
    BIGINTs — bit-identical across engines by construction.
    """
    # nodes / seeds / raw edges are three independent job chains —
    # materialize them overlapped (guide §2.6). The edge list is
    # materialized exactly once (same r10 fix as `pagerank`: a lazy
    # out-degree table made every iteration's dangling aggregate replay
    # the edge derivation); out-degrees ride the |nodes|-row frame so
    # nothing edge-sized is joined twice.
    n1, sd, ec = checkpoint_all(
        nodes.select(F.col(node_col).alias("node")),
        seeds.select(F.col(seed_col).alias("node")).distinct(),
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")),
    )
    params = sd.agg(
        F.count("*").alias("ns"),
        F.expr(f"CAST({total_mass} AS BIGINT) div count(*)").alias("s"),
    ).localCheckpoint(eager=True)
    deg = ec.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    # is_seed and outdeg (NULL = dangling) are both STATIC: resolve once
    # into per-node columns, so no per-iteration join against seeds or
    # the degree table exists
    marked = (
        n1.join(sd.withColumn("_isseed", F.lit(1)), "node", "left")
        .join(deg, "node", "left")
        .select(
            "node",
            F.coalesce("_isseed", F.lit(0)).alias("_isseed"),
            "outdeg",
        )
        .localCheckpoint(eager=True)
    )
    # join-strategy gate on the TOTAL node count (not the seed count in
    # `params`): 1-row driver read of a materialized agg.
    small = (
        n1.agg(F.count("*").alias("n")).first()["n"] <= _BCAST_NODES_CAP
    )
    ranks = marked.crossJoin(F.broadcast(params)).select(
        "node",
        "_isseed",
        "outdeg",
        F.when(F.col("_isseed") == 1, F.col("s").cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("r"),
    ).localCheckpoint(eager=True)

    seed_base = (
        F.expr(f"(({damping_den - damping_num}) * s) div {damping_den}")
        + F.expr(f"({damping_num} * (dang div ns)) div {damping_den}")
    )
    for _ in range(iters):
        # same gated-broadcast discipline as `pagerank`: ranks/insum are
        # |nodes|-row, the edge list never shuffles when the gate allows
        insum = (
            _maybe_bcast(
                ranks.select("node", F.expr("r div outdeg").alias("c")),
                small,
            )
            .join(ec, F.col("node") == ec["src"])
            .groupBy("dst")
            .agg(F.sum("c").alias("m"))
        )
        dang1 = (
            ranks.filter(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang"))
        )
        ranks = (
            marked.crossJoin(F.broadcast(params))
            .crossJoin(F.broadcast(dang1))
            .join(_maybe_bcast(insum, small), marked["node"] == insum["dst"], "left")
            .select(
                "node",
                "_isseed",
                "outdeg",
                (
                    F.when(F.col("_isseed") == 1, seed_base).otherwise(
                        F.lit(0).cast("long")
                    )
                    + F.expr(
                        f"({damping_num} * coalesce(m, CAST(0 AS BIGINT)))"
                        f" div {damping_den}"
                    )
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank"))
