"""Distributed graph operators.

connected_components() is the standard iterative min-label-propagation
formulation (cf. GraphX's ConnectedComponents / the MapReduce CC
literature): every vertex starts labeled with itself, each round takes
the min label over neighbors, then pointer-jumps (label <-
label(label)) so chains collapse in O(log n) rounds instead of
O(diameter). Each round is two shuffle joins over bounded-size
relations plus a localCheckpoint to truncate lineage; the only driver
action is a 1-row convergence probe per round — no data is collected.

Used by plans/dedup.py d9_dedup_clusters to turn near-dup PAIRS into
dedup CLUSTERS (the "which copies do I drop" answer).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger("risk_dashboard_database_spark.graph")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Edges (undirected; pass each pair once or twice, both work) ->
    (id, label) with label = min vertex id in the component. Vertices
    are the edge endpoints; isolated vertices should be unioned in by
    the caller (their label is trivially themselves).

    The round count is logged on convergence and written to
    ``stats["rounds"]`` when a dict is passed (VERDICT r6 #3): with
    pointer jumping the loop converges in O(log n) rounds, so on the
    100x corpus (where the build is the system's largest cost, ~212 s)
    a data-shaped regression to linear rounds must be LOUD — a
    warning fires if the budget is exhausted before convergence, and
    `tests/test_graph.py` pins the round count on a pathological
    10k-vertex chain graph (the worst case for plain label
    propagation: diameter = n)."""
    und = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    und = und.union(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint()
    labels = (
        und.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    import gc

    rounds = 0
    converged = False
    for _ in range(max_iter):
        rounds += 1
        nbr = und.join(
            labels.select(F.col("id").alias("dst"), "label"), "dst"
        ).select(F.col("src").alias("id"), "label")
        merged = (
            labels.select("id", "label")
            .union(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        hop = labels.select(F.col("id").alias("lid"), F.col("label").alias("llabel"))
        new_labels = (
            merged.join(hop, merged.label == hop.lid, "left")
            .select("id", F.coalesce("llabel", "label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        # Previous rounds' checkpoint blocks are only freed when their
        # RDDs are garbage-collected (ContextCleaner); Python's lazy GC
        # let them pile up in the block manager — on a 50M-edge graph
        # (the 100x near-duplicate corpus) that accumulated past the
        # heap and OOM'd the JVM (BENCH_NOTES r6). Drop the locals
        # that still reference the previous generation FIRST (they are
        # rebound only at the top of the next round), then collect, so
        # storage is genuinely bounded by two label generations.
        del nbr, merged, hop
        gc.collect()
        if changed == 0:
            converged = True
            break
    if converged:
        log.info("connected_components converged in %d rounds", rounds)
    else:
        log.warning(
            "connected_components did NOT converge in max_iter=%d rounds; "
            "labels may still be moving (pointer jumping should converge in "
            "O(log n) rounds — a budget exhaustion here means pathological "
            "edge data or a regression, not normal operation)",
            max_iter,
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    return labels
