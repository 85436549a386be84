"""Distributed connected components — the cluster step of a
production dedup pipeline (near-dup PAIRS from MinHash-LSH / n-gram
Jaccard are only evidence; what a corpus actually needs is the
transitive CLUSTER each document belongs to, so one canonical copy
per cluster survives — pair-at-a-time greedy dropping can orphan or
double-keep chained duplicates).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) — the
standard shuffle-bounded formulation, converging in O(log^2 n) rounds
independent of component diameter (plain min-label propagation needs
diameter rounds: one 100-million-doc chain of boilerplate pages would
take 100M rounds; this takes ~log^2).

Everything is relational — groupBy-min + join + distinct per star
operation, no adjacency lists are ever collected or materialized as
arrays (a hot node's neighborhood stays distributed across its join
rows; collect_list on a star center would concentrate a component's
whole membership in one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_mins(adj: DataFrame) -> DataFrame:
    """m(u) = min(N(u) ∪ {u}) for every node u of the directed
    adjacency (one groupBy — the only per-node state the algorithm
    needs)."""
    return (
        adj.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least("_mv", "u").alias("m"))
    )


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    """(row count, order-independent hash-sum) in ONE action — the
    convergence probe. A checksum comparison instead of exceptAll
    keeps the per-round cost at one aggregate; equal checksums on a
    changed edge set are astronomically unlikely, and one spurious
    'converged' verdict is impossible anyway because the star
    operators are idempotent on their fixed point (an extra round
    no-ops)."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor, not sum: order-independent AND overflow-free under
        # ANSI mode (summing 64-bit hashes trips ARITHMETIC_OVERFLOW);
        # xor-cancellation needs duplicate rows, which distinct rules
        # out
        F.expr("bit_xor(xxhash64(a, b))").alias("h"),
    ).first()
    return int(row["n"]), int(row["h"] or 0)


def _release_checkpoint(df: DataFrame) -> None:
    """Free a superseded localCheckpoint's storage blocks now instead
    of at GC time. ``DataFrame.unpersist`` is a no-op here (the data
    lives in the checkpointed RDD, not the CacheManager), so this
    unpersists the physical RDD behind the LogicalRDD plan.
    Best-effort: if the handle isn't the stored RDD on some Spark
    version, unpersisting an unpersisted RDD is itself a no-op and
    the ContextCleaner path still applies."""
    try:
        df._jdf.queryExecution().toRdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """(src, dst) undirected edge list -> (node, component) where
    ``component`` is the smallest node id in the node's connected
    component. Nodes appearing in no edge are absent (the caller
    left-joins + coalesces if isolated nodes need self-labels).

    Per round: large-star (every node hooks its larger neighbors onto
    its local minimum) then small-star (hooks the smaller ones),
    each one groupBy + one join + one distinct. Rounds repeat until
    the edge set reaches its fixed point — a forest of stars centered
    at component minima — detected by an order-independent checksum
    (one aggregate action per star op, which also materializes that
    round's persisted frame before the previous one is released).

    ``max_rounds`` is a diverge guard far above the O(log^2 n) bound
    (2^sqrt(30) >> any corpus); hitting it raises instead of
    returning a half-contracted labeling.

    Scale: state is the evolving edge set — bounded by the input edge
    count; exchanges carry two longs per row. Hot star centers are
    plain join/groupBy skew, handled by AQE like any other key skew.
    Each round ends in an EAGER localCheckpoint: persisting alone
    short-circuits execution but leaves the LOGICAL plan chaining
    every prior round — the plan roughly quadruples per round (two
    unions + a join + a distinct both reference the previous frame),
    so by ~10 rounds analysis alone OOMs the driver. localCheckpoint
    replaces the lineage with the materialized partitions (a 100 TB
    run on preemptible executors would use reliable `checkpoint()` to
    a DFS instead — same plan-truncation effect, replayable).

    A superseded round's checkpoint blocks are released EAGERLY
    (_release_checkpoint) once the round that replaced it has
    materialized — leaving them to Python GC + the ContextCleaner
    makes peak storage rounds x edge-set size on nondeterministic
    timing instead of a deterministic ~2x (the bpe.py
    materialize-then-unpersist discipline). Safe because nothing
    references an old round after its successor checkpoints: lineage
    was truncated, and the returned frame reads only the final
    round."""
    cur = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    sig = _edge_checksum(cur)
    for _ in range(max_rounds):
        adj = cur.select(
            F.col("a").alias("u"), F.col("b").alias("v")
        ).union(cur.select(F.col("b").alias("u"), F.col("a").alias("v")))

        # large-star: (v, m(u)) for v in N(u), v > u
        large = (
            adj.join(_star_mins(adj), "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )

        adj2 = large.select(
            F.col("a").alias("u"), F.col("b").alias("v")
        ).union(large.select(F.col("b").alias("u"), F.col("a").alias("v")))
        mins2 = _star_mins(adj2)
        # small-star: (v, m(u)) for v in N(u) ∪ {u}, v <= u
        small = (
            adj2.join(mins2, "u")
            .filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(mins2.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        new_sig = _edge_checksum(small)  # materializes `small`
        _release_checkpoint(large)
        _release_checkpoint(cur)
        cur = small
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    # fixed point is a star forest (child, root): children label root,
    # roots label themselves
    from clinvar_pipeline_spark.caching import register_persist

    return register_persist(
        cur.select(F.col("a").alias("node"), F.col("b").alias("component"))
        .union(
            cur.select(F.col("b").alias("node"), F.col("b").alias("component"))
        )
        .distinct()
    )
