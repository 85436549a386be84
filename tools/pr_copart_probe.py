#!/usr/bin/env python
"""Plan-only probe for the r12 pagerank edge-cache co-partitioning.

At scale the rank frame outgrows broadcast and each PageRank round's
edges⋈ranks on src becomes a shuffle join. This probe disables
auto-broadcast to materialize that shape locally and diffs the
round-1 physical plan with the edge cache (a) as-is and (b)
hash-partitioned on src — the shape pagerank() now picks via
_rank_frame_outgrows_broadcast. Expected: (a) has Sort+Exchange(src)
over the edge-side InMemoryTableScan every round; (b) has Sort only
(the cache's partitioning satisfies the join's distribution), i.e.
6 edge-sized shuffles per run collapse to 1 at cache build.

Writes plans/r12/pagerank_copart_{asis,srcpart}.txt.

Usage: python tools/pr_copart_probe.py [--sf /root/testdata/sf0.1]
"""
from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--outdir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12"))
    args = ap.parse_args()

    from clinvar_pipeline_spark.session import get_spark
    from clinvar_pipeline_spark.queries import _t

    spark = get_spark(app_name="pr-copart-probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sparkContext.setLogLevel("ERROR")

    # mirror pagerank()'s edge build exactly (queries_warehouse.py)
    o = _t(spark, args.sf, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, args.sf, "lineitem").select("l_orderkey", "l_suppkey")
    eraw = (o.join(li, o.o_orderkey == li.l_orderkey)
            .select((F.col("o_custkey") * 2).alias("u"),
                    (F.col("l_suppkey") * 2 + 1).alias("v"))
            .distinct())
    edges0 = eraw.select(F.explode(F.array(
        F.struct(F.col("u").alias("src"), F.col("v").alias("dst")),
        F.struct(F.col("v").alias("src"), F.col("u").alias("dst")))
    ).alias("e")).select("e.src", "e.dst")
    deg = (edges0.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
           .withColumnRenamed("src", "node"))
    dd = deg.select(F.col("node").alias("dst"), F.col("deg").alias("dst_deg"))

    def round1(edges):
        ranks = deg.select("node", "deg", F.lit(0.001).alias("r"))
        return (edges.join(ranks, edges.src == ranks.node)
                .select(F.col("dst"), F.col("dst_deg"),
                        (F.col("r") / F.col("deg")).alias("c"))
                .groupBy("dst", "dst_deg").agg(F.sum("c").alias("s")))

    width = spark.sparkContext.defaultParallelism
    for label, e in (
        ("asis", edges0.join(dd, "dst").persist()),
        ("srcpart", edges0.join(dd, "dst")
                    .repartition(width, "src").persist()),
    ):
        e.count()  # fill the cache so InMemoryRelation partitioning is live
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            round1(e).explain("formatted")
        plan = buf.getvalue()
        # the diagnostic: an Exchange in the join's edge branch (the
        # ":-" child holding the InMemoryTableScan) means the cached
        # edge table is re-shuffled every round
        head = plan.split("== Final Plan ==")[0]
        branch = re.search(
            r":- Sort[\s\S]*?InMemoryTableScan \(1\)", head)
        n_edge_ex = len(re.findall(r"Exchange", branch.group(0))) if branch else -1
        out = os.path.join(args.outdir, f"pagerank_copart_{label}.txt")
        open(out, "w").write(plan)
        print(f"{label}: edge-side Exchange above the cache scan: "
              f"{n_edge_ex}  -> {out}")
        e.unpersist()


if __name__ == "__main__":
    main()
