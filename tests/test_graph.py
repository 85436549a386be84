"""Connected components (operators/graph.py): exact agreement with a
pure-Python union-find on crafted and randomized graphs, convergence
on pathological shapes (long chains, big stars), and the
dedup_clusters registry query's contract."""

from __future__ import annotations

import random

from clinvar_pipeline_spark.operators.graph import connected_components


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id labeling
    return {n: find(n) for n in parent}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, "src", "dst")
    got = {r["node"]: r["component"] for r in out.collect()}
    from clinvar_pipeline_spark.caching import release_cached

    release_cached()
    return got


def test_cc_hand_graph(spark):
    # two components: {1,2,3,7} (chain + extra edge) and {5,6}
    edges = [(1, 2), (2, 3), (3, 7), (1, 3), (5, 6)]
    assert _run(spark, edges) == {1: 1, 2: 1, 3: 1, 7: 1, 5: 5, 6: 5}


def test_cc_long_chain_converges_fast(spark):
    # a 60-node chain has diameter 59: plain min-label propagation
    # would need ~59 rounds; large-star/small-star must land it well
    # inside the max_rounds guard
    edges = [(i, i + 1) for i in range(60)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(61)}


def test_cc_star_and_reversed_ids(spark):
    # star centered at the LARGEST id — labels must still contract to
    # the minimum member, not the hub
    edges = [(100, i) for i in range(5)]
    got = _run(spark, edges)
    assert got == {100: 0, 0: 0, 1: 0, 2: 0, 3: 0, 4: 0}


def test_cc_self_loops_and_duplicates_ignored(spark):
    edges = [(1, 1), (1, 2), (2, 1), (1, 2), (3, 3)]
    # pure self-loop node 3 contributes no component membership
    assert _run(spark, edges) == {1: 1, 2: 1}


def test_cc_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df, "src", "dst").count() == 0


def test_cc_random_matches_union_find(spark):
    for seed in (0, 5):
        rng = random.Random(seed)
        nodes = list(range(80))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(70)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _run(spark, edges) == _union_find(edges), seed


def test_dedup_clusters_transitive_chain(spark, tmp_path):
    """A~B and B~C near-dup (A,C too far apart to pair directly) must
    land in ONE cluster — the property greedy pair-dropping misses."""
    import clinvar_pipeline_spark.queries_llm as ql

    t = [f"tok{i}" for i in range(12)]
    u = [f"mid{i}" for i in range(6)]
    v = [f"end{i}" for i in range(6)]
    a = " ".join(t)                # t0..t11
    b = " ".join(t[6:] + u)        # shares t6..t11 with a -> J=4/16
    c = " ".join(u + v)            # shares u with b -> J=4/16; a∩c = ∅
    lone = "completely different words entirely unrelated text here"
    rows = [(1, a), (2, b), (3, c), (4, lone)]
    d = str(tmp_path / "tables")
    spark.createDataFrame(
        [(i, txt, "en", "s", len(txt)) for i, txt in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")

    from clinvar_pipeline_spark.caching import release_cached
    from clinvar_pipeline_spark.queries import q_ngram_jaccard_pairs

    # sanity: the fixture really is a CHAIN (1-2, 2-3; never 1-3)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in q_ngram_jaccard_pairs(spark, d).collect()
    }
    assert pairs == {(1, 2), (2, 3)}

    out = ql.q_dedup_clusters(spark, d).collect()
    release_cached()
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in out}
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3)}

    # cluster-canonical apply: ONE survivor from the chain (doc 1) +
    # the unclustered doc; greedy pair policy would keep the same set
    # here, but only the cluster policy guarantees it on chains
    kept = {r["doc_id"] for r in ql.q_cluster_dedup_apply(spark, d).collect()}
    release_cached()
    assert kept == {1, 4}


def test_cluster_dedup_keep_best_invariants(spark, sf_dir):
    """Keep-best apply on the real sf0.001 corpus: exactly one
    survivor per near-dup cluster, the survivor is the cluster's
    quality-score argmax (ties -> min doc_id), unclustered docs all
    pass through."""
    import clinvar_pipeline_spark.queries_llm as ql
    from clinvar_pipeline_spark.caching import release_cached

    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in ql.q_dedup_clusters(spark, sf_dir).collect()
    }
    scores = {
        r["doc_id"]: r["score"]
        for r in ql.q_quality_classifier(spark, sf_dir).collect()
    }
    kept = {
        r["doc_id"]
        for r in ql.q_cluster_dedup_keep_best(spark, sf_dir).collect()
    }
    release_cached()
    all_docs = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").collect()
    }
    assert clusters, "fixture corpus should contain near-dup clusters"
    # unclustered docs pass through untouched
    assert (all_docs - clusters.keys()) <= kept
    by_cluster: dict[int, list[int]] = {}
    for doc, cid in clusters.items():
        by_cluster.setdefault(cid, []).append(doc)
    for cid, members in by_cluster.items():
        best = min(members, key=lambda d: (-scores[d], d))
        assert set(members) & kept == {best}, (cid, members, best)
    # and the pick genuinely differs from min-id somewhere, or the
    # corpus can't distinguish the policies (keep the test honest)
    min_id_picks = {min(m) for m in by_cluster.values()}
    best_picks = {
        min(m, key=lambda d: (-scores[d], d)) for m in by_cluster.values()
    }
    assert min_id_picks != best_picks, (
        "every cluster's best copy is also its min-id copy — fixture "
        "cannot distinguish keep-best from keep-first"
    )
