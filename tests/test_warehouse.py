"""Contract tests for the warehouse staples (queries_warehouse.py)
and the Z-order layout writer (operators/layout.py).

The registry queries are oracle-attested by the DuckDB gate; these
tests pin the invariants the SQL comparison can't express — interval
algebra for SCD2, the exact quantized fixpoint for PageRank against
an independent pure-Python power iteration, and the two-way file
pruning a Z-ordered layout exists for (real parquet footers, not
simulated stats).
"""

from __future__ import annotations

import decimal
import math

import pytest
from pyspark.sql import functions as F

from clinvar_pipeline_spark.operators import layout
from clinvar_pipeline_spark.queries_warehouse import (
    q_pagerank,
    q_scd2_history,
    q_scd2_point_in_time,
    q_zorder_key,
)


# ---------------------------------------------------------------------
# SCD2
# ---------------------------------------------------------------------


def test_scd2_intervals_partition_history(spark, sf_dir):
    out = q_scd2_history(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_orders = orders.count()
    n_cust = orders.select("o_custkey").distinct().count()

    by_cust: dict[int, list] = {}
    for r in out:
        by_cust.setdefault(r["custkey"], []).append(r)
    assert len(by_cust) == n_cust
    assert sum(r["n_orders"] for r in out) == n_orders

    for rows in by_cust.values():
        rows.sort(key=lambda r: r["version"])
        # versions are 1..k dense
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        # exactly one open (current) interval, and it is the last
        assert [bool(r["is_current"]) for r in rows] == [False] * (
            len(rows) - 1
        ) + [True]
        for a, b in zip(rows, rows[1:]):
            # half-open adjacency: next run starts where this one ends
            assert a["valid_to"] == b["valid_from"]
            assert a["valid_from"] <= a["valid_to"]
            # a run BOUNDARY means the attribute actually changed
            assert a["priority"] != b["priority"]


# ---------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------


def _qround(x: float, s: int = 12) -> float:
    p = float(10**s)
    return math.floor(x * p + 0.5) / p


def test_pagerank_matches_pure_python_power_iteration(spark, sf_dir):
    got = {r["node"]: r["rank"] for r in q_pagerank(spark, sf_dir).collect()}

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .collect()
    )
    adj: dict[str, list[str]] = {}
    for r in pairs:
        c, s = f"c:{r['o_custkey']}", f"s:{r['l_suppkey']}"
        adj.setdefault(c, []).append(s)
        adj.setdefault(s, []).append(c)
    n = len(adj)
    base = 0.15 / n
    rank = {v: 1.0 / n for v in adj}
    for _ in range(6):
        # decimal accumulators replicate the DECIMAL(38,12) sum exactly
        acc = {v: decimal.Decimal(0) for v in adj}
        for u, nbrs in adj.items():
            c = decimal.Decimal(_qround(rank[u] / len(nbrs))).quantize(
                decimal.Decimal("1e-12"), rounding=decimal.ROUND_HALF_UP
            )
            for v in nbrs:
                acc[v] += c
        rank = {v: _qround(base + 0.85 * float(acc[v])) for v in adj}

    assert set(got) == set(rank)
    for v in rank:
        assert got[v] == rank[v], v  # bit-for-bit, not approximately

    total = sum(rank.values())
    assert abs(total - 1.0) < 1e-6  # no dangling mass on a bidirected graph
    assert all(r > 0 for r in rank.values())


# ---------------------------------------------------------------------
# Z-order key + layout pruning
# ---------------------------------------------------------------------


def test_morton_key_bit_interleave(spark):
    df = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 0), (0, 3), (65535, 65535)], "u long, t long"
    )
    rows = df.select(
        layout.morton_key(F.col("u"), F.col("t")).alias("z")
    ).collect()
    assert [r["z"] for r in rows] == [2, 1, 10, 5, (1 << 32) - 1]


def test_zorder_key_is_dense_and_total(spark, sf_dir):
    out = q_zorder_key(spark, sf_dir)
    n = out.count()
    assert n == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    zmax = out.agg(F.max("zkey")).first()[0]
    assert 0 <= zmax < (1 << 32)


@pytest.fixture(scope="module")
def event_layouts(spark, sf_dir, tmp_path_factory):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    root = tmp_path_factory.mktemp("layouts")
    zp, tp = str(root / "z"), str(root / "t")
    layout.zorder_write(ev, ("user_id", "ts"), zp, n_files=16)
    # the single-dimension strawman: perfectly time-clustered
    (
        ev.repartitionByRange(16, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(tp)
    )
    return ev, zp, tp


def test_zorder_prunes_both_dimensions(event_layouts):
    ev, zp, tp = event_layouts
    zs = layout.file_stats(zp, ["user_id", "ts"])
    ts = layout.file_stats(tp, ["user_id", "ts"])
    assert len(zs) == 16 and len(ts) == 16

    users = [r["user_id"] for r in ev.select("user_id").distinct().collect()]
    times = [r["ts"] for r in ev.select("ts").collect()]
    times.sort()
    probes_u = sorted(users)[:: max(1, len(users) // 7)][:7]
    probes_t = times[:: max(1, len(times) // 7)][:7]

    def avg(stats, col, probes):
        return sum(layout.files_containing(stats, col, p) for p in probes) / len(
            probes
        )

    z_user, t_user = avg(zs, "user_id", probes_u), avg(ts, "user_id", probes_u)
    z_time, t_time = avg(zs, "ts", probes_t), avg(ts, "ts", probes_t)

    # time-sorted layout: every file spans ~all users -> no user pruning
    assert t_user >= 15.0
    # Z-order: a user probe touches a strict subset of files...
    assert z_user <= 0.6 * t_user
    # ...while still pruning time probes far below scan-everything
    assert z_time <= 8.0
    # and the time-sorted layout stays the time-probe optimum
    assert t_time <= z_time


def test_scd2_point_in_time_every_order_matched_once(spark, sf_dir):
    out = q_scd2_point_in_time(spark, sf_dir)
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert out.count() == n_orders  # 1:1 — intervals partition the timeline
    assert out.select("ok").distinct().count() == n_orders
    # the round-trip audit: the overwhelming majority of orders look up
    # their own priority; mismatches exist only when a later same-day
    # run supersedes (asserted exactly below on a constructed case)
    frac = out.agg(F.avg("matches_own")).first()[0]
    assert frac > 0.9


def test_scd2_point_in_time_same_day_supersede(spark):
    import datetime as dt

    from clinvar_pipeline_spark.queries_warehouse import scd2_frame
    from clinvar_pipeline_spark.operators.temporal import asof_join

    d0 = dt.datetime(2024, 1, 1)
    d1 = dt.datetime(2024, 1, 5)
    orders = spark.createDataFrame(
        [
            (1, 7, "LOW", d0),    # run 1 starts Jan 1
            (2, 7, "HIGH", d0),   # run 2 ALSO starts Jan 1 (same day)
            (3, 7, "HIGH", d1),
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string,"
        " o_orderdate timestamp",
    )
    hist = scd2_frame(orders)
    rows = {r["version"]: r for r in hist.collect()}
    assert len(rows) == 2
    # run 1 is an EMPTY interval at day granularity: [Jan1, Jan1)
    assert rows[1]["valid_from"] == rows[1]["valid_to"] == d0
    probe = orders.select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
    )
    looked = asof_join(
        probe,
        hist.select(
            "custkey", F.col("valid_from").alias("ts"), "version", "priority"
        ),
        on="ts",
        by=["custkey"],
        tiebreak_col="version",
    )
    got = {r["ok"]: (r["version"], r["priority"]) for r in looked.collect()}
    # the same-day boundary: EVERY Jan-1 probe resolves to run 2 (the
    # containing, non-empty interval), so order 1's own LOW priority is
    # superseded inside its own day
    assert got == {1: (2, "HIGH"), 2: (2, "HIGH"), 3: (2, "HIGH")}


# ---------------------------------------------------------------------
# Partitioned layout: dynamic partition pruning
# ---------------------------------------------------------------------


def test_partitioned_write_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A fact table partitioned on the join column + a filtered dim:
    Catalyst injects a DynamicPruning subquery so only the matching
    partition directories are scanned at runtime — asserted from the
    physical plan, with results cross-checked against the plain
    filter."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_part")
    layout.partitioned_write(orders, "o_orderpriority", path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("1-URGENT", 1), ("2-HIGH", 0), ("3-MEDIUM", 0)],
        "prio string, flag int",
    ).filter(F.col("flag") == 1)  # DPP needs a selective dim predicate
    q = fact.join(dim, fact.o_orderpriority == dim.prio).agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    exp = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert q.first()["n"] == exp > 0


# ---------------------------------------------------------------------
# Bucketed layout: exchange-free co-located join
# ---------------------------------------------------------------------


def test_bucketed_tables_join_without_exchange(spark, sf_dir, tmp_path):
    """orders and lineitem bucketed 8-ways on the order key: the join
    plan contains NO Exchange (the shuffle was paid once at write
    time) while the unbucketed plan shuffles both sides; results match
    the plain join."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    layout.bucketed_write(
        orders, "t_orders_b", "o_orderkey", 8, str(tmp_path / "ob")
    )
    layout.bucketed_write(
        li, "t_lineitem_b", "l_orderkey", 8, str(tmp_path / "lb")
    )
    try:
        ob = spark.table("t_orders_b")
        lb = spark.table("t_lineitem_b")
        with_bcast_off = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
        old = {
            k: spark.conf.get(k, None) for k in with_bcast_off
        }
        for k, v in with_bcast_off.items():
            spark.conf.set(k, v)
        try:
            j = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # co-located: no shuffle at all
            # strawman: the same join over the raw parquet shuffles
            raw = orders.join(li, orders.o_orderkey == li.l_orderkey)
            raw_plan = raw._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in raw_plan
            assert j.count() == raw.count() > 0
        finally:
            for k, v in old.items():
                if v is not None:
                    spark.conf.set(k, v)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


# ---------------------------------------------------------------------
# Streaming SCD2 maintenance
# ---------------------------------------------------------------------


def _order_stream(spark, drop):
    return (
        spark.readStream.schema(
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )


def test_scd2_live_stream_equals_batch_closed_intervals(
    spark, sf_dir, tmp_path
):
    """Real orders drained in two micro-batches: the appended closed
    intervals equal the batch SCD2 history's closed intervals whose
    valid_to the final watermark passed (the transitions-stream pin
    applied to run collapse)."""
    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_warehouse import scd2_frame
    from clinvar_pipeline_spark.streaming.scd2 import scd2_live_stream

    orders = _t(spark, sf_dir, "orders")
    drop = tmp_path / "orders"
    orders.repartition(2).write.parquet(str(drop))

    out = (
        scd2_live_stream(_order_stream(spark, drop))
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "closed"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(180)

    max_us = orders.agg(F.max(F.unix_micros("o_orderdate"))).first()[0]
    wm_us = (max_us // 1000 - 10_000) * 1000
    exp = {
        (
            r["custkey"],
            r["version"],
            r["priority"],
            r["valid_from"],
            r["valid_to"],
            r["n_orders"],
        )
        for r in scd2_frame(orders)
        .filter(
            F.col("valid_to").isNotNull()
            & (F.unix_micros("valid_to") <= wm_us)
        )
        .select(
            "custkey",
            "version",
            "priority",
            F.unix_micros("valid_from").alias("valid_from"),
            F.unix_micros("valid_to").alias("valid_to"),
            "n_orders",
        )
        .collect()
    }
    got = {
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "closed"))
        .select(
            "custkey", "version", "priority",
            "valid_from_us", "valid_to_us", "n_orders",
        )
        .collect()
    }
    assert got == exp and len(got) > 100


def test_scd2_live_stream_late_row_splits_run(spark, tmp_path):
    """A late-but-in-horizon arrival lands BETWEEN two already-seen
    rows and must SPLIT the run it falls inside — the watermark gate
    is what makes that correct rather than racy."""
    import datetime as dt

    from clinvar_pipeline_spark.streaming.scd2 import scd2_live_stream

    def t(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string"
    )
    b1 = [(1, 7, "O", 0.0, t(100), "LOW"), (3, 7, "O", 0.0, t(205), "LOW")]
    # ok=2 arrives a batch late but inside the 10 s horizon (batch-1
    # watermark is 205-10=195 < 200); ok=4 only advances the clock
    b2 = [(2, 7, "O", 0.0, t(200), "HIGH"), (4, 7, "O", 0.0, t(400), "XX")]
    drop = tmp_path / "orders"
    for b in (b1, b2):
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(drop))

    out = (
        scd2_live_stream(_order_stream(spark, drop))
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "closed"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(120)
    got = sorted(
        (r["version"], r["priority"], r["valid_from_us"], r["valid_to_us"],
         r["n_orders"])
        for r in spark.read.parquet(str(tmp_path / "closed")).collect()
    )

    def us(s):
        return int(dt.datetime(2024, 1, 1).timestamp() * 1e6) + s * 1_000_000

    # the late HIGH row split LOW's run: [100,200) LOW, [200,205) HIGH;
    # the reopened LOW run closes at 400 only if the watermark passed
    # 400 — it did not (max ts 400, delay 10 s), so exactly two closed
    assert got == [
        (1, "LOW", us(100), us(200), 1),
        (2, "HIGH", us(200), us(205), 1),
    ]


# ---------------------------------------------------------------------
# Property tests (hypothesis)
# ---------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=24,
        unique=True,
    )
)
def test_morton_key_deinterleaves_exactly(spark, pairs):
    """morton_key is a bijection on 16-bit pairs: a pure-Python
    de-interleave recovers both dimensions from every key."""
    df = spark.createDataFrame(pairs, "u long, t long")
    rows = df.select(
        "u", "t", layout.morton_key(F.col("u"), F.col("t")).alias("z")
    ).collect()
    for r in rows:
        u = t = 0
        for i in range(16):
            u |= ((r["z"] >> (2 * i + 1)) & 1) << i
            t |= ((r["z"] >> (2 * i)) & 1) << i
        assert (u, t) == (r["u"], r["t"])


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # custkey
            st.integers(min_value=0, max_value=6),  # day offset (ties!)
            st.sampled_from(["A", "B", "C"]),       # attr
        ),
        min_size=1,
        max_size=20,
    )
)
def test_scd2_frame_matches_pure_python_run_collapse(spark, feed):
    """scd2_frame equals a pure-Python run collapse over the same
    (day, order-key) total order — random feeds incl. same-day ties
    and repeated attrs."""
    import datetime as dt

    from clinvar_pipeline_spark.queries_warehouse import scd2_frame

    base = dt.datetime(2024, 1, 1)
    rows = [
        (ok, ck, attr, base + dt.timedelta(days=doff))
        for ok, (ck, doff, attr) in enumerate(feed)
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderpriority string,"
        " o_orderdate timestamp",
    )
    got = sorted(
        (r["custkey"], r["version"], r["priority"], r["valid_from"],
         r["valid_to"], r["n_orders"], r["is_current"])
        for r in scd2_frame(orders).collect()
    )
    exp = []
    by_cust: dict[int, list] = {}
    for ok, ck, attr, ts in rows:
        by_cust.setdefault(ck, []).append((ts, ok, attr))
    for ck, seq in by_cust.items():
        seq.sort()
        runs = []
        for ts, _, attr in seq:
            if not runs or runs[-1][0] != attr:
                runs.append([attr, ts, 0])
            runs[-1][2] += 1
        for v, (attr, vf, cnt) in enumerate(runs, start=1):
            vt = runs[v][1] if v < len(runs) else None
            exp.append(
                (ck, v, attr, vf, vt, cnt, 1 if vt is None else 0)
            )
    assert got == sorted(exp)


def test_scd2_live_stream_recovers_across_runs(spark, tmp_path):
    """Cross-RUN state-store recovery: run 1 drains batch 1 (run
    state left open in the checkpoint), run 2 on the SAME checkpoint
    drains batch 2 — the union of appended closed intervals equals a
    one-shot drain over both batches."""
    import datetime as dt

    from clinvar_pipeline_spark.streaming.scd2 import scd2_live_stream

    def t(s):
        return dt.datetime(2024, 2, 1) + dt.timedelta(seconds=s)

    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string"
    )
    b1 = [
        (1, 7, "O", 0.0, t(0), "LOW"),
        (2, 7, "O", 0.0, t(100), "HIGH"),   # closes LOW once finalized
        (3, 7, "O", 0.0, t(200), "HIGH"),
    ]
    b2 = [
        (4, 7, "O", 0.0, t(300), "LOW"),    # closes the HIGH run
        (5, 7, "O", 0.0, t(500), "LOW"),    # advances the watermark
    ]
    drop = tmp_path / "orders"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "closed")

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(drop))
    q = (
        scd2_live_stream(_order_stream(spark, drop))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    after_run1 = {
        tuple(r) for r in spark.read.parquet(out).collect()
    }

    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(drop))
    q2 = (
        scd2_live_stream(_order_stream(spark, drop))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got = sorted(
        (r["version"], r["priority"], r["valid_from_us"], r["valid_to_us"],
         r["n_orders"])
        for r in spark.read.parquet(out).collect()
    )

    def us(s):
        return int(dt.datetime(2024, 2, 1).timestamp() * 1e6) + s * 1_000_000

    # run 2 closed the LOW run run 1 left open in its checkpointed
    # state (v1) AND the HIGH run (v2) — both finalized by b2's
    # watermark (500 - 10 s passes 300); v3 LOW stays open/pending
    assert got == [
        (1, "LOW", us(0), us(100), 1),
        (2, "HIGH", us(100), us(300), 2),
    ]
    assert after_run1 <= set(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
