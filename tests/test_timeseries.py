"""queries_timeseries.py: gap-fill / rolling RANGE stats / OHLC
resample / Markov transitions, pinned against pandas recomputations
on hand-built frames (edge cases the registry oracle's organic data
may not hit: exact rounding ties in interpolation, equal-timestamp
RANGE peers, single-bucket users) plus invariants on sf0.001."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from clinvar_pipeline_spark.queries_timeseries import (
    q_event_transitions,
    q_gap_fill,
    q_ohlc_resample,
    q_rolling_stats,
    qround,
)

SF = "/root/testdata/sf0.001"
T0 = dt.datetime(2024, 1, 1)


def _h(k: float) -> dt.datetime:
    return T0 + dt.timedelta(hours=k)


# ---------------------------------------------------------------------
# qround: the engine-identical quantizer
# ---------------------------------------------------------------------


def test_qround_matches_floor_formula(spark):
    # exact-tie values (the case ROUND() diverges on across engines)
    # and ordinary values, both signs of the tie
    vals = [47.00375, 47.00365, 1.23455, 0.00005, 12.0, 3.14159265]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r["q"]
        for r in df.select(qround(F.col("x"), 4).alias("q"))
        .orderBy("q")
        .collect()
    ]
    want = sorted(math.floor(v * 10000 + 0.5) / 10000 for v in vals)
    assert got == want


# ---------------------------------------------------------------------
# gap_fill
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def gap_rows(spark, tmp_path_factory):
    # user 1: observed hours 0, 1, 4 (interior 2-hour gap -> the
    # interpolation-tie case), values chosen so the midpoint lands
    # exactly on a 4-decimal rounding tie.
    # user 2: single bucket (spine collapses to one row).
    rows = [
        (1, 1, _h(0.25), "view", 10.0, "{}"),
        (2, 1, _h(1.25), "view", 20.0, "{}"),
        (3, 1, _h(4.25), "view", 20.0010, "{}"),
        (4, 2, _h(7.50), "view", 5.0, "{}"),
    ]
    d = tmp_path_factory.mktemp("gapfill")
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return str(d)


def test_gap_fill_spine_locf_interp(spark, gap_rows):
    out = {
        (r["user_id"], r["h"]): r
        for r in q_gap_fill(spark, gap_rows).collect()
    }
    # user 1: spine covers hours 0..4 inclusive, nothing else
    u1 = sorted(h for (u, h) in out if u == 1)
    assert u1 == [_h(k) for k in range(5)]
    # user 2: exactly one row, observed
    u2 = [out[(2, h)] for (u, h) in out if u == 2]
    assert len(u2) == 1 and u2[0]["observed"] == 1
    # observed rows echo the bucket mean
    assert out[(1, _h(0))]["v_interp"] == 10.0
    assert out[(1, _h(1))]["v_interp"] == 20.0
    # LOCF carries the last observed bucket across the gap
    assert out[(1, _h(2))]["locf"] == 20.0
    assert out[(1, _h(3))]["locf"] == 20.0
    assert out[(1, _h(2))]["observed"] == 0
    # linear interpolation between (h1, 20.0) and (h4, 20.0010):
    # h2 -> 20.0 + 0.001 * 1/3; h3 -> 20.0 + 0.001 * 2/3 — and the
    # quantizer formula applied verbatim
    for k, frac in ((2, 1 / 3), (3, 2 / 3)):
        want = math.floor((20.0 + 0.0010 * frac) * 10000 + 0.5) / 10000
        assert out[(1, _h(k))]["v_interp"] == want


def test_gap_fill_invariants_sf0001(spark):
    df = q_gap_fill(spark, SF)
    agg = df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("h").alias("hmin"),
        F.max("h").alias("hmax"),
        F.sum(F.when(F.col("locf").isNull(), 1).otherwise(0)).alias(
            "null_locf"
        ),
        F.sum(
            F.when(F.col("v_interp").isNull(), 1).otherwise(0)
        ).alias("null_interp"),
        F.max(F.when(F.col("observed") == 1, F.col("h"))).alias(
            "last_obs"
        ),
        F.min(F.when(F.col("observed") == 1, F.col("h"))).alias(
            "first_obs"
        ),
    )
    for r in agg.collect():
        # contiguous hourly spine: count == span_hours + 1
        span = int((r["hmax"] - r["hmin"]).total_seconds() // 3600)
        assert r["n"] == span + 1, r
        # LOCF total (first spine row observed), interp total
        assert r["null_locf"] == 0 and r["null_interp"] == 0
        # spine endpoints are observed buckets
        assert r["first_obs"] == r["hmin"] and r["last_obs"] == r["hmax"]


# ---------------------------------------------------------------------
# rolling_stats
# ---------------------------------------------------------------------


def test_rolling_stats_vs_pandas(spark, tmp_path_factory):
    # equal timestamps (RANGE peers share a frame) + exact 1h-edge
    rows = [
        (1, 1, _h(0.0), "view", 1.0, "{}"),
        (2, 1, _h(0.5), "view", 2.0, "{}"),
        (3, 1, _h(0.5), "view", 4.0, "{}"),   # ts tie with event 2
        (4, 1, _h(1.0), "view", 8.0, "{}"),   # exactly 1h after ev 1
        (5, 1, _h(2.01), "view", 16.0, "{}"),  # everything expired
        (6, 2, _h(0.0), "view", 100.0, "{}"),
    ]
    d = tmp_path_factory.mktemp("rolling")
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        r["event_id"]: (r["n_1h"], r["sum_1h"])
        for r in q_rolling_stats(spark, str(d)).collect()
    }
    # RANGE frame: peers at the same ts are in each other's frame
    assert got[2] == (3, 7.0) and got[3] == (3, 7.0)
    # inclusive 1h edge: event at exactly ts-1h still inside
    assert got[4] == (4, 15.0)
    # expired frame: only itself
    assert got[5] == (1, 16.0)
    # per-user isolation
    assert got[6] == (1, 100.0)


def test_rolling_stats_mean_quantized(spark):
    df = q_rolling_stats(spark, SF).limit(200)
    for r in df.collect():
        assert r["mean_1h"] == math.floor(
            r["sum_1h"] / r["n_1h"] * 10000 + 0.5
        ) / 10000 or abs(
            r["mean_1h"] - r["sum_1h"] / r["n_1h"]
        ) < 1e-3  # sum_1h is itself rounded; allow the re-derivation gap


# ---------------------------------------------------------------------
# ohlc_resample
# ---------------------------------------------------------------------


def test_ohlc_vs_pandas(spark):
    got = {
        (r["user_id"], r["h"]): r
        for r in q_ohlc_resample(spark, SF).collect()
    }
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf[pdf["event_type"] == "purchase"].copy()
    pdf["h"] = pd.to_datetime(pdf["ts"]).dt.floor("h")
    pdf = pdf.sort_values(["ts", "event_id"])
    want = pdf.groupby(["user_id", "h"]).agg(
        open=("value", "first"),
        high=("value", "max"),
        low=("value", "min"),
        close=("value", "last"),
        n_trades=("value", "size"),
    )
    assert len(got) == len(want)
    for (u, h), w in want.iterrows():
        g = got[(u, h.to_pydatetime())]
        assert g["open"] == w["open"] and g["close"] == w["close"]
        assert g["high"] == w["high"] and g["low"] == w["low"]
        assert g["n_trades"] == w["n_trades"]


def test_ohlc_tie_breaks_by_event_id(spark, tmp_path_factory):
    rows = [  # two trades at the identical timestamp
        (7, 1, _h(0.1), "purchase", 3.0, "{}"),
        (5, 1, _h(0.1), "purchase", 9.0, "{}"),
        (6, 1, _h(0.2), "purchase", 1.0, "{}"),
    ]
    d = tmp_path_factory.mktemp("ohlc")
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    r = q_ohlc_resample(spark, str(d)).collect()[0]
    # open = lowest (ts, event_id) = event 5; close = event 6
    assert r["open"] == 9.0 and r["close"] == 1.0
    assert r["high"] == 9.0 and r["low"] == 1.0 and r["n_trades"] == 3


# ---------------------------------------------------------------------
# event_transitions
# ---------------------------------------------------------------------


def test_transitions_vs_pandas(spark):
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in q_event_transitions(spark, SF).collect()
    }
    pdf = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    pdf["to_type"] = pdf.groupby("user_id")["event_type"].shift(-1)
    pairs = pdf.dropna(subset=["to_type"])
    want = pairs.groupby(["event_type", "to_type"]).size()
    assert len(got) == len(want)
    for (f_, t_), n in want.items():
        assert got[(f_, t_)][0] == n
    # probabilities normalize within the from-state (quantizer noise
    # bounded by rows-per-state * 0.5e-6)
    bystate = {}
    for (f_, _), (n, p) in got.items():
        bystate.setdefault(f_, []).append(p)
    for f_, ps in bystate.items():
        assert abs(sum(ps) - 1.0) < len(ps) * 5e-7 + 1e-9


# ---------------------------------------------------------------------
# streamed OHLC tier
# ---------------------------------------------------------------------


def test_ohlc_stream_equals_batch_on_two_batch_drain(spark, tmp_path, sf_dir):
    """Streamed OHLC: REAL sf0.001 events drained in two micro-batches;
    the merged snapshot must equal batch q_ohlc_resample row-for-row
    (compaction on, so the linear merge fold is exercised too)."""
    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.streaming.timeseries import (
        ohlc_snapshot,
        ohlc_stream,
    )

    ev = _t(spark, sf_dir, "events")
    drop = tmp_path / "events"
    ev.repartition(2).write.parquet(str(drop))  # 2 files -> 2 epochs

    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    out, ckpt = str(tmp_path / "ohlc"), str(tmp_path / "ckpt_ohlc")
    q = ohlc_stream(stream, out, ckpt, compact_every=1)
    q.awaitTermination(120)

    def rows(df):
        return {
            (r["user_id"], r["h"]): (
                r["open"], r["high"], r["low"], r["close"],
                r["n_trades"], r["volume"],
            )
            for r in df.collect()
        }

    got = rows(ohlc_snapshot(spark, out))
    exp = rows(q_ohlc_resample(spark, sf_dir))
    assert got == exp
    assert len(exp) > 0
    # the split exercised real merges: some (user, hour) cell spans
    # both micro-batches iff any bucket has >= 2 trades
    assert any(v[4] >= 2 for v in exp.values())


# ---------------------------------------------------------------------
# live streamed transitions (watermark-correct adjacent pairs)
# ---------------------------------------------------------------------


def _sec(s: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


def test_transitions_live_stream_watermark_correct(spark, tmp_path):
    """A late intermediate event (inside the horizon) must SPLIT the
    pair it lands inside; pairs flush via EventTimeTimeout when the
    watermark passes their completing event; the tail pair stays
    pending at drain."""
    from clinvar_pipeline_spark.streaming.timeseries import (
        transitions_live_stream,
    )

    schema = "event_id long, user_id long, ts timestamp, event_type string"
    batches = [
        # batch 1: a view at 100 and a click at 300 — NOT yet a pair
        # (watermark is still unset during this batch)
        [(1, 10, _sec(100.0), "view"), (2, 10, _sec(300.0), "click")],
        # batch 2: event time 295 arrives late-but-allowed (watermark
        # after batch 1 is 290) and lands BETWEEN view and click —
        # the naive view->click pair must never be emitted; 400
        # advances the watermark so the split pairs can finalize
        [(3, 10, _sec(295.0), "purchase"), (4, 10, _sec(400.0), "signup")],
    ]
    drop = tmp_path / "events"
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(drop))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    out = transitions_live_stream(stream, watermark_delay="10 seconds")
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "pairs"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["from_id"], r["to_id"]): (r["from_type"], r["to_type"])
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    # the late purchase split view->click into two pairs
    assert got == {
        (1, 3): ("view", "purchase"),
        (3, 2): ("purchase", "click"),
    }
    # click->signup is the tail (400 inside the final horizon): pending


def test_transitions_live_stream_drain_equals_batch(spark, tmp_path, sf_dir):
    """REAL sf0.001 events drained in two event-time-ordered batches:
    the emitted pair set must equal the batch lead() pairs whose
    completing event the final watermark passed."""
    from pyspark.sql import Window
    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.streaming.timeseries import (
        transitions_live_stream,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    # split at the median-ish time so batch 2 never carries rows
    # older than batch 1's watermark (which would be dropped as late)
    cut = _sec(15 * 86400)
    drop = tmp_path / "events"
    ev.filter(F.col("ts") < cut).coalesce(1).write.mode("append").parquet(
        str(drop)
    )
    ev.filter(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(
        str(drop)
    )

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    out = transitions_live_stream(stream, watermark_delay="10 seconds")
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "pairs"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["user_id"], r["from_id"], r["to_id"])
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }

    # batch twin: lead() pairs finalized under the final watermark
    # (Spark tracks event time in ms — mirror the truncation)
    max_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    wm_us = (max_us // 1000 - 10_000) * 1000
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    exp = {
        (r["user_id"], r["from_id"], r["to_id"])
        for r in ev.select(
            "user_id",
            F.col("event_id").alias("from_id"),
            F.lead("event_id").over(seq).alias("to_id"),
            F.lead(F.unix_micros("ts")).over(seq).alias("to_us"),
        )
        .filter(F.col("to_id").isNotNull() & (F.col("to_us") <= wm_us))
        .collect()
    }
    assert got == exp
    assert len(exp) > 500  # non-vacuous drain


# ---------------------------------------------------------------------
# rolling_anomalies
# ---------------------------------------------------------------------


def test_rolling_anomalies_vs_numpy(spark, tmp_path_factory):
    import numpy as np

    from clinvar_pipeline_spark.queries_timeseries import (
        q_rolling_anomalies,
    )

    # one user, a calm 1h frame then a spike; plus a degenerate
    # single-event user (z must be NULL, flag 0)
    rows = [
        (1, 1, _h(0.00), "view", 10.0, "{}"),
        (2, 1, _h(0.10), "view", 11.0, "{}"),
        (3, 1, _h(0.20), "view", 9.0, "{}"),
        (4, 1, _h(0.30), "view", 10.5, "{}"),
        (5, 1, _h(0.40), "view", 60.0, "{}"),  # the spike
        (6, 2, _h(0.00), "view", 5.0, "{}"),
    ]
    d = tmp_path_factory.mktemp("anom")
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        r["event_id"]: r for r in q_rolling_anomalies(spark, str(d)).collect()
    }
    # numpy twin for the spike row: population stats over its
    # EXCLUSIVE baseline (the spike must not inflate its own std)
    base = np.array([10.0, 11.0, 9.0, 10.5])
    z = (60.0 - base.mean()) / base.std()
    assert got[5]["is_anomaly"] == 1
    assert got[5]["n_base"] == 4
    assert abs(got[5]["zscore"] - z) < 1e-3
    # calm rows are not flagged
    assert all(got[i]["is_anomaly"] == 0 for i in (1, 2, 3, 4))
    # degenerate baselines: empty (first event / lone user) or
    # single-event -> z NULL, never flagged
    assert got[1]["zscore"] is None and got[6]["zscore"] is None
    assert got[2]["zscore"] is None  # baseline of one event
    assert got[6]["is_anomaly"] == 0


def test_rolling_anomalies_rate_sf0001(spark):
    from clinvar_pipeline_spark.queries_timeseries import (
        q_rolling_anomalies,
    )

    df = q_rolling_anomalies(spark, SF)
    n = df.count()
    flagged = df.filter(F.col("is_anomaly") == 1).count()
    # heavy-tailed values: some anomalies fire, but they stay rare
    assert 0 < flagged < n * 0.2


def test_anomalies_live_stream_drain_equals_batch(spark, tmp_path, sf_dir):
    """REAL sf0.001 events drained in two event-time-ordered batches:
    streamed anomaly verdicts must equal the batch q_rolling_anomalies
    rows the final watermark passed — zscore and flag included."""
    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_timeseries import (
        q_rolling_anomalies,
    )
    from clinvar_pipeline_spark.streaming.timeseries import (
        anomalies_live_stream,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    cut = _sec(15 * 86400)
    drop = tmp_path / "events"
    ev.filter(F.col("ts") < cut).coalesce(1).write.mode("append").parquet(
        str(drop)
    )
    ev.filter(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(
        str(drop)
    )

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    out = anomalies_live_stream(stream, watermark_delay="10 seconds")
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "verdicts"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        r["event_id"]: (r["n_base"], r["zscore"], r["is_anomaly"])
        for r in spark.read.parquet(str(tmp_path / "verdicts")).collect()
    }

    max_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    wm_us = (max_us // 1000 - 10_000) * 1000
    exp = {
        r["event_id"]: (r["n_base"], r["zscore"], r["is_anomaly"])
        for r in q_rolling_anomalies(spark, sf_dir)
        .filter(F.unix_micros("ts") <= wm_us)
        .collect()
    }
    assert set(got) == set(exp)
    diffs = {k: (got[k], exp[k]) for k in exp if got[k] != exp[k]}
    assert not diffs, dict(list(diffs.items())[:5])
    # non-vacuous: some flags fired across the drain
    assert sum(v[2] for v in exp.values()) > 0


# ---------------------------------------------------------------------
# active_users (DAU / WAU / MAU)
# ---------------------------------------------------------------------


def test_active_users_vs_pandas(spark):
    from clinvar_pipeline_spark.queries_timeseries import q_active_users

    got = {
        r["day"]: (r["dau"], r["wau"], r["mau"])
        for r in q_active_users(spark, SF).collect()
    }
    pdf = pd.read_parquet(f"{SF}/events.parquet")[["ts", "user_id"]]
    pdf["day"] = pd.to_datetime(pdf["ts"]).dt.date
    ud = pdf[["day", "user_id"]].drop_duplicates()
    days = sorted(ud["day"].unique())
    assert set(got) == set(days)
    for d in days:
        dau = ud[ud["day"] == d]["user_id"].nunique()
        w0 = d - dt.timedelta(days=6)
        wau = ud[(ud["day"] >= w0) & (ud["day"] <= d)]["user_id"].nunique()
        m0 = d - dt.timedelta(days=29)
        mau = ud[(ud["day"] >= m0) & (ud["day"] <= d)]["user_id"].nunique()
        assert got[d] == (dau, wau, mau), d
    # monotone sanity: dau <= wau <= mau everywhere
    assert all(v[0] <= v[1] <= v[2] for v in got.values())


# ---------------------------------------------------------------------
# rfm_segments (two-phase NTILE)
# ---------------------------------------------------------------------


def _py_ntile(n: int, k: int) -> list[int]:
    # SQL-standard NTILE: first n % k tiles get the extra row
    q, big = divmod(n, k)
    out = []
    for t in range(1, k + 1):
        out.extend([t] * (q + 1 if t <= big else q))
    return out


def test_rfm_ntile_arithmetic_edges(spark):
    from clinvar_pipeline_spark.queries_timeseries import (
        _global_rank_tile,
    )

    # n = 7 (remainder 2) and n = 3 (< k): both against pure python
    for n in (7, 3):
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(n)], "user_id long, k1 double"
        ).repartition(4)  # adversarial partitioning
        got = {
            r["user_id"]: r["t"]
            for r in _global_rank_tile(
                df, [F.col("k1"), F.col("user_id")], 5, "t"
            ).collect()
        }
        want = dict(zip(range(n), _py_ntile(n, 5)))
        assert got == want, (n, got)


def test_rfm_segments_invariants(spark):
    from clinvar_pipeline_spark.queries_timeseries import q_rfm_segments

    rows = q_rfm_segments(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r["r_tile"] <= 5
        assert 1 <= r["f_tile"] <= 5
        assert 1 <= r["m_tile"] <= 5
        assert r["recency_days"] >= 0
    # quintiles are balanced: sizes differ by at most 1
    from collections import Counter

    for col in ("r_tile", "f_tile", "m_tile"):
        sizes = Counter(r[col] for r in rows)
        assert max(sizes.values()) - min(sizes.values()) <= 1, (col, sizes)


# ---------------------------------------------------------------------
# Property tests: random schedules vs plain-python recomputation
# ---------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_sched = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # user
        st.integers(min_value=0, max_value=300),    # minutes offset
        st.integers(min_value=0, max_value=2000),   # value in cents
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None)
@given(_sched)
def test_gap_fill_property_vs_python(spark, sched):
    rows = [
        (i, u, T0 + dt.timedelta(minutes=m), "view", c / 100.0, "{}")
        for i, (u, m, c) in enumerate(sched)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{d}/events.parquet"
        )
        got = {
            (r["user_id"], r["h"]): (
                r["observed"], r["locf"], r["v_interp"]
            )
            for r in q_gap_fill(spark, d).collect()
        }

    # python twin
    byuser: dict = {}
    for u, m, c in sched:
        h = m // 60
        byuser.setdefault(u, {}).setdefault(h, []).append(c / 100.0)
    exp = {}
    for u, buckets in byuser.items():
        hmin, hmax = min(buckets), max(buckets)
        obs = {
            h: math.floor(
                (sum(round(v * 10000) for v in vs) / 10000.0)
                / len(vs) * 10000 + 0.5
            ) / 10000
            for h, vs in buckets.items()
        }
        known = sorted(obs)
        for h in range(hmin, hmax + 1):
            if h in obs:
                exp[(u, _h(h))] = (1, obs[h], obs[h])
            else:
                ph = max(k for k in known if k < h)
                nh = min(k for k in known if k > h)
                locf = obs[ph]
                interp = locf + (obs[nh] - locf) * (
                    (h - ph) * 1.0 / (nh - ph)
                )
                exp[(u, _h(h))] = (
                    0,
                    locf,
                    math.floor(interp * 10000 + 0.5) / 10000,
                )
    assert got == exp


@settings(max_examples=12, deadline=None)
@given(_sched)
def test_transitions_property_vs_python(spark, sched):
    rows = [
        (i, u, T0 + dt.timedelta(minutes=m), f"t{c % 3}", 1.0, "{}")
        for i, (u, m, c) in enumerate(sched)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{d}/events.parquet"
        )
        got = {
            (r["from_type"], r["to_type"]): r["n"]
            for r in q_event_transitions(spark, d).collect()
        }
    exp: dict = {}
    byuser: dict = {}
    for i, (u, m, c) in enumerate(sched):
        byuser.setdefault(u, []).append((m, i, f"t{c % 3}"))
    for evs in byuser.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            exp[(a, b)] = exp.get((a, b), 0) + 1
    assert got == exp


def test_active_users_stream_equals_batch(spark, tmp_path, sf_dir):
    """Streamed user-day set: two-batch drain with compaction on; the
    snapshot triple equals the batch q_active_users row-for-row."""
    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_timeseries import q_active_users
    from clinvar_pipeline_spark.streaming.timeseries import (
        active_users_snapshot,
        active_users_stream,
    )

    ev = _t(spark, sf_dir, "events")
    drop = tmp_path / "events"
    ev.repartition(2).write.parquet(str(drop))

    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    out, ckpt = str(tmp_path / "au"), str(tmp_path / "ckpt_au")
    q = active_users_stream(stream, out, ckpt, compact_every=1)
    q.awaitTermination(120)

    def rows(df):
        return {
            r["day"]: (r["dau"], r["wau"], r["mau"]) for r in df.collect()
        }

    got = rows(active_users_snapshot(spark, out))
    exp = rows(q_active_users(spark, sf_dir))
    assert got == exp and len(exp) > 0


def test_ohlc_unpivot_reshapes_exactly(spark):
    from clinvar_pipeline_spark.queries_timeseries import (
        q_ohlc_unpivot,
    )

    wide = {
        (r["user_id"], r["h"]): r
        for r in q_ohlc_resample(spark, SF).collect()
    }
    long_rows = q_ohlc_unpivot(spark, SF).collect()
    # exactly 4 metric rows per bucket, values matching the wide form
    assert len(long_rows) == 4 * len(wide)
    for r in long_rows:
        assert r["v"] == wide[(r["user_id"], r["h"])][r["metric"]]


def test_type_correlation_vs_numpy(spark):
    import numpy as np

    from clinvar_pipeline_spark.queries_timeseries import (
        q_type_correlation,
    )

    got = {
        (r["type_a"], r["type_b"]): (r["n_days"], r["pearson_r"])
        for r in q_type_correlation(spark, SF).collect()
    }
    pdf = pd.read_parquet(f"{SF}/events.parquet")[["ts", "event_type"]]
    pdf["day"] = pd.to_datetime(pdf["ts"]).dt.date
    counts = (
        pdf.groupby(["day", "event_type"]).size().unstack(fill_value=0)
    )
    types = sorted(counts.columns)
    # all unordered pairs present
    assert len(got) == len(types) * (len(types) - 1) // 2
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            n, r = got[(a, b)]
            assert n == len(counts)
            want = np.corrcoef(counts[a], counts[b])[0, 1]
            assert abs(r - want) < 1e-4, (a, b)
            assert -1.0 <= r <= 1.0


# ---------------------------------------------------------------------
# mad_outliers / event_trigrams (r8 additions) vs pure-Python twins
# ---------------------------------------------------------------------

def test_mad_outliers_matches_numpy_twin(spark, sf_dir):
    """Exact median/MAD recount with numpy over the real corpus; the
    flagged set and every robust-z must match bit-for-bit at the
    quantizer scale."""
    import numpy as np

    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_timeseries import q_mad_outliers

    rows = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    exp = {}
    for t, rs in by_type.items():
        vals = np.array([r["value"] for r in rs])
        med = float(np.percentile(vals, 50, method="linear"))
        mad = float(np.percentile(np.abs(vals - med), 50, method="linear"))
        if mad <= 0:
            continue
        for r in rs:
            z = (r["value"] - med) / (1.4826 * mad)
            if abs(z) > 3.5:
                exp[r["event_id"]] = (t, math.floor(z * 1e4 + 0.5) / 1e4)
    got = {r["event_id"]: (r["event_type"], r["robust_z"])
           for r in q_mad_outliers(spark, sf_dir).collect()}
    assert set(got) == set(exp)
    for k, (t, z) in exp.items():
        assert got[k][0] == t
        assert got[k][1] == pytest.approx(z, abs=1e-9)


def test_mad_screen_resists_the_outliers_it_hunts(spark):
    """The breakdown-point argument made concrete: one huge spike
    must not drag the cut the way it drags a mean/std z-screen."""
    import numpy as np

    base = [float(x) for x in range(1, 100)]  # 1..99, median 50
    spiked = base + [1e9]
    vals = np.array(spiked)
    med = float(np.percentile(vals, 50))
    mad = float(np.percentile(np.abs(vals - med), 50))
    assert abs((1e9 - med) / (1.4826 * mad)) > 3.5  # spike flagged
    # none of the ordinary points get flagged despite the spike
    assert all(
        abs((v - med) / (1.4826 * mad)) <= 3.5 for v in base
    )
    # while the classic z-screen goes blind: sigma is so inflated the
    # spike is the ONLY point above even z=1, and its own z is tiny
    mu, sd = vals.mean(), vals.std()
    assert abs((1e9 - mu) / sd) < 10  # 10-sigma event reads as ~10
    assert all(abs((v - mu) / sd) < 0.2 for v in base)


def test_event_trigrams_matches_counter_twin(spark, sf_dir):
    from collections import Counter

    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_timeseries import q_event_trigrams

    rows = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    c: Counter = Counter()
    for seq in by_user.values():
        seq.sort()
        types = [t for _, _, t in seq]
        c.update(zip(types, types[1:], types[2:]))
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = [((r["t1"], r["t2"], r["t3"]), r["n"])
           for r in q_event_trigrams(spark, sf_dir).collect()]
    assert got == ranked


# ---------------------------------------------------------------------
# ngrams_live_stream n=3 (r8): streamed trigram path mining
# ---------------------------------------------------------------------

def test_trigram_live_stream_split_semantics(spark, tmp_path):
    """A late intermediate event must split the trigram it lands
    inside: the naive (1,2,4) window can never be emitted once 3
    arrives between 2 and 4."""
    from clinvar_pipeline_spark.streaming.timeseries import (
        ngrams_live_stream,
    )

    schema = "event_id long, user_id long, ts timestamp, event_type string"
    batches = [
        [(1, 10, _sec(100.0), "view"), (2, 10, _sec(200.0), "click"),
         (4, 10, _sec(300.0), "error")],
        # wm after batch 1 = 290; 295 is late-but-allowed and lands
        # between 2 and 4; 600 advances wm past every earlier event
        [(3, 10, _sec(295.0), "purchase"), (5, 10, _sec(600.0), "signup")],
    ]
    drop = tmp_path / "events"
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(drop))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    out = ngrams_live_stream(stream, n=3, watermark_delay="10 seconds")
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "tri"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["id_1"], r["id_2"], r["id_3"]): (r["type_1"], r["type_2"], r["type_3"])
        for r in spark.read.parquet(str(tmp_path / "tri")).collect()
    }
    assert got == {
        (1, 2, 3): ("view", "click", "purchase"),
        (2, 3, 4): ("click", "purchase", "error"),
    }
    # (3,4,5) is the tail (5 inside the final horizon): pending


def test_trigram_live_stream_drain_equals_batch(spark, tmp_path, sf_dir):
    """REAL sf0.001 events in two batches: emitted trigrams == the
    batch double-lead windows whose END the final watermark passed;
    and the pair stream (the n=2 wrapper) stays consistent with them
    (every emitted trigram's two halves are emitted pairs)."""
    from pyspark.sql import Window
    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.streaming.timeseries import (
        ngrams_live_stream,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    cut = _sec(15 * 86400)
    drop = tmp_path / "events"
    ev.filter(F.col("ts") < cut).coalesce(1).write.mode("append").parquet(
        str(drop)
    )
    ev.filter(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(
        str(drop)
    )

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    out = ngrams_live_stream(stream, n=3, watermark_delay="10 seconds")
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "tri"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["user_id"], r["id_1"], r["id_2"], r["id_3"])
        for r in spark.read.parquet(str(tmp_path / "tri")).collect()
    }

    max_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    wm_us = (max_us // 1000 - 10_000) * 1000
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    exp = {
        (r["user_id"], r["i1"], r["i2"], r["i3"])
        for r in ev.select(
            "user_id",
            F.col("event_id").alias("i1"),
            F.lead("event_id").over(seq).alias("i2"),
            F.lead("event_id", 2).over(seq).alias("i3"),
            F.lead(F.unix_micros("ts"), 2).over(seq).alias("end_us"),
        )
        .filter(F.col("i3").isNotNull() & (F.col("end_us") <= wm_us))
        .collect()
    }
    assert got == exp
    assert len(exp) > 500


def test_dow_seasonality_matches_pandas_twin(spark, sf_dir):
    """Zero-filled dow means and seasonal indices recomputed with
    pandas on the real corpus."""
    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_timeseries import q_dow_seasonality

    pdf = _t(spark, sf_dir, "events").select("event_type", "ts").toPandas()
    pdf["day"] = pdf["ts"].dt.date
    daily = pdf.groupby(["event_type", "day"]).size()
    days = sorted(pdf["day"].unique())
    types = sorted(pdf["event_type"].unique())
    exp = {}
    for t in types:
        counts = {d: int(daily.get((t, d), 0)) for d in days}
        mean_all = float(sum(counts.values())) / len(days)
        for dow in range(1, 8):
            dd = [d for d in days if d.isoweekday() == dow]
            if not dd:
                continue
            s = sum(counts[d] for d in dd)
            m = float(s) / len(dd)
            exp[(t, dow)] = (
                s, len(dd),
                math.floor(m * 1e4 + 0.5) / 1e4,
                math.floor(m / mean_all * 1e6 + 0.5) / 1e6,
            )
    got = {
        (r["event_type"], r["dow"]): (
            r["n_events"], r["n_days"], r["dow_mean"], r["seasonal_index"]
        )
        for r in q_dow_seasonality(spark, sf_dir).collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0] and got[k][1] == exp[k][1]
        assert got[k][2] == pytest.approx(exp[k][2], abs=1e-9)
        assert got[k][3] == pytest.approx(exp[k][3], abs=1e-9)
    # the seasonal indices of each type average ~1 over the week
    # (weighted by day counts they telescope to exactly the overall
    # mean, so an unweighted mean sits near 1 on a dense grid)
    for t in types:
        idx = [exp[(t, d)][3] for d in range(1, 8) if (t, d) in exp]
        assert 0.5 < sum(idx) / len(idx) < 1.5


def test_trigram_lift_matches_counter_twin(spark, sf_dir):
    """Lift = P(t3|t1,t2)/P(t3|t2) recomputed from Counters on the
    same completed-window population; lift must hover near 1 when the
    generator is first-order."""
    from collections import Counter

    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_timeseries import q_trigram_lift

    rows = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    tri, bi, mar, tot = Counter(), Counter(), Counter(), Counter()
    for seq in by_user.values():
        seq.sort()
        t = [x for _, _, x in seq]
        for a, b, c in zip(t, t[1:], t[2:]):
            tri[(a, b, c)] += 1
            bi[(a, b)] += 1
            mar[(b, c)] += 1
            tot[b] += 1
    exp = {}
    for (a, b, c), n3 in tri.items():
        if n3 >= 5:
            v = (n3 / bi[(a, b)]) / (mar[(b, c)] / tot[b])
            exp[(a, b, c)] = (n3, math.floor(v * 1e6 + 0.5) / 1e6)
    got = {
        (r["t1"], r["t2"], r["t3"]): (r["n3"], r["lift"])
        for r in q_trigram_lift(spark, sf_dir).collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1], abs=1e-9)


def test_interarrival_stats_matches_numpy_twin(spark, sf_dir):
    import numpy as np

    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_timeseries import (
        q_interarrival_stats,
    )

    rows = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user: dict = {}
    for r in rows:
        us = int(r["ts"].timestamp() * 1e6)
        by_user.setdefault(r["user_id"], []).append(
            (us, r["event_id"], r["event_type"])
        )
    gaps: dict = {}
    for seq in by_user.values():
        seq.sort()
        for (pu, _, _), (cu, _, ct) in zip(seq, seq[1:]):
            gaps.setdefault(ct, []).append(cu - pu)
    got = {r["event_type"]: r for r in
           q_interarrival_stats(spark, sf_dir).collect()}
    assert set(got) == set(gaps)
    for t, gs in gaps.items():
        a = np.array(gs, dtype=np.float64)
        mean = a.sum() / len(a)
        var = (np.square(a).sum() - a.sum() * a.sum() / len(a)) / len(a)
        cv = math.sqrt(max(var, 0.0)) / mean
        assert got[t]["n_gaps"] == len(gs)
        assert got[t]["mean_gap_s"] == pytest.approx(mean / 1e6, abs=1e-3)
        assert got[t]["cv"] == pytest.approx(cv, abs=1e-3)


def test_weekly_growth_matches_pandas_twin(spark, sf_dir):
    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_timeseries import q_weekly_growth

    pdf = _t(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    ).toPandas()
    pdf["week"] = pdf["ts"].dt.to_period("W-SUN").dt.start_time
    g = pdf.groupby(["event_type", "week"]).agg(
        n=("ts", "size"), v=("value", "sum")
    ).reset_index().sort_values(["event_type", "week"])
    exp = {}
    for t, sub in g.groupby("event_type"):
        prev = None
        for _, row in sub.iterrows():
            wow = (
                math.floor((row["n"] - prev) / prev * 1e6 + 0.5) / 1e6
                if prev else None
            )
            exp[(t, row["week"].to_pydatetime())] = (int(row["n"]), wow)
            prev = row["n"]
    got = {
        (r["event_type"], r["week"]): (r["n"], r["wow_growth"])
        for r in q_weekly_growth(spark, sf_dir).collect()
    }
    assert set(got) == set(exp)
    for k, (n, wow) in exp.items():
        assert got[k][0] == n
        if wow is None:
            assert got[k][1] is None
        else:
            assert got[k][1] == pytest.approx(wow, abs=1e-9)


def test_daily_count_stream_serves_three_calendar_reports(
    spark, tmp_path, sf_dir
):
    """One ADD-merged (event_type, day) sink drained in two batches
    with compaction on: the dow, correlation, weekly-growth, ewma,
    trend, changepoint and acf snapshots each equal their batch
    registry query — seven reports off one sufficient-statistics sink
    (the token-count-sink pattern on the events table)."""
    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_timeseries import (
        q_dow_seasonality,
        q_type_correlation,
        q_weekly_growth,
    )
    from clinvar_pipeline_spark.queries_timeseries import (
        q_autocorrelation,
        q_changepoint_detect,
        q_ewma_daily,
        q_trend_test,
    )
    from clinvar_pipeline_spark.streaming.timeseries import (
        acf_snapshot,
        changepoint_snapshot,
        correlation_snapshot,
        daily_count_stream,
        dow_snapshot,
        ewma_snapshot,
        trend_snapshot,
        weekly_growth_snapshot,
    )

    ev = _t(spark, sf_dir, "events")
    drop = tmp_path / "events"
    ev.repartition(2).write.parquet(str(drop))
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    deltas, ckpt = str(tmp_path / "daily"), str(tmp_path / "ckpt")
    q = daily_count_stream(stream, deltas, ckpt, compact_every=1)
    q.awaitTermination(120)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(dow_snapshot(spark, deltas)) == rows(
        q_dow_seasonality(spark, sf_dir)
    )
    assert rows(correlation_snapshot(spark, deltas)) == rows(
        q_type_correlation(spark, sf_dir)
    )
    assert rows(weekly_growth_snapshot(spark, deltas)) == rows(
        q_weekly_growth(spark, sf_dir)
    )
    assert rows(ewma_snapshot(spark, deltas)) == rows(
        q_ewma_daily(spark, sf_dir)
    )
    assert rows(trend_snapshot(spark, deltas)) == rows(
        q_trend_test(spark, sf_dir)
    )
    assert rows(changepoint_snapshot(spark, deltas)) == rows(
        q_changepoint_detect(spark, sf_dir)
    )
    assert rows(acf_snapshot(spark, deltas)) == rows(
        q_autocorrelation(spark, sf_dir)
    )


def test_ewma_daily_exact_dyadic_vs_fraction_twin(spark, sf_dir):
    """Every EWMA value equals the Fraction-arithmetic ground truth
    EXACTLY — not approximately: with decay base 1/2, a 28-day
    horizon and integer daily counts, every term x/2^g and every
    partial sum is a dyadic rational representable in a double, so
    the distributed float sum is order-independent and lossless."""
    import datetime
    from fractions import Fraction

    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_timeseries import q_ewma_daily

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    counts: dict[tuple, int] = {}
    for r in ev.collect():
        counts[(r["event_type"], r["day"])] = (
            counts.get((r["event_type"], r["day"]), 0) + 1
        )
    bounds: dict[str, tuple] = {}
    for (t, d) in counts:
        lo, hi = bounds.get(t, (d, d))
        bounds[t] = (min(lo, d), max(hi, d))
    exp = {}
    for t, (lo, hi) in bounds.items():
        d = lo
        while d <= hi:
            s = Fraction(0)
            for g in range(28):
                s += Fraction(
                    counts.get((t, d - datetime.timedelta(days=g)), 0), 1 << g
                )
            exp[(t, d)] = (counts.get((t, d), 0), s)
            d += datetime.timedelta(days=1)

    got = {
        (r["event_type"], r["day"]): (r["n"], r["ewma"])
        for r in q_ewma_daily(spark, sf_dir).collect()
    }
    assert set(got) == set(exp)
    for k, (n, s) in exp.items():
        assert got[k][0] == n
        assert Fraction(got[k][1]) == s, k  # bit-exact, by construction


def test_peak_concurrency_matches_plain_python_sweep(spark, sf_dir):
    """The sweep-line result equals a pure-Python interval sweep over
    the same clipped 30-minute sessions (max concurrency AND the first
    instant reaching it)."""
    import datetime as dt

    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_timeseries import q_peak_concurrency

    ev = _t(spark, sf_dir, "events").select("event_type", "ts").collect()
    DAY = dt.timedelta(days=1)
    bounds: dict[tuple, list] = {}
    for r in ev:
        st, en = r["ts"], r["ts"] + dt.timedelta(minutes=30)
        day = dt.datetime(st.year, st.month, st.day)
        while day < en:
            cst, cen = max(st, day), min(en, day + DAY)
            bounds.setdefault((r["event_type"], day.date()), []).append(
                (cst, 1)
            )
            bounds[(r["event_type"], day.date())].append((cen, -1))
            day += DAY
    exp = {}
    for k, bs in bounds.items():
        bs.sort()  # (ts, delta): -1 sorts before +1 at the same instant
        run = peak = 0
        peak_ts = None
        for t, dlt in bs:
            run += dlt
            if run > peak:
                peak, peak_ts = run, t
        exp[k] = (peak, peak_ts)
    got = {
        (r["event_type"], r["day"]): (r["peak"], r["peak_ts"])
        for r in q_peak_concurrency(spark, sf_dir).collect()
    }
    assert got == exp


def test_trend_test_matches_pure_python_mann_kendall(spark, sf_dir):
    """S, the ties-corrected variance, z and the Theil-Sen lower
    median replicate a pure-Python Mann-Kendall on the same
    zero-filled series, bit-for-bit after the shared qround."""
    import datetime as dt
    import math

    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_timeseries import q_trend_test

    def qr(x, s=9):
        p = float(10**s)
        return math.floor(x * p + 0.5) / p

    ev = _t(spark, sf_dir, "events").select("event_type", "ts").collect()
    counts: dict[tuple, int] = {}
    for r in ev:
        d = r["ts"].date()
        counts[(r["event_type"], d)] = counts.get((r["event_type"], d), 0) + 1
    types = {t for t, _ in counts}
    exp = {}
    for t in types:
        days = sorted(d for tt, d in counts if tt == t)
        lo, hi = days[0], days[-1]
        series = []
        d = lo
        while d <= hi:
            series.append((d, counts.get((t, d), 0)))
            d += dt.timedelta(days=1)
        n = len(series)
        s = 0
        slopes = []
        for i in range(n):
            for j in range(i + 1, n):
                dy = series[j][1] - series[i][1]
                s += (dy > 0) - (dy < 0)
                slopes.append(
                    qr(float(dy) / (series[j][0] - series[i][0]).days)
                )
        tie = 0
        vals: dict[int, int] = {}
        for _, y in series:
            vals[y] = vals.get(y, 0) + 1
        for c in vals.values():
            tie += c * (c - 1) * (2 * c + 5)
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        z = 0.0 if s == 0 else (s - (1 if s > 0 else -1) * 1) / math.sqrt(var)
        slopes.sort()
        med = slopes[math.ceil(len(slopes) / 2.0) - 1]
        exp[t] = (n, len(slopes), s, qr(z), med)
    got = {
        r["event_type"]: (
            r["n_days"], r["n_pairs"], r["s_stat"], r["z_stat"],
            r["slope_med"],
        )
        for r in q_trend_test(spark, sf_dir).collect()
    }
    assert got == exp


def test_trend_test_verdicts_on_constructed_series(spark, tmp_path):
    """A strictly rising series must test 'increasing', a constant
    one 'none' — the detector demonstrably detects."""
    import datetime as dt

    from clinvar_pipeline_spark.queries_timeseries import q_trend_test

    rows = []
    eid = 0
    base = dt.datetime(2024, 3, 1)
    for day in range(14):
        for k in range(day + 1):  # rising: 1, 2, ..., 14 events/day
            rows.append((eid, base + dt.timedelta(days=day, minutes=k),
                         1, "rising", 1.0, "{}"))
            eid += 1
        for k in range(3):  # constant: 3 events every day
            rows.append((eid, base + dt.timedelta(days=day, minutes=30 + k),
                         2, "flat", 1.0, "{}"))
            eid += 1
    sfdir = tmp_path / "sf"
    sfdir.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(sfdir / "events.parquet"))
    got = {r["event_type"]: r for r in q_trend_test(spark, str(sfdir)).collect()}
    assert got["rising"]["trend"] == "increasing"
    assert got["rising"]["slope_med"] == 1.0
    assert got["flat"]["trend"] == "none"
    assert got["flat"]["s_stat"] == 0


def test_changepoint_detects_planted_level_shift(spark, tmp_path):
    """A series with a clean level shift (5/day for 10 days, then
    25/day for 10 days) must locate the change at the shift boundary
    with the right pre/post means; a flat series reports a tiny
    statistic relative to the shifted one."""
    import datetime as dt

    from clinvar_pipeline_spark.queries_timeseries import (
        q_changepoint_detect,
    )

    rows, eid = [], 0
    base = dt.datetime(2024, 5, 1)
    for day in range(20):
        rate = 5 if day < 10 else 25
        for k in range(rate):
            rows.append((eid, base + dt.timedelta(days=day, minutes=k),
                         1, "shifted", 1.0, "{}"))
            eid += 1
        for k in range(7):
            rows.append((eid, base + dt.timedelta(days=day, minutes=100 + k),
                         2, "steady", 1.0, "{}"))
            eid += 1
    sfdir = tmp_path / "sf"
    sfdir.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(sfdir / "events.parquet"))
    got = {
        r["event_type"]: r
        for r in q_changepoint_detect(spark, str(sfdir)).collect()
    }
    sh = got["shifted"]
    assert sh["change_day"] == (base + dt.timedelta(days=9)).date()
    assert sh["mean_before"] == 5.0 and sh["mean_after"] == 25.0
    # n*CUSUM at the true split: |20*50 - 10*300| = 2000
    assert sh["cusum_stat"] == 2000
    assert got["steady"]["cusum_stat"] == 0


def test_autocorrelation_matches_numpy(spark, sf_dir):
    """ACF values replicate numpy's Pearson r over the same lagged
    pairs (within the 1e-9 quantization)."""
    import datetime as dt

    import numpy as np

    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_timeseries import q_autocorrelation

    ev = _t(spark, sf_dir, "events").select("event_type", "ts").collect()
    counts: dict[tuple, int] = {}
    for r in ev:
        d = r["ts"].date()
        counts[(r["event_type"], d)] = counts.get((r["event_type"], d), 0) + 1
    got = {
        (r["event_type"], r["lag"]): (r["n"], r["acf"])
        for r in q_autocorrelation(spark, sf_dir).collect()
    }
    types = {t for t, _ in counts}
    n_checked = 0
    for t in types:
        days = sorted(d for tt, d in counts if tt == t)
        lo, hi = days[0], days[-1]
        series = []
        d = lo
        while d <= hi:
            series.append(counts.get((t, d), 0))
            d += dt.timedelta(days=1)
        y = np.array(series, dtype=float)
        for lag in range(1, 8):
            if len(y) <= lag:
                continue
            a, b = y[:-lag], y[lag:]
            n, acf = got[(t, lag)]
            assert n == len(a)
            if a.std() == 0 or b.std() == 0:
                assert acf is None
            else:
                r = float(np.corrcoef(a, b)[0, 1])
                assert acf == pytest.approx(r, abs=2e-9)
            n_checked += 1
    assert n_checked >= 25
