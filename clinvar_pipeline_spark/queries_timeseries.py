"""Time-series resampling suite (round 8): the per-key regular-grid
operators every hypertable/tick store ships natively — gap-fill with
LOCF + linear interpolation, rolling time-range aggregates, and OHLC
bucket resampling — plus the Markov transition matrix over per-user
event sequences. All four are pure DataFrame compositions (bucketed
aggregates, `sequence` spines, RANGE-frame windows, `min_by`/`max_by`
ordered picks) attested against DuckDB's own interval-RANGE frames,
ordered aggregates and `generate_series`.

These extend the temporal-join family (queries_temporal.py /
operators/temporal.py): the as-of join answers "most recent value at
an irregular probe time"; gap-fill and rolling frames answer the
regular-grid variants of the same question. Reference scope: the
reference engine (single-JVM Java, ClinVar ETL) has no time-series
surface — this suite is part of the first-class extension tier the
events table exists for (TESTDATA.md), like the session/tumbling/
sliding windows in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinvar_pipeline_spark.queries import DEC4, _persist, _t, qround, register

HOUR_US = 3_600_000_000


@register(
    "gap_fill",
    """
    WITH b AS (
        SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS h,
               count(*) AS n,
               floor(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                     / count(*) * 10000 + 0.5) / 10000 AS v
        FROM events GROUP BY 1, 2),
    spine AS (
        SELECT user_id,
               unnest(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS h
        FROM (SELECT user_id, min(h) AS hmin, max(h) AS hmax
              FROM b GROUP BY 1)),
    j AS (
        SELECT s.user_id, s.h, b.v,
               CASE WHEN b.n IS NULL THEN 0 ELSE 1 END AS observed
        FROM spine s LEFT JOIN b ON s.user_id = b.user_id AND s.h = b.h),
    f AS (
        SELECT user_id, h, observed, v,
            last_value(v IGNORE NULLS) OVER
                (PARTITION BY user_id ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS locf,
            last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS ph,
            first_value(v IGNORE NULLS) OVER
                (PARTITION BY user_id ORDER BY h
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                AS nv,
            first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY h
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                AS nh
        FROM j)
    SELECT user_id, h, observed, locf,
        floor(CASE WHEN observed = 1 THEN v
                   WHEN nv IS NULL THEN locf
                   ELSE locf + (nv - locf)
                        * ((epoch_us(h) - epoch_us(ph)) * 1.0
                           / (epoch_us(nh) - epoch_us(ph))) END
              * 10000 + 0.5) / 10000 AS v_interp
    FROM f
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill onto a regular per-user hourly grid: bucket each
    user's events into hours, emit one row per hour from the user's
    first to last observed bucket, and fill the silent hours two ways
    — LOCF (last observation carried forward, the hypertable
    ``locf()``) and linear interpolation between the surrounding
    observed buckets (``interpolate()``). `observed` flags real vs
    manufactured rows.

    Scale: grid rows are manufactured per observed SEGMENT — one
    lead() window over the bucket table (users x active-hours rows),
    then `sequence(h, next_h - 1h)` exploded per bucket. Segment
    length is bounded by the TIME SPAN in hours, not by corpus size
    (more data at fixed span = same grid, denser buckets), so the
    explode never balloons with SF, and the window runs over buckets,
    never over the full grid. Every grid hour lies inside a segment
    (the grid spans min(h)..max(h)), so LOCF is total and
    interpolation always has both neighbors."""
    e = _t(spark, sf_dir, "events")
    b = (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            qround(
                F.sum(F.col("value").cast(DEC4)).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("v"),
        )
    )
    # r11 restructure (guide §2.4 remove shuffles / §1.2 algorithm
    # first): the oracle's spine-join-window pipeline carries every
    # GRID row (users x span hours) through a left join and two
    # whole-spine window passes. But every grid row's fill values are
    # fully determined by its enclosing observed SEGMENT [h, next_h):
    # locf = segment start's v, ph = h, (nv, nh) = the next bucket.
    # So: ONE lead() window over the bucket table (users x
    # active-hours rows — the small frame), then explode each
    # segment's hours and compute locf/interp map-side. Removes the
    # spine groupBy, the spine⋈buckets join, the two spine-sized
    # windows, and b's persist (single consumer now). Value identity
    # with the window formulation: manufactured rows exist only
    # inside a segment (the spine spans min(h)..max(h), so every grid
    # hour has an observed bucket at-or-before AND at-or-after it),
    # and frac spells the identical unix_micros arithmetic on the
    # identical doubles; the oracle's `nv IS NULL` branch was
    # unreachable totality armor for the same reason. Measured sf0.1
    # warm 1.74 -> 0.9 s; the 8.0 s spine stage (stage_profile) is
    # gone from the plan (plans/r11/gap_fill_{before,after}.txt).
    nxt = Window.partitionBy("user_id").orderBy("h")
    seg = b.select(
        "user_id",
        "h",
        "v",
        F.lead("h").over(nxt).alias("nh"),
        F.lead("v").over(nxt).alias("nv"),
    )
    # each segment emits its own observed hour plus the silent hours
    # strictly before the next bucket; the last bucket (nh null)
    # emits just itself
    hh = F.explode(
        F.sequence(
            F.col("h"),
            F.coalesce(
                F.col("nh") - F.expr("INTERVAL 1 HOUR"), F.col("h")
            ),
            F.expr("INTERVAL 1 HOUR"),
        )
    ).alias("hh")
    g = seg.select("user_id", "h", "v", "nh", "nv", hh)
    frac = (
        (F.unix_micros("hh") - F.unix_micros("h")) * F.lit(1.0)
        / (F.unix_micros("nh") - F.unix_micros("h"))
    )
    observed = F.col("hh") == F.col("h")
    interp = F.when(observed, F.col("v")).otherwise(
        F.col("v") + (F.col("nv") - F.col("v")) * frac
    )
    return g.select(
        "user_id",
        F.col("hh").alias("h"),
        F.when(observed, F.lit(1)).otherwise(F.lit(0)).alias("observed"),
        F.col("v").alias("locf"),
        qround(interp, 4).alias("v_interp"),
    )


@register(
    "rolling_stats",
    """
    SELECT event_id, user_id, ts,
        count(*) OVER w AS n_1h,
        round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE),
              4) AS sum_1h,
        floor(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
              / count(*) OVER w * 10000 + 0.5) / 10000 AS mean_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour aggregates over the same user's events
    — the rolling time-RANGE frame (count / exact DECIMAL sum / mean
    of `value` in the last hour including the current event). The
    oracle is DuckDB's native interval-RANGE window frame; Spark has
    no interval RANGE, so the frame is expressed as a numeric
    `rangeBetween` over `unix_micros(ts)` — semantically identical,
    including the peer rule (equal timestamps share a frame under
    RANGE on both engines, so the result is total even with ties).

    Scale: one shuffle on user_id, one ordered pass per user with a
    bounded sliding frame — Spark's window evaluator holds only the
    rows inside the 1-hour range. Sum in DECIMAL(18,4): exact and
    associative, so frame-slide order can't drift the value."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-HOUR_US, 0)
    )
    s = F.sum(F.col("value").cast(DEC4)).over(w).cast("double")
    n = F.count(F.lit(1)).over(w)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        n.alias("n_1h"),
        F.round(s, 4).alias("sum_1h"),
        qround(s / n, 4).alias("mean_1h"),
    )


@register(
    "ohlc_resample",
    """
    SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS h,
        first(value ORDER BY ts, event_id) AS open,
        max(value) AS high,
        min(value) AS low,
        last(value ORDER BY ts, event_id) AS close,
        count(*) AS n_trades,
        round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
            AS volume
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1, 2
    """,
)
def q_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bucket resampling: per user per hour, the open (first
    `value` by (ts, event_id)), high, low, close (last by the same
    order), trade count and exact volume over 'purchase' events — the
    tick-store candlestick downsample. The open/close picks are
    `min_by`/`max_by` over a (ts, event_id) struct, so equal
    timestamps break by event_id and the pick is total by
    construction (the asof tiebreak_col discipline); the oracle is
    DuckDB's ordered-aggregate `first(... ORDER BY ts, event_id)`.

    Scale: one filtered scan, one groupBy with full map-side partial
    aggregation — min_by/max_by/min/max/count/DECIMAL-sum are all
    associative combiner-friendly aggregates, so the shuffle carries
    one row per (user, hour) regardless of how many trades share a
    bucket."""
    e = _t(spark, sf_dir, "events")
    order = F.struct("ts", "event_id")
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.min_by("value", order).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order).alias("close"),
            F.count(F.lit(1)).alias("n_trades"),
            F.round(
                F.sum(F.col("value").cast(DEC4)).cast("double"), 4
            ).alias("volume"),
        )
    )


@register(
    "event_transitions",
    """
    WITH s AS (
        SELECT event_type,
               lead(event_type) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_type
        FROM events)
    SELECT event_type AS from_type, next_type AS to_type,
        count(*) AS n,
        floor(count(*) * 1.0
              / sum(count(*)) OVER (PARTITION BY event_type)
              * 1000000 + 0.5) / 1000000 AS p
    FROM s WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each (from_type → to_type) adjacent pair in a
    user's (ts, event_id)-ordered stream, the pair count and the
    transition probability normalized within the from-state — the
    session-flow / clickstream model behind "what follows a view".

    Scale: one shuffle on user_id for the lead() pass (ordered by
    (ts, event_id) so ties can't flip pairs between runs), then a
    groupBy on the type pair — at most |types|² = 25 groups, with
    map-side partial aggregation collapsing each partition to those
    25 rows before the exchange. The normalizing window runs over
    ≤ 25 rows (provably tiny frame)."""
    e = _t(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(seq).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    g = s.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("from_type")
    return g.select(
        "from_type",
        "to_type",
        "n",
        qround(F.col("n") * F.lit(1.0) / F.sum("n").over(tot), 6).alias(
            "p"
        ),
    )


WEEK_US = 7 * 24 * HOUR_US


@register(
    "rolling_anomalies",
    f"""
    WITH base AS (
        SELECT event_id, user_id, ts, value,
            count(*) OVER w AS n,
            CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                AS s,
            CAST(sum(CAST(value AS DECIMAL(18,4))
                     * CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                AS s2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN {WEEK_US} PRECEDING
                           AND 1 PRECEDING)),
    m AS (SELECT *, s / n AS mean FROM base),
    v AS (SELECT *, s2 / n - mean * mean AS var FROM m),
    z AS (SELECT *,
            CASE WHEN n >= 2 AND var > 0
                 THEN (value - mean) / sqrt(var) END AS zs
          FROM v)
    SELECT event_id, user_id, ts, n AS n_base,
        floor(zs * 10000 + 0.5) / 10000 AS zscore,
        CASE WHEN abs(zs) > 2.5 AND n >= 4 THEN 1 ELSE 0 END
            AS is_anomaly
    FROM z
    """,
)
def q_rolling_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event z-score anomaly screen: each event scored against
    the mean/std of the SAME user's trailing 7-day baseline,
    EXCLUSIVE of the event itself, flagged when |z| > 2.5 — the
    alerting primitive every metrics/observability store ships (and
    the time-RANGE twin of the curation suite's
    class_centroid_outliers). The exclusive frame matters: an
    inclusive frame caps |z| at sqrt(n-1) (the spike inflates its own
    baseline), silently making the flag unreachable on sparse keys.
    z is NULL when the baseline is degenerate (empty, single event —
    whose variance is analytically zero but carries a float residue
    that would pass a bare var > 0 guard — or all values equal); such
    rows are never flagged, and neither is
    any row whose baseline holds fewer than 4 events — a 2-event
    baseline makes z explode on ordinary jitter (a 1.0-vs-10.5 pair
    flags a 9.0), the classic cold-start false-positive.

    Scale: identical envelope to rolling_stats — one shuffle on
    user_id, one ordered pass with a bounded sliding frame (both
    engines run the numeric RANGE over epoch micros, so the exclusive
    bound is the same `-1` on both sides). The second moment
    accumulates in DECIMAL (the value² products are exact at
    (18,4) × (18,4)), so frame-slide order can't drift the variance;
    mean/var/z are then double expressions spelled identically in the
    oracle, and the flag compares identical doubles — deterministic
    across engines by construction."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-WEEK_US, -1)
    )
    vdec = F.col("value").cast(DEC4)
    n = F.count(F.lit(1)).over(w)
    s = F.sum(vdec).over(w).cast("double")
    s2 = F.sum(vdec * vdec).over(w).cast("double")
    base = e.select("event_id", "user_id", "ts", "value",
                    n.alias("n"), s.alias("s"), s2.alias("s2"))
    m = base.withColumn("mean", F.col("s") / F.col("n"))
    v = m.withColumn(
        "var", F.col("s2") / F.col("n") - F.col("mean") * F.col("mean")
    )
    # n >= 2: a single-point baseline's var is analytically zero but
    # leaves a ~1e-10 float residue (s2/n - mean*mean), which would
    # pass the var > 0 guard and emit an astronomically-scaled junk z
    z = v.withColumn(
        "zs",
        F.when(
            (F.col("n") >= 2) & (F.col("var") > 0),
            (F.col("value") - F.col("mean")) / F.sqrt(F.col("var")),
        ),
    )
    return z.select(
        "event_id",
        "user_id",
        "ts",
        F.col("n").alias("n_base"),
        qround(F.col("zs"), 4).alias("zscore"),
        F.when((F.abs(F.col("zs")) > 2.5) & (F.col("n") >= 4), 1)
        .otherwise(0)
        .alias("is_anomaly"),
    )


@register(
    "active_users",
    """
    WITH ud AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
    wexp AS (
        SELECT DISTINCT ud.day + CAST(i AS INTEGER) AS day, user_id
        FROM ud CROSS JOIN
             (SELECT unnest(generate_series(0, 6)) AS i) t),
    wau AS (SELECT day, count(*) AS wau FROM wexp GROUP BY day),
    mexp AS (
        SELECT DISTINCT ud.day + CAST(i AS INTEGER) AS day, user_id
        FROM ud CROSS JOIN
             (SELECT unnest(generate_series(0, 29)) AS i) t),
    mau AS (SELECT day, count(*) AS mau FROM mexp GROUP BY day)
    SELECT day, dau, wau, mau
    FROM dau JOIN wau USING (day) JOIN mau USING (day)
    """,
)
def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU: per active day, the distinct users active that
    day, in the trailing 7 days, and in the trailing 30 days — the
    engagement triple every product dashboard opens with. Rows are
    emitted for ACTIVE days (a day with zero events reports nothing
    rather than a zero row).

    Scale: rolling COUNT DISTINCT has no window form — the plan here
    is the canonical scalable shape: dedupe FIRST to (user, day)
    pairs (one shuffle, collapsing arbitrarily many events per user-
    day before any fan-out), then explode each pair into the ≤7 / ≤30
    future days it supports and dedupe-count per target day. The
    fan-out is bounded by 30 × user-days — independent of raw event
    count — and every aggregate is map-side combinable. The approx
    alternative at extreme scale is the mergeable HLL register sketch
    (hll_distinct): max-merge 30 daily sketches instead of exploding;
    this query is its exact twin on the events table."""
    e = _t(spark, sf_dir, "events")
    ud = e.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    return active_user_counts(ud)


def active_user_counts(ud: DataFrame) -> DataFrame:
    """The DAU/WAU/MAU triple from a distinct (day, user_id) frame —
    shared by the batch query above and the streamed snapshot
    (streaming/timeseries.py active_users_snapshot): the pair set is
    the operator's entire state, and set union is idempotent AND
    associative, so the streamed merge needs no epoch algebra at
    all."""
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))

    def rolling(days: int, name: str) -> DataFrame:
        exp = (
            ud.select(
                F.explode(
                    F.sequence(F.lit(0), F.lit(days - 1))
                ).alias("i"),
                "day",
                "user_id",
            )
            .select(
                F.date_add("day", F.col("i")).alias("day"), "user_id"
            )
            .distinct()
        )
        return exp.groupBy("day").agg(F.count(F.lit(1)).alias(name))

    return (
        dau.join(rolling(7, "wau"), "day")
        .join(rolling(30, "mau"), "day")
        .select("day", "dau", "wau", "mau")
    )


def _global_rank_tile(
    df: DataFrame, sort_cols: list, k: int, out: str
) -> DataFrame:
    """(user_id, <out>): NTILE(k) of ``df``'s rows under the total
    order ``sort_cols`` — WITHOUT a single-partition window. The
    corpus_shuffle two-phase shape: range-partition on the sort key,
    parallel per-partition row_number, exclusive prefix-sum of the
    ~n_partitions counts, broadcast back; then Spark-side NTILE
    arithmetic (first n % k tiles get the extra row — the SQL-standard
    remainder rule DuckDB's native ntile applies, which the oracle
    uses, making the two formulations independent)."""
    part = df.repartitionByRange(*sort_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = _persist(
        part.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_pid").orderBy(*sort_cols)
            ),
        )
    )
    offsets = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "_total", F.sum("_cnt").over(Window.partitionBy(F.lit(1)))
        )
        .drop("_cnt")
    )
    rn = F.col("_offset") + F.col("_rn")
    n = F.col("_total")
    q = F.floor(n / k)
    big = n % k
    cut = big * (q + 1)
    tile = F.when(rn <= cut, F.floor((rn - 1) / (q + 1)) + 1).otherwise(
        # q = 0 only when n < k, where every row satisfies rn <= cut;
        # greatest() keeps the unused branch division total
        big + F.floor((rn - cut - 1) / F.greatest(q, F.lit(1))) + 1
    )
    return local.join(F.broadcast(offsets), "_pid").select(
        "user_id", tile.cast("long").alias(out)
    )


@register(
    "rfm_segments",
    """
    WITH p AS (SELECT user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    agg AS (SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
            round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
                AS monetary
            FROM p GROUP BY user_id),
    r AS (SELECT user_id,
            date_diff('day', CAST(last_ts AS DATE),
                      (SELECT max(CAST(ts AS DATE)) FROM p))
                AS recency_days,
            frequency, monetary, last_ts
          FROM agg)
    SELECT user_id, recency_days, frequency, monetary,
        ntile(5) OVER (ORDER BY last_ts DESC, user_id) AS r_tile,
        ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f_tile,
        ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m_tile
    FROM r
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per purchasing user, recency (days since
    last purchase, against the corpus's last purchase day), frequency
    (purchase count) and monetary (exact DECIMAL spend), each cut
    into NTILE(5) quintiles — the classic customer-value grid
    (r_tile ranks by EXACT last-purchase time, most recent first, so
    same-day ties stay total; f/m rank descending, user_id breaking
    ties). The oracle is DuckDB's NATIVE ntile() — the Spark side
    never calls ntile at all (see below), the asof-join style
    independent-formulation pairing.

    Scale: NTILE is a global-total-order operator; the naive Spark
    form is a single-partition window over every user. Each quintile
    here is instead the corpus_shuffle two-phase rank (range
    exchange, parallel local row_number, prefix-summed offsets
    broadcast back) + the SQL-standard remainder arithmetic, so the
    plan stays parallel at any user count. The corpus-max date is a
    sanctioned 1-row scalar collect (the lm_quality discipline)."""
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase")
    agg = p.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(
            F.sum(F.col("value").cast(DEC4)).cast("double"), 4
        ).alias("monetary"),
    )
    max_day = p.agg(F.max(F.to_date("ts"))).collect()[0][0]
    base = agg.select(
        "user_id",
        F.datediff(F.lit(max_day), F.to_date("last_ts")).alias(
            "recency_days"
        ),
        "frequency",
        "monetary",
        "last_ts",
    )
    base = _persist(base)
    r = _global_rank_tile(
        base.select(
            "user_id", (-F.unix_micros("last_ts")).alias("k1")
        ),
        [F.col("k1"), F.col("user_id")],
        5,
        "r_tile",
    )
    f = _global_rank_tile(
        base.select("user_id", (-F.col("frequency")).alias("k1")),
        [F.col("k1"), F.col("user_id")],
        5,
        "f_tile",
    )
    m = _global_rank_tile(
        base.select("user_id", (-F.col("monetary")).alias("k1")),
        [F.col("k1"), F.col("user_id")],
        5,
        "m_tile",
    )
    return (
        base.join(r, "user_id")
        .join(f, "user_id")
        .join(m, "user_id")
        .select(
            "user_id", "recency_days", "frequency", "monetary",
            "r_tile", "f_tile", "m_tile",
        )
    )


@register(
    "ohlc_unpivot",
    """
    WITH ohlc AS (
        SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS h,
            first(value ORDER BY ts, event_id) AS open,
            max(value) AS high,
            min(value) AS low,
            last(value ORDER BY ts, event_id) AS close
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1, 2)
    SELECT user_id, h, metric, v
    FROM ohlc UNPIVOT (v FOR metric IN (open, high, low, close))
    """,
)
def q_ohlc_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form export of the OHLC matrix: one (user, hour, metric,
    value) row per candlestick field — the wide→long UNPIVOT/melt
    operator, and the layout a metrics/time-series store ingests
    (metric name as a tag column, not a schema column). The oracle is
    DuckDB's native UNPIVOT against Spark's native `unpivot` — two
    engines' dedicated operators checked against each other.

    Scale: unpivot is a map-only projection (each input row emits a
    fixed 4 rows, no shuffle added to the upstream aggregate); the
    upstream is q_ohlc_resample's combiner-friendly groupBy."""
    e = _t(spark, sf_dir, "events")
    order = F.struct("ts", "event_id")
    ohlc = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.min_by("value", order).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order).alias("close"),
        )
    )
    return ohlc.unpivot(
        ids=["user_id", "h"],
        values=["open", "high", "low", "close"],
        variableColumnName="metric",
        valueColumnName="v",
    )


def daily_counts(e: DataFrame) -> DataFrame:
    """The shared sufficient statistics for the calendar reports:
    (event_type, day, n, vsum) with vsum an EXACT DECIMAL(18,4) sum —
    dow_seasonality and type_correlation consume n; weekly_growth
    consumes n + vsum (per-day decimal sums re-sum to the identical
    week totals by associativity). The streamed serve path
    (streaming/timeseries.daily_count_stream) lands THIS frame as an
    ADD-merged epoch sink, so all three reports come off one sink —
    the token-count-sink pattern on the events table."""
    return e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC4)).alias("vsum"),
    )


def dow_seasonality_from_daily(daily: DataFrame) -> DataFrame:
    """The dow_seasonality aggregate over a (event_type, day, n)
    frame (zero-filled spine built here)."""
    daily = _persist(daily)
    types = sorted(
        r[0] for r in daily.select("event_type").distinct().collect()
    )
    spine = daily.select("day").distinct().select(
        "day",
        F.explode(F.array(*[F.lit(t) for t in types])).alias("event_type"),
    )
    typed = (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            (F.weekday("day") + F.lit(1)).alias("dow"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
    typed = _persist(typed)
    prof = typed.groupBy("event_type", "dow").agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("dow_mean"),
        F.sum("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_days"),
    )
    overall = typed.groupBy("event_type").agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mean_all")
    )
    return prof.join(F.broadcast(overall), "event_type").select(
        "event_type",
        F.col("dow").cast("int").alias("dow"),
        "n_events",
        "n_days",
        qround(F.col("dow_mean"), 4).alias("dow_mean"),
        qround(F.col("dow_mean") / F.col("mean_all"), 6).alias(
            "seasonal_index"
        ),
    )


def weekly_growth_from_daily(daily: DataFrame) -> DataFrame:
    """The weekly_growth aggregate over (event_type, day, n, vsum)."""
    wk = daily.groupBy(
        "event_type", F.date_trunc("week", "day").alias("week")
    ).agg(
        F.sum("n").alias("n"),
        F.round(F.sum("vsum").cast(DEC4).cast("double"), 4).alias(
            "total_value"
        ),
    )
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("n").over(w)
    growth = F.when(
        prev.isNotNull() & (prev > 0),
        F.floor(
            (F.col("n").cast("double") - prev) / prev * F.lit(1e6)
            + F.lit(0.5)
        )
        / F.lit(1e6),
    )
    return wk.select(
        "event_type", "week", "n", "total_value",
        growth.alias("wow_growth"),
    )



@register(
    "type_correlation",
    """
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
        FROM events GROUP BY 1, 2),
    days AS (SELECT DISTINCT day FROM d),
    types AS (SELECT DISTINCT event_type FROM d),
    filled AS (
        SELECT day, event_type, COALESCE(n, 0) AS n
        FROM days CROSS JOIN types LEFT JOIN d USING (day, event_type)),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.n AS x, b.n AS y
        FROM filled a JOIN filled b USING (day)
        WHERE a.event_type < b.event_type),
    s AS (
        SELECT type_a, type_b, count(*) AS n,
            CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
            CAST(sum(x * y) AS BIGINT) AS sxy,
            CAST(sum(x * x) AS BIGINT) AS sxx,
            CAST(sum(y * y) AS BIGINT) AS syy
        FROM pairs GROUP BY 1, 2)
    SELECT type_a, type_b, n AS n_days,
        CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
             THEN floor((n * sxy - sx * sy) * 1.0
                        / sqrt((n * sxx - sx * sx) * 1.0
                               * (n * syy - sy * sy))
                        * 1000000 + 0.5) / 1000000 END AS pearson_r
    FROM s
    """,
)
def q_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between every pair of event-type DAILY
    count series — "do error spikes co-move with signups?", the
    cross-metric screen an observability store runs over its tag
    dimension. Days where a type is silent COUNT AS ZERO (the
    zero-fill is what makes the correlation honest — skipping absent
    days biases r toward busy days). NULL r for constant series
    (zero variance on either side).

    Scale: daily counts are one map-side-combined groupBy; the
    zero-fill spine is a map-only explode of the BOUNDED type list
    (collected once, the sanctioned |types|-row scalar — a crossJoin
    would plan BroadcastNestedLoopJoin, audit-rejected); the pair
    frame is days × |types|² rows; all moments are exact integer
    sums, the correlation formula a double expression spelled
    identically in the oracle with the qround quantizer."""
    e = _t(spark, sf_dir, "events")
    d = daily_counts(e).select("day", "event_type", "n")
    return type_correlation_from_daily(d)


def type_correlation_from_daily(d: DataFrame) -> DataFrame:
    """The correlation aggregate over a (day, event_type, n) daily
    frame — shared by the batch query and the streamed serve path
    (streaming/timeseries.correlation_snapshot off the daily-count
    sink)."""
    d = _persist(d)
    types = sorted(
        r[0] for r in d.select("event_type").distinct().collect()
    )
    spine = (
        d.select("day")
        .distinct()
        .select(
            "day",
            F.explode(
                F.array(*[F.lit(t) for t in types])
            ).alias("event_type"),
        )
    )
    full = spine.join(d, ["day", "event_type"], "left").select(
        "day", "event_type", F.coalesce("n", F.lit(0)).alias("n")
    )
    a = full.select(
        "day", F.col("event_type").alias("type_a"), F.col("n").alias("x")
    )
    b = full.select(
        "day", F.col("event_type").alias("type_b"), F.col("n").alias("y")
    )
    pairs = a.join(b, "day").filter(F.col("type_a") < F.col("type_b"))
    s = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    r = F.when(
        (vx > 0) & (vy > 0),
        qround(
            (n * sxy - sx * sy) * F.lit(1.0)
            / F.sqrt(vx * F.lit(1.0) * vy),
            6,
        ),
    )
    return s.select(
        "type_a", "type_b", n.alias("n_days"), r.alias("pearson_r")
    )


@register(
    "mad_outliers",
    """
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type),
    dev AS (
        SELECT e.event_id, e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type)
    SELECT d.event_id, d.event_type, d.value,
           floor((d.value - d.med) / (1.4826 * m2.mad)
                 * 10000 + 0.5) / 10000 AS robust_z
    FROM dev d JOIN mad m2 USING (event_type)
    WHERE m2.mad > 0
      AND abs((d.value - d.med) / (1.4826 * m2.mad)) > 3.5
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier screen: |x − median| > 3.5 MADs (the
    Iglewicz-Hoaglin cut, MAD scaled by 1.4826 to be a consistent
    sigma estimator). The MEAN/STDDEV z-screen (rolling_anomalies)
    is itself dragged by the outliers it hunts — median/MAD has a
    50% breakdown point, the standard screen for heavy-tailed
    metrics, and this corpus's values are heavy-tailed (max robust-z
    ≈ 12 at sf0.01 where a normal tail would stop near 4).

    Scale: two grouped EXACT medians (percentile over the |types|
    groups — each group's sort is distributed by the aggregate, no
    global single-partition window), each followed by a broadcast of
    the |types|-row stat table back onto the stream; the flagged set
    is the only output. The z expression and its 3.5 gate are spelled
    with the identical operation order in the oracle, so the cut is
    engine-deterministic (mad > 0 guards the degenerate constant
    group in both engines identically)."""
    e = _t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    dev = _persist(dev)  # feeds the MAD aggregate AND the final scan
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5D)").alias("mad")
    )
    z = (F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.abs(z) > 3.5))
        .select(
            "event_id",
            "event_type",
            "value",
            qround(z, 4).alias("robust_z"),
        )
    )


@register(
    "event_trigrams",
    """
    WITH s AS (
        SELECT event_type AS t1,
               lead(event_type) OVER w AS t2,
               lead(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT t1, t2, t3, count(*) AS n
    FROM s WHERE t3 IS NOT NULL
    GROUP BY t1, t2, t3
    ORDER BY n DESC, t1, t2, t3
    LIMIT 25
    """,
)
def q_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step behavioral sequences (second-order path mining):
    the most frequent (t1 → t2 → t3) windows over per-user
    (ts, event_id)-ordered streams — the path-analysis upgrade of
    the first-order Markov matrix (q_event_transitions), catching
    patterns the pairwise view factorizes away (e.g. view→click→
    purchase vs view→click→error diverge only at depth 3).

    Scale: identical envelope to event_transitions — one user_id
    shuffle for the two lead() passes (same window, one WindowExec),
    then a groupBy over at most |types|³ = 125 groups, map-side
    combined. Top-25 by count with the full lexicographic tiebreak
    compiles to TakeOrderedAndProject; integer counts make the cut
    exact in both engines."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type").over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    return (
        s.filter(F.col("t3").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "t1", "t2", "t3")
        .limit(25)
    )


@register(
    "dow_seasonality",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        FROM events GROUP BY 1, 2),
    spine AS (SELECT DISTINCT day FROM daily),
    typed AS (
        SELECT t.event_type, s.day, isodow(s.day) AS dow,
               coalesce(d.n, 0) AS n
        FROM (SELECT DISTINCT event_type FROM daily) t
        CROSS JOIN spine s
        LEFT JOIN daily d ON d.event_type = t.event_type
                         AND d.day = s.day),
    prof AS (
        SELECT event_type, dow,
               CAST(sum(n) AS DOUBLE) / count(*) AS dow_mean,
               CAST(sum(n) AS BIGINT) AS n_events, count(*) AS n_days
        FROM typed GROUP BY 1, 2),
    overall AS (
        SELECT event_type, CAST(sum(n) AS DOUBLE) / count(*) AS mean_all
        FROM typed GROUP BY 1)
    SELECT p.event_type, CAST(p.dow AS INT) AS dow,
           p.n_events, p.n_days,
           floor(p.dow_mean * 10000 + 0.5) / 10000 AS dow_mean,
           floor(p.dow_mean / o.mean_all * 1000000 + 0.5) / 1000000
             AS seasonal_index
    FROM prof p JOIN overall o USING (event_type)
    """,
)
def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal profile per event type: mean daily count
    per ISO weekday (Mon=1..Sun=7) and the seasonal index (dow mean ÷
    overall daily mean — >1 means that weekday runs hot). Days where
    a type is silent count as ZERO via the distinct-day spine (the
    type_correlation zero-fill argument: skipping silent days biases
    every mean toward busy days).

    Portability: both means are exact-integer-sum ÷ exact-count — one
    IEEE divide each, then the floor-form quantizer; the index is one
    further divide spelled identically. No interpolation, no
    summation-order dependence.

    Scale: daily counts are one map-side-combined groupBy (days ×
    |types| rows out); the spine cross join is |types| × |days| —
    time-span-bounded, not data-bounded; both profile aggregates are
    ≤ 7 × |types| rows. The spine frame is computed once and reused
    by both the per-dow and overall aggregates."""
    e = _t(spark, sf_dir, "events")
    return dow_seasonality_from_daily(
        daily_counts(e).select("event_type", "day", "n")
    )


@register(
    "trigram_lift",
    """
    WITH s AS (
        SELECT event_type AS t1,
               lead(event_type) OVER w AS t2,
               lead(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    tri AS (
        SELECT t1, t2, t3, count(*) AS n3
        FROM s WHERE t3 IS NOT NULL GROUP BY 1, 2, 3),
    bi AS (
        SELECT t1 AS b1, t2 AS b2, count(*) AS n2
        FROM s WHERE t3 IS NOT NULL GROUP BY 1, 2),
    mar AS (
        SELECT t2 AS m2, t3 AS m3, count(*) AS nm
        FROM s WHERE t3 IS NOT NULL GROUP BY 1, 2),
    tot AS (
        SELECT t2 AS o2, count(*) AS n1
        FROM s WHERE t3 IS NOT NULL GROUP BY 1)
    SELECT t1, t2, t3, n3,
           floor((CAST(n3 AS DOUBLE) / bi.n2)
                 / (CAST(mar.nm AS DOUBLE) / tot.n1)
                 * 1000000 + 0.5) / 1000000 AS lift
    FROM tri
    JOIN bi  ON bi.b1 = tri.t1 AND bi.b2 = tri.t2
    JOIN mar ON mar.m2 = tri.t2 AND mar.m3 = tri.t3
    JOIN tot ON tot.o2 = tri.t2
    WHERE n3 >= 5
    """,
)
def q_trigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order structure detector: for each (t1 → t2 → t3) path,
    the lift P(t3 | t1,t2) / P(t3 | t2) — how much the two-step
    context changes the next-step distribution vs the first-order
    Markov model. Lift ≈ 1 everywhere means the chain is genuinely
    first-order and q_event_transitions is a sufficient model; the
    rows far from 1 are exactly where depth-3 mining
    (q_event_trigrams) earns its cost. All four count frames condition
    on the same completed-window population (t3 known), so the two
    conditionals are comparable.

    Scale: ONE window pass (shared by all four aggregates off the
    same projection), then groupBys over ≤ |types|³ / |types|² /
    |types| rows — every join after the pass is dim-sized and
    broadcast. The ratio-of-ratios is double-spelled identically in
    the oracle with the floor-form quantizer."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type").over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    s = _persist(s)
    tri = s.groupBy("t1", "t2", "t3").agg(F.count(F.lit(1)).alias("n3"))
    bi = s.groupBy(
        F.col("t1").alias("b1"), F.col("t2").alias("b2")
    ).agg(F.count(F.lit(1)).alias("n2"))
    mar = s.groupBy(
        F.col("t2").alias("m2"), F.col("t3").alias("m3")
    ).agg(F.count(F.lit(1)).alias("nm"))
    tot = s.groupBy(F.col("t2").alias("o2")).agg(
        F.count(F.lit(1)).alias("n1")
    )
    lift = (F.col("n3").cast("double") / F.col("n2")) / (
        F.col("nm").cast("double") / F.col("n1")
    )
    return (
        tri.join(
            F.broadcast(bi),
            (F.col("b1") == F.col("t1")) & (F.col("b2") == F.col("t2")),
        )
        .join(
            F.broadcast(mar),
            (F.col("m2") == F.col("t2")) & (F.col("m3") == F.col("t3")),
        )
        .join(F.broadcast(tot), F.col("o2") == F.col("t2"))
        .filter(F.col("n3") >= 5)
        .select("t1", "t2", "t3", "n3", qround(lift, 6).alias("lift"))
    )


@register(
    "interarrival_stats",
    """
    WITH g AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   AS gap_us
        FROM events),
    f AS (SELECT event_type, gap_us FROM g WHERE gap_us IS NOT NULL)
    SELECT event_type, count(*) AS n_gaps,
           floor(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1000000
                 * 10000 + 0.5) / 10000 AS mean_gap_s,
           floor(sqrt(greatest(
                   (CAST(sum(CAST(gap_us AS DECIMAL(38,0)) * gap_us) AS DOUBLE)
                    - CAST(sum(gap_us) AS DOUBLE) * sum(gap_us) / count(*))
                   / count(*), 0))
                 / (CAST(sum(gap_us) AS DOUBLE) / count(*))
                 * 10000 + 0.5) / 10000 AS cv
    FROM f GROUP BY event_type
    """,
)
def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival profile per event type: mean gap between a
    user's consecutive events (any type → that type boundary — the
    lag is over the user's FULL stream, so the gap measures stream
    tempo at each type's arrivals) and the coefficient of variation —
    the burstiness scalar (CV ≈ 1 Poisson, > 1 bursty, < 1 regular).

    Portability: gaps are integer microseconds; Σgap and Σgap² are
    EXACT integer sums (gap² ≤ (31 days)² µs² ≈ 7e24 — beyond int64,
    so the square is summed in DECIMAL(38,0), still exact), and the
    variance/mean/CV are then a fixed IEEE expression over two exact
    integers and a count, spelled identically in the oracle. No
    float accumulation anywhere.

    Scale: one user_id window pass (same exchange as the other
    sequence queries), then a |types|-row aggregate with map-side
    partials."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    g = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    agg = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        # Σgap in DECIMAL: at ~1e6 users × month-long spans the int64
        # sum would sit within 3 bits of overflow — same width the
        # oracle's DuckDB sum(BIGINT)→DECIMAL(38,0) already has
        F.sum(F.col("gap_us").cast("decimal(38,0)")).alias("s1"),
        F.sum(
            (F.col("gap_us").cast("decimal(38,0)") * F.col("gap_us"))
        ).alias("s2"),
    )
    mean_us = F.col("s1").cast("double") / F.col("n_gaps")
    var_us2 = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n_gaps")
    ) / F.col("n_gaps")
    cv = F.sqrt(F.greatest(var_us2, F.lit(0.0))) / mean_us
    return agg.select(
        "event_type",
        "n_gaps",
        qround(mean_us / F.lit(1e6), 4).alias("mean_gap_s"),
        qround(cv, 4).alias("cv"),
    )


@register(
    "weekly_growth",
    """
    WITH w AS (
        SELECT event_type,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
               count(*) AS n,
               round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
                 AS total_value
        FROM events GROUP BY 1, 2),
    g AS (
        SELECT *,
               lag(n) OVER (PARTITION BY event_type ORDER BY week)
                 AS prev_n
        FROM w)
    SELECT event_type, week, n, total_value,
           CASE WHEN prev_n IS NOT NULL AND prev_n > 0 THEN
               floor((CAST(n AS DOUBLE) - prev_n) / prev_n
                     * 1000000 + 0.5) / 1000000
           END AS wow_growth
    FROM g
    """,
)
def q_weekly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type: weekly counts + exact
    DECIMAL value totals, and the WoW growth rate ((n − prev)/prev)
    against the previous CALENDAR week bucket (date_trunc both
    engines; a silent week simply has no row, so the lag compares
    adjacent OBSERVED weeks — the convention BI tools call
    'vs previous period with data'; the zero-filled alternative is
    dow_seasonality's spine pattern). NULL growth on the first
    observed week.

    Scale: one map-side-combined groupBy to |types| × |weeks| rows
    (time-span bounded); the lag window runs over those tiny frames,
    partitioned by type — never a single-partition global window."""
    e = _t(spark, sf_dir, "events")
    return weekly_growth_from_daily(daily_counts(e))


def ewma_from_daily(daily: DataFrame) -> DataFrame:
    """The ewma_daily smoother over a (event_type, day, n) frame —
    factored so the streamed daily-count sink
    (streaming/timeseries.daily_count_stream) can serve it too."""
    daily = _persist(daily.select("event_type", "day", "n"))
    b = daily.groupBy("event_type").agg(
        F.min("day").alias("dlo"), F.max("day").alias("dhi")
    )
    spine = b.select(
        "event_type",
        F.explode(F.sequence("dlo", "dhi")).alias("day"),
    )
    sp = _persist(
        spine.join(daily, ["event_type", "day"], "left").select(
            "event_type", "day", F.coalesce("n", F.lit(0)).alias("x")
        )
    )
    contrib = (
        sp.select(
            "event_type",
            "day",
            "x",
            F.explode(F.sequence(F.lit(0), F.lit(27))).alias("g"),
        )
        .select(
            "event_type",
            F.date_add("day", F.col("g").cast("int")).alias("day"),
            (
                F.col("x").cast("double")
                / F.expr("CAST(shiftleft(1, g) AS DOUBLE)")
            ).alias("w"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("w").alias("ewma"))
    )
    return sp.join(contrib, ["event_type", "day"]).select(
        "event_type", "day", F.col("x").alias("n"), "ewma"
    )


@register(
    "ewma_daily",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS dlo, max(day) AS dhi
          FROM daily GROUP BY 1),
    spine AS (
        SELECT event_type,
               CAST(unnest(generate_series(CAST(dlo AS TIMESTAMP),
                                           CAST(dhi AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM b),
    sp AS (
        SELECT s.event_type, s.day, coalesce(d.n, 0) AS x
        FROM spine s LEFT JOIN daily d
          ON s.event_type = d.event_type AND s.day = d.day),
    contrib AS (
        SELECT sp.event_type,
               sp.day + CAST(t.g AS INTEGER) AS day,
               CAST(sp.x AS DOUBLE) / (1 << t.g) AS w
        FROM sp CROSS JOIN range(0, 28) t(g)),
    agg AS (
        SELECT event_type, day, sum(w) AS ewma
        FROM contrib GROUP BY 1, 2)
    SELECT sp.event_type, sp.day, sp.x AS n, a.ewma
    FROM sp JOIN agg a ON sp.event_type = a.event_type AND sp.day = a.day
    """,
)
def q_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dyadic-decay EWMA over the zero-filled per-type daily count
    series: s(t) = sum over g in [0, 27] of x(t-g) / 2^g — the
    trailing exponential smoother next to rolling_stats' flat window
    and rolling_anomalies' z-screen.

    The decay base is deliberately 1/2 with a 28-day horizon: every
    term x/2^g is a dyadic rational with <= ~46 mantissa bits (counts
    < 2^19 at any tested SF, g <= 27), so every partial sum is EXACTLY
    representable in a double — the sum is order-independent and
    engine-portable WITHOUT the DECIMAL detour, and no rounding
    boundary is needed at all (the weight is spelled as integer
    shiftleft + one division both engines — pow() is not guaranteed
    correctly rounded, 1 << g is exact by construction).

    Scale: the spine is time-span x |types| bounded (never corpus-
    sized); the decay fans each spine day out 28x through an explode
    (map-only, fixed fan-out — the active_users bounded-fan-out
    shape), one (type, day)-keyed map-side-combined sum, one narrow
    join back to the spine. No window operator at all, so no
    per-partition ordering cost."""
    e = _t(spark, sf_dir, "events")
    return ewma_from_daily(daily_counts(e))


@register(
    "histogram_quantiles",
    """
    WITH b AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events),
    h AS (
        SELECT event_type AS key,
               CAST(least(greatest(floor((value - (SELECT vmin FROM b))
                   * 1024.0 / ((SELECT vmax FROM b) - (SELECT vmin FROM b))),
                   0), 1023) AS BIGINT) AS bin,
               count(*) AS c
        FROM events GROUP BY 1, 2),
    cum AS (
        SELECT key, bin, c,
               sum(c) OVER (PARTITION BY key ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               sum(c) OVER (PARTITION BY key) AS n
        FROM h),
    q AS (SELECT * FROM (VALUES ('p50', 0.5), ('p90', 0.9), ('p99', 0.99))
          t(q_label, qv)),
    j AS (
        SELECT c.key, q.q_label, CAST(c.n AS BIGINT) AS n,
               CAST(ceil(q.qv * c.n) AS BIGINT) AS k, c.bin, c.cum
        FROM cum c CROSS JOIN q),
    pick AS (
        SELECT key, q_label, min(n) AS n, min(k) AS k, min(bin) AS bin
        FROM j WHERE cum >= k GROUP BY key, q_label)
    SELECT key, q_label, n, k, bin,
           (SELECT vmin FROM b) + bin * ((SELECT vmax FROM b)
               - (SELECT vmin FROM b)) / 1024.0 AS lo,
           (SELECT vmin FROM b) + (bin + 1) * ((SELECT vmax FROM b)
               - (SELECT vmin FROM b)) / 1024.0 AS hi
    FROM pick
    """,
)
def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The QUANTILE member of the engine-portable sketch family
    (cardinality: hll_distinct; frequency: cm_heavy_hitters;
    membership: bloom_decontaminate; quantiles: this): per event type
    the p50/p90/p99 BRACKET from a fixed 1024-bin equal-width
    histogram over the value domain — the smallest bin whose running
    count reaches ceil(q·n), with its [lo, hi) bounds; the true
    quantile provably lies inside (error ≤ one bin width). Spark's
    own percentile_approx carries engine-private sketch state; these
    registers DuckDB recomputes bit-for-bit, and two shards' register
    frames ADD-merge into the union's exactly (mergeability pinned by
    test; the streamed serve freezes the bin domain at first run —
    the DSIR/langid artifact lifecycle — and post-freeze out-of-range
    arrivals clamp into the edge bins, counted, never dropped).

    Scale: one 1-row min/max aggregate (driver scalar, sanctioned),
    one map-side-combined groupBy to ≤ types × 1024 register rows,
    windows over ≤1024-row frames — shuffle volume independent of
    input size, exactly like the other three sketches. value_quantiles
    is the exact-order-statistics twin."""
    from clinvar_pipeline_spark.operators.sketch import (
        quantiles_from_histogram,
        value_histogram,
    )

    e = _t(spark, sf_dir, "events")
    b = e.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax")).first()
    vmin, vmax = float(b["vmin"]), float(b["vmax"])
    hist = value_histogram(e, "event_type", "value", vmin, vmax)
    return quantiles_from_histogram(hist, vmin, vmax).withColumnRenamed(
        "key", "key"
    )


@register(
    "peak_concurrency",
    """
    WITH s AS (
        SELECT event_type, ts AS st, ts + INTERVAL 30 MINUTE AS en
        FROM events),
    d AS (
        SELECT event_type, st, en,
               unnest(generate_series(
                   CAST(date_trunc('day', st) AS TIMESTAMP),
                   CAST(date_trunc('day', en - INTERVAL 1 MICROSECOND)
                        AS TIMESTAMP),
                   INTERVAL 1 DAY)) AS day
        FROM s),
    c AS (
        SELECT event_type, day,
               greatest(st, day) AS st,
               least(en, day + INTERVAL 1 DAY) AS en
        FROM d),
    b AS (
        SELECT event_type, day, st AS bts, 1 AS delta FROM c
        UNION ALL
        SELECT event_type, day, en AS bts, -1 AS delta FROM c),
    r AS (
        SELECT event_type, day, bts,
               sum(delta) OVER (PARTITION BY event_type, day
                                ORDER BY bts, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS run
        FROM b),
    p AS (SELECT event_type, day, max(run) AS peak
          FROM r GROUP BY event_type, day)
    SELECT r.event_type, CAST(r.day AS DATE) AS day,
           CAST(p.peak AS BIGINT) AS peak,
           min(r.bts) AS peak_ts
    FROM r JOIN p ON r.event_type = p.event_type AND r.day = p.day
    WHERE r.run = p.peak
    GROUP BY r.event_type, r.day, p.peak
    """,
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency (occupancy) per event type and calendar day:
    treat each event as a 30-minute session, clip sessions at
    midnight (a crossing session counts in both days — bounded ≤2×
    fan-out), and sweep-line count: +1/−1 boundary rows, a running
    sum ordered by (time, delta) — ends sort before starts at the
    same instant, the half-open [st, en) convention — whose maximum
    is the day's peak, emitted with the first instant that reaches
    it. The max-concurrent-sessions / room-occupancy staple no
    aggregate function expresses directly.

    Determinism under boundary ties: rows with identical
    (bts, delta) permute only among themselves, so the running sum
    passes through the same value set at that instant — max(run) and
    min(bts at peak) are total regardless of intra-tie order (the
    asof tiebreak discipline applied to a sweep).

    Scale: the sweep partitions by (type, day) — frames are bounded
    by one day's boundary rows per type, never a global sort; the
    day-split explode is ≤2× and the peak pick is one groupBy + one
    equi-join back. At extreme per-day cardinality the same sweep
    re-partitions by (type, day, hour) with carry-in counts — the
    two-phase prefix-sum idiom; not needed at any tested SF."""
    e = _t(spark, sf_dir, "events")
    s = e.select(
        "event_type",
        F.col("ts").alias("st"),
        F.expr("ts + INTERVAL 30 MINUTE").alias("en"),
    )
    d = s.select(
        "event_type",
        "st",
        "en",
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col("st")),
                F.date_trunc(
                    "day", F.expr("en - INTERVAL 1 MICROSECOND")
                ),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    c = d.select(
        "event_type",
        "day",
        F.greatest("st", "day").alias("st"),
        F.least("en", F.expr("day + INTERVAL 1 DAY")).alias("en"),
    )
    b = c.select(
        "event_type", "day", F.col("st").alias("bts"), F.lit(1).alias("delta")
    ).unionAll(
        c.select(
            "event_type",
            "day",
            F.col("en").alias("bts"),
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy("bts", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = _persist(
        b.withColumn("run", F.sum("delta").over(w))
    )
    p = r.groupBy("event_type", "day").agg(F.max("run").alias("peak"))
    return (
        r.join(p, ["event_type", "day"])
        .filter(F.col("run") == F.col("peak"))
        .groupBy("event_type", "day", "peak")
        .agg(F.min("bts").alias("peak_ts"))
        .select(
            "event_type",
            F.col("day").cast("date").alias("day"),
            F.col("peak").cast("long").alias("peak"),
            "peak_ts",
        )
    )


@register(
    "trend_test",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS dlo, max(day) AS dhi
          FROM daily GROUP BY 1),
    spine AS (
        SELECT event_type,
               CAST(unnest(generate_series(CAST(dlo AS TIMESTAMP),
                                           CAST(dhi AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM b),
    sp AS (
        SELECT s.event_type, s.day, coalesce(d.n, 0) AS y
        FROM spine s LEFT JOIN daily d
          ON s.event_type = d.event_type AND s.day = d.day),
    pairs AS (
        SELECT a.event_type,
               CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1
                    ELSE 0 END AS sgn,
               floor((CAST(b.y AS DOUBLE) - a.y)
                     / date_diff('day', a.day, b.day)
                     * 1000000000.0 + 0.5) / 1000000000.0 AS slope
        FROM sp a JOIN sp b
          ON a.event_type = b.event_type AND a.day < b.day),
    s_stat AS (
        SELECT event_type, sum(sgn) AS s, count(*) AS n_pairs
        FROM pairs GROUP BY event_type),
    nd AS (SELECT event_type, count(*) AS n FROM sp GROUP BY event_type),
    ties AS (
        SELECT event_type,
               sum(t * (t - 1) * (2 * t + 5)) AS tie_term
        FROM (SELECT event_type, y, count(*) AS t
              FROM sp GROUP BY event_type, y)
        GROUP BY event_type),
    med AS (
        SELECT event_type, slope AS slope_med
        FROM (SELECT event_type, slope,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY slope) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS c
              FROM pairs)
        WHERE rn = CAST(ceil(c / 2.0) AS BIGINT)),
    z AS (
        SELECT s.event_type, nd.n, s.n_pairs, s.s,
               (nd.n * (nd.n - 1) * (2 * nd.n + 5) - t.tie_term) / 18.0
                   AS var_s
        FROM s_stat s JOIN nd USING (event_type)
        JOIN ties t USING (event_type))
    SELECT z.event_type, CAST(z.n AS BIGINT) AS n_days,
           CAST(z.n_pairs AS BIGINT) AS n_pairs,
           CAST(z.s AS BIGINT) AS s_stat,
           floor(CASE WHEN z.s > 0 THEN (z.s - 1) / sqrt(z.var_s)
                      WHEN z.s < 0 THEN (z.s + 1) / sqrt(z.var_s)
                      ELSE 0.0 END * 1000000000.0 + 0.5)
               / 1000000000.0 AS z_stat,
           m.slope_med,
           CASE WHEN (CASE WHEN z.s > 0 THEN (z.s - 1) / sqrt(z.var_s)
                           WHEN z.s < 0 THEN (z.s + 1) / sqrt(z.var_s)
                           ELSE 0.0 END) > 1.959963984540054
                THEN 'increasing'
                WHEN (CASE WHEN z.s > 0 THEN (z.s - 1) / sqrt(z.var_s)
                           WHEN z.s < 0 THEN (z.s + 1) / sqrt(z.var_s)
                           ELSE 0.0 END) < -1.959963984540054
                THEN 'decreasing'
                ELSE 'none' END AS trend
    FROM z JOIN med m USING (event_type)
    """,
)
def q_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test + Theil-Sen slope per event type over
    the zero-filled daily count series — the ROBUST trend detector
    next to mad_outliers (both are rank/median statistics a single
    spike cannot move, where a least-squares slope can): S = Σ
    sign(y_j − y_i) over all day pairs (pure INTEGER counting —
    exact), variance with the FULL ties correction
    (n(n−1)(2n+5) − Σ t(t−1)(2t+5))/18 (integers again — zero-filled
    silent days tie heavily, so the no-ties formula would overstate
    significance), z with the continuity correction, and the
    Theil-Sen slope = lower median of all pairwise slopes (each
    slope a qround(9) quotient; the median pick is a ROW_NUMBER
    order statistic — total because ROW_NUMBER ties broken by the
    deterministic slope order suffice: equal slopes are
    interchangeable at the median position).

    Scale: the pair fan-out is span²-bounded per type (days², never
    corpus rows — the active_users bounded-fan-out argument); one
    (type-keyed) join + two aggregates + one ≤span²-row window.
    sqrt is IEEE-correctly-rounded in both engines, so z matches
    bit-for-bit after qround."""
    e = _t(spark, sf_dir, "events")
    return trend_from_daily(daily_counts(e).select("event_type", "day", "n"))


def trend_from_daily(daily: DataFrame) -> DataFrame:
    """The trend_test core over a (event_type, day, n) frame — factored
    so the streamed daily-count sink serves it too."""
    b = daily.groupBy("event_type").agg(
        F.min("day").alias("dlo"), F.max("day").alias("dhi")
    )
    spine = b.select(
        "event_type", F.explode(F.sequence("dlo", "dhi")).alias("day")
    )
    sp = _persist(
        spine.join(daily, ["event_type", "day"], "left").select(
            "event_type", "day", F.coalesce("n", F.lit(0)).alias("y")
        )
    )
    a = sp.select(
        "event_type", F.col("day").alias("da"), F.col("y").alias("ya")
    )
    bb = sp.select(
        "event_type", F.col("day").alias("db"), F.col("y").alias("yb")
    )
    pairs = a.join(bb, ["event_type"]).filter(F.col("da") < F.col("db")).select(
        "event_type",
        F.when(F.col("yb") > F.col("ya"), 1)
        .when(F.col("yb") < F.col("ya"), -1)
        .otherwise(0)
        .alias("sgn"),
        qround(
            (F.col("yb").cast("double") - F.col("ya"))
            / F.datediff("db", "da"),
            9,
        ).alias("slope"),
    )
    pairs = _persist(pairs)
    s_stat = pairs.groupBy("event_type").agg(
        F.sum("sgn").alias("s"), F.count(F.lit(1)).alias("n_pairs")
    )
    nd = sp.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        sp.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    wm = Window.partitionBy("event_type").orderBy("slope")
    wc = Window.partitionBy("event_type")
    med = (
        pairs.select(
            "event_type",
            "slope",
            F.row_number().over(wm).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("c"),
        )
        .filter(F.col("rn") == F.ceil(F.col("c") / F.lit(2.0)))
        .select("event_type", F.col("slope").alias("slope_med"))
    )
    var_s = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ) / F.lit(18.0)
    zraw = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var_s))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    crit = F.lit(1.959963984540054)
    return (
        s_stat.join(nd, "event_type")
        .join(ties, "event_type")
        .join(med, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("s").cast("long").alias("s_stat"),
            qround(zraw, 9).alias("z_stat"),
            "slope_med",
            F.when(zraw > crit, "increasing")
            .when(zraw < -crit, "decreasing")
            .otherwise("none")
            .alias("trend"),
        )
    )


@register(
    "changepoint_detect",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS dlo, max(day) AS dhi
          FROM daily GROUP BY 1),
    spine AS (
        SELECT event_type,
               CAST(unnest(generate_series(CAST(dlo AS TIMESTAMP),
                                           CAST(dhi AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM b),
    sp AS (
        SELECT s.event_type, s.day, coalesce(d.n, 0) AS y
        FROM spine s LEFT JOIN daily d
          ON s.event_type = d.event_type AND s.day = d.day),
    run AS (
        SELECT event_type, day, y,
               sum(y) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS pre,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                   AS k,
               sum(y) OVER (PARTITION BY event_type) AS tot,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM sp),
    scored AS (
        -- n·CUSUM_k = n·pre_k − k·tot: INTEGER, no mean quotient
        SELECT event_type, day, k, n, tot, pre,
               abs(n * pre - k * tot) AS stat
        FROM run WHERE k < n),
    best AS (
        SELECT event_type, day AS change_day, k, n, tot, pre,
               CAST(stat AS BIGINT) AS cusum_stat
        FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                            ORDER BY stat DESC, day) AS rn
              FROM scored)
        WHERE rn = 1)
    SELECT event_type, change_day,
           CAST(n AS BIGINT) AS n_days, cusum_stat,
           floor(CAST(pre AS DOUBLE) / k * 10000 + 0.5) / 10000
               AS mean_before,
           floor(CAST(tot - pre AS DOUBLE) / (n - k) * 10000 + 0.5) / 10000
               AS mean_after
    FROM best
    """,
)
def q_changepoint_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type over the zero-filled
    daily series — the LEVEL-SHIFT detector beside trend_test's
    monotone-trend test: the candidate split day maximizing
    |CUSUM_k| = |Σ_{i≤k}(y_i − ȳ)|, with the pre/post means. The
    statistic is kept INTEGER end-to-end by scaling out the mean
    quotient (n·CUSUM_k = n·pre_k − k·tot — exact at any magnitude,
    no float drift can flip the argmax), and the argmax is total via
    the (stat DESC, day) ROW_NUMBER order; only the two reported
    means are quotients, qround(4)-quantized.

    Scale: one running-sum window per type over span-bounded frames
    (the daily spine, never corpus rows), one argmax window over the
    same frame — no pair fan-out at all (cheaper than trend_test),
    the plan shape of a per-key prefix sum."""
    e = _t(spark, sf_dir, "events")
    return changepoint_from_daily(
        daily_counts(e).select("event_type", "day", "n")
    )


def changepoint_from_daily(daily: DataFrame) -> DataFrame:
    """The changepoint_detect core over a (event_type, day, n) frame —
    factored for the streamed daily-count sink."""
    b = daily.groupBy("event_type").agg(
        F.min("day").alias("dlo"), F.max("day").alias("dhi")
    )
    spine = b.select(
        "event_type", F.explode(F.sequence("dlo", "dhi")).alias("day")
    )
    sp = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0)).alias("y")
    )
    ws = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("event_type")
    run = sp.select(
        "event_type",
        "day",
        F.sum("y").over(ws).alias("pre"),
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("day")
        ).alias("k"),
        F.sum("y").over(wp).alias("tot"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    scored = run.filter(F.col("k") < F.col("n")).withColumn(
        "stat",
        F.abs(F.col("n") * F.col("pre") - F.col("k") * F.col("tot")),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("stat").desc(), F.col("day")
    )
    best = scored.withColumn("rn", F.row_number().over(wr)).filter(
        F.col("rn") == 1
    )
    return best.select(
        "event_type",
        F.col("day").alias("change_day"),
        F.col("n").cast("long").alias("n_days"),
        F.col("stat").cast("long").alias("cusum_stat"),
        qround(F.col("pre").cast("double") / F.col("k"), 4).alias(
            "mean_before"
        ),
        qround(
            (F.col("tot") - F.col("pre")).cast("double")
            / (F.col("n") - F.col("k")),
            4,
        ).alias("mean_after"),
    )


@register(
    "autocorrelation",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS dlo, max(day) AS dhi
          FROM daily GROUP BY 1),
    spine AS (
        SELECT event_type,
               CAST(unnest(generate_series(CAST(dlo AS TIMESTAMP),
                                           CAST(dhi AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM b),
    sp AS (
        SELECT s.event_type, s.day, coalesce(d.n, 0) AS y
        FROM spine s LEFT JOIN daily d
          ON s.event_type = d.event_type AND s.day = d.day),
    lp AS (
        SELECT a.event_type, t.lag, a.y AS ya, c.y AS yb
        FROM sp a
        CROSS JOIN range(1, 8) t(lag)
        JOIN sp c ON c.event_type = a.event_type
                 AND c.day = a.day + CAST(t.lag AS INTEGER)),
    m AS (
        SELECT event_type, lag,
               count(*) AS np, sum(ya) AS sa, sum(yb) AS sb,
               sum(ya * ya) AS saa, sum(yb * yb) AS sbb,
               sum(ya * yb) AS sab
        FROM lp GROUP BY event_type, lag)
    SELECT event_type, CAST(lag AS BIGINT) AS lag, CAST(np AS BIGINT) AS n,
           CASE WHEN (np * saa - sa * sa) > 0 AND (np * sbb - sb * sb) > 0
                THEN floor((np * sab - sa * sb)
                     / sqrt(CAST(np * saa - sa * sa AS DOUBLE))
                     / sqrt(CAST(np * sbb - sb * sb AS DOUBLE))
                     * 1000000000.0 + 0.5) / 1000000000.0
           END AS acf
    FROM m
    """,
)
def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the zero-filled daily series at lags
    1..7 — the periodicity detector completing the daily-statistics
    family (dow_seasonality asserts a weekly shape; the ACF measures
    it): Pearson r between (y_t, y_{t+lag}) pairs, computed from
    EXACT integer moment sums (counts ≤ 2^20, squares ≤ 2^40, sums
    over ≤ span rows — far inside int64), with exactly two IEEE
    sqrt/divide steps both engines spell identically and one qround.
    NULL when either margin is constant (zero variance — the
    type_correlation convention).

    Scale: the lag pairing is a bounded 7× self-join on the
    span-sized spine (never corpus rows), moments are one map-side-
    combined aggregate per (type, lag) — |types|×7 output rows at any
    input size."""
    e = _t(spark, sf_dir, "events")
    return acf_from_daily(daily_counts(e).select("event_type", "day", "n"))


def acf_from_daily(daily: DataFrame) -> DataFrame:
    """The autocorrelation core over a (event_type, day, n) frame —
    factored for the streamed daily-count sink."""
    b = daily.groupBy("event_type").agg(
        F.min("day").alias("dlo"), F.max("day").alias("dhi")
    )
    spine = b.select(
        "event_type", F.explode(F.sequence("dlo", "dhi")).alias("day")
    )
    sp = _persist(
        spine.join(daily, ["event_type", "day"], "left").select(
            "event_type", "day", F.coalesce("n", F.lit(0)).alias("y")
        )
    )
    a = sp.select(
        "event_type",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag"),
        F.col("day"),
        F.col("y").alias("ya"),
    ).withColumn("day_b", F.date_add("day", F.col("lag").cast("int")))
    c = sp.select(
        "event_type", F.col("day").alias("day_b"), F.col("y").alias("yb")
    )
    lp = a.join(c, ["event_type", "day_b"])
    m = lp.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("ya").alias("sa"),
        F.sum("yb").alias("sb"),
        F.sum(F.col("ya") * F.col("ya")).alias("saa"),
        F.sum(F.col("yb") * F.col("yb")).alias("sbb"),
        F.sum(F.col("ya") * F.col("yb")).alias("sab"),
    )
    va = F.col("np") * F.col("saa") - F.col("sa") * F.col("sa")
    vb = F.col("np") * F.col("sbb") - F.col("sb") * F.col("sb")
    cov = F.col("np") * F.col("sab") - F.col("sa") * F.col("sb")
    return m.select(
        "event_type",
        F.col("lag").cast("long").alias("lag"),
        F.col("np").cast("long").alias("n"),
        F.when(
            (va > 0) & (vb > 0),
            qround(
                cov / F.sqrt(va.cast("double")) / F.sqrt(vb.cast("double")),
                9,
            ),
        ).alias("acf"),
    )
