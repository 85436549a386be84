"""Temporal-join + event-analytics suite (round 7): the as-of join
and interval range join over the events stream — the two classic
time-series joins Spark has no native operator for, implemented in
operators/temporal.py as shuffle-native compositions and attested
here against DuckDB's own native ``ASOF JOIN`` and a plain
inequality join (two INDEPENDENT formulations of the same semantics
— the strongest oracle pairing in the registry: the Spark side never
expresses a join for asof at all, yet must match DuckDB's dedicated
operator row-for-row) — plus the analytics built on them: the
conversion funnel (chained forward as-of joins), cohort retention,
and the per-user event-type pivot."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinvar_pipeline_spark.operators.temporal import asof_join, range_join
from clinvar_pipeline_spark.queries import DEC4, _t, register

# attribution window for the range join and each funnel step:
# purchases within 24h of a click. Bucket = window span -> each click
# probes exactly 2 buckets.
CONVERSION_WINDOW_US = 86_400_000_000


@register(
    "asof_attribution",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT event_id AS view_event_id, user_id, ts FROM events
          WHERE event_type = 'view')
    SELECT p.event_id, p.user_id, p.ts, v.view_event_id,
           v.ts AS ts_asof,
           round((epoch_us(p.ts) - epoch_us(v.ts)) / 1000000.0, 6)
             AS lag_s
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase joined as-of to the most
    recent prior (or simultaneous) 'view' by the same user — the
    canonical as-of join (pandas merge_asof / kdb+ aj), NULL when the
    user never viewed before buying. The oracle is DuckDB's NATIVE
    ``ASOF LEFT JOIN`` — a dedicated engine operator the Spark side
    must reproduce with no join in its plan at all.

    Scale: operators/temporal.asof_join unions the two streams and
    carry-forwards the view columns in one user-keyed window pass —
    a single shuffle on user_id, cost independent of how many
    purchases share one view (where a join would fan out)."""
    ev = _t(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id")
    )
    out = asof_join(purch, views, on="ts", by=["user_id"])
    lag = (
        F.unix_micros(F.col("ts").cast("timestamp_ltz"))
        - F.unix_micros(F.col("ts_asof").cast("timestamp_ltz"))
    ) / 1000000.0
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "view_event_id",
        "ts_asof",
        F.round(lag, 6).alias("lag_s"),
    )


@register(
    "range_join_conversions",
    f"""
    WITH c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
    p AS (SELECT user_id, ts, value FROM events
          WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id,
           CAST(count(p.ts) AS BIGINT) AS n_conversions,
           round(CAST(coalesce(sum(CAST(p.value AS DECIMAL(18,4))), 0)
                      AS DOUBLE), 4) AS conversion_value
    FROM c LEFT JOIN p ON c.user_id = p.user_id
       AND epoch_us(p.ts) - epoch_us(c.ts) > 0
       AND epoch_us(p.ts) - epoch_us(c.ts) <= {CONVERSION_WINDOW_US}
    GROUP BY c.event_id, c.user_id
    """,
)
def q_range_join_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion attribution by interval join: for each click, the
    count and value of same-user purchases inside the following 24 h
    window — every click emitted, zero-filled when nothing converts.

    Scale: the oracle states the semantics as a naive inequality
    join (which Spark would execute as a nested loop — the trap);
    operators/temporal.range_join instead buckets purchase times at
    the window span so candidates come from an EQUI join on
    (user_id, bucket) with each click probing exactly 2 buckets, and
    the exact microsecond interval filters candidates. The final
    zero-fill is a left join from the click spine onto the aggregated
    matches (purchase side aggregated BEFORE the fill, so the spine
    join is 1:1)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    pairs = range_join(
        clicks,
        purch,
        on="ts",
        by=["user_id"],
        lower_us=0,
        upper_us=CONVERSION_WINDOW_US,
    )
    agg = pairs.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.sum(F.col("value").cast(DEC4)).alias("_sum"),
    )
    return (
        clicks.select("event_id", "user_id")
        .join(agg, ["event_id", "user_id"], "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("n_conversions"), F.lit(0))
            .cast("long")
            .alias("n_conversions"),
            F.round(
                F.coalesce(F.col("_sum"), F.lit(0).cast(DEC4)).cast("double"),
                4,
            ).alias("conversion_value"),
        )
    )


@register(
    "event_funnel",
    f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (SELECT user_id, min(ts) AS view_ts FROM events
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS click_ts
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts >= v.view_ts
            AND epoch_us(e.ts) - epoch_us(v.view_ts)
                <= {CONVERSION_WINDOW_US}
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
            AND epoch_us(e.ts) - epoch_us(c.click_ts)
                <= {CONVERSION_WINDOW_US}
          GROUP BY e.user_id)
    SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts,
           CASE WHEN p.purchase_ts IS NOT NULL THEN 3
                WHEN c.click_ts IS NOT NULL THEN 2
                WHEN v.view_ts IS NOT NULL THEN 1
                ELSE 0 END AS funnel_stage
    FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
           LEFT JOIN p USING (user_id)
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel (view -> click -> purchase, each step within
    24 h of the previous): per user, the first view, the nearest
    click at-or-after it inside the step window, the nearest purchase
    at-or-after THAT click inside its window, and the deepest stage
    reached — the funnel report an event-analytics engine computes in
    one pass.

    The funnel IS two chained forward as-of joins with tolerance
    (operators/temporal.asof_join): step N's frame — one row per
    still-converting user — is the left side of step N+1, so the
    whole funnel costs one groupBy (first view) plus one
    union+window shuffle per step, each over the per-user frame plus
    that step's event slice; no inequality joins, no fan-out (each
    left row carries at most one match forward). The oracle states
    the same semantics as correlated min() subqueries. Users who
    never reach a step stay on the spine via the final left joins
    (the range_join_conversions zero-fill discipline)."""
    ev = _t(spark, sf_dir, "events")
    chain = funnel_chain(ev)
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    # chain only converted rows: a null click ts must not enter the
    # next asof's ordering (and the spine restores the non-converted)
    step2c = chain.filter(F.col("click_ts").isNotNull()).select(
        "user_id", F.col("click_ts").alias("ts")
    )
    step3 = asof_join(
        step2c,
        purch,
        on="ts",
        by=["user_id"],
        direction="forward",
        tolerance_us=CONVERSION_WINDOW_US,
    )
    return (
        chain.join(
            step3.select(
                "user_id", F.col("ts_asof").alias("purchase_ts")
            ),
            "user_id",
            "left",
        )
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            F.when(F.col("purchase_ts").isNotNull(), 3)
            .when(F.col("click_ts").isNotNull(), 2)
            .when(F.col("view_ts").isNotNull(), 1)
            .otherwise(0)
            .alias("funnel_stage"),
        )
    )


def funnel_chain(ev: DataFrame) -> DataFrame:
    """The funnel's frozen view->click history: ONE row per user —
    (user_id, view_ts, click_ts), click_ts null where the user never
    clicked inside the step window. This is q_event_funnel's spine
    through stage 2, factored out so the streamed purchase tier
    (streaming/temporal.funnel_stream) serves against exactly the
    frame the batch query chains from: each arriving purchase's
    attribution is (chain equi-join + window filter), row-independent
    given the frozen chain — the asof_stream argument verbatim."""
    users = ev.select("user_id").distinct()
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    step2 = asof_join(
        v,
        clicks,
        on="ts",
        by=["user_id"],
        direction="forward",
        tolerance_us=CONVERSION_WINDOW_US,
    )
    return users.join(
        step2.select(
            "user_id",
            F.col("ts").alias("view_ts"),
            F.col("ts_asof").alias("click_ts"),
        ),
        "user_id",
        "left",
    )


@register(
    "cohort_retention",
    """
    WITH p AS (SELECT user_id, ts FROM events
               WHERE event_type = 'purchase'),
    first AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
              FROM p GROUP BY user_id),
    act AS (SELECT DISTINCT p.user_id, f.cohort_day,
                   CAST(datediff('day', f.cohort_day, CAST(p.ts AS DATE))
                        AS BIGINT) AS day_offset
            FROM p JOIN first f USING (user_id))
    SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_active
    FROM act GROUP BY cohort_day, day_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention over purchase activity: users cohort by their
    FIRST purchase day; each later purchase day marks them active at
    that day offset, and the (cohort_day, day_offset) cell counts
    distinct active users — the retention matrix behind every
    product-analytics curve (purchase-based so the synthetic corpus
    actually decays; all-event cohorts saturate at 100%).

    Scale: one user-keyed groupBy for the cohort frame, one
    (user, day)-distinct + (cohort, offset) groupBy for the matrix —
    the cohort frame joins back user-keyed (same partitioning as the
    purchase slice), and the matrix is cohorts x horizon cells, tiny
    at any corpus size."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    first = p.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    act = (
        p.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )


@register(
    "event_type_pivot",
    """
    SELECT user_id,
           CAST(count(*) FILTER (event_type = 'view') AS BIGINT)
             AS n_view,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT)
             AS n_click,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
             AS n_purchase,
           CAST(count(*) FILTER (event_type = 'signup') AS BIGINT)
             AS n_signup,
           CAST(count(*) FILTER (event_type = 'error') AS BIGINT)
             AS n_error,
           round(CAST(coalesce(sum(CAST(value AS DECIMAL(18,4)))
                               FILTER (event_type = 'purchase'), 0)
                      AS DOUBLE), 4) AS purchase_value
    FROM events GROUP BY user_id
    """,
)
def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type pivot: one row per user, one count column
    per event type plus the purchase-value total — the wide activity
    profile feeding churn/LTV features.

    Expressed as CONDITIONAL AGGREGATION rather than the pivot() API
    on purpose: with a declared value list Spark's pivot compiles to
    exactly this conditional-agg plan, and writing it explicitly
    keeps the output column set static (schema-stable under data
    drift — an unseen event type can't silently add a column) and
    the oracle identical. One map-side-combined shuffle on user_id;
    decimal-sum discipline on the value total."""
    ev = _t(spark, sf_dir, "events")

    def cnt(t: str):
        return F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")

    return ev.groupBy("user_id").agg(
        cnt("view"),
        cnt("click"),
        cnt("purchase"),
        cnt("signup"),
        cnt("error"),
        F.round(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.col("value").cast(DEC4),
                    )
                ),
                F.lit(0).cast(DEC4),
            ).cast("double"),
            4,
        ).alias("purchase_value"),
    )


@register(
    "json_props_stats",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           round(CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                      AS DOUBLE) / count(*), 4) AS avg_k,
           CAST(count(*) FILTER (json_extract(props, '$.k') IS NULL)
                AS BIGINT) AS n_missing
    FROM events GROUP BY event_type
    """,
)
def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: the events table's ``props`` JSON
    string parsed per row (``get_json_object`` — the engine's
    schema-on-read path for ragged payloads, no pre-declared struct)
    and aggregated per event type, with the missing-key count
    surfaced (silent-null extraction is the classic JSON-pipeline
    bug; the n_missing column makes it an observable).

    Scale: extraction is a per-row JVM expression inside the scan —
    no UDF, no second pass — feeding one map-side-combined groupBy
    over |event_types| groups. For a FIXED schema the production
    upgrade is from_json with an explicit struct (pushes the parse
    into one tokenizer pass and nulls malformed rows observably);
    get_json_object is the right call exactly when keys vary by
    row."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.round(F.sum(k).cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_k"
        ),
        F.count(F.when(k.isNull(), 1)).alias("n_missing"),
    )


@register(
    "event_cube",
    """
    SELECT event_type, dayname(ts) AS dow,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
             AS total_value
    FROM events GROUP BY CUBE (event_type, dayname(ts))
    """,
)
def q_event_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day-of-week): all four grouping sets —
    the full matrix, each margin, and the grand total — in one pass,
    completing the grouping-set family next to tumbling_rollup's
    ROLLUP (a hierarchy keeps only prefix sets; a cube report wants
    every margin).

    Scale: like rollup, partial aggregation applies at every grouping
    set — one shuffle keyed by (grouping-set id, keys), output
    cardinality = product of (distinct+1) per dimension, tiny for
    categorical dimensions at any row count."""
    ev = _t(spark, sf_dir, "events")
    return ev.cube(
        "event_type", F.date_format(F.col("ts"), "EEEE").alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast(DEC4)).cast("double"), 4).alias(
            "total_value"
        ),
    )


@register(
    "multitouch_attribution",
    f"""
    WITH p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT event_id AS view_id, user_id, ts FROM events
          WHERE event_type = 'view'),
    pairs AS (
        SELECT p.event_id, p.user_id, v.view_id, v.ts AS v_ts,
               row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY epoch_us(v.ts), v.view_id) AS rn_first,
               row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY epoch_us(v.ts) DESC, v.view_id DESC) AS rn_last
        FROM p JOIN v ON p.user_id = v.user_id
           AND epoch_us(p.ts) - epoch_us(v.ts) > 0
           AND epoch_us(p.ts) - epoch_us(v.ts) <= {CONVERSION_WINDOW_US}),
    agg AS (
        SELECT event_id,
               count(*) AS n_touches,
               min(CASE WHEN rn_first = 1 THEN view_id END) AS first_view_id,
               min(CASE WHEN rn_last = 1 THEN view_id END) AS last_view_id
        FROM pairs GROUP BY event_id)
    SELECT p.event_id, p.user_id,
           round(CAST(CAST(p.value AS DECIMAL(18,4)) AS DOUBLE), 4)
             AS purchase_value,
           CAST(coalesce(a.n_touches, 0) AS BIGINT) AS n_touches,
           a.first_view_id, a.last_view_id,
           CASE WHEN a.n_touches IS NOT NULL THEN
               floor(1.0 / a.n_touches * 1000000 + 0.5) / 1000000
           END AS linear_credit
    FROM p LEFT JOIN agg a USING (event_id)
    """,
)
def q_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution: for each purchase, EVERY same-user
    view inside the preceding 24 h — first-touch and last-touch
    picks plus the linear model's per-touch credit (1/n). Completes
    the attribution family: asof_attribution is last-touch only (one
    carry, no fan-out); this is the model that needs the actual touch
    set, so it rides the bucketed range_join (operators/temporal.py)
    — never an inequality nested loop.

    Determinism: first/last are (ts, view_id)-total picks — min/max
    over a struct in Spark, ROW_NUMBER with the same two-key order in
    the oracle — so duplicate view timestamps cannot flip the pick
    (the asof tiebreak_col discipline). Zero-touch purchases are kept
    by the spine LEFT join (n_touches = 0, NULL picks/credit), the
    range_join_conversions zero-fill shape; the purchase side
    aggregates BEFORE the fill so the spine join is 1:1.

    Scale: pair volume is true touch density with each purchase
    probing 2 buckets; the aggregate is one purchase-keyed groupBy
    (first/last/count in a single pass over the pairs)."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", "ts"
    )
    pairs = range_join(
        p.select("event_id", "user_id", "ts"),
        v,
        on="ts",
        by=["user_id"],
        # range_join's interval is OPEN at lower; timestamps are
        # integer micros, so (-W-1, 0] == [-W, 0] — the exact-boundary
        # view at p.ts - W stays in, matching the oracle's diff <= W
        lower_us=-CONVERSION_WINDOW_US - 1,
        upper_us=0,
    ).filter(F.col("ts_r") < F.col("ts"))  # strictly prior views
    okey = F.struct(F.col("ts_r"), F.col("view_id"))
    agg = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.min_by("view_id", okey).alias("first_view_id"),
        F.max_by("view_id", okey).alias("last_view_id"),
    )
    credit = F.floor(
        F.lit(1.0) / F.col("n_touches") * F.lit(1e6) + F.lit(0.5)
    ) / F.lit(1e6)
    return p.join(agg, "event_id", "left").select(
        "event_id",
        "user_id",
        F.round(F.col("value").cast(DEC4).cast("double"), 4).alias(
            "purchase_value"
        ),
        F.coalesce(F.col("n_touches"), F.lit(0)).alias("n_touches"),
        "first_view_id",
        "last_view_id",
        F.when(F.col("n_touches").isNotNull(), credit).alias("linear_credit"),
    )
