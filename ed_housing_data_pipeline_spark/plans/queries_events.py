"""Event-time analytics queries (SURVEY.md §2.9) with DuckDB oracles.

The events table stores ``ts`` as INT64 TIMESTAMP(NANOS); the Spark
side reads it as bigint ns (nanosAsLong) and truncates to a µs
timestamp (sources/tables.events_with_ts) — exactly the truncation
DuckDB applies reading TIMESTAMP_NS, so both engines see identical
µs instants. Buckets are exported as epoch seconds (bigint) so no raw
timestamp ever reaches the comparator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ed_housing_data_pipeline_spark.operators import events as ev_ops
from ed_housing_data_pipeline_spark.plans._base import events_ts
from ed_housing_data_pipeline_spark.plans.registry import register


@register(
    "events_hourly_by_type",
    oracle="""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_s,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling hourly buckets × event type — batch twin of a streaming
    windowed agg; plain groupBy, map-side partial agg."""
    ev = events_ts(spark, sf_dir)
    out = ev_ops.tumbling_agg(
        ev,
        ts_col="ts",
        unit="hour",
        keys=["event_type"],
        aggs={
            "n_events": F.count(F.lit(1)),
            "total_value": F.round(F.sum("value"), 4),
        },
    )
    return out.select(
        F.unix_seconds(F.col("bucket")).alias("bucket_s"),
        "event_type",
        "n_events",
        "total_value",
    )


@register(
    "events_daily_active_users",
    oracle="""
    SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS bucket_s,
           COUNT(DISTINCT user_id) AS active_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1
    """,
)
def q_events_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users — distinct-agg inside time buckets."""
    ev = events_ts(spark, sf_dir)
    out = ev_ops.tumbling_agg(
        ev,
        ts_col="ts",
        unit="day",
        keys=[],
        aggs={
            "active_users": F.countDistinct("user_id"),
            "n_events": F.count(F.lit(1)),
        },
    )
    return out.select(
        F.unix_seconds(F.col("bucket")).alias("bucket_s"),
        "active_users",
        "n_events",
    )


@register(
    "events_json_by_type",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           -- json_valid guard: see coerce_json_field
           ROUND(AVG(TRY_CAST(CASE WHEN json_valid(props)
                    THEN json_extract_string(props, '$.k') END AS DOUBLE)), 4)
               AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def q_events_json_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-prop extraction (native get_json_object, no UDF) feeding a
    grouped agg — the §2.5 extension the events feed motivates."""
    ev = events_ts(spark, sf_dir)
    ev = ev_ops.with_json_field(ev, "props", "k", out="k_val")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg(F.col("k_val").try_cast("double")), 4).alias("avg_k"),
    )


# µs-integer gap/span arithmetic on both sides (date_diff here,
# unix_micros in Spark) — exact, no double-epoch rounding drift.
SESSION_ORACLE = """
WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800 * 1000000
                THEN 1 ELSE 0 END AS new_s
    FROM events
    -- event-time quarantine: a NULL-ts event cannot be placed in a
    -- session (and the engines disagree on NULL ordering in windows)
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sessions AS (
    SELECT *, CAST(SUM(new_s) OVER (
        PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       ROUND(date_diff('microsecond', MIN(ts), MAX(ts)) / 1000000.0, 3) AS span_sec,
       ROUND(SUM(value), 4) AS total_value
FROM sessions
GROUP BY user_id, session_id
"""


@register("events_sessionize_stats", oracle=SESSION_ORACLE)
def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) + per-session stats — the
    lag→flag→cumsum formulation; one shuffle on user_id, then
    partition-local window scans."""
    ev = events_ts(spark, sf_dir).filter(F.col("ts").isNotNull())
    s = ev_ops.session_stats(ev, ts_col="ts", user_col="user_id", gap_minutes=30)
    return s.select(
        "user_id",
        "session_id",
        "n_events",
        F.round(F.col("span_sec"), 3).alias("span_sec"),
        F.round(F.col("total_value"), 4).alias("total_value"),
    )


@register(
    "events_sliding_counts",
    oracle="""
    WITH grid AS (
        SELECT e.ts, e.value,
               time_bucket(INTERVAL 30 MINUTES, e.ts) - (o.o * INTERVAL 30 MINUTES)
                   AS ws
        FROM events e, (SELECT UNNEST([0, 1]) AS o) o
        -- Spark's window() assigns no window to NULL event time
        WHERE e.ts IS NOT NULL
    )
    SELECT CAST(epoch(ws) AS BIGINT) AS window_start_s,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM grid
    GROUP BY 1
    """,
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30m windows (each event in 2 windows) — Spark's
    ``window()`` with slide; the oracle reproduces the epoch-aligned
    window grid with an explicit 2-offset expansion."""
    ev = events_ts(spark, sf_dir)
    out = ev_ops.sliding_window_agg(
        ev,
        ts_col="ts",
        duration="1 hour",
        slide="30 minutes",
        keys=[],
        aggs={
            "n_events": F.count(F.lit(1)),
            "total_value": F.round(F.sum("value"), 4),
        },
    )
    return out.select(
        F.unix_seconds(F.col("window_start")).alias("window_start_s"),
        "n_events",
        "total_value",
    )


@register(
    "events_rollup_day_type",
    oracle="""
    SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_s,
           event_type,
           CAST(GROUPING(CAST(epoch(date_trunc('day', ts)) AS BIGINT),
                         event_type) AS BIGINT) AS gid,
           COUNT(*) AS n_events
    FROM events
    GROUP BY ROLLUP(1, 2)
    """,
)
def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (day, event_type): per-type, per-day subtotal, and
    grand total — grouping-sets engine surface (§2.4 extension).
    ``gid`` disambiguates rollup NULLs from data NULLs.

    Formulated as groupingSets(non-empty sets) ∪ ungrouped grand
    total, NOT ``df.rollup``: Spark's rollup/cube return ZERO rows on
    empty input while ANSI engines (the DuckDB oracle, Postgres,
    Trino) emit the grand-total row — the ungrouped aggregate restores
    the standard semantics at every input size (found by the
    empty-input differential sweep). Same single-scan shape; the grand
    aggregate's partials collapse to one row."""
    ev = events_ts(spark, sf_dir)
    d = ev.withColumn("day_s", F.unix_seconds(F.date_trunc("day", F.col("ts"))))
    sets = (
        d.groupingSets([["day_s", "event_type"], ["day_s"]], "day_s", "event_type")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("day_s", "event_type", "gid", "n_events")
    )
    grand = d.agg(F.count(F.lit(1)).alias("n_events")).select(
        F.lit(None).cast("bigint").alias("day_s"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(3).cast("bigint").alias("gid"),
        "n_events",
    )
    return sets.unionByName(grand)


ASOF_ORACLE = """
WITH views_d AS (
    SELECT user_id, ts, value, event_id
    FROM events
    WHERE event_type = 'view'
    QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id ASC) = 1
), purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id,
       p.user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
       ROUND(v.value, 4) AS last_view_value
FROM purchases p
ASOF LEFT JOIN views_d v
    ON p.user_id = v.user_id AND p.ts >= v.ts
"""


@register("events_asof_last_view", oracle=ASOF_ORACLE)
def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase picks up the value of the
    user's most recent view at-or-before it (DuckDB native ASOF JOIN as
    oracle). Spark side is operators.joins.asof_join — union + one
    shuffle on user_id + partition-local last_value window; right-side
    ties pre-deduped so both engines pick the same row."""
    from ed_housing_data_pipeline_spark.operators.joins import (
        asof_join,
        dedup_one_per_key,
    )

    ev = events_ts(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = dedup_one_per_key(
        ev.filter(F.col("event_type") == "view").select(
            "user_id", F.col("ts").alias("vts"), "value", "event_id"
        ),
        keys=["user_id", "vts"],
        order_by=[F.col("event_id").asc()],
    ).select("user_id", "vts", "value")
    out = asof_join(
        purchases, views, on="user_id", ts_left="ts", ts_right="vts",
        value_cols=["value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.round(F.col("value"), 4).alias("last_view_value"),
    )


@register(
    "events_props_struct",
    oracle="""
    WITH parsed AS (
        SELECT event_type,
               CASE WHEN props IS NOT NULL AND json_valid(props)
                    THEN TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)
               END AS k_val
        FROM events
    )
    SELECT event_type,
           COUNT(k_val) AS n_with_k,
           ROUND(MAX(k_val), 4) AS max_k
    FROM parsed
    GROUP BY event_type
    """,
)
def q_events_props_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parsing: ``from_json`` into a typed struct (vs
    get_json_object's per-path extraction) feeding a grouped agg.

    Parity detail: the struct field is STRING + try_cast, not DOUBLE —
    ``from_json(.., "k double")`` nulls a string-encoded number like
    ``{"k": "7.5"}`` that the oracle's TRY_CAST accepts; extracting the
    raw string then casting makes both engines agree for numeric,
    string-encoded, non-numeric, and malformed payloads alike (the
    oracle's json_valid guard mirrors PERMISSIVE's null-on-malformed).
    """
    ev = events_ts(spark, sf_dir)
    parsed = ev.withColumn(
        "p", F.from_json(F.col("props"), "k string", {"mode": "PERMISSIVE"})
    ).withColumn("k_val", F.col("p.k").try_cast("double"))
    return parsed.groupBy("event_type").agg(
        F.count(F.col("k_val")).alias("n_with_k"),
        F.round(F.max(F.col("k_val")), 4).alias("max_k"),
    )


@register(
    "events_funnel_signup_purchase",
    oracle="""
    WITH first_signup AS (
        SELECT user_id, MIN(ts) AS signup_ts
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), conv AS (
        SELECT s.user_id,
               MIN(e.ts) AS first_purchase_ts
        FROM first_signup s
        JOIN events e
          ON e.user_id = s.user_id
         AND e.event_type = 'purchase'
         AND e.ts >= s.signup_ts
         AND e.ts <= s.signup_ts + INTERVAL 7 DAY
        GROUP BY s.user_id
    )
    SELECT (SELECT COUNT(*) FROM first_signup) AS n_signup_users,
           (SELECT COUNT(*) FROM conv) AS n_converted_7d
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel: users converting signup → purchase within 7
    days. One agg per step + an equi-join on user_id (range predicate
    rides along as a join filter, never a cartesian)."""
    ev = events_ts(spark, sf_dir)
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    conv = (
        signup.join(purchases, on="user_id")
        .filter(
            (F.col("pts") >= F.col("signup_ts"))
            & (F.col("pts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS"))
        )
        .select("user_id")
        .distinct()
    )
    return signup.agg(F.count(F.lit(1)).alias("n_signup_users")).crossJoin(
        conv.agg(F.count(F.lit(1)).alias("n_converted_7d"))
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH first_day AS (
        SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id,
               f.cohort_day,
               date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset
        FROM events e JOIN first_day f ON f.user_id = e.user_id
    )
    SELECT CAST(epoch(cohort_day) AS BIGINT) AS cohort_day_s,
           CAST(day_offset AS BIGINT) AS day_offset,
           COUNT(*) AS n_users
    FROM activity
    GROUP BY 1, 2
    """,
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort triangle: users grouped by first-seen day,
    counted per day-offset of later activity. Two shuffles on user_id
    (cohort agg + join) then one on the cohort key."""
    ev = events_ts(spark, sf_dir).withColumn("day", F.date_trunc("day", F.col("ts")))
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(first_day, on="user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    ).select(
        F.unix_seconds(F.col("cohort_day")).alias("cohort_day_s"),
        F.col("day_offset").cast("bigint").alias("day_offset"),
        "n_users",
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH h AS (
        SELECT event_type,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_s,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT event_type, bucket_s, n_events,
               COUNT(n_events) OVER tw AS cnt,
               CAST(SUM(n_events) OVER tw AS DOUBLE) AS s,
               CAST(SUM(n_events * n_events) OVER tw AS DOUBLE) AS ss
        FROM h
        WINDOW tw AS (PARTITION BY event_type ORDER BY bucket_s
                      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, bucket_s, n_events,
           ROUND(CASE WHEN cnt >= 12
                       AND (ss - s * s / cnt) / (cnt - 1) > 0
                      THEN (n_events - s / cnt)
                           / sqrt((ss - s * s / cnt) / (cnt - 1))
                 END, 4) AS z
    FROM w
    """,
)
def q_events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly score: each (type, hour) bucket's count
    z-scored against its own TRAILING 24 buckets (current excluded) —
    the monitoring primitive for traffic spikes/drops. NULL until 12
    trailing buckets exist or when the trailing variance is zero.

    Exactness across engines: the variance comes from integer moment
    sums — (Σx², Σx exact in 64-bit, cast to double before any
    division) — NOT stddev_samp, whose streaming implementations
    differ at the last ulp between engines and would flap the rounded
    hash. Scale shape: one groupBy + one partitioned window; the frame
    is 24 rows per partition regardless of data volume."""
    from pyspark.sql import Window

    ev = events_ts(spark, sf_dir)
    h = (
        ev.groupBy(
            "event_type",
            F.unix_seconds(F.date_trunc("hour", F.col("ts"))).alias("bucket_s"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    tw = (
        Window.partitionBy("event_type")
        .orderBy("bucket_s")
        .rowsBetween(-24, -1)
    )
    cnt = F.count("n_events").over(tw)
    s = F.sum("n_events").over(tw).cast("double")
    ss = F.sum(F.col("n_events") * F.col("n_events")).over(tw).cast("double")
    var = (ss - s * s / cnt) / (cnt - 1)
    z = F.when(
        (cnt >= 12) & (var > 0),
        (F.col("n_events") - s / cnt) / F.sqrt(var),
    )
    return h.select(
        "event_type", "bucket_s", "n_events", F.round(z, 4).alias("z")
    )


# --------------------------- cross-engine HLL cardinality sketch
def _hll_daily_oracle() -> str:
    from ed_housing_data_pipeline_spark.functions import sketches as sk
    from ed_housing_data_pipeline_spark.plans._base import hash60_sql

    chain = sk.hll_sql("bucket_s", "hv", "src")
    return f"""
WITH src AS (
    SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS bucket_s,
           user_id,
           {hash60_sql("CAST(user_id AS VARCHAR)")} AS hv
    FROM events WHERE user_id IS NOT NULL
),{chain}
SELECT h.grp AS bucket_s,
       ROUND(h.hll_est, 4) AS hll_users,
       x.exact_users
FROM hll h
JOIN (SELECT bucket_s, COUNT(DISTINCT user_id) AS exact_users
      FROM src GROUP BY 1) x
  ON h.grp = x.bucket_s
"""


@register("events_hll_daily_users", oracle=_hll_daily_oracle())
def q_events_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users twice over: a cross-engine-DETERMINISTIC
    HyperLogLog estimate (functions/sketches.py — md5-prefix hash60
    registers, exact integer indicator algebra, Flajolet alpha +
    linear-counting correction) next to the exact distinct count. The
    DuckDB twin recomputes the identical register algebra in SQL, so
    the sketch itself is hash-checked, not just bounded; accuracy vs
    exact is pinned separately (tests/test_sketches.py, <15% on every
    bucket). At 100 TB the register table (group × 256 rows) is the
    shuffle payload — the exact COUNT(DISTINCT) pays a full
    (group, user) shuffle instead, which is exactly what the sketch
    exists to avoid; both run here so the trade is visible."""
    from ed_housing_data_pipeline_spark.functions import sketches as sk
    from ed_housing_data_pipeline_spark.functions.text import hash60

    # ONE distinct-(day, user) pass feeds BOTH sides (r15 opt): the
    # exact count is a plain count over the deduped pairs (the old
    # countDistinct expansion re-scanned and re-shuffled the raw
    # events), the HLL registers are unchanged by dedup (reg/rho are
    # functions of the user hash, and max(rho) over duplicates ≡ over
    # distinct users), and the md5-based hash60 now runs once per
    # distinct (day, user) instead of once per event. The two
    # consumers share the distinct's exchange (AQE runtime stage reuse
    # over identical subtrees).
    d = (
        events_ts(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select(
            F.unix_seconds(F.date_trunc("day", F.col("ts"))).alias("bucket_s"),
            "user_id",
        )
        .distinct()
        .withColumn("h", hash60(F.col("user_id").cast("string")))
    )
    regs = (
        d.select(
            "bucket_s",
            sk.hll_register(F.col("h")).alias("reg"),
            sk.hll_rho(F.col("h")).alias("rho"),
        )
        .groupBy("bucket_s", "reg")
        .agg(F.max("rho").alias("mr"))
    )
    stats = regs.groupBy("bucket_s").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(sk.hll_indicator_term(F.col("mr"))).alias("sum_scaled"),
    )
    exact = d.groupBy("bucket_s").agg(
        F.count(F.lit(1)).alias("exact_users")
    )
    return stats.join(exact, "bucket_s").select(
        "bucket_s",
        F.round(
            sk.hll_estimate(F.col("n_present"), F.col("sum_scaled")), 4
        ).alias("hll_users"),
        "exact_users",
    )
