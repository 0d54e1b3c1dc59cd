"""Event-stream queries (batch form of the streaming operators).

``windowed_agg`` runs identically on a stream (with watermark) and a
batch frame; registering the batch form gives the streaming operator a
DuckDB oracle (time_bucket). Sessionization is the lag-gap-cumsum
pattern — the batch equivalent of ``session_window``.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from carbondata_spark.functions import dround
from carbondata_spark.queries import register, t


@register(
    "q_stream_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    headline=True,
    doc="Tumbling 1-hour event-time window aggregation (batch form of the "
    "streaming windowed_agg; F.window == time_bucket).",
)
def q_stream_window(spark, sf_dir):
    from carbondata_spark.streaming.ingest import windowed_agg

    out = windowed_agg(t(spark, sf_dir, "events"), window="1 hour", group_cols=["event_type"])
    return out.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        dround(F.col("sum_value"), 2).alias("sum_value"),
    )


@register(
    "q_asof_join",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click' AND user_id < 100
    ),
    purchases AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id,
           coalesce(round(epoch(c.ts - p.ts), 1), -1.0) AS since_purchase_s
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    doc="As-of join (custom operator Spark lacks): each click matched to "
    "the user's most recent prior purchase via the union-window pattern; "
    "oracle = DuckDB's native ASOF LEFT JOIN.",
)
def q_asof_join(spark, sf_dir):
    from carbondata_spark.operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    clicks = ev.filter((F.col("event_type") == "click") & (F.col("user_id") < 100)).select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("p_ts")
    )
    from carbondata_spark.functions import epoch_seconds

    joined = asof_join(clicks, purchases, on="ts", by="user_id", value_cols=["p_ts"])
    gap = epoch_seconds(F.col("ts")) - epoch_seconds(F.col("p_ts_asof"))
    return joined.select(
        "event_id",
        "user_id",
        F.coalesce(dround(gap, 1), F.lit(-1.0)).alias("since_purchase_s"),
    )


@register(
    "q_stream_session_window",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE user_id < 200),
    flag AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts - lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flag
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
    doc="Per-session rows via F.session_window (30-min gap; batch form of "
    "the streaming sessionized operator — identical code runs with a "
    "watermark on a stream). Oracle = gaps-and-islands; the > 1800 "
    "boundary matches session_window's inclusive window extension.",
)
def q_stream_session_window(spark, sf_dir):
    from carbondata_spark.streaming.ingest import sessionized

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    out = sessionized(ev, gap="30 minutes", group_cols=["user_id"])
    return out.select(
        "user_id",
        F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        "n_events",
        dround(F.col("sum_value"), 2).alias("sum_value"),
    )


@register(
    "q_sessionize",
    oracle="""
    WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE user_id < 200),
    gaps AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts - lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM gaps GROUP BY user_id
    """,
    headline=True,
    doc="Sessionization: 30-min inactivity gap → session count per user "
    "(lag + flag-sum; batch equivalent of session_window).",
)
def q_sessionize(spark, sf_dir):
    from carbondata_spark.functions import epoch_seconds

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = epoch_seconds(F.col("ts")) - F.lag(epoch_seconds(F.col("ts"))).over(w)
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "q_funnel",
    oracle="""
    WITH m AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t1,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CASE
               WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
                    AND t2 IS NOT NULL AND t2 > t1 THEN 3
               WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0 THEN 2
               WHEN t0 IS NOT NULL THEN 1
               ELSE 0 END AS stage
      FROM m
    )
    SELECT CAST(stage AS INT) AS stage, count(*) AS n_users
    FROM s GROUP BY stage
    """,
    doc="Ordered funnel view->click->purchase (operators/funnel.py): per "
    "user the furthest step whose FIRST occurrence strictly follows the "
    "previous step's first occurrence, then users per stage. One "
    "map-side-combining min() aggregate keyed on user — no self-joins, "
    "no windows (green-field; the reference's query layer has no "
    "event-sequence surface, SURVEY §2.4).",
)
def q_funnel(spark, sf_dir):
    from carbondata_spark.operators.funnel import funnel_stages

    stages = funnel_stages(t(spark, sf_dir, "events"), ["view", "click", "purchase"])
    return stages.groupBy("stage").agg(F.count("*").alias("n_users"))


@register(
    "q_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             CAST(floor(date_diff('day', f.first_day, CAST(e.ts AS DATE)) / 7) AS INT) AS week_n,
             CAST(date_trunc('week', f.first_day) AS DATE) AS cohort_week
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           week_n,
           count(*) AS n_active
    FROM activity
    GROUP BY cohort_week, week_n
    """,
    doc="Retention cohort matrix: users bucketed by first-seen week "
    "(cohort), counted as active in each subsequent week-offset. Two "
    "user-keyed aggregates + one user-keyed join — first-seen is a "
    "map-side-combining min(), the join shuffles on the naturally "
    "high-cardinality user key, and the final rollup is tiny. The "
    "standard product-analytics companion to q_funnel.",
)
def q_retention_cohorts(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            F.floor(F.datediff(F.col("day"), F.col("first_day")) / 7)
            .cast("int")
            .alias("week_n"),
            F.date_format(F.date_trunc("week", F.col("first_day")), "yyyy-MM-dd").alias(
                "cohort_week"
            ),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_n").agg(F.count("*").alias("n_active"))


@register(
    "q_event_attribution",
    oracle="""
    WITH c AS (SELECT user_id, ts AS click_ts, event_id AS click_id
               FROM events WHERE event_type = 'click' AND user_id < 100),
    p AS (SELECT user_id AS p_user_id, ts AS purchase_ts,
                 event_id AS purchase_id, value AS purchase_value
          FROM events WHERE event_type = 'purchase')
    SELECT user_id, click_id, purchase_id,
           round(purchase_value, 2) AS purchase_value
    FROM c JOIN p
      ON user_id = p_user_id
     AND purchase_ts >= click_ts
     AND purchase_ts <= click_ts + INTERVAL 1 HOUR
    """,
    doc="Attribution interval join (streaming/ingest.py:attribution_join, "
    "batch form — identical code runs stream-stream with watermarks on "
    "both sides and a bounded join condition, so state evicts): every "
    "purchase matched to same-user clicks in the preceding hour. Shuffle "
    "keys on the user; no time-bucketing blowup because the equi-key "
    "carries the join and the interval is a residual predicate.",
)
def q_event_attribution(spark, sf_dir):
    from carbondata_spark.streaming.ingest import attribution_join

    ev = t(spark, sf_dir, "events")
    clicks = ev.filter((F.col("event_type") == "click") & (F.col("user_id") < 100))
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = attribution_join(clicks, purchases, horizon="1 hour")
    return out.select(
        "user_id",
        "click_id",
        "purchase_id",
        dround(F.col("purchase_value"), 2).alias("purchase_value"),
    )
