"""Time-window aggregations over the events table, in batch.

These are the batch twins of the Structured Streaming pipelines in
``mapreduce_4_spark.streaming`` — identical logic, DuckDB-oracle-checkable
here, re-run under ``readStream`` + watermark there (SURVEY.md §7.2 step 4:
batch first, then the same logic as a stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.money import dsum, sql_dsum
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table


@register(
    "events_tumbling_1h",
    oracle=f"""
        SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
               time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) + INTERVAL '1 hour' AS window_end,
               event_type,
               COUNT(*) AS n_events,
               {sql_dsum('value')} AS sum_value
        FROM events
        GROUP BY window_start, window_end, event_type
    """,
    tags=("events", "time-window"),
    description="tumbling 1-hour windows by event type (batch twin of the stream)",
)
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_sliding_30m",
    oracle=f"""
        WITH offsets AS (SELECT unnest([0, 30]) AS off_min),
        bucketed AS (
            SELECT time_bucket(INTERVAL '1 hour',
                               CAST(ts AS TIMESTAMP) - to_minutes(off_min))
                   + to_minutes(off_min) AS window_start,
                   value
            FROM events, offsets
        )
        SELECT window_start,
               window_start + INTERVAL '1 hour' AS window_end,
               COUNT(*) AS n_events,
               {sql_dsum('value')} AS sum_value
        FROM bucketed
        GROUP BY window_start
    """,
    tags=("events", "time-window"),
    description="sliding 1-hour windows every 30 minutes (each event in 2 windows)",
)
def events_sliding_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_user_sessions",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                   CASE WHEN CAST(ts AS TIMESTAMP)
                             - LAG(CAST(ts AS TIMESTAMP), 1, TIMESTAMP '1970-01-01')
                               OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                             > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts,
                   CAST(SUM(new_session) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id
                                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM ordered
        )
        SELECT user_id, session_id,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               COUNT(*) AS n_events
        FROM sessions
        GROUP BY user_id, session_id
    """,
    tags=("events", "time-window", "window"),
    description="sessionization with a 30-minute gap via lag + running sum "
                "(batch twin of session_window in streaming)",
)
def events_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # gap test in exact microseconds — casting timestamps to long would
    # truncate to seconds and disagree with the oracle's interval compare
    prev = F.lag("ts").over(wo)
    with_flag = ev.withColumn(
        "new_session",
        (
            prev.isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(prev.cast("timestamp"))
                > 30 * 60 * 1_000_000
            )
        ).cast("int"),
    )
    return (
        with_flag.withColumn("session_id", F.sum("new_session").over(wrun))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
