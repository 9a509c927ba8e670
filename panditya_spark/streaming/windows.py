"""Structured Streaming surface (SURVEY §2.10: the reference has no
streaming; these are the Phase-6 scale extensions).

The aggregation logic is shared with the batch queries in
plans/streaming_queries.py (same window exprs, so the DuckDB oracle
that validates the batch path also validates the streaming semantics);
this module adds the streaming-specific machinery: readStream sources,
watermarks for late data, output modes, and a custom stateful operator
via applyInPandasWithState.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based streaming source over the events parquet — the local
    stand-in for Kafka; on a cluster only this reader changes
    (format('kafka') + from_json), every transformation downstream is
    identical. The file stores ts as TIMESTAMP(NANOS), read as long
    (legacy nanosAsLong conf) and truncated to microseconds exactly
    like the batch loader."""
    import os

    from pyspark.sql.types import LongType

    from panditya_spark.session import ensure_session_defaults

    ensure_session_defaults(spark)
    path = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(path).schema
    # The file-stream source requires a DIRECTORY; point it at sf_dir
    # with a glob filter so only the events file matches.
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(raw_schema["ts"].dataType, LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def tumbling_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h window counts with a watermark: late events beyond
    `watermark` are dropped and state for closed windows is evicted —
    the standard unbounded-state guard."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


SESSION_STATE_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("n_events", IntegerType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
    ]
)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator: session windows per user via
    applyInPandasWithState — the escape hatch for semantics window()
    can't express (dynamic, gap-based windows). Emits one row per
    CLOSED session; open sessions stay in state until the watermark
    passes their gap timeout."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1000_000

    def update(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        old = state.get if state.exists else None
        n, start, end = (old[0], old[1], old[2]) if old else (0, None, None)
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["ts"]).sort_values()
            for t in ts:
                # microsecond precision: matches the batch twin
                # (sessionize_batch) and the parquet micros exactly.
                tus = int(t.value // 10**3)
                if end is not None and tus - end > gap_us:
                    yield pd.DataFrame(
                        {
                            "user_id": [user_id],
                            "n_events": [n],
                            "session_start": [pd.Timestamp(start, unit="us")],
                            "session_end": [pd.Timestamp(end, unit="us")],
                        }
                    )
                    n, start = 0, tus
                if start is None:
                    start = tus
                n += 1
                end = tus
        if state.hasTimedOut:
            if n:
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "n_events": [n],
                        "session_start": [pd.Timestamp(start, unit="us")],
                        "session_end": [pd.Timestamp(end, unit="us")],
                    }
                )
            state.remove()
        else:
            state.update((n, start, end))
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + gap_us // 1000)

    return (
        events.withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_STATE_SCHEMA,
            stateStructType="n_events INT, start_us LONG, end_us LONG",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch equivalent of sessionize(): gaps-and-islands via lag +
    running sum — a session break is a gap > gap_minutes, the running
    count of breaks is the session id. Pure window functions (one
    shuffle by user), so it is oracle-checkable in ANSI SQL and pins
    the session semantics the stateful streaming operator must match.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = gap_minutes * 60 * 1000_000
    ts_us = F.unix_micros(F.col("ts"))
    brk = F.when(
        F.lag(ts_us).over(w).isNull() | (ts_us - F.lag(ts_us).over(w) > gap_us), 1
    ).otherwise(0)
    sess = events.select(
        "user_id", "ts", F.sum(brk).over(w).alias("session_seq")
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_seq", "n_events", "session_start", "session_end")
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    mode: str = "complete",
    timeout_sec: int = 180,
) -> DataFrame:
    """Drive a streaming aggregation to completion against the finite
    file source and return the materialized result (memory sink;
    'complete' for windowed aggs, 'append' for stateful emit-on-close
    operators). Test/bench harness helper."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()
    return stream_df.sparkSession.table(query_name)
