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

import os

from pyspark.sql import DataFrame, SparkSession

from panditya_spark.sources.loaders import normalize_event_ts
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


# Last completed run's StreamingQueryProgress dicts, keyed by query
# name — the state-store evidence trail (numRowsTotal / memoryUsedBytes
# per stateful operator per micro-batch) for the sf1 boundedness
# ledger. Populated by the run_* drivers below after termination;
# bounded: overwritten per run, never appended across runs.
LAST_PROGRESS: dict[str, list] = {}


def _snap_progress(q, query_name: str) -> None:
    """Stash recentProgress (already plain dicts via json round-trip)
    under the query name; best-effort — a progress-less run (instant
    finish) just records []."""
    import json as _json

    try:
        LAST_PROGRESS[query_name] = [
            p if isinstance(p, dict) else _json.loads(p.json)
            for p in (q.recentProgress or [])
        ]
    except Exception:  # noqa: BLE001 — evidence capture must not fail runs
        LAST_PROGRESS[query_name] = []


def state_store_partitions(
    sf_dir: str, default: int = 8, cap: int = 32
) -> int:
    """Size a stateful query's shuffle-partition count (= its
    state-store instance count, pinned at query start) to INPUT VOLUME
    instead of CPU count. Every store pays a per-micro-batch
    snapshot/commit cost, so tiny local runs stay at ``default`` —
    the round-5 measurement behind the 8-partition harness default —
    while decade-scale inputs gain stateful-stage parallelism (the
    applyInPandasWithState worker pool is bounded by this; measured at
    the sf1 stress decade: the 8-partition sessionizer ran its Python
    state stage 8-wide on a 32-core host). ~1 MB of source parquet per
    partition is the local proxy for the production rule the
    run_stream_to_memory docstring states: keys-per-watermark-span /
    target-state-per-task."""
    return max(
        default, min(cap, _events_size_bytes(sf_dir) // (1 << 20))
    )


def _events_size_bytes(sf_dir: str) -> int:
    """Total on-disk bytes of the events parquet under ``sf_dir`` —
    the shared volume proxy behind both the state-store-partition
    sizing and the stream timeout budget (which previously carried
    two verbatim copies of this scan). Walks RECURSIVELY: a
    partitioned or nested parquet layout (part dirs, date partitions)
    silently under-measured with the old top-level listdir, which for
    the timeout re-created the exact under-budgeting the
    volume-scaling exists to fix."""
    import os

    path = os.path.join(sf_dir, "events.parquet")
    size = 0
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in files:
                fp = os.path.join(root, f)
                if os.path.isfile(fp):
                    size += os.path.getsize(fp)
    elif os.path.exists(path):
        size = os.path.getsize(path)
    return size


def stream_timeout_sec(sf_dir: str, floor: int = 180) -> int:
    """Volume-scaled awaitTermination budget for the finite
    availableNow harness runs: the fixed 180s default is a LIVENESS
    bound, not a latency target, and the sf10 stress tier proved it
    under-sized — the applyInPandasWithState sessionizer legitimately
    needs >180s to chew 10M events in 7 micro-batches, and a timeout
    there doesn't fail fast, it throws away a near-complete run.
    ~3s per MB of source parquet on top of the floor tracks the
    measured per-volume cost of the heaviest stateful query (the
    Arrow-round-trip sessionizer: ~45s at 20MB/sf1, ~500s budget at
    200MB/sf10) with generous slack for host weather; the floor keeps
    every test-tier run on the old behavior. A genuinely hung stream
    still dies — later, but loudly."""
    return floor + 3 * (_events_size_bytes(sf_dir) // (1 << 20))


def _await_or_raise(q, timeout_sec: int) -> None:
    """awaitTermination returns False on timeout with the query still
    running; every caller here treats the result as a COMPLETE
    availableNow run, so a timeout must fail loudly instead of
    returning a partial snapshot/table."""
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise RuntimeError(
            f"streaming query {q.name or q.id} did not finish within "
            f"{timeout_sec}s; result would be partial"
        )


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based streaming source over the events parquet — the local
    stand-in for Kafka; on a cluster only this reader changes
    (format('kafka') + from_json), every transformation downstream is
    identical. The file's physical timestamp type has varied across
    testdata generations (TIMESTAMP(NANOS) → long under nanosAsLong;
    TIMESTAMP_MICROS isAdjustedToUTC=0 → TIMESTAMP_NTZ); both are
    normalized to plain TIMESTAMP exactly like the batch loader, so
    withWatermark always sees an event-time-capable column."""
    import os

    from panditya_spark.session import ensure_session_defaults
    from panditya_spark.sources.loaders import normalize_event_ts

    ensure_session_defaults(spark)
    path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(path):
        # DIRECTORY table (the normal layout for any Spark-written
        # table at scale): part files interleave event time, so a
        # verbatim part-per-batch replay hands batch 1 a near-max
        # timestamp and every watermarked APPEND consumer downstream
        # (dropDuplicatesWithinWatermark, the stream-stream
        # attribution join) silently drops later batches' rows as
        # late — the exact failure the sessionize path hit first on
        # the sf1 stress build. Stage the directory through the same
        # event-time re-split (one contiguous time-range file per
        # micro-batch) so every read_events_stream consumer sees the
        # roughly-time-ordered arrival a replayed event log actually
        # has. (A name glob over the raw directory is worse still: it
        # matches ZERO part files and yields an empty stream.)
        src_dir = build_time_ordered_events_input(spark, sf_dir)
        stream = (
            spark.readStream.schema(spark.read.parquet(src_dir).schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(src_dir)
        )
    else:
        # Single-FILE table (the driver testdata layout): the file
        # source requires a directory, so point it at sf_dir with a
        # glob filter selecting exactly the events file. One file =
        # one micro-batch, so arrival order cannot split across
        # watermark advances and no staging is needed.
        raw_schema = spark.read.parquet(path).schema
        stream = (
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    return normalize_event_ts(stream)


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


def sliding_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding 24h/1h window counts as a stream: each event feeds 24
    window states; the watermark bounds how long a window stays open.
    Same window exprs as the batch twin stream_sliding_daily, so the
    same DuckDB oracle checks the streaming machinery."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "24 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def dedup_stream(
    events: DataFrame, keys: list[str], watermark: str = "2 hours"
) -> DataFrame:
    """Streaming deduplication — the training-pipeline guard against
    replayed/duplicated records at ingest (a Kafka redelivery, a
    re-uploaded shard). dropDuplicatesWithinWatermark keeps one row per
    key tuple and EVICTS key state once the watermark passes, so state
    is bounded by the key cardinality of one watermark span rather than
    of the whole stream — the property that makes stream-dedup viable
    on an unbounded 100 TB/day feed. The price of bounded state: a key
    recurring AFTER its state was evicted is emitted again, so an exact
    consumer collapses the (rare) cross-watermark survivors with a
    downstream batch distinct — the standard two-tier dedup
    architecture, and what the registered query does after the sink.

    Only the key columns are projected, so "keep-first vs keep-any"
    arrival nondeterminism is invisible: post-collapse the output is
    exactly the DISTINCT key set, oracle-checkable as `SELECT DISTINCT`
    over the same file.
    """
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )


SESSION_STATE_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("n_events", IntegerType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
    ]
)


def merge_session_events(
    sessions: list[list[int]], ts_us: list[int], gap_us: int
) -> list[list[int]]:
    """Fold event timestamps (ascending, microseconds) into a list of
    disjoint session intervals ``[n_events, start_us, end_us]`` ordered
    by start, merging neighbors whose separation is within ``gap_us``.
    Pure helper behind sessionize(); exactly the gaps-and-islands
    semantics of sessionize_batch."""
    import bisect

    sessions = [list(s) for s in sessions]
    starts = [s[1] for s in sessions]
    for tus in ts_us:
        i = bisect.bisect_right(starts, tus)
        sessions.insert(i, [1, tus, tus])
        starts.insert(i, tus)
        while i > 0 and sessions[i][1] - sessions[i - 1][2] <= gap_us:
            left = sessions.pop(i - 1)
            starts.pop(i - 1)
            i -= 1
            sessions[i] = [
                left[0] + sessions[i][0],
                min(left[1], sessions[i][1]),
                max(left[2], sessions[i][2]),
            ]
            starts[i] = sessions[i][1]
        while i + 1 < len(sessions) and sessions[i + 1][1] - sessions[i][2] <= gap_us:
            right = sessions.pop(i + 1)
            starts.pop(i + 1)
            sessions[i] = [
                sessions[i][0] + right[0],
                min(sessions[i][1], right[1]),
                max(sessions[i][2], right[2]),
            ]
    return sessions


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator: session windows per user via
    applyInPandasWithState — the escape hatch for semantics window()
    can't express (dynamic, gap-based windows). Emits one row per
    CLOSED session; the open session stays in state until the watermark
    passes its gap timeout.

    Ordering: all Arrow chunks of a micro-batch are concatenated and
    sorted globally before folding (chunk boundaries are arbitrary), and
    events are merged into the session list as closed intervals
    (min-start / max-end / neighbor re-merge) rather than assuming
    monotone arrival — a late-but-within-watermark event that precedes
    the open session either chains into it or forms its own earlier
    session. Sessions are closed as soon as a >gap separation from the
    next known interval exists; with a finite availableNow run the final
    open session per user is only emitted if a later trigger advances
    the watermark past its timeout (the batch twin `sessionize_batch`
    is the complete-output equivalent).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1000_000

    def update(key, pdfs, state):
        import pandas as pd

        (user_id,) = key

        def emit(n, start, end):
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end, unit="us")],
                }
            )

        old = state.get if state.exists else None
        n, start, end = (old[0], old[1], old[2]) if old else (0, None, None)

        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # Concatenate ALL Arrow chunks and sort globally: chunk
            # boundaries are arbitrary and must not affect folding.
            ts = pd.to_datetime(
                pd.concat([c["ts"] for c in chunks], ignore_index=True)
            ).sort_values()
            # Microsecond precision: matches the batch twin
            # (sessionize_batch) and the parquet micros exactly.
            ts_us = [int(t.value // 10**3) for t in ts]
            seed = [[n, start, end]] if end is not None else []
            sessions = merge_session_events(seed, ts_us, gap_us)
            # Every interval but the last is >gap away from its
            # successor in the known data: closed. The last stays open.
            for sn, ss, se in sessions[:-1]:
                yield emit(sn, ss, se)
            n, start, end = sessions[-1]

        if state.hasTimedOut:
            if n:
                yield emit(n, start, end)
            state.remove()
        elif end is not None:
            state.update((n, start, end))
            # Close at session_end + gap; must stay ahead of the
            # current watermark or Spark rejects the timestamp.
            state.setTimeoutTimestamp(
                max(
                    (end // 1000) + gap_us // 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )

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


# Sentinel users injected by build_sessionize_stream_input: far-future
# events that push the watermark past every REAL session's gap timeout
# so the stateful sessionizer closes and emits them all. Two sentinels
# (10d and 20d past the real max ts) so the close does not depend on
# whether the engine schedules a trailing no-data micro-batch: the 20d
# file's batch runs with the watermark already past 10d+gap, firing all
# real timeouts during a DATA batch.
SENTINEL_USERS = (-999_999, -999_998)

_SENTINEL_INPUT_CACHE: dict[str, str] = {}
_TIME_SPLIT_CACHE: dict[str, str] = {}


def _stage_time_split_events(
    spark: SparkSession, src: str, dest: str, n_splits: int = 4
) -> None:
    """Re-split a directory events table into `n_splits` contiguous
    EVENT-TIME ranges, one staged file per range, written into `dest`
    as 00_events_NNNN.parquet. Part files of a Spark-written table
    interleave time arbitrarily, so replaying them verbatim hands
    batch 1 the global max timestamp and its watermark marks nearly
    every later batch's events late (observed: 664 of 946 sessions
    survived a 3-part copy). A replayed event log arrives roughly in
    event-time order; the range split reproduces that regime, and each
    staged file still becomes one real micro-batch."""
    import shutil

    from panditya_spark.sources.loaders import normalize_event_ts

    ev = normalize_event_ts(spark.read.parquet(src))
    us = F.unix_micros(F.col("ts"))
    qs = [i / n_splits for i in range(1, n_splits)]
    cuts = ev.select(us.alias("_us")).approxQuantile("_us", qs, 0.001)
    bounds = [None, *sorted(set(cuts)), None]
    for i, (lo, hi_b) in enumerate(zip(bounds[:-1], bounds[1:])):
        part = ev
        if lo is not None:
            part = part.filter(us >= int(lo))
        if hi_b is not None:
            part = part.filter(us < int(hi_b))
        tmp_i = os.path.join(dest, f"_w{i}")
        part.repartition(1).write.mode("overwrite").parquet(tmp_i)
        (pf,) = [f for f in os.listdir(tmp_i) if f.endswith(".parquet")]
        shutil.move(
            os.path.join(tmp_i, pf),
            os.path.join(dest, f"00_events_{i:04d}.parquet"),
        )
        shutil.rmtree(tmp_i)


def build_time_ordered_events_input(spark: SparkSession, sf_dir: str) -> str:
    """Staged, event-time-ordered streaming-input directory for a
    DIRECTORY-layout events table — the shared front door for every
    read_events_stream consumer (no sentinels; the sessionize path,
    which additionally needs watermark-closing sentinel files, has its
    own builder on the same staging helper). Cached per (path, mtime)
    so repeated invocations reuse one copy."""
    import atexit
    import shutil
    import tempfile
    import time as _time

    src = os.path.join(sf_dir, "events.parquet")
    key = f"{src}:{os.path.getmtime(src)}"
    cached = _TIME_SPLIT_CACHE.get(key)
    if cached and os.path.isdir(cached):
        return cached

    d = tempfile.mkdtemp(prefix="panditya-events-in-")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    _stage_time_split_events(spark, src, d)
    # FileStreamSource orders by modification time: force range order.
    now = _time.time()
    for j, name in enumerate(sorted(os.listdir(d))):
        os.utime(os.path.join(d, name), (now + j, now + j))
    _TIME_SPLIT_CACHE[key] = d
    return d


def build_sessionize_stream_input(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a temp streaming-input directory: the real events
    file plus two single-row far-future sentinel files (one per
    SENTINEL_USERS entry), mtime-ordered so the file source processes
    real data first. Cached per (path, mtime) so repeated invocations
    (driver correctness run + pytest + bench) reuse one copy."""
    import atexit
    import datetime
    import shutil
    import tempfile
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "events.parquet")
    key = f"{src}:{os.path.getmtime(src)}"
    cached = _SENTINEL_INPUT_CACHE.get(key)
    if cached and os.path.isdir(cached):
        return cached

    d = tempfile.mkdtemp(prefix="panditya-sessionize-in-")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    if os.path.isdir(src):
        # Directory table (the normal Spark-written layout): stage
        # through the shared event-time re-split (see
        # _stage_time_split_events for why verbatim part copies kill
        # the watermark), then append the sentinel files below.
        _stage_time_split_events(spark, src, d)
        schema_file = os.path.join(d, "00_events_0000.parquet")
    else:
        shutil.copy(src, os.path.join(d, "00_events.parquet"))
        schema_file = src
    hi = (
        normalize_event_ts(spark.read.parquet(src))
        .agg(F.max("ts").alias("hi"))
        .first()["hi"]
    )
    # Build each sentinel row against the RAW file's arrow schema so a
    # driver re-materialization with new columns keeps working: every
    # non-(ts, user_id) field is null.
    raw = pq.read_schema(schema_file)
    # The sentinel's PHYSICAL ts type must match how SPARK reads the
    # real rows, and pyarrow's schema is ambiguous there: both INT96
    # (which Spark reads as TIMESTAMP) and TIMESTAMP(NANOS) int64
    # (which Spark reads as LONG under nanosAsLong) surface as
    # timestamp[ns]. Writing a ns-annotated sentinel against INT96
    # parts made the stream schema (timestamp) reject the sentinel
    # file (long). Spark's own view of the STAGED file disambiguates:
    # when Spark sees a timestamp, write the sentinel as micros-UTC
    # (arrives as TIMESTAMP everywhere); when Spark sees long, keep ns.
    from pyspark.sql.types import LongType

    ts_idx = raw.get_field_index("ts")
    if (
        pa.types.is_timestamp(raw.field(ts_idx).type)
        and raw.field(ts_idx).type.unit == "ns"
        and not isinstance(
            spark.read.parquet(schema_file).schema["ts"].dataType, LongType
        )
    ):
        raw = raw.set(ts_idx, pa.field("ts", pa.timestamp("us", tz="UTC")))
    for i, (uid, days) in enumerate(zip(SENTINEL_USERS, (10, 20)), start=1):
        ts = hi + datetime.timedelta(days=days)
        arrays = []
        for field in raw:
            if field.name == "ts":
                arrays.append(pa.array([ts], type=field.type))
            elif field.name == "user_id":
                arrays.append(pa.array([uid], type=field.type))
            else:
                arrays.append(pa.array([None], type=field.type))
        pq.write_table(
            pa.Table.from_arrays(arrays, schema=raw),
            os.path.join(d, f"{i:02d}_sentinel.parquet"),
        )
    # FileStreamSource orders by modification time: force real < s1 < s2.
    now = _time.time()
    for j, name in enumerate(sorted(os.listdir(d))):
        os.utime(os.path.join(d, name), (now + j, now + j))
    _SENTINEL_INPUT_CACHE[key] = d
    return d


def read_sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + watermark-closing sentinels as a file stream, one file
    per micro-batch, ts normalized to TimestampType like every other
    events reader."""
    from panditya_spark.session import ensure_session_defaults

    ensure_session_defaults(spark)
    d = build_sessionize_stream_input(spark, sf_dir)
    # Glob: the staged real-events prefix is 00_events.parquet for a
    # single-file source table, 00_events_NNNN.parquet per part for a
    # directory table.
    schema = spark.read.parquet(os.path.join(d, "00_events*.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    return normalize_event_ts(stream)


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch equivalent of sessionize(): gaps-and-islands via lag +
    running sum — a session break is a gap > gap_minutes, the running
    count of breaks is the session id. Pure window functions (one
    shuffle by user), so it is oracle-checkable in ANSI SQL and pins
    the session semantics the stateful streaming operator must match.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # The running sum must be a ROWS frame: Spark's default for an
    # ordered window is RANGE, which groups tied (user_id, ts) rows.
    # For this 0/1-break pattern the two frames happen to agree, but
    # the oracle pins ROWS — make the equivalence explicit, not lucky.
    w_rows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = gap_minutes * 60 * 1000_000
    ts_us = F.unix_micros(F.col("ts"))
    brk = F.when(
        F.lag(ts_us).over(w).isNull() | (ts_us - F.lag(ts_us).over(w) > gap_us), 1
    ).otherwise(0)
    sess = events.select(
        "user_id", "ts", F.sum(brk).over(w_rows).alias("session_seq")
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


def session_window_agg_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Spark's BUILT-IN session_window aggregation with its two
    PRODUCTION STATE-SIZING KNOBS explicit (VERDICT r13 #5): peak
    state for this operator is the number of OPEN sessions per
    watermark span — a session's window stays in the store from its
    first event until the watermark passes last-event + gap — so:

    - ``watermark_delay`` is the eviction knob, but the EFFECTIVE
      horizon is max(delay, micro-batch event-time span): the
      watermark only advances between batches, so state cannot evict
      finer than one batch's worth of event time regardless of the
      delay. Measured both ways at the sf10 stress tier (100x keys,
      10M events replayed in 7 time-split batches): at that batch
      granularity the peak is batch-bound — 2,410,900 rows / 2.1 GB at
      a 1-hour delay vs 2,396,900 / 2.09 GB at 2 minutes (and the
      tight delay WORSENS wall 52.2 → 108.1s on extra eviction/commit
      work per batch) — while with fine-grained batches (hourly files,
      tests/test_streaming.py::test_session_window_state_vs_watermark)
      the same 2-minute delay cuts peak state >2x with identical
      output. Production rule: size state to open sessions per
      max(delay, trigger span); tightening the delay below the
      trigger granularity buys nothing and costs eviction churn.
    - ``gap_minutes`` both defines the session semantics and extends
      each session's state lifetime by the gap itself.

    tests/test_streaming.py::test_session_window_state_vs_watermark
    measures peak numRowsTotal shrinking as the delay tightens while
    the closed-session OUTPUT stays identical (the sentinel files land
    10 days out, so every real session closes under either delay).

    Emits one append-mode row per CLOSED session: (user_id, n_events,
    session_start_us, session_end_us) with the gaps-and-islands
    timestamp convention — the native window end is last-event + gap,
    so session_end is window.end − gap. Boundary semantics: the
    builtin MERGES an event arriving exactly gap after the previous
    one, matching the strictly-greater-than break of
    sessionize()/sessionize_batch (pinned by
    test_native_session_window_gap_boundary_semantics)."""
    gap = f"{int(gap_minutes)} minutes"
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).cast("int").alias("n_events"))
        .select(
            "user_id",
            "n_events",
            F.unix_micros(F.col("session_window.start")).alias(
                "session_start_us"
            ),
            F.unix_micros(
                F.col("session_window.end") - F.expr(f"INTERVAL {gap}")
            ).alias("session_end_us"),
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    mode: str = "complete",
    timeout_sec: int = 180,
    shuffle_partitions: int = 8,
) -> DataFrame:
    """Drive a streaming aggregation to completion against the finite
    file source and return the materialized result (memory sink;
    'complete' for windowed aggs, 'append' for stateful emit-on-close
    operators). Test/bench harness helper.

    The number of state-store instances per stateful operator is pinned
    at query start to spark.sql.shuffle.partitions, and EVERY store
    pays a per-micro-batch snapshot/commit cost — with a stream-stream
    join that is 4 stores × partitions × batches regardless of data
    volume. 32 partitions is right for the batch queries but pure
    overhead for a local micro-batch harness, so the conf is lowered
    around .start() (the query keeps its start-time value; batch
    queries planned afterwards are unaffected). A production deployment
    sizes this to keys-per-watermark-span ÷ target-state-per-task, not
    to CPU count."""
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # Restored only after termination: the stream thread snapshots the
    # conf asynchronously when it constructs the first batch, so
    # restoring right after start() would race it.
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            _await_or_raise(q, timeout_sec)
            _snap_progress(q, query_name)
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.table(query_name)
    # The DataFrame's analyzed plan already holds the memory-sink
    # relation, so the catalog entry is pure leak surface: repeated
    # bench/pytest invocations would otherwise accumulate one temp view
    # (plus its buffered rows) per run for the life of the session.
    spark.catalog.dropTempView(query_name)
    return out


def attribution_join_stream(
    events: DataFrame, horizon_minutes: int = 60, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to every
    view by the same user within the preceding `horizon_minutes` — the
    canonical streaming attribution shape. Both sides carry watermarks
    and the join predicate bounds purchase.ts to [view.ts, view.ts +
    horizon], so Spark can evict view state once the purchase-side
    watermark passes view.ts + horizon: state is bounded by one horizon
    span per user, the property that keeps a stream-stream join viable
    on an unbounded feed (without the time bound the state is infinite
    and Spark rejects the append-mode query).
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return views.join(purchases, cond).select(
        F.col("v_user").alias("user_id"),
        "view_ts",
        "purchase_ts",
        "purchase_value",
    )


def run_stream_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 180,
    shuffle_partitions: int = 8,
    query_name: str | None = None,
) -> None:
    """Drive a streaming query to completion into a PARQUET file sink
    with a checkpoint — the durable, exactly-once output path (memory
    sinks are test-only). The checkpoint's WAL + file-sink manifest
    (_spark_metadata) give end-to-end exactly-once: re-running the same
    query over the same input with the same checkpoint processes zero
    new files and appends zero new rows (pinned by
    tests/test_streaming.py::test_file_sink_rerun_is_idempotent).
    File sinks only support append mode, so aggregations must be
    watermark-finalized (emit-on-close), not complete-mode.

    ``query_name`` keys the LAST_PROGRESS evidence snapshot (ADVICE
    r11: a hardcoded key would let two parquet-sink queries silently
    overwrite each other's progress); defaults to the out_dir basename
    so distinct sinks get distinct keys without every caller caring."""
    import os as _os

    if query_name is None:
        query_name = _os.path.basename(out_dir.rstrip("/")) or "file_sink"
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # Same conf dance as run_stream_to_memory: state-store count is
    # pinned at query start; restore only after termination.
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            _await_or_raise(q, timeout_sec)
            _snap_progress(q, query_name)
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def tumbling_counts_append_stream(events: DataFrame) -> DataFrame:
    """Tumbling 1h counts for APPEND-mode sinks (file sink): windows
    emit when the watermark passes their end, so the finite run needs
    the far-future sentinel rows (build_sessionize_stream_input) to
    close the last real windows. The sentinels MUST flow through the
    watermark node into the aggregation: a pre-agg
    filter(event_type IS NOT NULL) gets pushed below
    EventTimeWatermark by the optimizer, the sentinel batches then
    never advance the watermark, and the last real window never emits
    (observed: exactly the final hour x 5 event types missing). So
    sentinel windows DO form here — with NULL event_type, since
    sentinel rows carry only (ts, user_id) — and the caller drops them
    on read-back. Same agg exprs as tumbling_counts_stream — the
    memory-sink complete-mode twin."""
    return (
        events.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def run_stream_upsert(
    stream_df: DataFrame,
    key: str,
    op_col: str,
    state: dict,
    checkpoint_dir: str,
    update_cols: list[str] | None = None,
    timeout_sec: int = 180,
    shuffle_partitions: int = 8,
):
    """Streaming MERGE: apply each micro-batch to a keyed target via
    foreachBatch + merge_upsert — the standard Spark pattern for a
    streaming upsert sink (Delta's streaming MERGE is exactly this
    composition). `state` is a one-entry dict {'df': target_frame}
    mutated per batch; production swaps the dict for a transactional
    table write, the batch function is unchanged.

    Within a batch, rows are compacted last-writer-wins per key BEFORE
    the merge (merge_upsert requires unique keys); across batches,
    later micro-batches overwrite earlier ones by construction. The
    checkpoint makes redelivery safe: a replayed batch re-applies the
    same merge (idempotent for upserts/deletes on the same data)."""
    from pyspark.sql.window import Window as _W

    from panditya_spark.operators.relational import merge_upsert

    spark = stream_df.sparkSession

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if not batch_df.columns:
            return
        w = _W.partitionBy(key).orderBy(F.desc("ts"), F.desc("event_id"))
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        merged = merge_upsert(
            state["df"], latest, key=key, op_col=op_col, update_cols=update_cols
        )
        # Materialize OFF the incoming batch's lineage (localCheckpoint)
        # so the next batch's merge doesn't re-trigger this batch's scan.
        state["df"] = merged.drop("action").localCheckpoint(eager=True)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        try:
            _await_or_raise(q, timeout_sec)
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return state["df"]


# ---------------------------------------------------- record-high detection
def record_highs(events: DataFrame, key_groups: int = 64) -> DataFrame:
    """Second custom stateful operator (applyInPandasWithState, like
    sessionize): per-user running-maximum tracking — emit an event iff
    its value strictly exceeds every prior value of that user in
    event-time order, with its record sequence number. The streaming
    twin of 'new all-time high' alerting; the per-user state is two
    scalars (current max, records-so-far), bounded regardless of
    stream length.

    Exactness: the fold uses only COMPARISONS of stored doubles (no
    float arithmetic), so the emitted set is bit-exact against the
    batch window twin and SQL-oracle-checkable — unlike running sums,
    record detection has no accumulation-order sensitivity. Within a
    micro-batch all Arrow chunks are concatenated and sorted by
    (ts, event_id) per user; cross-batch exactness holds whenever
    batches arrive time-ordered (the time-split file input), which the
    registered query uses to drive three real batches through the
    state store.

    KEY-GROUP sharding (r17, guide §4.2/§2.3 — amortize the per-group
    Python fixed cost): the grouping key is pmod(xxhash64(user_id),
    key_groups) rather than user_id itself, and the state row holds
    the (user, max, n_rec) triples of the whole group as parallel
    arrays — the keyGroup design production stream processors use to
    decouple key cardinality from state-machinery overhead. Grouping
    by raw user_id ran the update fn once per user per batch, and the
    measured cost was NOT the fold (pure numpy since r16) but the
    per-group machinery — Arrow slice → pandas frame per group, state
    get/update round-trip per group: ~4 ms × 1500 users × 3 batches
    ≈ 6 s summed at sf0.1. With key_groups=64 that machinery runs
    64×/batch; the per-user fold inside is numpy over segment slices
    of ONE lexsort, value-identical per user (same (ts, event_id)
    order, same comparisons — pinned by the batch-twin pytest).
    Per-group state is O(keys/key_groups); callers size key_groups to
    volume (~8× the state-store partition count) exactly as key-group
    counts scale in any sharded-state deployment — per-user state is
    unchanged at two scalars."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd

        if state.exists:
            uids0, mxs0, nrs0 = state.get
            st = dict(zip(uids0, zip(mxs0, nrs0)))
        else:
            st = {}
        uid_parts: list = []
        ts_parts: list = []
        eid_parts: list = []
        val_parts: list = []
        for pdf in pdfs:
            if len(pdf):
                uid_parts.append(pdf["user_id"].to_numpy())
                ts_parts.append(pdf["ts"].to_numpy(dtype="datetime64[us]"))
                eid_parts.append(pdf["event_id"].to_numpy())
                val_parts.append(pdf["value"].to_numpy(dtype=float))
        out = None
        if uid_parts:
            def cat(parts):
                return parts[0] if len(parts) == 1 else np.concatenate(parts)

            uid, ts, eid, v = (
                cat(uid_parts), cat(ts_parts), cat(eid_parts), cat(val_parts)
            )
            # One lexsort for the whole group — per user, (ts, event_id)
            # order, identical to the former per-user-group sort.
            order = np.lexsort((eid, ts, uid))
            uid, ts, v = uid[order], ts[order], v[order]
            starts = np.flatnonzero(
                np.concatenate(([True], uid[1:] != uid[:-1]))
            )
            ends = np.concatenate((starts[1:], [len(uid)]))
            o_uid: list = []
            o_ts: list = []
            o_val: list = []
            o_seq: list = []
            for s, e in zip(starts, ends):
                u = int(uid[s])
                mx, n_rec = st.get(u, (float("-inf"), 0))
                vs = v[s:e]
                # Vectorized record detection: a row is a record iff it
                # strictly exceeds the running max of (state ∪ prior
                # rows). Pure comparisons — same bit-exactness as the
                # scalar fold.
                prior_max = np.maximum.accumulate(
                    np.concatenate(([mx], vs))
                )[:-1]
                mask = vs > prior_max
                if mask.any():
                    n = int(mask.sum())
                    o_seq.append(n_rec + np.cumsum(mask)[mask])
                    o_uid.append(np.full(n, u, dtype=np.int64))
                    o_ts.append(ts[s:e][mask].astype("int64"))
                    o_val.append(vs[mask])
                    n_rec += n
                    mx = float(vs.max()) if vs.max() > mx else mx
                st[u] = (mx, n_rec)
            if o_uid:
                out = pd.DataFrame(
                    {
                        "user_id": np.concatenate(o_uid),
                        "ts_us": np.concatenate(o_ts),
                        "value": np.concatenate(o_val),
                        "record_seq": np.concatenate(o_seq),
                    }
                )
        ks = list(st.keys())
        state.update((ks, [st[k][0] for k in ks], [st[k][1] for k in ks]))
        if out is not None:
            yield out

    return events.withColumn(
        "_kg", F.pmod(F.xxhash64("user_id"), F.lit(key_groups))
    ).groupBy("_kg").applyInPandasWithState(
        update,
        outputStructType="user_id LONG, ts_us LONG, value DOUBLE, record_seq LONG",
        stateStructType="uids ARRAY<LONG>, mxs ARRAY<DOUBLE>, nrs ARRAY<LONG>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def record_high_batch(events: DataFrame) -> DataFrame:
    """Batch twin of record_highs: window max over strictly-preceding
    rows in (ts, event_id) order — pins the semantics the stateful
    operator must reproduce."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max = F.max("value").over(w)
    is_rec = F.when(prev_max.isNull() | (F.col("value") > prev_max), 1).otherwise(0)
    return (
        events.select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "value",
            is_rec.alias("_rec"),
            F.sum(is_rec).over(w_run).alias("record_seq"),
        )
        .filter(F.col("_rec") == 1)
        .select("user_id", "ts_us", "value", "record_seq")
    )


# ---------------------------------------------- streaming near-dedup ingest
_DOCS_STREAM_CACHE: dict[str, str] = {}


def build_docs_stream_input(
    spark: SparkSession, sf_dir: str, n_batches: int = 3
) -> str:
    """Materialize the documents table as ``n_batches`` parquet files
    (batch b = docs with doc_id % n_batches == b), mtime-ordered so the
    file source delivers them as a deterministic arrival sequence —
    the ingestion-pipeline twin of build_sessionize_stream_input.
    Cached per (path, mtime, n)."""
    import atexit
    import shutil
    import tempfile
    import time as _time

    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "documents.parquet")
    key = f"{src}:{os.path.getmtime(src)}:{n_batches}"
    cached = _DOCS_STREAM_CACHE.get(key)
    if cached and os.path.isdir(cached):
        return cached
    d = tempfile.mkdtemp(prefix="panditya-docs-stream-")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    pdf = pq.read_table(src, columns=["doc_id", "text"]).to_pandas()
    import pyarrow as pa

    for b in range(n_batches):
        sub = pdf[pdf.doc_id % n_batches == b]
        pq.write_table(
            pa.Table.from_pandas(sub, preserve_index=False),
            os.path.join(d, f"{b:02d}_batch.parquet"),
        )
    now = _time.time()
    for j, name in enumerate(sorted(os.listdir(d))):
        os.utime(os.path.join(d, name), (now + j, now + j))
    _DOCS_STREAM_CACHE[key] = d
    return d


def run_stream_ingest_neardedup(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    threshold: float = 0.5,
    n_batches: int = 3,
    timeout_sec: int = 240,
) -> DataFrame:
    """Streaming NEAR-duplicate ingestion — the corpus-refresh loop as
    a real micro-batch run: each arriving batch (1) dedups against
    itself (exact md5 keeper = min id; near = any smaller-id pair at
    Jaccard >= threshold drops the larger — the semantic_dedup keeper
    convention), then (2) dedups against the ACCUMULATED survivor
    snapshot via dedup_against_snapshot (the exact cross-corpus
    operator the batch path uses), and only clean documents append to
    the snapshot. Batch order is deterministic (doc_id % n_batches,
    mtime-sequenced files, maxFilesPerTrigger=1), so the greedy
    batch-ordered survivor set is reproducible — pinned by a
    sequential Python replay in tests/test_streaming.py. Rows-only at
    the driver (the greedy chain is order-dependent — not cleanly
    SQL-expressible).

    Returns the final snapshot as (doc_id, batch_seq)."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.window import Window as _W

    from panditya_spark.operators.dedup import (
        dedup_against_snapshot,
        ngram_jaccard_pairs,
    )

    d = build_docs_stream_input(spark, sf_dir, n_batches)
    first = os.path.join(d, sorted(os.listdir(d))[0])
    schema = spark.read.parquet(first).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    empty = spark.createDataFrame(
        [],
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
                StructField("batch_seq", IntegerType()),
            ]
        ),
    )
    state = {"df": empty, "seq": 0}

    def apply_batch(batch: DataFrame, _bid: int) -> None:
        if batch.isEmpty():
            return
        state["seq"] += 1
        w = _W.partitionBy("h").orderBy("doc_id")
        b1 = (
            batch.withColumn("h", F.md5(F.col("text")))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("h", "_rn")
        )
        pairs = ngram_jaccard_pairs(
            b1, "text", "doc_id", k=k, threshold=threshold
        )
        b2 = b1.join(
            pairs.select(F.col("doc2").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
        flags = dedup_against_snapshot(
            b2,
            state["df"].select("doc_id", "text"),
            "text",
            "doc_id",
            k=k,
            threshold=threshold,
        )
        clean = flags.filter(
            (F.col("dup_exact") == 0) & (F.col("dup_near") == 0)
        ).select("doc_id")
        survivors = b2.join(clean, "doc_id", "left_semi").withColumn(
            "batch_seq", F.lit(state["seq"]).cast("int")
        )
        state["df"] = (
            state["df"].unionByName(survivors).localCheckpoint(eager=True)
        )

    import tempfile

    ckpt = tempfile.mkdtemp(prefix="panditya-neardedup-ckpt-")
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        _await_or_raise(q, timeout_sec)
    finally:
        q.stop()
    return state["df"].select("doc_id", "batch_seq")
