"""Structured Streaming tests: the streaming path over the finite
events source must agree with the batch path (which the DuckDB oracle
already validates)."""

from __future__ import annotations

from tests.conftest import rows

SF_DIR = "/root/testdata/sf0.001"


def test_stream_tumbling_agrees_with_batch(spark):
    from panditya_spark.plans.streaming_queries import tumbling_hourly
    from panditya_spark.sources.loaders import load_table
    from panditya_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
        tumbling_counts_stream,
    )

    stream = read_events_stream(spark, SF_DIR, max_files_per_trigger=1)
    assert stream.isStreaming
    got = run_stream_to_memory(
        tumbling_counts_stream(stream, watermark="0 seconds"),
        "t_tumbling_test",
        mode="complete",
    )
    expected = tumbling_hourly(load_table(spark, SF_DIR, "events"))
    assert rows(got) == rows(expected)


def test_merge_session_events_pure():
    from panditya_spark.streaming.windows import merge_session_events

    gap = 100
    # In-order fold: two sessions separated by >gap.
    assert merge_session_events([], [0, 50, 300], gap) == [[2, 0, 50], [1, 300, 300]]
    # Boundary: separation == gap chains.
    assert merge_session_events([], [0, 100, 200], gap) == [[3, 0, 200]]
    # Out-of-order straggler BEFORE the open session, within gap:
    # extends the session backwards instead of corrupting boundaries.
    assert merge_session_events([[2, 200, 250]], [150], gap) == [[3, 150, 250]]
    # Straggler bridges two would-be sessions into one.
    assert merge_session_events([[2, 500, 550]], [390, 450], gap) == [[4, 390, 550]]
    # Straggler >gap before the open session forms its own earlier session.
    assert merge_session_events([[2, 500, 550]], [10], gap) == [[1, 10, 10], [2, 500, 550]]
    # Interior event just increments the count.
    assert merge_session_events([[2, 100, 300]], [200], gap) == [[3, 100, 300]]


def test_stream_sessionize(spark):
    from pyspark.sql import functions as F

    from panditya_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_memory,
        sessionize,
    )

    stream = read_events_stream(spark, SF_DIR).select(
        F.col("user_id").cast("string").alias("user_id"), "ts"
    )
    out = run_stream_to_memory(
        sessionize(stream, gap_minutes=30), "t_sessions_test", mode="append"
    )
    sessions = out.collect()
    # closed sessions exist, are well-formed, and never overlap per user
    assert len(sessions) > 0
    per_user: dict[str, list] = {}
    for s in sessions:
        assert s.session_start <= s.session_end
        assert s.n_events >= 1
        per_user.setdefault(s.user_id, []).append((s.session_start, s.session_end))
    for spans in per_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 < s2  # disjoint, ordered

    # Every closed streaming session must appear verbatim in the batch
    # gaps-and-islands sessionization (the oracle-checked twin).
    from panditya_spark.sources.loaders import load_table
    from panditya_spark.streaming.windows import sessionize_batch

    batch = {
        (str(r.user_id), r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(
            load_table(spark, SF_DIR, "events"), gap_minutes=30
        ).collect()
    }
    for s in sessions:
        assert (s.user_id, s.session_start, s.session_end, s.n_events) in batch


def test_stream_sessionize_microbatch_equals_batch_twin(spark):
    """The registered sentinel-closed stateful run must emit EXACTLY the
    batch gaps-and-islands session set — not a subset: the far-future
    sentinel batches advance the watermark past every real session's
    timeout, so every session closes and emits."""
    from pyspark.sql import functions as F

    from panditya_spark.plans import QUERIES
    from panditya_spark.sources.loaders import load_table
    from panditya_spark.streaming.windows import sessionize_batch

    got = QUERIES["stream_sessionize_microbatch"](spark, SF_DIR)
    expected = sessionize_batch(
        load_table(spark, SF_DIR, "events"), gap_minutes=30
    ).select(
        F.col("user_id").cast("string").alias("user_id"),
        "n_events",
        "session_start",
        "session_end",
    )
    assert rows(got) == rows(expected)
    assert got.count() > 100  # non-vacuous


def test_stream_dedup_agrees_with_batch_distinct(spark):
    """Two-tier streaming dedup (bounded watermark state + downstream
    batch collapse) must produce exactly the batch DISTINCT key set."""
    from panditya_spark.plans import QUERIES
    from panditya_spark.sources.loaders import load_table

    got = QUERIES["stream_dedup_microbatch"](spark, SF_DIR)
    expected = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type"
    ).distinct()
    assert rows(got) == rows(expected)
    assert got.count() > 1  # non-vacuous: multiple distinct keys exist


def test_stream_attribution_join_agrees_with_batch(spark):
    """Watermarked stream-stream interval join over the finite source
    must equal the batch interval join exactly."""
    from pyspark.sql import functions as F

    from panditya_spark.plans import QUERIES
    from panditya_spark.sources.loaders import load_table

    got = QUERIES["stream_attribution_join"](spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    v = ev.filter("event_type = 'view'").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    expected = v.join(
        p,
        (v.user_id == p.p_user)
        & (p.purchase_ts >= v.view_ts)
        & (p.purchase_ts <= v.view_ts + F.expr("INTERVAL 60 MINUTES")),
    ).select("user_id", "view_ts", "purchase_ts", "purchase_value")
    assert rows(got) == rows(expected)


def test_merge_session_events_property():
    """Property: folding timestamps in ANY arrival order must produce
    exactly the sessions of a sorted gaps-and-islands pass."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from panditya_spark.streaming.windows import merge_session_events

    GAP = 100

    def reference(ts):
        out = []
        for t in sorted(ts):
            if out and t - out[-1][2] <= GAP:
                out[-1][0] += 1
                out[-1][2] = max(out[-1][2], t)
            else:
                out.append([1, t, t])
        return out

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=40),
        st.randoms(),
    )
    def check(ts, rnd):
        shuffled = list(ts)
        rnd.shuffle(shuffled)
        got = merge_session_events([], shuffled, GAP)
        assert got == reference(ts)

    check()


def test_file_sink_rerun_is_idempotent(spark):
    """Re-running the checkpointed file-sink query over the same input
    must append ZERO rows: the checkpoint WAL already marks every input
    file processed, so the availableNow rerun commits no new batch —
    the exactly-once property the durable sink exists for."""
    from panditya_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    first = QUERIES["stream_file_sink_hourly"](spark, sf)
    n1 = first.count()
    assert n1 > 0
    second = QUERIES["stream_file_sink_hourly"](spark, sf)
    n2 = second.count()
    assert n2 == n1, f"rerun appended rows: {n1} -> {n2}"


def test_file_sink_matches_memory_sink_twin(spark):
    """The append-mode file sink and the complete-mode memory sink must
    produce the identical window set — emit-on-watermark-close with
    sentinels loses nothing vs emit-everything-at-end."""
    from panditya_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    via_file = {
        tuple(r) for r in QUERIES["stream_file_sink_hourly"](spark, sf).collect()
    }
    via_mem = {
        tuple(r)
        for r in QUERIES["stream_tumbling_microbatch"](spark, sf).collect()
    }
    assert via_file == via_mem


# ---------------------------------------------------- record-high detection
def test_stream_record_high_agrees_with_batch_twin(spark):
    """The stateful record-high run (3 real time-split micro-batches)
    must equal the batch window twin EXACTLY — comparisons-only
    folding has no float-order slack, so this is set equality on raw
    values, not approximate."""
    from panditya_spark.plans import QUERIES
    from panditya_spark.sources.loaders import load_table
    from panditya_spark.streaming.windows import record_high_batch

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["user_id"], r["ts_us"], r["value"], r["record_seq"])
        for r in QUERIES["stream_record_high"](spark, sf).collect()
    )
    ev = load_table(spark, sf, "events")
    want = sorted(
        (r["user_id"], r["ts_us"], r["value"], r["record_seq"])
        for r in record_high_batch(ev).collect()
    )
    assert got == want
    assert len(got) > 0
    # Structural invariants: per user, record_seq is 1..k in ts order
    # and values strictly increase.
    from collections import defaultdict

    per_user = defaultdict(list)
    for u, t, v, s in got:
        per_user[u].append((t, v, s))
    for u, rows_u in per_user.items():
        rows_u.sort()
        assert [s for _, _, s in rows_u] == list(range(1, len(rows_u) + 1)), u
        vals = [v for _, v, _ in rows_u]
        assert all(a < b for a, b in zip(vals, vals[1:])), u


def test_analytic_windows_use_rows_frames(spark):
    """Regression pin for the r3 sessionize bug class: an ORDER BY
    window defaults to a RANGE frame, which merges same-timestamp
    peers — the running-sum/running-max windows in sessionize_batch
    and record_high_batch must compile to ROWS frames, never RANGE."""
    from panditya_spark.sources.loaders import load_table
    from panditya_spark.streaming.windows import (
        record_high_batch,
        sessionize_batch,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    for name, df in [
        ("sessionize_batch", sessionize_batch(ev, gap_minutes=30)),
        (
            "record_high_batch",
            record_high_batch(ev.select("user_id", "ts", "event_id", "value")),
        ),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "RowFrame" in plan, name
        assert "RangeFrame" not in plan, name


def test_native_session_window_gap_boundary_semantics(spark):
    """The builtin session_window MERGES an event arriving exactly gap
    after the previous one (adjacent windows coalesce), matching the
    gaps-and-islands twin's strictly-greater-than break — measured
    here so the exact-boundary agreement is pinned, not assumed."""
    import datetime

    from pyspark.sql import functions as F

    from panditya_spark.streaming.windows import sessionize_batch

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows_in = [
        (1, t0),
        (1, t0 + datetime.timedelta(minutes=30)),          # exactly gap
        (1, t0 + datetime.timedelta(minutes=90)),          # > gap: new
    ]
    df = spark.createDataFrame(rows_in, ["user_id", "ts"])

    native = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    batch = sessionize_batch(df, gap_minutes=30).collect()
    # BOTH definitions keep the exact-gap event in the first session.
    assert sorted(r["n"] for r in native) == [1, 2]
    assert sorted(r["n_events"] for r in batch) == [1, 2]


def test_stream_ingest_neardedup_matches_replay(spark, tmp_path):
    """The streaming ingest's batch-ordered greedy must equal a
    sequential Python replay of its documented rules: per batch —
    exact keeper = first text occurrence by id; near = any smaller-id
    in-batch doc at Jaccard >= 0.5 drops the doc; then exact/near
    against the accumulated snapshot; survivors append."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from panditya_spark.streaming.windows import run_stream_ingest_neardedup

    docs = [
        (0, "a b c d e f g"),
        (3, "a b c d e f g"),        # in-batch exact dup of 0
        (6, "a b c d e f h"),        # in-batch near dup of 0
        (9, "p q r s t u v"),
        (1, "a b c d e f g"),        # cross-batch exact dup of 0
        (4, "p q r s t u w"),        # cross-batch near dup of 9
        (7, "m n o aa bb cc dd"),
        (2, "m n o aa bb cc ee"),    # cross-batch near dup of 7
        (5, "x y z xx yy zz qq"),
        (8, "x y z xx yy zz qq"),    # in-batch exact dup of 5
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    def sh(text, k=3):
        w = [t for t in text.strip().split() if t]
        return (
            {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}
            if len(w) >= k
            else set()
        )

    def jac(a, b):
        return len(a & b) / len(a | b) if (a or b) else 0.0

    snapshot: list[tuple[int, str]] = []
    expected = set()
    for b in range(3):
        batch = sorted((d, t) for d, t in docs if d % 3 == b)
        b1 = []
        seen_texts = set()
        for d, t in batch:
            if t in seen_texts:
                continue
            seen_texts.add(t)
            b1.append((d, t))
        b2 = [
            (d, t)
            for d, t in b1
            if not any(
                d2 < d and jac(sh(t), sh(t2)) >= 0.5 for d2, t2 in b1
            )
        ]
        for d, t in b2:
            dup_exact = any(t == t2 for _, t2 in snapshot)
            dup_near = any(jac(sh(t), sh(t2)) >= 0.5 for _, t2 in snapshot)
            if not dup_exact and not dup_near:
                snapshot.append((d, t))
                expected.add((d, b + 1))

    got = {
        (r["doc_id"], r["batch_seq"])
        for r in run_stream_ingest_neardedup(
            spark, str(tmp_path), n_batches=3, timeout_sec=180
        ).collect()
    }
    assert got == expected, (sorted(got), sorted(expected))


def test_stream_readers_handle_directory_table_layout(spark, tmp_path):
    """Directory-layout events table (the normal Spark-written layout,
    e.g. the sf1 stress build): the file-stream source must read the
    part files — the old name-glob approach matched ZERO of them and
    silently produced an empty stream — and the sessionize input
    builder must stage every part before the sentinel files."""
    from panditya_spark.plans.streaming_queries import tumbling_hourly
    from panditya_spark.sources.loaders import load_table
    from panditya_spark.streaming.windows import (
        build_sessionize_stream_input,
        read_events_stream,
        run_stream_to_memory,
        tumbling_counts_stream,
    )

    sf_dir = str(tmp_path)
    (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .repartition(3)
        .write.parquet(f"{sf_dir}/events.parquet")
    )

    got = run_stream_to_memory(
        tumbling_counts_stream(
            read_events_stream(spark, sf_dir, max_files_per_trigger=1),
            watermark="0 seconds",
        ),
        "t_tumbling_dir_layout",
        mode="complete",
    )
    expected = tumbling_hourly(load_table(spark, SF_DIR, "events"))
    assert rows(got) == rows(expected)

    import os

    d = build_sessionize_stream_input(spark, sf_dir)
    staged = sorted(os.listdir(d))
    parts = [f for f in staged if f.startswith("00_events_")]
    sentinels = [f for f in staged if "sentinel" in f]
    # Directory sources are re-split into event-time quartile ranges
    # (4 staged files), NOT copied part-for-part: verbatim copies
    # interleave time, and batch 1's watermark would drop later
    # batches' events as late.
    assert len(parts) == 4 and len(sentinels) == 2
    # mtime order: every real part strictly before every sentinel.
    assert max(os.path.getmtime(os.path.join(d, f)) for f in parts) < min(
        os.path.getmtime(os.path.join(d, f)) for f in sentinels
    )
    # Staged files are event-time ordered and disjoint: max ts of each
    # range stays below min ts of the next.
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    ranges = []
    for f in parts:
        t = pq.read_table(os.path.join(d, f), columns=["ts"])["ts"]
        mm = pc.min_max(t).as_py()
        ranges.append((mm["min"], mm["max"]))
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2

    # And the full sentinel-closed stateful sessionizer over the
    # directory layout must equal the batch twin (the schema read in
    # read_sessionize_stream must glob the per-part staged names).
    from pyspark.sql import functions as F

    from panditya_spark.plans import QUERIES
    from panditya_spark.sources.loaders import normalize_event_ts
    from panditya_spark.streaming.windows import sessionize_batch

    got_sessions = QUERIES["stream_sessionize_microbatch"](spark, sf_dir)
    expected_sessions = sessionize_batch(
        normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet")),
        gap_minutes=30,
    ).select(
        F.col("user_id").cast("string").alias("user_id"),
        "n_events",
        "session_start",
        "session_end",
    )
    assert rows(got_sessions) == rows(expected_sessions)


def test_state_store_partitions_sizing(tmp_path):
    """Pure sizing contract: default floor at the local tiers, ~1
    partition per MB of source parquet, capped at 32; both file and
    directory layouts measured."""
    import os

    from panditya_spark.streaming.windows import state_store_partitions

    # No events table at all -> floor.
    assert state_store_partitions(str(tmp_path)) == 8
    # Single small file -> floor.
    f = tmp_path / "events.parquet"
    f.write_bytes(b"x" * (2 << 20))
    assert state_store_partitions(str(tmp_path)) == 8
    # Directory layout summing past the floor -> ~1/MB.
    os.remove(f)
    d = tmp_path / "events.parquet"
    d.mkdir()
    for i in range(17):
        (d / f"part-{i}.parquet").write_bytes(b"x" * (1 << 20))
    assert state_store_partitions(str(tmp_path)) == 17
    # Huge -> capped.
    (d / "big.parquet").write_bytes(b"x" * (64 << 20))
    assert state_store_partitions(str(tmp_path)) == 32


def test_session_window_state_vs_watermark(spark, tmp_path):
    """The parameterized native session window's sizing contract:
    tightening watermark_delay shrinks peak state (open sessions are
    evicted sooner) while the closed-session OUTPUT is unchanged.

    The sf0.001 events table is a single parquet file — one data
    micro-batch, so no watermark advances between real events and
    both delays would peak identically. Instead, stage a controlled
    6-batch event-time-ordered input (100 users x 1 event per hourly
    file = 600 singleton sessions, one file per micro-batch, plus a
    far-future closer): with a 2-minute delay each batch's watermark
    evicts the previous hour's closed sessions; with a 4-hour delay
    nothing evicts until the closer, so peak state = every session."""
    import os
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    from panditya_spark.streaming import windows as W

    d = tmp_path / "stream_in"
    d.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")
    now = _time.time()
    n_files, n_users = 6, 100
    for h in range(n_files):
        pd.DataFrame(
            {
                "user_id": [str(u) for u in range(n_users)],
                "ts": [base + pd.Timedelta(hours=h)] * n_users,
            }
        ).astype({"ts": "datetime64[us]"}).to_parquet(
            d / f"{h:02d}_events.parquet"
        )
        os.utime(d / f"{h:02d}_events.parquet", (now + h, now + h))
    pd.DataFrame(
        {"user_id": ["closer"], "ts": [base + pd.Timedelta(days=10)]}
    ).astype({"ts": "datetime64[us]"}).to_parquet(d / "99_closer.parquet")
    os.utime(d / "99_closer.parquet", (now + 99, now + 99))

    schema = spark.read.parquet(str(d / "00_events.parquet")).schema

    def run(delay, name):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        out = W.run_stream_to_memory(
            W.session_window_agg_stream(
                stream, gap_minutes=30, watermark_delay=delay
            ),
            name,
            mode="append",
        )
        peak = max(
            (
                op.get("numRowsTotal") or 0
                for p in W.LAST_PROGRESS.get(name, [])
                for op in (p.get("stateOperators") or [])
            ),
            default=0,
        )
        rows = sorted(
            map(tuple, out.filter(F.col("user_id") != "closer").collect())
        )
        return peak, rows

    peak_loose, rows_loose = run("4 hours", "swin_state_loose")
    peak_tight, rows_tight = run("2 minutes", "swin_state_tight")
    assert rows_tight == rows_loose
    assert len(rows_tight) == n_files * n_users
    # Loose: every session is still open when the closer arrives.
    assert peak_loose >= n_files * n_users
    # Tight: the store only ever holds the sessions the watermark has
    # not yet reached — a strict fraction of the total.
    assert peak_tight < peak_loose, (peak_tight, peak_loose)
    assert peak_tight <= 3 * n_users, peak_tight


def test_events_size_scan_recursive_and_shared(tmp_path):
    """The shared volume scan behind partition sizing AND the timeout
    budget walks nested layouts (date-partitioned parquet dirs) — a
    top-level listdir would count zero bytes here and re-create the
    sf10 timeout under-budgeting."""
    from panditya_spark.streaming.windows import (
        _events_size_bytes,
        stream_timeout_sec,
    )

    d = tmp_path / "events.parquet" / "dt=2024-01-01"
    d.mkdir(parents=True)
    (d / "part-0.parquet").write_bytes(b"x" * (5 << 20))
    assert _events_size_bytes(str(tmp_path)) == 5 << 20
    assert stream_timeout_sec(str(tmp_path), floor=180) == 180 + 15


def test_append_mode_streams_handle_directory_table_layout(spark, tmp_path):
    """The two append-mode read_events_stream consumers whose
    watermarks DROP late rows — dropDuplicatesWithinWatermark
    (stream_dedup_microbatch) and the stream-stream attribution join —
    must survive a directory-layout events table whose part files
    interleave event time. Without the shared event-time re-split
    staging, batch 1 carries a near-max timestamp and most later-batch
    rows are silently discarded as late: rows go MISSING, which the
    complete-mode tumbling test cannot catch."""
    from pyspark.sql import functions as F

    from panditya_spark.plans import QUERIES
    from panditya_spark.sources.loaders import normalize_event_ts

    sf_dir = str(tmp_path)
    (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .repartition(3)
        .write.parquet(f"{sf_dir}/events.parquet")
    )
    ev = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))

    got_dedup = QUERIES["stream_dedup_microbatch"](spark, sf_dir)
    expected_dedup = ev.select("user_id", "event_type").distinct()
    assert rows(got_dedup) == rows(expected_dedup)

    got_attr = QUERIES["stream_attribution_join"](spark, sf_dir)
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    expected_attr = v.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 60 MINUTES")),
    ).select("user_id", "view_ts", "purchase_ts", "purchase_value")
    assert rows(got_attr) == rows(expected_attr)
