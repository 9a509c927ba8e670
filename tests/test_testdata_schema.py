"""Guard against silent driver-testdata re-materialization (VERDICT r2
item #3): the parquet physical type of events.ts has already changed
once (TIMESTAMP(NANOS) → TIMESTAMP_MICROS isAdjustedToUTC=0, which
Spark infers as TIMESTAMP_NTZ) and broke every watermark downstream.
These tests run the ACTUAL load boundary against the ACTUAL testdata
files at every sf tier, so the next shape change fails loudly here
instead of silently in the driver's correctness run."""

from __future__ import annotations

import os

import pytest

SF_DIRS = [
    f"/root/testdata/{d}"
    for d in ("sf0.001", "sf0.01", "sf0.1")
    if os.path.isdir(f"/root/testdata/{d}")
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_loads_as_timestamp(spark, sf_dir):
    from pyspark.sql.types import TimestampType

    from panditya_spark.sources.loaders import load_table

    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType), (
        f"{sf_dir}/events.parquet ts arrived as {ev.schema['ts'].dataType}; "
        "normalize_event_ts needs a new case for this physical shape"
    )
    # The instants themselves must be sane (loader bugs like a double
    # tz shift or ns/us mix-up would move everything out of epoch range).
    from pyspark.sql import functions as F

    bounds = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    assert bounds.lo.year >= 1990 and bounds.hi.year <= 2100


def test_events_stream_starts_on_real_files(spark):
    """read_events_stream must yield a watermarkable TimestampType ts on
    the actual driver files — withWatermark raises at plan time on NTZ,
    so constructing the watermarked plan IS the assertion."""
    from pyspark.sql.types import TimestampType

    from panditya_spark.streaming.windows import (
        read_events_stream,
        tumbling_counts_stream,
    )

    stream = read_events_stream(spark, SF_DIRS[0])
    assert stream.isStreaming
    assert isinstance(stream.schema["ts"].dataType, TimestampType)
    tumbling_counts_stream(stream)  # raises EVENT_TIME_IS_NOT_ON_TIMESTAMP on NTZ


@pytest.mark.parametrize("sf_dir", SF_DIRS[:1])
def test_all_tables_load(spark, sf_dir):
    """Every driver table loads and has at least one row at the smallest
    tier; catches file renames/removals in a re-materialization."""
    from panditya_spark.sources.loaders import TESTDATA_TABLES, load_table

    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        assert len(df.columns) > 0, name
        assert df.limit(1).count() == 1, f"{name} is empty"
