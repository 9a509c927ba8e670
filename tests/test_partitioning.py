"""Partitioning-strategy tests: the RESULT must equal the plain join,
and the PLAN must have the promised shape (bucketed join: no Exchange;
salted join: hot key spread over n_salts partitions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from panditya_spark.operators.partitioning import (
    bucketed_join,
    bucketed_write,
    salted_join,
    top_skewed_keys,
)
from tests.conftest import rows


@pytest.fixture()
def skewed(spark):
    # one pathologically hot key + a long tail
    hot = spark.range(5000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    tail = spark.range(200).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    return hot.union(tail)


def test_salted_join_equals_plain_inner(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B"), ("missing", "Z")], ["k", "label"]
    )
    plain = skewed.join(dim, "k").select("k", "v", "label")
    salted = salted_join(skewed, dim, on="k", n_salts=8).select("k", "v", "label")
    assert rows(salted) == rows(plain)
    assert salted.count() == 5002


def test_salted_join_equals_plain_left(spark, skewed):
    dim = spark.createDataFrame([("hot", "H"), ("k1", "A")], ["k", "label"])
    plain = skewed.join(dim, "k", "left").select("k", "v", "label")
    salted = salted_join(skewed, dim, on="k", n_salts=4, how="left").select(
        "k", "v", "label"
    )
    assert rows(salted) == rows(plain)


def test_salted_join_spreads_hot_key(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], ["k", "label"])
    n_sub = (
        salted_join(skewed, dim, on="k", n_salts=8)
        .select(
            F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(8)).alias(
                "salt"
            )
        )
        .distinct()
        .count()
    )
    # the hot key's 5000 rows must land in >1 (in practice all 8) sub-keys
    assert n_sub > 1


def test_bucketed_join_no_exchange(spark, tmp_path):
    left = spark.range(1000).select(
        F.col("id").alias("key"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(500).select(
        F.col("id").alias("key"), (F.col("id") % 3).alias("b")
    )
    spark.sql("DROP TABLE IF EXISTS t_bl")
    spark.sql("DROP TABLE IF EXISTS t_br")
    bucketed_write(left, "t_bl", ["key"], n_buckets=4, path=str(tmp_path / "bl"))
    bucketed_write(right, "t_br", ["key"], n_buckets=4, path=str(tmp_path / "br"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (a broadcast would hide bucketing)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "t_bl", "t_br", ["key"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 500
        # result parity with the plain dataframe join
        assert rows(joined, "key", "a", "b") == rows(
            left.join(right, "key"), "key", "a", "b"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bl")
        spark.sql("DROP TABLE IF EXISTS t_br")


def test_top_skewed_keys(spark, skewed):
    top = top_skewed_keys(skewed, "k", top_n=3).collect()
    assert top[0]["k"] == "hot" and top[0]["cnt"] == 5000
    assert all(r["cnt"] == 1 for r in top[1:])


def test_scale_queries_registered(spark):
    from panditya_spark.plans import ORACLES, QUERIES

    for name in ("j_salted_join", "j_bucketed_join", "skew_key_profile"):
        assert name in QUERIES and name in ORACLES


def test_range_join(spark):
    """Bucketed range join: result equals the naive theta join, and the
    plan is an equi hash/merge join, NOT BroadcastNestedLoopJoin."""
    from panditya_spark.operators.relational import range_join

    pts = spark.range(0, 500).select(F.col("id").alias("p"))
    iv = spark.createDataFrame(
        [(1, 10, 40), (2, 35, 36), (3, 450, 600), (4, -20, -5)],
        ["iv_id", "s", "e"],
    )
    got = range_join(pts, iv, "p", "s", "e", bucket_width=16)
    naive = pts.join(iv, (F.col("p") >= F.col("s")) & (F.col("p") <= F.col("e")))
    assert rows(got, "iv_id", "p") == rows(naive, "iv_id", "p")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


# ------------------------------------------------------ z-order clustering
def test_zorder_layout_skips_files_on_both_dimensions(spark, tmp_path):
    """The data-skipping claim, measured: count files that contain
    matching rows (input_file_name) for a range predicate on each
    dimension. A linear sort on x localizes x-queries but smears
    y-queries across EVERY file; the z-layout localizes both."""
    import random

    from pyspark.sql import functions as F

    from panditya_spark.operators.partitioning import zorder_write

    rnd = random.Random(11)
    n = 20_000
    df = spark.createDataFrame(
        [(i, rnd.randrange(1024), rnd.randrange(1024)) for i in range(n)],
        ["id", "x", "y"],
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    zorder_write(df, "x", "y", zpath, bits=8, n_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def files_touched(path, pred):
        return (
            spark.read.parquet(path)
            .filter(pred)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    x_pred = (F.col("x") >= 256) & (F.col("x") < 512)    # 1/4 of x space
    y_pred = (F.col("y") >= 256) & (F.col("y") < 512)    # 1/4 of y space

    # Linear layout: x-queries prune hard, y-queries touch everything.
    assert files_touched(lpath, x_pred) <= 6
    assert files_touched(lpath, y_pred) == 16
    # Z-layout: BOTH dimensions bounded well below the full file set.
    zx, zy = files_touched(zpath, x_pred), files_touched(zpath, y_pred)
    assert zx <= 10 and zy <= 10, (zx, zy)
    # And the layout is value-invisible: same matching row set.
    a = sorted(r["id"] for r in spark.read.parquet(zpath).filter(y_pred).collect())
    b = sorted(r["id"] for r in df.filter(y_pred).collect())
    assert a == b


def test_morton_code_hand_values(spark):
    from pyspark.sql import functions as F

    from panditya_spark.operators.partitioning import morton_code

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (255, 255)], ["x", "y"]
    )
    got = [
        r["z"]
        for r in df.select(
            morton_code(F.col("x").cast("long"), F.col("y").cast("long")).alias("z")
        ).collect()
    ]
    # interleave(x even bits, y odd bits): (2,3)->x bits 10 at even
    # positions = 0b100, y bits 11 at odd = 0b1010 -> 0b1110 = 14.
    assert got == [0, 1, 2, 3, 14, 65535]


# ------------------------------------------------------- targeted delete
def test_targeted_delete_rewrites_only_affected_files(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from panditya_spark.sources.sinks import targeted_delete

    layout = str(tmp_path / "layout")
    df = spark.createDataFrame(
        [(uid, f"p{uid}-{i}") for uid in range(100) for i in range(20)],
        ["uid", "payload"],
    )
    df.repartitionByRange(10, "uid").write.parquet(layout)

    def snapshot():
        return {
            f: (os.path.getsize(os.path.join(layout, f)),
                os.path.getmtime(os.path.join(layout, f)))
            for f in os.listdir(layout)
            if f.endswith(".parquet")
        }

    before = snapshot()
    # Keys 3 and 7 live in the first range partition(s) only.
    doomed = spark.createDataFrame([(3,), (7,)], ["uid"])
    n_rw, n_total = targeted_delete(spark, layout, doomed, "uid")
    after = snapshot()

    assert n_total == len(before)
    assert 1 <= n_rw <= 2, n_rw  # clustered keys -> few files touched
    untouched = set(before) & set(after)
    # Untouched files are bit-for-bit the same artifacts.
    assert len(untouched) == n_total - n_rw
    for f in untouched:
        assert before[f] == after[f], f
    # The data is exactly the anti-join.
    back = spark.read.parquet(layout)
    assert back.filter(F.col("uid").isin(3, 7)).count() == 0
    assert back.count() == 100 * 20 - 2 * 20
    assert back.select("payload").distinct().count() == 98 * 20


def test_targeted_delete_repeated_keeps_prior_rewrites(spark, tmp_path):
    """Two successive deletes must not clobber each other's rewrite
    files: rewrite names are invocation-unique, so the rows kept by
    delete #1 survive delete #2 (the repeated-GDPR-erasure path)."""
    from pyspark.sql import functions as F

    from panditya_spark.sources.sinks import targeted_delete

    layout = str(tmp_path / "layout3")
    df = spark.createDataFrame(
        [(uid, f"p{uid}-{i}") for uid in range(100) for i in range(20)],
        ["uid", "payload"],
    )
    df.repartitionByRange(10, "uid").write.parquet(layout)

    targeted_delete(
        spark, layout, spark.createDataFrame([(3,)], ["uid"]), "uid"
    )
    # Second delete hits a DIFFERENT range partition (uid 97).
    targeted_delete(
        spark, layout, spark.createDataFrame([(97,)], ["uid"]), "uid"
    )
    back = spark.read.parquet(layout)
    assert back.filter(F.col("uid").isin(3, 97)).count() == 0
    # Rows kept by the first rewrite (e.g. uid 0-9 minus 3) still exist.
    assert back.count() == 100 * 20 - 2 * 20
    assert back.select("payload").distinct().count() == 98 * 20


def test_targeted_delete_noop_when_keys_absent(spark, tmp_path):
    import os

    from panditya_spark.sources.sinks import targeted_delete

    layout = str(tmp_path / "layout2")
    spark.createDataFrame([(1, "a"), (2, "b")], ["uid", "v"]).coalesce(
        1
    ).write.parquet(layout)
    before = sorted(os.listdir(layout))
    doomed = spark.createDataFrame([(999,)], ["uid"])
    n_rw, _ = targeted_delete(spark, layout, doomed, "uid")
    assert n_rw == 0
    assert sorted(os.listdir(layout)) == before


# ------------------------------------------------------------- ORC format
def test_orc_roundtrip_preserves_types_and_values(spark, tmp_path):
    from pyspark.sql import functions as F

    out = str(tmp_path / "orc")
    df = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, "b", -0.25, False), (3, None, None, None)],
        ["k", "s", "v", "flag"],
    )
    df.write.orc(out)
    back = spark.read.orc(out)
    assert back.schema == df.schema
    assert sorted(back.collect()) == sorted(df.collect())
    # Predicate pushdown reaches the ORC scan.
    plan = back.filter(F.col("k") > 1)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "k" in plan


# -------------------------------------------------------- quarantine read
def test_quarantine_read_routes_bad_lines(spark, tmp_path):
    from panditya_spark.sources.loaders import read_json_with_quarantine

    p = str(tmp_path / "in")
    lines = [
        '{"k": 1, "v": 1.5}',
        '{"k": 2, "v": ',          # truncated
        'not json at all',
        '{"k": 3, "v": -2.0}',
        '{"k": "wrongtype", "v": 1.0}',  # type mismatch -> corrupt
    ]
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    df.coalesce(1).write.text(p)
    good, bad = read_json_with_quarantine(spark, p, "k bigint, v double")
    g = sorted((r["k"], r["v"]) for r in good.collect())
    assert g == [(1, 1.5), (3, -2.0)]
    raws = sorted(r["raw_line"] for r in bad.collect())
    assert len(raws) == 3
    assert 'not json at all' in raws
    # The raw line is preserved verbatim for replay.
    assert '{"k": 2, "v": ' in raws


# ---------------------------------------------- shard routing bijection
def test_shard_repartition_offset_is_bijective(spark):
    """pipeline_training_shards keys each of its 8 shard ids to its own
    write task via repartition(8, shard_id + _SHARD_ROUTE_OFFSET): the
    offset is a searched constant making pmod(murmur3_42(shard_id +
    offset), 8) a bijection on {0..7} — one file per shard dir with NO
    range-sampling job. Importing the SHARED constant (ADVICE r16)
    means an offset/expression change in the pipeline is tested here
    automatically; the test pins it against hash/partitioner drift (a
    collision would silently serialize two shards into one task —
    degrading file layout, never row placement)."""
    from pyspark.sql import functions as F

    from panditya_spark.plans.data_pipeline_queries import _SHARD_ROUTE_OFFSET

    df = spark.range(8).select(F.col("id").cast("bigint").alias("shard_id"))
    pids = (
        df.repartition(
            8, F.col("shard_id") + F.lit(_SHARD_ROUTE_OFFSET).cast("bigint")
        )
        .select(F.spark_partition_id().alias("pid"))
        .collect()
    )
    assert sorted(r["pid"] for r in pids) == list(range(8))
