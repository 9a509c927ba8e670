"""Sketch aggregates: no cross-engine oracle exists for approximate
values, so accuracy is pinned HERE against the exact answers."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.01"


def test_sketch_aggregates_accuracy(spark):
    from pyspark.sql import functions as F

    from panditya_spark.plans import QUERIES
    from panditya_spark.sources.loaders import load_table

    got = {r["event_type"]: r for r in QUERIES["sketch_aggregates"](spark, SF_DIR).collect()}
    exact = {
        r["event_type"]: r
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, array(0.5, 0.95))").alias("pcts"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact) and len(got) >= 3
    for et, g in got.items():
        ex = exact[et]
        assert g["n_events"] == ex["n"]
        # HLL++ at rsd=0.02: allow 2x the nominal standard error
        assert abs(g["approx_users"] - ex["users"]) <= max(2, 0.04 * ex["users"])
        p50, p95 = g["value_p50_p95"]
        # percentile_approx returns a REAL element near the requested
        # rank; with accuracy=10000 and ~2k rows/group it is rank-exact,
        # but pin a small relative window to stay robust across scales.
        assert abs(p50 - ex["pcts"][0]) <= 0.05 * max(1.0, abs(ex["pcts"][0]))
        assert abs(p95 - ex["pcts"][1]) <= 0.05 * max(1.0, abs(ex["pcts"][1]))
