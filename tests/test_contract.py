"""Driver-contract invariants (no Spark needed for most)."""

from __future__ import annotations


def test_registry_shape():
    from panditya_spark.plans import ORACLES, QUERIES

    assert len(QUERIES) >= 37
    assert set(ORACLES) <= set(QUERIES)
    # every query name is a lowercase identifier
    assert all(n == n.lower() and n.isidentifier() for n in QUERIES)


def test_entry_module_contract():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert callable(e.entry)
    assert set(os_) <= set(qs)
    assert all(isinstance(s, str) and "select" in s.lower() for s in os_.values())


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ["node", "dist"]
