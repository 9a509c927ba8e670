"""SQL surface: the same tables and semantics through spark.sql.

Everything else in the engine declares plans with the DataFrame API;
this module exposes the equivalent ANSI-SQL entry point — temp views
over the testdata tables (event-time normalized exactly like
load_table) so users can run `spark.sql("SELECT ... FROM lineitem")`
and get identical plans: Catalyst compiles both surfaces to the same
logical operators, so pushdown/pruning/broadcast behavior is shared,
not reimplemented.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from panditya_spark.sources.loaders import TESTDATA_TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create/replace one temp view per testdata table. Views go
    through load_table, so events.ts arrives normalized to TIMESTAMP
    regardless of the file's physical shape."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
