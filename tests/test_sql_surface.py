"""The SQL entry point (SURVEY §7: "SQL comes free"): every lake table
is a temp view, and spark.sql plans/executes against them with the
same optimizations the DataFrame API gets.
"""

from __future__ import annotations

from big_data_data_lake_spark import plans
from big_data_data_lake_spark.sources.catalog import TABLES, register_views

SF = "/root/testdata/sf0.001"


def test_all_tables_registered_and_queryable(spark):
    register_views(spark, SF)
    for t in TABLES:
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").collect()[0]["n"] > 0


def test_sql_join_agg_matches_dataframe_api(spark):
    register_views(spark, SF)
    sql = spark.sql(
        """
        SELECT p.p_brand AS brand,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
        ORDER BY brand
        """
    )
    from pyspark.sql import functions as F

    df = (
        spark.table("lineitem")
        .join(spark.table("part"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("brand")
    )
    assert [tuple(r) for r in sql.collect()] == [tuple(r) for r in df.collect()]
    # SQL goes through the same Catalyst physical planning: broadcast join
    assert plans.broadcast_join_count(sql) >= 1
