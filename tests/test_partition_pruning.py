"""Scale posture proofs: date-partition pruning and parquet pushdown
are visible in the physical plan (what makes T3/K3 metadata-cheap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_python_azure_spark.session import load_tables
from etl_python_azure_spark.sinks.files import full_refresh


def test_date_partitioned_scan_prunes(spark, sf_dir, tmp_path):
    p = str(tmp_path / "li_parts")
    li = load_tables(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    full_refresh(li, p, partition_by=["ship_month"])

    one_month = spark.read.parquet(p).filter(F.col("ship_month") == "1995-06")
    plan = one_month._jdf.queryExecution().executedPlan().toString()
    # partition filter present, and only that partition's rows scanned
    assert "ship_month" in plan.split("PartitionFilters")[1].split("]")[0]
    n = one_month.count()
    assert 0 < n < li.count()


def test_parquet_filter_pushdown_visible(spark, sf_dir):
    li = load_tables(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") < 5).select("l_orderkey", "l_quantity")
    plan = q._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "l_quantity" in pushed
    # column pruning: only the two needed columns in ReadSchema
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema
