"""JDBC scans (S6).

The reference's CDC probe read is a 2-column projection pushed into
the SQL (`SELECT id, updated_at FROM Sercom_API_task`, `S:146–152`).
Spark's JDBC source does the same with ``query``/column pruning; the
wrapper standardizes partitioned reads for big tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_query(
    spark: SparkSession,
    url: str,
    query: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Projection-pushed JDBC read (S6).

    With *partition_column* + bounds, the scan is split into
    *num_partitions* range predicates executed in parallel — the
    scale path for probing large targets (the reference reads the
    whole probe table single-threaded into pandas).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
        .options(**(properties or {}))
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()
