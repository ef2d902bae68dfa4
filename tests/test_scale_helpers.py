"""Scale-path helpers: salted joins/aggs equal their plain forms;
bucketed tables join without an exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_python_azure_spark.operators.skew import salted_aggregate, salted_join
from etl_python_azure_spark.sinks.files import write_bucketed


def _skewed_fact(spark):
    # one hot key (k=1) with 5k rows, 100 cold keys
    hot = spark.range(5000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(100).select(
        (F.col("id") + 2).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_join_equals_plain_join(spark):
    fact = _skewed_fact(spark)
    dim = spark.range(50).select(
        (F.col("id") + 1).alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    plain = fact.join(dim, "k").groupBy("k", "name").count()
    salted = salted_join(fact, dim, on="k", buckets=4).groupBy("k", "name").count()
    # right/full would emit unmatched dim rows once per salt replica
    import pytest

    for bad in ("right", "full", "outer", "right_outer", "full_outer"):
        with pytest.raises(ValueError):
            salted_join(fact, dim, on="k", how=bad)
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_aggregate_equals_plain(spark):
    fact = _skewed_fact(spark)
    plain = fact.groupBy("k").agg(
        F.sum("v").alias("s"), F.count("*").alias("n")
    )
    salted = salted_aggregate(
        fact,
        ["k"],
        partial_aggs=[F.sum("v").alias("ps"), F.count("*").alias("pn")],
        final_aggs=[F.sum("ps").alias("s"), F.sum("pn").alias("n")],
        buckets=4,
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bt_a", "k", 8, path=str(tmp_path / "bt_a"))
    write_bucketed(b, "bt_b", "k", 8, path=str(tmp_path / "bt_b"))
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    # date/key-partitioned fact joined to a FILTERED dim: the fact
    # scan must carry a dynamicpruning subquery in PartitionFilters,
    # i.e. only the dim-selected partitions are read — the mechanism
    # that turns a 100 TB fact scan into a handful of partitions
    fact = spark.range(10000).select(
        (F.col("id") % 20).alias("pk"), F.col("id").alias("v")
    )
    fact.write.partitionBy("pk").mode("overwrite").parquet(
        str(tmp_path / "fact")
    )
    dim = spark.range(20).select(
        F.col("id").alias("pk"), (F.col("id") % 5).alias("grp")
    )
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))
    f = spark.read.parquet(str(tmp_path / "fact"))
    dm = spark.read.parquet(str(tmp_path / "dim")).filter(
        F.col("grp") == 1
    )
    j = f.join(dm, "pk")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
    assert j.count() == 2000  # 4 of 20 partitions survive


def test_runtime_bloom_filter_prunes_probe_side(spark, tmp_path):
    # Spark's runtime bloom-filter join reduction: a selective filter
    # on the build side injects might_contain() into the probe scan
    # so non-matching rows drop BEFORE the shuffle — the runtime
    # semi-join reduction for fact-fact joins that can't broadcast.
    # (Default thresholds target real clusters: creation side small,
    # application side ≥ 10 GB; loosened here to observe the plan.)
    big = spark.range(100000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    big.write.mode("overwrite").parquet(str(tmp_path / "big"))
    sm = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    )
    sm.write.mode("overwrite").parquet(str(tmp_path / "small"))
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        bb = spark.read.parquet(str(tmp_path / "big"))
        ss = spark.read.parquet(str(tmp_path / "small")).filter(
            F.col("g") == 3
        )
        j = bb.join(ss, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert j.count() > 0
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    # AQE's runtime answer to the hot key that salting handles
    # statically: after execution, the skewed shuffle partition is
    # split (SortMergeJoin(skew=true) + AQEShuffleRead in the FINAL
    # adaptive plan). Thresholds lowered so local-mode volumes
    # qualify; inspect the SAME DataFrame that executed — a .count()
    # builds a different query execution and shows the initial plan.
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        hot = spark.range(200000).select(
            F.lit(1).alias("k"), F.col("id").alias("v")
        )
        cold = spark.range(200).select(
            (F.col("id") + 2).alias("k"), F.col("id").alias("v")
        )
        dim = spark.range(300).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("d")
        )
        j = hot.unionByName(cold).join(dim, "k")
        rows = j.collect()
        assert len(rows) == 200000 + 200
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ivf_assignment_is_aggregate_not_window(spark):
    """The rank-1 corpus assignment (Lloyd rounds, ivf_assign, the
    SemDeDup bucketing) must plan as a map-side-combinable max_by
    hash aggregate, never as a window that sorts all n x K
    cross-join rows with the embedding payload attached (the r06
    scale fix: 23.6 s -> 1.4 s at 20k x 160 cells)."""
    from etl_python_azure_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )

    em = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    asg = ivf_assign(em, ivf_centroids(em, num_centroids=4))
    plan = asg._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:2000]
    assert "max_by" in plan
    # the probe path (n_cells > 1) keeps the window formulation —
    # query-side rows are few and need all top-n cells
    from etl_python_azure_spark.operators.dedup import with_norm
    from etl_python_azure_spark.operators.similarity import _nearest_cells

    cn = with_norm(em.select("vec_id", "embedding"))
    probes = _nearest_cells(
        cn, ivf_centroids(em, num_centroids=4), "vec_id", "embedding", 2
    )
    assert probes.groupBy("vec_id").count().filter("count != 2").count() == 0
