"""Bucketed tables must co-locate joins: zero exchanges on the bucketed key."""

from __future__ import annotations

from pyspark.sql import functions as F

from azeroth_data_platform_spark.operators import adapters
from azeroth_data_platform_spark.sources.writers import write_bucketed_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    spark.sql("CREATE DATABASE IF NOT EXISTS btest")
    silver = adapters.silver_auctions(spark, sf_dir)
    dim = adapters.dim_items(spark, sf_dir)
    write_bucketed_table(spark, silver, "btest.silver_b", "item_id", path=f"{wh}/silver_b")
    write_bucketed_table(spark, dim, "btest.dim_b", "item_id", path=f"{wh}/dim_b")

    s = spark.table("btest.silver_b")
    d = spark.table("btest.dim_b")
    # disable broadcast so the join would normally need a full shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = s.join(d, "item_id").groupBy("item_class").agg(
            F.sum("quantity").alias("q")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # the join itself must not shuffle either side (bucketing co-locates);
    # the only exchange allowed is the final groupBy on item_class
    join_part = plan.split("SortMergeJoin")[-1]
    assert "SortMergeJoin" in plan
    assert join_part.count("Exchange hashpartitioning(item_id") == 0
    # correctness unchanged vs unbucketed
    unbucketed = (
        silver.join(dim, "item_id").groupBy("item_class").agg(F.sum("quantity").alias("q"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, unbucketed.collect()))
