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


def test_zorder_layout_prunes_on_both_keys(spark, tmp_path):
    """Factual pruning check from parquet footer stats, against the honest
    baseline: a single-key-sorted layout prunes its sort key but covers
    ~every file for the second key; the Z-order layout must (a) beat the
    naive layout on the second key and (b) still skip files on the first.
    Bands sit at the 20-30% quantiles — off the curve's top-bit boundary,
    where Morton locality is representative rather than worst-case."""
    import os

    import pyarrow.parquet as pq

    from azeroth_data_platform_spark.sources.writers import write_zordered

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    zout = str(tmp_path / "z")
    nout = str(tmp_path / "naive")
    n_files = 16
    write_zordered(ev, zout, "user_id", "value", n_files=n_files)
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(nout)
    )

    def overlap_fraction(path, col, lo, hi):
        files = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
        hit = 0
        for f in files:
            pf = pq.ParquetFile(f)
            idx = pf.schema_arrow.get_field_index(col)
            md = pf.metadata
            fmin = min(
                md.row_group(i).column(idx).statistics.min
                for i in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(i).column(idx).statistics.max
                for i in range(md.num_row_groups)
            )
            if fmax >= lo and fmin <= hi:
                hit += 1
        return hit / len(files)

    s = ev.agg(
        F.expr("percentile(user_id, 0.20)"),
        F.expr("percentile(user_id, 0.30)"),
        F.expr("percentile(value, 0.20)"),
        F.expr("percentile(value, 0.30)"),
    ).collect()[0]
    z_k1 = overlap_fraction(zout, "user_id", s[0], s[1])
    z_k2 = overlap_fraction(zout, "value", s[2], s[3])
    naive_k2 = overlap_fraction(nout, "value", s[2], s[3])
    # the naive layout cannot skip on the second key; z-order must
    assert naive_k2 >= 0.9
    assert z_k2 < naive_k2
    assert z_k2 <= 0.75 and z_k1 <= 0.75
    # and the layout is lossless
    assert spark.read.parquet(zout).count() == ev.count()


def test_persisted_lsh_index_bit_identical_and_exchange_free(
    spark, sf_dir, tmp_path_factory
):
    """persist_lsh_index -> read_lsh_index -> lsh_index_topk is
    bit-identical to the in-memory build_lsh_index path, and the
    candidate join reads the bucketed index scan with NO exchange on the
    index side (the build-once/query-many 100 TB story)."""
    from azeroth_data_platform_spark.operators import similarity

    wh = str(tmp_path_factory.mktemp("lsh_wh"))
    spark.sql("CREATE DATABASE IF NOT EXISTS btest")
    emb = adapters.read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < similarity.N_QUERIES)

    mem = similarity.lsh_index_topk(similarity.build_lsh_index(emb), queries)
    want = sorted(map(tuple, mem.collect()))

    similarity.persist_lsh_index(spark, emb, "btest.lsh_idx", path=f"{wh}/lsh_idx")
    idx = similarity.read_lsh_index(spark, "btest.lsh_idx")
    got_df = similarity.lsh_index_topk(idx, queries)
    got = sorted(map(tuple, got_df.collect()))
    assert got == want and len(got) > 0

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    # index side: bucketed file scan feeding the join without an exchange
    assert "Bucketed: true" in plan
    idx_frag = plan.split("Location")[0]
    assert "Exchange hashpartitioning(tbl" not in plan
