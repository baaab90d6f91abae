"""Sinks beyond merge: bronze blob writes, partitioned gold writes, and
bucketed tables for shuffle-free joins (SURVEY.md §2.1 S3; §4 partitioning).

Bucketing is the 100 TB lever the medallion layout earns: write silver and
any co-joined table bucketed by the join key and every later equi-join or
groupBy on that key skips its exchange entirely. Local tests pin exactly
that plan property (tests/test_bucketing.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 16


def write_json_blob(payload: dict, root: str, key: str) -> str:
    """S3: the reference's bronze object write (minio_client.py:33-49) —
    one raw JSON document per day key, driver-side by design (the payload
    arrives via one HTTP response, not a distributed job)."""
    path = os.path.join(root, key)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(payload, f)
    return path


def write_partitioned(df: DataFrame, path: str, partition_col: str = "snapshot_date") -> None:
    """Date-partitioned parquet — partition pruning for every date-ranged
    read (the engine twin of the reference's date-keyed object paths)."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def prune_old_day_keys(root: str, cutoff_day: str) -> list[str]:
    """S10 (minio_client.py:51-67): drop bronze objects older than the
    retention window. The reference lists every object and checks
    LastModified; with day-keyed paths (`YYYY-MM-DD/...`) pruning is a
    directory-name comparison — O(#days), no listing of object contents,
    which is the only version that works on a 100 TB bronze prefix."""
    import shutil

    removed = []
    if not os.path.isdir(root):
        return removed
    for name in sorted(os.listdir(root)):
        full = os.path.join(root, name)
        if os.path.isdir(full) and len(name) == 10 and name < cutoff_day:
            shutil.rmtree(full)
            removed.append(name)
    return removed


def write_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_col: str | list[str] = "item_id",
    path: str | None = None,
    n_buckets: int = N_BUCKETS,
    sort_col: str | list[str] | None = None,
) -> None:
    """Persist as a Hive-style bucketed (+sorted) table: later equi-joins and
    aggregations on `bucket_col` between tables bucketed the same way run
    with zero exchanges. `bucket_col` may be a composite key (list);
    `sort_col` defaults to the bucket key and may extend it for
    deterministic in-file order. `path` overrides the warehouse location
    (the warehouse dir itself is a static conf)."""
    bcols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    scols = (
        bcols
        if sort_col is None
        else ([sort_col] if isinstance(sort_col, str) else list(sort_col))
    )
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bcols[0], *bcols[1:])
        .sortBy(scols[0], *scols[1:])
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_training_shards(packed: DataFrame, path: str) -> None:
    """Lay the packed corpus (operators/corpus.py::pack_sequences output)
    on disk as the trainer reads it: one directory per shard
    (`shard=N/...`), rows sorted by (pack_id, pack_offset) within each
    file so a sequential reader streams packs in order.

    `repartition("shard")` aligns the write tasks with the layout — one
    task per shard writes one file set, instead of every task writing a
    sliver of every shard (the small-files explosion at 1000 executors).
    sortWithinPartitions is a per-partition sort, no extra exchange."""
    (
        packed.repartition("shard")
        .sortWithinPartitions("shard", "pack_id", "pack_offset")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


TARGET_FILE_BYTES = 128 * 1024 * 1024  # ≈ one HDFS/parquet block per file


def compact_parquet(
    spark: SparkSession, path: str, target_bytes: int = TARGET_FILE_BYTES
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target_bytes) files via the staged atomic swap
    (merge._staged_rewrite — old data recoverable at every step).
    Returns the new file count.

    The 100 TB rationale: every incremental append (insert_if_absent,
    streaming sinks) adds a file per task; after N batches a reader pays
    N×tasks open/footer costs and the NameNode/listing pays the metadata.
    Periodic compaction is the standard fix (Delta OPTIMIZE's file-level
    half, minus the transaction log). Coalesce, not repartition: packing
    existing partitions needs no shuffle."""
    import math

    from .merge import _staged_rewrite

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path).coalesce(n_files)
    # No materialization needed: _staged_rewrite writes to a staging dir
    # before the old path is renamed aside, so the plan's own scan of
    # `path` reads intact files — one streaming pass (r13).
    _staged_rewrite(df, path)
    return n_files


def write_packed_corpus(packs: DataFrame, path: str) -> None:
    """Lay the MATERIALIZED packs (operators/corpus.py::pack_contents
    output — one row per (shard, pack_id) with the assembled sequence text)
    on disk the same way: one directory per shard, rows sorted by pack_id
    so the trainer streams ready-to-tokenize sequences in order. Same
    task-per-shard alignment rationale as write_training_shards."""
    (
        packs.repartition("shard")
        .sortWithinPartitions("shard", "pack_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def write_zordered(
    df: DataFrame, path: str, k1: str, k2: str, n_files: int = N_BUCKETS, bits: int = 16
) -> None:
    """Z-order (Morton-curve) file layout over two filter keys — the
    data-skipping lever table formats ship as `OPTIMIZE ... ZORDER BY`:
    interleave the bits of the two keys' rank positions and range-partition
    + sort the write on that curve value. Files then cover compact 2-D
    regions of (k1, k2), so parquet min/max stats prune MOST files for a
    point or range query on EITHER key — unlike a single-column sort,
    which only prunes on its leading key. `tests/test_bucketing.py` pins
    the pruning factually from file footer stats.

    Rank-space (percent_rank scaled to 2^bits) rather than raw values:
    Morton locality needs both axes uniformly spread; raw skewed keys
    collapse the curve onto few cells. The double window pass is the cost;
    at 100 TB this runs as the same one-shot layout job a Delta OPTIMIZE
    would be, and the ranks shuffle ONCE on each key (AQE-coalesced).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    scale = (1 << bits) - 1
    r1 = F.floor(
        F.percent_rank().over(Window.orderBy(F.col(k1))) * scale
    ).cast("long")
    r2 = F.floor(
        F.percent_rank().over(Window.orderBy(F.col(k2))) * scale
    ).cast("long")
    interleave = "+".join(
        f"(shiftleft(shiftright(_r1, {b}) & 1, {2 * b + 1})"
        f" + shiftleft(shiftright(_r2, {b}) & 1, {2 * b}))"
        for b in range(bits)
    )
    z = df.withColumn("_r1", r1).withColumn("_r2", r2).withColumn(
        "_z", F.expr(interleave)
    )
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_r1", "_r2", "_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def export_manifest(packs: DataFrame) -> DataFrame:
    """Delivery manifest for a packed training corpus: one row per shard
    with pack/token counts and an ORDER-INSENSITIVE content checksum —
    the artifact a data delivery hands the training team so ingestion can
    verify completeness without re-reading the corpus (and a re-export
    can be diffed shard-by-shard).

    Checksum design: per-row md5(content) parsed to an integer and SUMMED
    per shard (exact BIGINT within DECIMAL(38,0) headroom). Addition
    commutes, so the checksum is independent of row order, partitioning,
    and file layout — comparable across any two exports of the same data,
    which a concatenated/ordered digest is not. Collision behavior is the
    usual additive-checksum trade, fine for transport/completeness checks
    (the security-grade alternative is a Merkle tree over sorted row
    hashes — same relational shape plus a groupBy level).

    `packs`: pack_contents output — (shard, pack_id, pack_text,
    n_tokens_in_pack, …) with one row per pack."""
    from ..operators.dedup import _hex_int_sql

    h = _hex_int_sql("md5(pack_text)", duck=False)
    return (
        packs.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.sum("n_tokens_in_pack").cast("bigint").alias("total_tokens"),
            F.sum(F.expr(f"CAST({h} AS DECIMAL(38,0))")).cast("decimal(38,0)").cast("string").alias("content_checksum"),
        )
        .orderBy("shard")
    )
