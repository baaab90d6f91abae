"""Physical-layout planning: z-order (Morton) clustering report.

The reference serves point lookups by item and range scans by date from
one row-ordered Postgres table (reference main.py:31-79 filters on either
key); at 100 TB the same duality becomes a FILE-LAYOUT problem — a layout
sorted by date prunes nothing for an item filter and vice versa. Z-order
interleaves the bits of both keys so every file covers a small rectangle
of (item, day) space and min/max file statistics prune BOTH predicates —
the Delta/Iceberg `OPTIMIZE ZORDER BY (item_id, snapshot_date)` strategy,
expressed here as a pure-projection curve assignment plus the per-shard
clustering report a table optimizer reads to decide whether a rewrite
pays.

Everything is integer-exact: the Morton code is a fixed 16-bit-per-
dimension bit interleave (a deterministic projection — no ranking pass,
no sampling), shards are the top bits of the curve, and the report is
min/max/count per shard. The item_span/day_span columns ARE the evidence:
on z-ordered shards both spans are small rectangles; a date-sorted layout
would show full-width item spans in every shard.

Scale (100 TB): the curve value is a row-local expression (whole-stage
codegen, zero exchanges); the report is one map-combinable groupBy over
at most 2^(32-SHARD_SHIFT) shards. A production rewrite would
`repartitionByRange(z)` and write — the assignment computed here is
exactly that partitioner's key. For key domains wider than 16 bits,
production normalizes each dimension to 2^16 buckets with
approx-quantile range boundaries first (rank-based, scan-resident); the
fixed bit-mask variant here keeps the operator oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits kept per dimension (32-bit curve)
Z_SHARD_SHIFT = 16  # shard = top 16 curve bits -> <= 65536 shards
Z_EPOCH = "1992-01-01"  # day-index origin (first TPC-H ship date)


def morton_expr(a: str, b: str, bits: int = Z_BITS, duck: bool = False) -> str:
    """Bit-interleave SQL: bit i of `a` -> curve bit 2i+1, bit i of `b` ->
    curve bit 2i. Emitted as a sum of disjoint single-bit terms — pure
    integer arithmetic, identical values in both dialects (Spark spells
    shifts as functions, DuckDB as operators)."""
    terms = []
    for i in range(bits):
        if duck:
            terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
            terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
        else:
            terms.append(f"shiftleft(shiftright({a}, {i}) & 1, {2 * i + 1})")
            terms.append(f"shiftleft(shiftright({b}, {i}) & 1, {2 * i})")
    return "(" + " + ".join(terms) + ")"


def day16_expr(bits: int = Z_BITS) -> str:
    """Spark SQL expression for the date dimension of the curve: days
    since Z_EPOCH, valid ONLY on [Z_EPOCH, Z_EPOCH + 2^bits - 1 days]
    (1992-01-01 .. 2171-06-06 at 16 bits). A date before the epoch would
    two's-complement-wrap the & mask and a later one would alias onto an
    earlier curve cell, silently corrupting the clustering — so
    out-of-domain dates fail LOUDLY via raise_error instead of
    interleaving a wrapped value. In-domain the guard is an identity, so
    the DuckDB oracle twin (whose probe data is in-domain by
    construction) needs no counterpart."""
    mask = (1 << bits) - 1
    d = f"datediff(snapshot_date, DATE'{Z_EPOCH}')"
    return (
        f"CAST(CASE WHEN {d} BETWEEN 0 AND {mask} THEN {d} "
        f"ELSE raise_error(concat('z-order day16 domain violation: ', "
        f"CAST(snapshot_date AS STRING), "
        f"' outside [{Z_EPOCH}, {Z_EPOCH} + {mask} days]')) END AS BIGINT)"
    )


def zorder_layout(
    silver: DataFrame, bits: int = Z_BITS, shard_shift: int = Z_SHARD_SHIFT
) -> DataFrame:
    """Per-shard clustering report of the (item_id, snapshot_date) z-order
    layout: row volume, both key rectangles (lo/hi/span), and the curve
    range each shard owns. See module docstring for the 100 TB story.

    Key domains: item_id is masked to the low `bits` bits (documented
    fixed-mask caveat — the rank-normalized production variant is
    zorder_ranked); snapshot_date must lie in [Z_EPOCH, Z_EPOCH +
    2^bits - 1 days] and FAILS LOUDLY outside it (see day16_expr)."""
    mask = (1 << bits) - 1
    z = morton_expr("item16", "day16", bits)
    base = silver.select(
        "item_id",
        "snapshot_date",
        F.expr(f"CAST(item_id & {mask} AS BIGINT)").alias("item16"),
        F.expr(day16_expr(bits)).alias("day16"),
    ).withColumn("z", F.expr(z))
    return (
        base.withColumn("zorder_shard", F.expr(f"shiftright(z, {shard_shift})"))
        .groupBy("zorder_shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("item_id").alias("item_lo"),
            F.max("item_id").alias("item_hi"),
            (F.max("item_id") - F.min("item_id")).alias("item_span"),
            F.min("snapshot_date").alias("date_lo"),
            F.max("snapshot_date").alias("date_hi"),
            F.datediff(F.max("snapshot_date"), F.min("snapshot_date"))
            .cast("bigint")
            .alias("day_span"),
            F.min("z").alias("z_lo"),
            F.max("z").alias("z_hi"),
        )
        .orderBy("zorder_shard")
    )


def zorder_layout_sql(
    silver_sql_cte: str, bits: int = Z_BITS, shard_shift: int = Z_SHARD_SHIFT
) -> str:
    """DuckDB twin of :func:`zorder_layout` (expects `silver` CTE)."""
    mask = (1 << bits) - 1
    z = morton_expr("item16", "day16", bits, duck=True)
    return f"""{silver_sql_cte},
  keyed AS (SELECT item_id, snapshot_date,
                   CAST(item_id & {mask} AS BIGINT) AS item16,
                   CAST((snapshot_date - DATE '{Z_EPOCH}') & {mask} AS BIGINT)
                     AS day16
            FROM silver),
  curved AS (SELECT item_id, snapshot_date, {z} AS z FROM keyed)
SELECT (z >> {shard_shift}) AS zorder_shard,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(item_id) AS item_lo, MAX(item_id) AS item_hi,
       MAX(item_id) - MIN(item_id) AS item_span,
       MIN(snapshot_date) AS date_lo, MAX(snapshot_date) AS date_hi,
       CAST(MAX(snapshot_date) - MIN(snapshot_date) AS BIGINT) AS day_span,
       MIN(z) AS z_lo, MAX(z) AS z_hi
FROM curved GROUP BY 1 ORDER BY 1"""


# --- data-skipping effectiveness report ---------------------------------------

SKIP_ITEM_SAMPLE_MOD = 53  # deterministic probe sample: item_id % MOD == 1
LINEAR_DAYS_PER_SHARD = 7  # the date-partitioned ingestion layout: weekly files


def skipping_report(silver: DataFrame) -> DataFrame:
    """Quantifies what the z-order layout BUYS: for two candidate file
    layouts — `linear` (weekly date-partitioned files, the natural
    ingestion order) and `zorder` (top Morton-curve bits, as
    zorder_layout) — replay a probe workload of point-item lookups and
    week-range scans against the per-shard min/max statistics and report
    the exact fraction of shards each layout fails to prune. This is the
    Delta/Iceberg file-skipping computation run as a query: a shard must
    be scanned iff its [lo, hi] key rectangle intersects the predicate.

    Expected shape of the answer (and the reason z-order exists): under
    `linear`, every weekly file spans the full item range, so item-point
    probes scan ~100% of shards while week probes scan ~1/n_shards;
    `zorder` trades a small regression on week probes for a large win on
    item probes — both predicate families prune.

    Scale (100 TB): the base pass is one row-local projection + ONE
    map-combinable (layout, shard) aggregate (the two layouts ride one
    exchange via a stack generator); probes and shard stats are
    METADATA-sized (file count, not row count), so the intersect join is
    a broadcast nested-loop over thousands of rows — the same
    driver-side work a lakehouse planner does per query, here costed
    exactly and in parallel. Output is 4 rows, all integers exact:
    scan_ppm = 1e6·scanned_pairs DIV (n_probes·n_shards)."""
    mask = (1 << Z_BITS) - 1
    z = morton_expr("item16", "day16", Z_BITS)
    base = silver.select(
        "item_id",
        F.expr(f"CAST(datediff(snapshot_date, DATE'{Z_EPOCH}') AS BIGINT)").alias(
            "day_idx"
        ),
        F.expr(f"CAST(item_id & {mask} AS BIGINT)").alias("item16"),
        F.expr(day16_expr(Z_BITS)).alias("day16"),
    ).withColumn("z", F.expr(z))
    tagged = base.select(
        "item_id",
        "day_idx",
        F.expr(
            f"stack(2, 'linear', day_idx DIV {LINEAR_DAYS_PER_SHARD},"
            f" 'zorder', shiftright(z, {Z_SHARD_SHIFT})) AS (layout, shard)"
        ),
    )
    stats = tagged.groupBy("layout", "shard").agg(
        F.min("item_id").alias("item_lo"),
        F.max("item_id").alias("item_hi"),
        F.min("day_idx").alias("day_lo"),
        F.max("day_idx").alias("day_hi"),
    )
    item_probes = (
        base.select("item_id")
        .where(F.expr(f"item_id % {SKIP_ITEM_SAMPLE_MOD} = 1"))
        .distinct()
        .select(
            F.lit("item_point").alias("workload"),
            F.col("item_id").alias("lo"),
            F.col("item_id").alias("hi"),
            F.lit("item").alias("dim"),
        )
    )
    week_probes = (
        base.select(
            (F.col("day_idx") - F.col("day_idx") % LINEAR_DAYS_PER_SHARD).alias("lo")
        )
        .distinct()
        .select(
            F.lit("week_range").alias("workload"),
            "lo",
            (F.col("lo") + LINEAR_DAYS_PER_SHARD - 1).alias("hi"),
            F.lit("day").alias("dim"),
        )
    )
    probes = item_probes.unionByName(week_probes)
    hits = stats.join(
        F.broadcast(probes),
        F.expr(
            "CASE WHEN dim = 'item'"
            " THEN item_lo <= hi AND item_hi >= lo"
            " ELSE day_lo <= hi AND day_hi >= lo END"
        ),
    )
    shard_counts = stats.groupBy("layout").agg(F.count(F.lit(1)).alias("n_shards"))
    probe_counts = probes.groupBy("workload").agg(F.count(F.lit(1)).alias("n_probes"))
    return (
        hits.groupBy("layout", "workload")
        .agg(F.count(F.lit(1)).cast("bigint").alias("scanned_pairs"))
        .join(F.broadcast(shard_counts), "layout")
        .join(F.broadcast(probe_counts), "workload")
        .select(
            "layout",
            "workload",
            F.col("n_probes").cast("bigint").alias("n_probes"),
            F.col("n_shards").cast("bigint").alias("n_shards"),
            "scanned_pairs",
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * scanned_pairs"
                " DIV (n_probes * n_shards) AS BIGINT)"
            ).alias("scan_ppm"),
        )
        .orderBy("layout", "workload")
    )


def skipping_report_sql(silver_sql_cte: str) -> str:
    """DuckDB twin of :func:`skipping_report` (expects `silver` CTE)."""
    mask = (1 << Z_BITS) - 1
    z = morton_expr("item16", "day16", Z_BITS, duck=True)
    return f"""{silver_sql_cte},
  base AS (SELECT item_id,
                  CAST(snapshot_date - DATE '{Z_EPOCH}' AS BIGINT) AS day_idx,
                  CAST(item_id & {mask} AS BIGINT) AS item16,
                  CAST((snapshot_date - DATE '{Z_EPOCH}') & {mask} AS BIGINT)
                    AS day16
           FROM silver),
  curved AS (SELECT item_id, day_idx, {z} AS z FROM base),
  tagged AS (
    SELECT item_id, day_idx, 'linear' AS layout,
           day_idx // {LINEAR_DAYS_PER_SHARD} AS shard FROM curved
    UNION ALL
    SELECT item_id, day_idx, 'zorder' AS layout,
           (z >> {Z_SHARD_SHIFT}) AS shard FROM curved),
  stats AS (SELECT layout, shard,
                   MIN(item_id) AS item_lo, MAX(item_id) AS item_hi,
                   MIN(day_idx) AS day_lo, MAX(day_idx) AS day_hi
            FROM tagged GROUP BY layout, shard),
  item_probes AS (
    SELECT DISTINCT 'item_point' AS workload, item_id AS lo, item_id AS hi,
           'item' AS dim
    FROM base WHERE item_id % {SKIP_ITEM_SAMPLE_MOD} = 1),
  week_probes AS (
    SELECT DISTINCT 'week_range' AS workload,
           day_idx - day_idx % {LINEAR_DAYS_PER_SHARD} AS lo,
           day_idx - day_idx % {LINEAR_DAYS_PER_SHARD}
             + {LINEAR_DAYS_PER_SHARD - 1} AS hi,
           'day' AS dim
    FROM base),
  probes AS (SELECT * FROM item_probes UNION ALL SELECT * FROM week_probes),
  hits AS (
    SELECT s.layout, p.workload
    FROM stats s JOIN probes p
      ON CASE WHEN p.dim = 'item'
              THEN s.item_lo <= p.hi AND s.item_hi >= p.lo
              ELSE s.day_lo <= p.hi AND s.day_hi >= p.lo END),
  shard_counts AS (SELECT layout, COUNT(*) AS n_shards FROM stats GROUP BY layout),
  probe_counts AS (SELECT workload, COUNT(*) AS n_probes FROM probes GROUP BY workload)
SELECT h.layout, h.workload,
       CAST(pc.n_probes AS BIGINT) AS n_probes,
       CAST(sc.n_shards AS BIGINT) AS n_shards,
       CAST(COUNT(*) AS BIGINT) AS scanned_pairs,
       CAST(CAST(1000000 AS HUGEINT) * COUNT(*)
            // (pc.n_probes * sc.n_shards) AS BIGINT) AS scan_ppm
FROM hits h
JOIN shard_counts sc ON h.layout = sc.layout
JOIN probe_counts pc ON h.workload = pc.workload
GROUP BY h.layout, h.workload, pc.n_probes, sc.n_shards
ORDER BY h.layout, h.workload"""


# --- rank-normalized z-order (the production variant) -------------------------

Z_RANK_BITS = 8  # 2^8 rank buckets per dimension -> 16-bit curve
Z_RANK_SHARD_SHIFT = 8  # shard = top 8 curve bits


def zorder_ranked(
    silver: DataFrame, bits: int = Z_RANK_BITS, shard_shift: int = Z_RANK_SHARD_SHIFT
) -> DataFrame:
    """The PRODUCTION z-order: each dimension is rank-normalized to 2^bits
    buckets over its DISTINCT values before interleaving, so the curve
    stays balanced whatever the key distribution — the fixed bit-mask
    variant (zorder_layout) keels over when keys are clustered (all
    items in one 65536-range → every row in one shard), which is exactly
    the regime a real table lives in after a few years of monotonically
    growing ids.

    Normalization is exact ntile over the distinct-value domain (both
    engines define ntile identically: floor-balanced buckets in rank
    order). The rank dims are VALUE-DOMAIN-sized (distinct items,
    distinct days), built once and broadcast back onto the fact rows —
    at 100 TB you would swap the exact ntile for approx-quantile range
    boundaries computed on a sample (the documented caveat in
    zorder_layout's docstring, here made concrete); everything
    downstream (interleave, shard, report) is unchanged.

    Output is the same per-shard clustering report as zorder_layout, so
    the two variants are directly comparable."""
    n_buckets = 1 << bits
    from pyspark.sql import Window

    item_rank = (
        silver.select("item_id")
        .distinct()
        .withColumn(
            "item_b",
            (F.ntile(n_buckets).over(Window.orderBy("item_id")) - 1).cast("bigint"),
        )
    )
    day_rank = (
        silver.select("snapshot_date")
        .distinct()
        .withColumn(
            "day_b",
            (F.ntile(n_buckets).over(Window.orderBy("snapshot_date")) - 1).cast(
                "bigint"
            ),
        )
    )
    z = morton_expr("item_b", "day_b", bits)
    base = (
        silver.select("item_id", "snapshot_date")
        .join(F.broadcast(item_rank), "item_id")
        .join(F.broadcast(day_rank), "snapshot_date")
        .withColumn("z", F.expr(z))
    )
    return (
        base.withColumn("zorder_shard", F.expr(f"shiftright(z, {shard_shift})"))
        .groupBy("zorder_shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("item_id").alias("item_lo"),
            F.max("item_id").alias("item_hi"),
            (F.max("item_id") - F.min("item_id")).alias("item_span"),
            F.min("snapshot_date").alias("date_lo"),
            F.max("snapshot_date").alias("date_hi"),
            F.datediff(F.max("snapshot_date"), F.min("snapshot_date"))
            .cast("bigint")
            .alias("day_span"),
            F.min("z").alias("z_lo"),
            F.max("z").alias("z_hi"),
        )
        .orderBy("zorder_shard")
    )


def zorder_ranked_sql(
    silver_sql_cte: str,
    bits: int = Z_RANK_BITS,
    shard_shift: int = Z_RANK_SHARD_SHIFT,
) -> str:
    """DuckDB twin of :func:`zorder_ranked` (expects `silver` CTE)."""
    n_buckets = 1 << bits
    z = morton_expr("item_b", "day_b", bits, duck=True)
    return f"""{silver_sql_cte},
  item_rank AS (
    SELECT item_id,
           CAST(ntile({n_buckets}) OVER (ORDER BY item_id) - 1 AS BIGINT)
             AS item_b
    FROM (SELECT DISTINCT item_id FROM silver)),
  day_rank AS (
    SELECT snapshot_date,
           CAST(ntile({n_buckets}) OVER (ORDER BY snapshot_date) - 1 AS BIGINT)
             AS day_b
    FROM (SELECT DISTINCT snapshot_date FROM silver)),
  base AS (
    SELECT s.item_id, s.snapshot_date, {z} AS z
    FROM silver s
    JOIN item_rank USING (item_id)
    JOIN day_rank USING (snapshot_date))
SELECT (z >> {shard_shift}) AS zorder_shard,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(item_id) AS item_lo, MAX(item_id) AS item_hi,
       MAX(item_id) - MIN(item_id) AS item_span,
       MIN(snapshot_date) AS date_lo, MAX(snapshot_date) AS date_hi,
       CAST(MAX(snapshot_date) - MIN(snapshot_date) AS BIGINT) AS day_span,
       MIN(z) AS z_lo, MAX(z) AS z_hi
FROM base GROUP BY 1 ORDER BY 1"""


# --- compaction planning -------------------------------------------------------

COMPACT_TARGET_ROWS = 4096  # target rows per output file


def compaction_plan(
    silver: DataFrame, target_rows: int = COMPACT_TARGET_ROWS
) -> DataFrame:
    """Small-file compaction plan over the z-order shard stats: pack
    curve-adjacent shards into output files of ~`target_rows` rows by
    exclusive-prefix running total (out_file = prefix_rows DIV target —
    the same streaming pack as tp_pack_sequences, here over FILE
    METADATA). Curve adjacency is the point: merging shards that are
    neighbors ON THE CURVE preserves the clustering the z-order bought,
    so the compacted files keep their small (item, day) rectangles and
    the skipping_report numbers survive compaction.

    Output per planned file: shard range, shard count, row volume, curve
    range, and fill_ppm (1e6·n_rows DIV target — how full the file is;
    >1e6 means one oversized shard straddles, the standard streaming-pack
    semantics). The defining invariant Σ n_rows = total input rows is
    pinned in tests.

    Scale: the input is the shard-stats aggregate (file count, not row
    count); the single-partition prefix window over it is the same
    metadata-sized work a lakehouse OPTIMIZE planner does on the driver —
    at 1e6+ files, range-partition by a shard prefix and run the same
    plan per partition."""
    from pyspark.sql import Window

    stats = zorder_layout(silver)
    w = Window.orderBy("zorder_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    packed = stats.withColumn(
        "_prefix_rows", F.coalesce(F.sum("n_rows").over(w), F.lit(0)).cast("bigint")
    ).withColumn("out_file", F.expr(f"_prefix_rows DIV {target_rows}"))
    return (
        packed.groupBy("out_file")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.min("zorder_shard").alias("shard_lo"),
            F.max("zorder_shard").alias("shard_hi"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.min("z_lo").alias("z_lo"),
            F.max("z_hi").alias("z_hi"),
        )
        .select(
            "out_file",
            "n_shards",
            "shard_lo",
            "shard_hi",
            "n_rows",
            "z_lo",
            "z_hi",
            F.expr(
                f"CAST(CAST(1000000 AS DECIMAL(38,0)) * n_rows"
                f" DIV {target_rows} AS BIGINT)"
            ).alias("fill_ppm"),
        )
        .orderBy("out_file")
    )


def compaction_plan_sql(
    silver_sql_cte: str, target_rows: int = COMPACT_TARGET_ROWS
) -> str:
    """DuckDB twin of :func:`compaction_plan` (expects `silver` CTE)."""
    inner = zorder_layout_sql(silver_sql_cte)
    return f"""WITH stats AS ({inner}),
  packed AS (
    SELECT *, CAST(COALESCE(SUM(n_rows) OVER (ORDER BY zorder_shard
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {target_rows} AS BIGINT) AS out_file
    FROM stats)
SELECT out_file,
       CAST(COUNT(*) AS BIGINT) AS n_shards,
       MIN(zorder_shard) AS shard_lo, MAX(zorder_shard) AS shard_hi,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       MIN(z_lo) AS z_lo, MAX(z_hi) AS z_hi,
       CAST(CAST(1000000 AS HUGEINT) * SUM(n_rows) // {target_rows} AS BIGINT)
         AS fill_ppm
FROM packed GROUP BY out_file ORDER BY out_file"""
