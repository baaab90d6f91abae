"""Mergeable sketches, relationally: HyperLogLog distinct + count-min counts.

At 100 TB, distinct counts and frequency tables are served from sketches:
bounded state, one pass, mergeable across partitions/days (the partial
states union + re-aggregate exactly like operators/incremental.py's gold
state). Spark's built-ins (`approx_count_distinct` = HLL++,
`count_min_sketch`) are JVM-internal and NOT reproducible against another
engine, so this module implements both sketches as plain relational
algebra over engine-portable md5 hashing (operators/dedup.py's hex-parse
idiom): every register/bucket value is exact integer arithmetic, identical
in Spark and DuckDB — the APPROXIMATE structures are therefore
HASH-EXACTLY oracle-checked, the same trick as corpus.py's Bloom
decontamination.

HyperLogLog (Flajolet et al. 2007, the standard practical variant):
  * h = first 12 md5 nibbles → 48-bit integer (exact in BIGINT/double)
  * register j = h mod m (m = 2^p, p = 8); w = h div m (40 bits)
  * rho(w) = leading-zero count within 40 bits + 1 = 41 − bitlength(w)
    (bitlength via length(bin(w)) — the plog2 idiom, identical engines)
  * state: per (group, register) max rho — a commutative monoid (max), so
    sketch union IS relational groupBy-max: states from any partitioning
    merge to the identical sketch (pinned in tests)
  * estimate: alpha·m²/Σ2^−M_j with the small-range linear-counting
    correction; 2^−M_j sums are computed as Σ2^(48−M_j) in exact BIGINT
    (≤ 2^56), and the one log the correction needs is the portable plog2
    — no engine transcendentals anywhere.

Count-min (Cormode & Muthukrishnan 2005):
  * d = 4 rows × w = 512 buckets; row hashes are the MinHash affine
    family over the word's md5 (dedup.py:162-185)
  * counts are increments of the EXACT per-word totals (CMS over
    aggregated increments ≡ CMS over the stream, and the build is then
    vocab-sized, not corpus-sized)
  * point estimate = min over rows of the bucket totals; CMS guarantees
    estimate ≥ truth — pinned in tests and visible as the `overcount`
    column.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.lifecycle import materialize

from ..functions.numerics import plog2_sql
from .dedup import _affine_sql, _hex_int_sql
from .textstats import WORDS_SQL, _words

# --- HyperLogLog ------------------------------------------------------------

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
_H_NIBBLES = 12  # 48 hash bits: 8 register bits + 40 rho bits
_RHO_BITS = 48 - HLL_P
_RHO_MAX = _RHO_BITS + 1
# alpha_m · m² · 2^48 folded to ONE double literal so both engines multiply
# the identical constant (alpha_256 = 0.7213/(1 + 1.079/256)).
_ALPHA_M2_POW = repr(0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M * float(1 << _RHO_BITS))
_LN2 = repr(math.log(2.0))


def _h48_sql(expr: str, duck: bool) -> str:
    """First 12 md5 nibbles of `expr` → exact 48-bit integer.

    Spark side parses the 12-digit prefix with ONE conv() (r12; same
    positional base-16 value as the per-nibble instr sum, 48 bits fits
    BIGINT exactly). DuckDB keeps the strpos sum — frozen oracle text."""
    if not duck:
        return f"CAST(conv(substr(md5({expr}), 1, {_H_NIBBLES}), 16, 10) AS BIGINT)"
    terms = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (_H_NIBBLES - 1 - i)}"
        for i in range(_H_NIBBLES)
    )
    return f"({terms})"


def _shl1_sql(n: str, duck: bool) -> str:
    """2^n as BIGINT (n ≤ 48 here — exact)."""
    if duck:
        return f"(CAST(1 AS BIGINT) << CAST({n} AS INTEGER))"
    return f"shiftleft(CAST(1 AS BIGINT), CAST({n} AS INT))"


def _rho_sql(key: str, duck: bool) -> tuple[str, str]:
    """(register, rho) SQL fragments for a string key expression."""
    h = _h48_sql(key, duck)
    reg = f"({h} % {HLL_M})"
    w = f"({h} DIV {HLL_M})" if not duck else f"({h} // {HLL_M})"
    rho = f"(CASE WHEN {w} = 0 THEN {_RHO_MAX} ELSE {_RHO_MAX} - length(bin({w})) END)"
    return reg, rho


def hll_state(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Sketch state: per (group, register) max rho. One shuffle keyed on
    (group, register) — never on the raw key, so a 10^9-distinct column
    costs the same shuffle as a 10-distinct one."""
    reg, rho = _rho_sql(f"CAST({key_col} AS STRING)", duck=False)
    return (
        df.select(F.col(group_col).alias("grp"), F.expr(reg).alias("register"), F.expr(rho).alias("rho"))
        .groupBy("grp", "register")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_merge(*states: DataFrame) -> DataFrame:
    """Sketch union = groupBy-max over the unioned states (commutative,
    associative, idempotent — the HLL merge law)."""
    from functools import reduce

    unioned = reduce(DataFrame.unionByName, states)
    return unioned.groupBy("grp", "register").agg(F.max("m_j").alias("m_j"))


def _estimate_cols(duck: bool) -> str:
    """Estimate SQL over per-group (s_present, n_present) partials."""
    pow48 = str(1 << _RHO_BITS)
    s = f"(s_present + ({HLL_M} - n_present) * {pow48})"
    v = f"({HLL_M} - n_present)"
    e_raw = f"({_ALPHA_M2_POW} / CAST({s} AS DOUBLE))"
    lc = f"({HLL_M}.0 * ({plog2_sql(str(HLL_M), duck)} - {plog2_sql(v, duck)}) * {_LN2})"
    return (
        f"CASE WHEN {e_raw} <= {2.5 * HLL_M!r} AND {v} > 0 THEN {lc} ELSE {e_raw} END"
    )


def hll_estimate(state: DataFrame) -> DataFrame:
    """(grp, n_est): cardinality estimate per group from the sketch state."""
    shl = _shl1_sql(f"{_RHO_BITS} - m_j", duck=False)
    partials = state.groupBy("grp").agg(
        F.expr(f"SUM({shl})").alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    return partials.select("grp", F.expr(_estimate_cols(duck=False)).alias("n_est"))


def hll_distinct(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(group, n_exact, n_est, rel_err): sketch estimate next to the exact
    distinct count — the error column is the operator's own audit."""
    est = hll_estimate(hll_state(df, group_col, key_col))
    exact = (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(F.countDistinct(key_col).alias("n_exact"))
    )
    return (
        exact.join(est, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_exact",
            "n_est",
            ((F.col("n_est") - F.col("n_exact").cast("double")) / F.col("n_exact").cast("double")).alias("rel_err"),
        )
    )


def hll_distinct_sql(source_sql: str, group_col: str, key_col: str) -> str:
    """DuckDB twin of :func:`hll_distinct` over `source_sql`."""
    reg, rho = _rho_sql(f"CAST({key_col} AS VARCHAR)", duck=True)
    shl = _shl1_sql(f"{_RHO_BITS} - m_j", duck=True)
    return f"""
  WITH src AS ({source_sql}),
  regs AS (
    SELECT {group_col} AS grp, {reg} AS register, MAX({rho}) AS m_j
    FROM src GROUP BY 1, 2),
  partials AS (
    SELECT grp, CAST(SUM({shl}) AS BIGINT) AS s_present, COUNT(*) AS n_present
    FROM regs GROUP BY grp),
  est AS (SELECT grp, {_estimate_cols(duck=True)} AS n_est FROM partials),
  exact AS (SELECT {group_col} AS grp, COUNT(DISTINCT {key_col}) AS n_exact
            FROM src GROUP BY 1)
  SELECT exact.grp AS {group_col}, CAST(n_exact AS BIGINT) AS n_exact, n_est,
         (n_est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_err
  FROM exact JOIN est ON exact.grp = est.grp"""


# --- Count-min sketch -------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 512  # buckets per row
CMS_TOPK = 20


def _cms_bucket_sql(seed: int, h: str) -> str:
    return f"({_affine_sql(seed, h)} % {CMS_W})"


def cms_top_terms(documents: DataFrame, k: int = CMS_TOPK) -> DataFrame:
    """(word, n_exact, n_cms, overcount) for the k most frequent corpus
    words: exact counts vs the count-min estimate (min over CMS_D rows).

    Build path: exact vocab first (one corpus shuffle — the same relation
    ts_vocab_topk already materializes), then the sketch is vocab-sized:
    each word fans out to CMS_D (row, bucket) increments of its exact
    total. Query path: candidates re-derive their buckets row-locally and
    equi-join the tiny (d×w)-row sketch."""
    words = documents.select(F.explode(_words()).alias("word"))
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    h = _hex_int_sql("md5(word)", duck=False)
    pairs = [
        e
        for s in range(CMS_D)
        for e in (f"{s} AS seed_{s}", f"{_cms_bucket_sql(s, h)} AS bucket_{s}")
    ]
    stack = ", ".join(f"seed_{s}, bucket_{s}" for s in range(CMS_D))
    sketch = (
        vocab.selectExpr("word", "cnt", *pairs)
        .selectExpr("cnt", f"stack({CMS_D}, {stack}) AS (seed, bucket)")
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("total"))
    )
    top = vocab.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(k)
    cand = top.selectExpr("word", "cnt", *pairs).selectExpr(
        "word", "cnt", f"stack({CMS_D}, {stack}) AS (seed, bucket)"
    )
    est = (
        cand.join(sketch, ["seed", "bucket"])
        .groupBy("word")
        .agg(F.max("cnt").alias("n_exact"), F.min("total").alias("n_cms"))
    )
    return est.select(
        "word",
        "n_exact",
        "n_cms",
        (F.col("n_cms") - F.col("n_exact")).alias("overcount"),
    )


def cms_top_terms_sql(k: int = CMS_TOPK) -> str:
    h = _hex_int_sql("md5(word)", duck=True)
    bucket_rows = " UNION ALL ".join(
        f"SELECT word, cnt, {s} AS seed, {_cms_bucket_sql(s, h)} AS bucket FROM vocab"
        for s in range(CMS_D)
    )
    return f"""
  WITH words AS (SELECT unnest({WORDS_SQL}) AS word FROM documents),
  vocab AS (SELECT word, COUNT(*) AS cnt FROM words GROUP BY word),
  fanout AS ({bucket_rows}),
  sketch AS (SELECT seed, bucket, CAST(SUM(cnt) AS BIGINT) AS total
             FROM fanout GROUP BY seed, bucket),
  top AS (SELECT word, cnt FROM vocab ORDER BY cnt DESC, word ASC LIMIT {k}),
  cand AS (SELECT f.word, f.cnt, f.seed, f.bucket FROM fanout f
           JOIN top t ON f.word = t.word),
  est AS (SELECT c.word, MAX(c.cnt) AS n_exact, MIN(s.total) AS n_cms
          FROM cand c JOIN sketch s ON c.seed = s.seed AND c.bucket = s.bucket
          GROUP BY c.word)
  SELECT word, CAST(n_exact AS BIGINT) AS n_exact, CAST(n_cms AS BIGINT) AS n_cms,
         CAST(n_cms - n_exact AS BIGINT) AS overcount
  FROM est"""


# --- sketch re-aggregation (the reason sketches exist) ----------------------
#
# Distinct counts do NOT re-aggregate: you cannot sum daily uniques into a
# weekly unique. HLL states DO: weekly registers = max over the daily
# registers. hll_weekly_rollup materializes the daily sketch states and
# merges them up to weekly — the Spark side goes rows → daily states →
# weekly merge, while the DuckDB oracle computes the weekly sketch
# DIRECTLY from rows in one pass; hash-equality between the two is a
# differential proof of the merge law on real data (on top of the unit
# pin in tests/test_sketches.py). At 100 TB the daily states are the
# materialized artifact (a few KB per group-day) and every wider window
# (week, month, quarter) is a re-aggregation, never a re-scan.

ROLLUP_EPOCH = "1970-01-05"  # Monday-aligned week arithmetic, engine-neutral


def hll_weekly_rollup(events: DataFrame) -> DataFrame:
    """(event_type, week, n_exact, n_est, rel_err): weekly distinct users
    estimated by merging the 7 daily HLL states of each (type, week)."""
    epoch = F.lit(ROLLUP_EPOCH).cast("date")
    day = F.col("ts").cast("date")
    base = events.select(
        "event_type",
        F.floor(F.datediff(day, epoch) / 7).alias("week"),
        day.alias("day"),
        "user_id",
    )
    reg, rho = _rho_sql("CAST(user_id AS STRING)", duck=False)
    daily = (
        base.select(
            "event_type", "week", "day",
            F.expr(reg).alias("register"), F.expr(rho).alias("rho"),
        )
        .groupBy("event_type", "week", "day", "register")
        .agg(F.max("rho").alias("m_j"))
    )
    weekly = daily.groupBy("event_type", "week", "register").agg(
        F.max("m_j").alias("m_j")
    )
    shl = _shl1_sql(f"{_RHO_BITS} - m_j", duck=False)
    partials = weekly.groupBy("event_type", "week").agg(
        F.expr(f"SUM({shl})").alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    est = partials.select(
        "event_type", "week", F.expr(_estimate_cols(duck=False)).alias("n_est")
    )
    exact = base.groupBy("event_type", "week").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return exact.join(est, ["event_type", "week"]).select(
        "event_type",
        "week",
        "n_exact",
        "n_est",
        (
            (F.col("n_est") - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double")
        ).alias("rel_err"),
    )


def hll_weekly_rollup_sql() -> str:
    """Oracle: the weekly sketch computed DIRECTLY (no daily stage)."""
    reg, rho = _rho_sql("CAST(user_id AS VARCHAR)", duck=True)
    shl = _shl1_sql(f"{_RHO_BITS} - m_j", duck=True)
    return f"""
  WITH base AS (
    SELECT event_type,
           CAST(floor(date_diff('day', DATE '{ROLLUP_EPOCH}',
                                CAST(CAST(ts AS TIMESTAMP) AS DATE)) / 7.0) AS BIGINT)
             AS week,
           user_id
    FROM events),
  regs AS (
    SELECT event_type, week, {reg} AS register, MAX({rho}) AS m_j
    FROM base GROUP BY 1, 2, 3),
  partials AS (
    SELECT event_type, week, CAST(SUM({shl}) AS BIGINT) AS s_present,
           COUNT(*) AS n_present
    FROM regs GROUP BY 1, 2),
  est AS (SELECT event_type, week, {_estimate_cols(duck=True)} AS n_est FROM partials),
  exact AS (SELECT event_type, week, COUNT(DISTINCT user_id) AS n_exact
            FROM base GROUP BY 1, 2)
  SELECT exact.event_type, exact.week, CAST(n_exact AS BIGINT) AS n_exact, n_est,
         (n_est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_err
  FROM exact JOIN est ON exact.event_type = est.event_type AND exact.week = est.week"""


# --- K-minimum-values (theta) sketch: cohort overlap ------------------------
#
# HLL merges under UNION only — it cannot answer "how many users do the
# `purchase` and `error` cohorts SHARE?". The KMV / theta sketch (Beyer et
# al., "On synopses for distinct-value estimation under multiset
# operations", SIGMOD 2007; the Apache DataSketches theta sketch) keeps the
# K smallest hash values per set; the Kth smallest (theta) estimates
# density ((K-1)·H / theta distinct values over a hash domain of size H),
# and because the K-min-set of A ∪ B is computable from the two K-min-sets
# alone, intersections estimate via the Jaccard of retained hashes:
# |A∩B| ≈ (c/K)·|A∪B| with c = common retained hashes below the union
# theta. Everything here is exact integer arithmetic over the portable
# 48-bit md5 hash (_h48_sql) — the APPROXIMATE sketch is HASH-EXACTLY
# reproducible in both engines, the module's standing trick.
#
# Exact-mode edge: a cohort (or pair union) with fewer than K distinct
# hashes IS its own sketch — counts are exact and the estimator must not
# extrapolate. Both code paths are CASE'd on retained-count < K and both
# are exercised by the driver corpus (sf0.001 cohorts sit under K, sf0.01
# over it).
#
# Scale shape: the ONLY corpus-sized work is one distinct over
# (event_type, member-hash) — a map-combinable exchange;
# the per-cohort K-min selection is a rank window whose partial
# WindowGroupLimit caps every upstream partition at K rows before the
# exchange, so no cohort ever funnels its full distinct set into one task.
# Sketches are K·#cohorts rows; every pairwise stage is arithmetic on
# kilobytes, broadcast-joined.

KMV_K = 256
_KMV_H = 1 << 48  # hash domain size (48-bit md5 prefix)


def _kmv_sketches(events: DataFrame, k: int) -> DataFrame:
    """(event_type, h, r): the k smallest distinct member-hashes per type,
    r = 1-based rank in hash order. The set member is the USER-DAY
    (user_id || '@' || ISO date): "which active user-days saw this event
    type" — the granularity of DAU-overlap / retention questions, and
    ~30× the user cardinality, so the sketch-estimate branch (not just
    the small-set exact branch) is live even at driver scale."""
    member = (
        "CONCAT(CAST(user_id AS STRING), '@',"
        " CAST(CAST(ts AS DATE) AS STRING))"
    )
    h = _h48_sql(member, duck=False)
    hashed = (
        events.select("event_type", F.expr(h).alias("h"))
        .distinct()  # KMV is a SET of hashes: collapse 48-bit collisions
    )
    from pyspark.sql import Window

    # Single-phase rank: Spark's rank-limit pushdown (WindowGroupLimit,
    # SPARK-37099) inserts a PARTIAL limit before the exchange — each
    # upstream partition forwards at most k rows per type, so the per-type
    # window task receives ≤ k·#partitions rows, never the full distinct
    # set. That is exactly what a hand-salted two-phase top-k would buy
    # (similarity.py:42), minus one exchange+sort; verified in the
    # executed plan (WindowGroupLimit Partial/Final pair).
    w = Window.partitionBy("event_type").orderBy("h")
    return hashed.withColumn("r", F.row_number().over(w)).where(F.col("r") <= k)


def kmv_cohort_overlap(events: DataFrame, k: int = KMV_K) -> DataFrame:
    """Pairwise cohort overlap between event-type USER-DAY sets, from KMV
    sketches only: per ordered pair (type_a < type_b) the estimated
    distinct user-days of each side, of the union, the retained-common count,
    Jaccard in exact ppm of the retained set, and the intersection
    estimate. All integer arithmetic; 128-bit staging where products can
    pass 2^63 (c·est_union ≤ K·(K-1)·H ≈ 1.8e19)."""
    sk = materialize(_kmv_sketches(events, k))  # K·#types rows; reused 4×
    per_type = sk.groupBy("event_type").agg(
        F.max("r").alias("n_k"), F.max("h").alias("theta")
    )
    est_t = (
        f"CASE WHEN n_k < {k} THEN n_k"
        f" ELSE CAST({k - 1} AS BIGINT) * {_KMV_H} DIV theta END"
    )
    summary = per_type.select(
        "event_type", F.expr(est_t).alias("est")
    )
    types = sk.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("ta"))
        .join(types.select(F.col("event_type").alias("tb")), F.col("ta") < F.col("tb"))
    )
    side_a = sk.join(
        F.broadcast(pairs), sk["event_type"] == F.col("ta")
    ).select("ta", "tb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    side_b = sk.join(
        F.broadcast(pairs), sk["event_type"] == F.col("tb")
    ).select("ta", "tb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    from pyspark.sql import Window

    wu = Window.partitionBy("ta", "tb").orderBy("h")
    union_k = (
        side_a.unionByName(side_b)
        .groupBy("ta", "tb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .withColumn("r", F.row_number().over(wu))
        .where(F.col("r") <= k)
    )
    per_pair = union_k.groupBy("ta", "tb").agg(
        F.max("r").alias("l_u"),
        F.max("h").alias("theta_u"),
        F.sum(F.expr("CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("c"),
    )
    est_union = (
        f"CASE WHEN l_u < {k} THEN CAST(l_u AS BIGINT)"
        f" ELSE CAST({k - 1} AS BIGINT) * {_KMV_H} DIV theta_u END"
    )
    denom = f"CASE WHEN l_u < {k} THEN CAST(l_u AS BIGINT) ELSE CAST({k} AS BIGINT) END"
    return (
        per_pair.select(
            "ta",
            "tb",
            F.expr(est_union).alias("est_union"),
            "c",
            F.expr(f"CAST(1000000 * c DIV ({denom}) AS BIGINT)").alias("jaccard_ppm"),
            F.expr(
                f"CAST(CAST(c AS DECIMAL(38,0)) * ({est_union})"
                f" DIV ({denom}) AS BIGINT)"
            ).alias("est_intersection"),
        )
        .join(F.broadcast(summary.select(F.col("event_type").alias("ta"),
                                         F.col("est").alias("est_a"))), "ta")
        .join(F.broadcast(summary.select(F.col("event_type").alias("tb"),
                                         F.col("est").alias("est_b"))), "tb")
        .select(
            F.col("ta").alias("type_a"), F.col("tb").alias("type_b"),
            "est_a", "est_b", "est_union", F.col("c").alias("n_common"),
            "jaccard_ppm", "est_intersection",
        )
        .orderBy("type_a", "type_b")
    )


def kmv_cohort_overlap_sql(k: int = KMV_K) -> str:
    """DuckDB twin of :func:`kmv_cohort_overlap` (single-phase rank — the
    two-phase Spark selection is bit-identical by total order on h)."""
    h = _h48_sql(
        "CONCAT(CAST(user_id AS VARCHAR), '@',"
        " CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS VARCHAR))",
        duck=True,
    )
    est_t = (
        f"CASE WHEN n_k < {k} THEN n_k"
        f" ELSE CAST({k - 1} AS BIGINT) * {_KMV_H} // theta END"
    )
    est_union = (
        f"CASE WHEN l_u < {k} THEN CAST(l_u AS BIGINT)"
        f" ELSE CAST({k - 1} AS BIGINT) * {_KMV_H} // theta_u END"
    )
    denom = f"CASE WHEN l_u < {k} THEN CAST(l_u AS BIGINT) ELSE CAST({k} AS BIGINT) END"
    return f"""
  WITH hashed AS (
    SELECT DISTINCT event_type, {h} AS h FROM events),
  sk AS (
    SELECT event_type, h,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
                AS BIGINT) AS r
    FROM hashed QUALIFY r <= {k}),
  summary AS (
    SELECT event_type, {est_t} AS est
    FROM (SELECT event_type, MAX(r) AS n_k, MAX(h) AS theta
          FROM sk GROUP BY event_type)),
  pairs AS (
    SELECT a.event_type AS ta, b.event_type AS tb
    FROM (SELECT DISTINCT event_type FROM sk) a
    JOIN (SELECT DISTINCT event_type FROM sk) b ON a.event_type < b.event_type),
  tagged AS (
    SELECT p.ta, p.tb, s.h, 1 AS in_a, 0 AS in_b
    FROM sk s JOIN pairs p ON s.event_type = p.ta
    UNION ALL
    SELECT p.ta, p.tb, s.h, 0, 1
    FROM sk s JOIN pairs p ON s.event_type = p.tb),
  union_k AS (
    SELECT ta, tb, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b,
           CAST(row_number() OVER (PARTITION BY ta, tb ORDER BY h)
                AS BIGINT) AS r
    FROM tagged GROUP BY ta, tb, h QUALIFY r <= {k}),
  per_pair AS (
    SELECT ta, tb, MAX(r) AS l_u, MAX(h) AS theta_u,
           CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS c
    FROM union_k GROUP BY ta, tb)
SELECT ta AS type_a, tb AS type_b,
       sa.est AS est_a, sb.est AS est_b,
       {est_union} AS est_union, c AS n_common,
       CAST(1000000 * c // ({denom}) AS BIGINT) AS jaccard_ppm,
       CAST(CAST(c AS HUGEINT) * ({est_union}) // ({denom}) AS BIGINT)
         AS est_intersection
FROM per_pair
JOIN summary sa ON sa.event_type = ta
JOIN summary sb ON sb.event_type = tb
ORDER BY type_a, type_b"""
