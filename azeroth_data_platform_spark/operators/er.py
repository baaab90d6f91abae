"""Entity resolution: blocked fuzzy matching over the item catalog.

The reference ingests item names from an external API (reference
data_pipeline/dimensions.py) — the moment two sources feed the catalog,
near-identical names ("red widget" / "red gadget") need linking. The
classic ER recipe, expressed relationally:

  1. canonicalize + collapse to distinct entities (cheap pre-reduce: the
     match runs over DISTINCT names, never over raw rows);
  2. blocking — candidate pairs only within a block (here the head noun,
     i.e. the last name token), never the full cross product;
  3. pairwise scoring — exact Levenshtein edit distance on candidates
     only, thresholded.

Levenshtein is the unit-cost DP edit distance in both Spark
(`F.levenshtein`) and DuckDB (`levenshtein()`), so the score is an exact
integer and the match set is hash-checkable (pinned by the cross-engine
property test in tests/test_er_properties.py). ONE caveat that test also
pins: DuckDB's levenshtein counts UTF-8 BYTES while Spark's counts
CODEPOINTS — they agree only on ASCII (true of the catalog); a non-ASCII
source must be transliterated/normalized before matching.

Scale notes (100 TB): the distinct-entity reduce is the only full-data
pass (map-side combinable groupBy). Blocking makes candidate volume
Σ_blocks |block|² over the ENTITY set, not the row set — the knob is the
block key (compound keys cut hot blocks; a skewed block is AQE territory
exactly like any hot join key). The pair join is a plain equi-join on the
block key — never CartesianProduct (pinned in tests/test_plan_shapes.py::
test_fuzzy_match_blocked_equi_join_no_cross_product).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEV_MAX = 4  # max edit distance for a candidate pair to count as a match


def fuzzy_name_matches(dim: DataFrame, lev_max: int = LEV_MAX) -> DataFrame:
    """Matched (name_a, name_b) pairs within head-noun blocks, with edit
    distance and per-entity support counts (how many catalog rows carry
    each name — the evidence a resolution reviewer needs)."""
    ents = (
        dim.groupBy("name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("block", F.element_at(F.split("name", " "), -1))
    )
    a = ents.select(
        F.col("block"),
        F.col("name").alias("name_a"),
        F.col("n_rows").alias("n_rows_a"),
    )
    b = ents.select(
        F.col("block"),
        F.col("name").alias("name_b"),
        F.col("n_rows").alias("n_rows_b"),
    )
    return (
        a.join(b, "block")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("lev", F.levenshtein("name_a", "name_b"))
        .where(F.col("lev") <= lev_max)
        .select("block", "name_a", "name_b", "lev", "n_rows_a", "n_rows_b")
    )


def fuzzy_name_matches_sql(dim_sql: str, lev_max: int = LEV_MAX) -> str:
    """DuckDB twin of :func:`fuzzy_name_matches`."""
    return f"""WITH dim AS ({dim_sql}),
  ents AS (SELECT name, COUNT(*) AS n_rows,
                  string_split(name, ' ')[-1] AS block
           FROM dim GROUP BY name)
SELECT a.block, a.name AS name_a, b.name AS name_b,
       levenshtein(a.name, b.name) AS lev,
       a.n_rows AS n_rows_a, b.n_rows AS n_rows_b
FROM ents a JOIN ents b ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= {lev_max}"""
