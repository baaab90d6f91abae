"""Local differential harness mimicking the driver's correctness gate.

For each query in __spark_entry__.queries(): run the Spark implementation
and the DuckDB oracle on the same sf dir, then compare row count, column
names, and (order-insensitively) every value — exact equality, which is
stricter than any plausible driver hash.

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Bound the oracle's footprint: DuckDB's default memory_limit is 80% of
    # host RAM (~100 GiB here) with one thread per CPU — racing the Spark
    # JVM in the same process, that defaulted footprint produced transient
    # malloc failures ("Failed to allocate block ... bad allocation") on
    # queries whose true peak is <1 GiB. The parity oracles are tiny
    # (sf≤0.01); 8 GiB / 8 threads is >10× headroom and deterministic.
    # overridable for the sf1-scale sweeps (r11 verdict #4), where some
    # oracles legitimately need more than the sf0.01-sized default
    con.execute(
        f"SET memory_limit='{os.environ.get('PARITY_DUCK_MEM', '8GB')}'"
    )
    con.execute("SET threads=8")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            # dates / strings: stringify uniformly
            df[c] = s.astype(str)
        elif "datetime" in str(s.dtype):
            df[c] = s.astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is b:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    s, d = _norm(spark_df.copy()), _norm(duck_df.copy())
    for c in s.columns:
        # dtype-KIND parity (int vs float vs bool vs object): the driver's
        # value hash is width-insensitive (int32 == int64) but kind-sensitive
        # (3.0 != 3) — the round-2 tp_pack_sequences HUGEINT→float64 bug
        # passed here because values were compared stringified. Never again.
        sk, dk = s[c].dtype.kind, d[c].dtype.kind
        sk = "i" if sk == "u" else sk
        dk = "i" if dk == "u" else dk
        if sk != dk:
            problems.append(
                f"col {c}: dtype kind mismatch spark={s[c].dtype} duck={d[c].dtype}"
            )
            continue
        sv, dv = s[c].tolist(), d[c].tolist()
        bad = [i for i, (x, y) in enumerate(zip(sv, dv)) if not _values_equal(x, y)]
        if bad:
            i = bad[0]
            problems.append(
                f"col {c}: {len(bad)} mismatches, first at sorted-row {i}: "
                f"spark={sv[i]!r} duck={dv[i]!r}"
            )
    return problems


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--all"]
    use_all = "--all" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    import __spark_entry__ as entrymod
    from azeroth_data_platform_spark.session import get_spark

    spark = get_spark("parity")
    con = duck_connection(sf_dir)
    if use_all:  # include legacy twins consolidated out of the driver dict
        from azeroth_data_platform_spark import harness

        qs, oracles = harness.ALL_QUERIES, harness.ALL_ORACLES
    else:
        qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only): {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failed.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name}: {len(sdf)} rows")
    spark.stop()
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
