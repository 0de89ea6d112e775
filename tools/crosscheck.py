"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query on Spark AND its oracle_sql twin on DuckDB,
compare row count, column names, and order-insensitive values.

Usage: python tools/crosscheck.py [--retired] [sf_dir] [query ...]

``--retired`` also checks the queries retired from the driver's
50-entry grading window (see __spark_entry__._RETIRED).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(float)
                continue
            except (ValueError, TypeError):
                pass
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype in (np.float32,):
            df[c] = df[c].astype(float)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    """Strict replica of the driver gate: after column-name sort and
    row sort, values must be EXACTLY equal (the driver hashes the
    representation — atol-close is not good enough).  A result that is
    close-but-not-bitwise gets the distinct verdict 'CLOSE' so type
    mismatches are visible locally before the driver sees them."""
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"SCHEMA MISMATCH spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWCOUNT MISMATCH spark={len(spark_df)} duck={len(duck_df)}"
    raw_a, raw_b = spark_df.copy(), duck_df.copy()
    a, b = normalize(raw_a), normalize(raw_b)
    close_cols = []
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if a[c].dtype == float:
            exact = np.array_equal(av.astype(float), bv.astype(float), equal_nan=True)
            if exact:
                continue
            if np.allclose(av.astype(float), bv.astype(float), atol=1e-9, equal_nan=True):
                close_cols.append(c)
                continue
        else:
            if (av == bv).all():
                continue
        bad = next(i for i in range(len(av)) if not _eq(av[i], bv[i]))
        return f"VALUE MISMATCH col={c} row{bad}: spark={av[bad]!r} duck={bv[bad]!r}"
    if close_cols:
        return f"CLOSE (not bit-exact; driver hash would FAIL) cols={close_cols}"
    # physical-type check: decimal/object vs float mismatches hash
    # differently even when values compare equal above
    for c in sorted(raw_a.columns):
        ka, kb = raw_a[c].dtype.kind, raw_b[c].dtype.kind
        if ka != kb and {ka, kb} != {"i", "u"}:
            return f"DTYPE MISMATCH col={c}: spark={raw_a[c].dtype} duck={raw_b[c].dtype}"
    return "OK"


def _eq(x, y):
    try:
        return bool(np.isclose(float(x), float(y), atol=1e-9))
    except (ValueError, TypeError):
        return x == y


def main():
    args = sys.argv[1:]
    include_retired = "--retired" in args
    args = [a for a in args if a != "--retired"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as e
    from mnemophonix_spark.session import get_spark

    spark = get_spark(app_name="crosscheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    sqls = e.oracle_sql()
    if include_retired:
        qs.update(e.retired_queries())
        sqls.update(e.retired_oracle_sql())
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            results[name] = f"SPARK ERROR: {ex}"
            print(f"{name:28s} SPARK ERROR: {str(ex)[:200]}")
            continue
        sql = sqls.get(name)
        if sql is None:
            results[name] = f"rows-only ({len(sdf)} rows)"
            print(f"{name:28s} rows-only: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as ex:
            results[name] = f"DUCK ERROR: {ex}"
            print(f"{name:28s} DUCK ERROR: {str(ex)[:200]}")
            continue
        verdict = compare(sdf, ddf)
        results[name] = verdict
        print(f"{name:28s} {verdict}  ({len(sdf)} rows)  [{time.time()-t0:.1f}s]")

    n_bad = sum(1 for v in results.values() if v != "OK" and not v.startswith("rows-only"))
    print(f"\n{len(results)} queries, {n_bad} problems")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
