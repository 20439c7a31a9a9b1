"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value comparison (columns sorted by name, rows
sorted by all columns, exact equality after type normalization).

Usage: python3 scripts/check_correctness.py [query_name ...] [--sf DIR]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # decimals and strings: canonical string form
            df[c] = df[c].map(lambda v: None if v is None else str(v))
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class used by the driver's type-sensitive hash.

    DuckDB HUGEINT window sums / integer division come back to pandas as
    float64 or object while Spark emits int64 — equal values, different
    hash.  Any int-vs-float / int-vs-object divergence is therefore a
    gate failure even when values compare equal (VERDICT r4 items 1-2).
    """
    dt = s.dtype
    if str(dt).startswith("datetime"):
        return "datetime"
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    return "object"


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> bool:
    ok = True
    if len(spark_df) != len(oracle_df):
        print(f"  [{name}] ROW COUNT mismatch: spark={len(spark_df)} oracle={len(oracle_df)}")
        ok = False
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        print(f"  [{name}] SCHEMA mismatch: spark={sc} oracle={oc}")
        return False
    for c in sc:
        sk, okind = _dtype_kind(spark_df[c]), _dtype_kind(oracle_df[c])
        if sk != okind and len(spark_df):
            print(
                f"  [{name}] DTYPE mismatch in column {c}: "
                f"spark={spark_df[c].dtype}({sk}) oracle={oracle_df[c].dtype}({okind})"
            )
            ok = False
    if not ok:
        return False
    a, b = normalize(spark_df), normalize(oracle_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating):
            good = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
        else:
            good = (pd.isna(av) & pd.isna(bv)) | (av == bv)
            good = bool(np.asarray(good).all())
        if not good:
            bad = np.nonzero(~((pd.isna(av) & pd.isna(bv)) | (av == bv)))[0][:5]
            print(f"  [{name}] VALUE mismatch in column {c}; first rows: {bad}")
            for r in bad:
                print(f"    row {r}: spark={av[r]!r} oracle={bv[r]!r}")
            ok = False
    return ok


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    import __spark_entry__ as e
    from geo_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = e.queries()
    oracles = e.oracle_sql()
    names = args or list(qs)
    failures = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"  [{name}] SPARK ERROR: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[{name}] rows-only: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"  [{name}] ORACLE ERROR: {ex}")
            failures += 1
            continue
        if compare(name, sdf, odf):
            print(f"[{name}] OK ({len(sdf)} rows)")
        else:
            failures += 1
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
