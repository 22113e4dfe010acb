"""Exact-text driver-mimic comparator: like oracle_check, but decimals
and floats are compared as exact text (str(Decimal) / repr(float)) with
NO rounding tolerance — strictly as tight as the driver's value hash.

Usage: python tools/exact_check.py [--sf DIR] query_name [...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from pyspark.sql import SparkSession


def normalize_exact(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]

    def norm(v):
        import decimal

        if v is None:
            return "\x00NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "\x00NULL"
            return repr(v)
        if isinstance(v, decimal.Decimal):
            # exact text, normalized scale (1.50 == 1.5 but 1.500001 != 1.5)
            return format(v.normalize(), "f")
        if isinstance(v, bytes):
            return v.hex()
        if hasattr(v, "item"):
            return norm(v.item())
        return str(v)

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def main(argv: list[str]) -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args = list(argv)
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = args or list(qs)
    failures = 0
    for name in names:
        sdf = qs[name](spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"weak {name}: rows={len(sdf)} (no oracle)")
            continue
        ddf = con.execute(oracles[name]).fetchdf()
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows spark={len(sdf)} duck={len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(
                f"cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
            )
        if not problems:
            s, d = normalize_exact(sdf), normalize_exact(ddf)
            if s != d:
                diff = [(a, b) for a, b in zip(s, d) if a != b][:5]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures += 1
            print(f"FAIL {name} @ {sf_dir}: {'; '.join(problems)}")
        else:
            print(f"ok   {name} @ {sf_dir}: {len(sdf)} rows [exact]")
    spark.stop()
    print(f"\n{len(names) - failures}/{len(names)} passed [exact]")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
