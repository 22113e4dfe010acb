"""Local driver-mimic: run every queries() entry on Spark AND its
oracle_sql() on DuckDB at sf0.01; compare row count + column names +
order-insensitive value multiset.

Usage: python tools/oracle_check.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> list[tuple]:
    """Order-insensitive canonical form: sort columns by name, normalize
    values (decimals as EXACT text, doubles as full-precision repr,
    bytes→hex, NaN→None), sort rows.

    VERDICT r13 item 7: the old repr(round(float(v), 9)) normalization
    was strictly looser than the driver's value hash — a 9-dp float64
    tolerance that structurally cannot catch a last-digit divergence in
    a decimal column. Decimals now compare as exact normalized text
    (scale-insensitive: 1.50 == 1.5, but 1.500001 != 1.5) and doubles as
    shortest-roundtrip repr, so 'oracle-green' here means bit-equal —
    as tight as the driver."""
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
            return format(v.normalize(), "f")
        if isinstance(v, bytes):
            return v.hex()
        if hasattr(v, "item"):  # numpy scalar
            return norm(v.item())
        return str(v)

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def main(only: list[str]) -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # console progress bars interleave with the per-query ok lines and
        # garble the sweep artifact
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = only or list(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows spark={len(sdf)} duck={len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        if not problems:
            s, d = normalize(sdf), normalize(ddf)
            if s != d:
                diff = [
                    (a, b) for a, b in zip(s, d) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
        elif len(sdf) == 0:
            # green-on-empty proves nothing about the operator (the
            # tpch_q7ish lesson): still counted as passing, but flagged so
            # a vacuous check can't hide in the sweep
            print(f"ok   {name}: 0 rows [VACUOUS — both engines empty] "
                  f"[{time.time()-t0:.1f}s]")
        else:
            print(f"ok   {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    spark.stop()
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
