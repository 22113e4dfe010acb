"""Generate a 10× scale-up of /root/testdata/sf0.1 for the sf1
scale-validation sweep (VERDICT r07 'Next round' #4).

Construction: FACTOR disjoint-id replicas of every fact table, with
per-replica CONTENT divergence so cross-replica rows never collide in
any dedup/ANN candidate structure:

  * key columns shift by ``replica * OFFSET`` (disjoint id spaces);
  * document tokens get a ``_r{r}`` suffix on EVERY token — per-doc
    token counts, shingle structure and within-replica duplicate
    structure are preserved exactly, while cross-replica shingles never
    match (a naive text copy would make every gram's posting list 10×
    and every LSH band bucket 10×, turning pair volume 100× — a
    quadratic artifact of duplicated CONTENT, not an engine property);
  * embeddings circular-shift by 6·r dimensions — unit norm and
    within-replica geometry preserved, cross-replica cosines decorrelate
    so sign-LSH / kmeans buckets grow 10×, not collapse into 10×-deep
    identical stacks.

Replica 0 is the identity, so sf0.1 is literally a subset. Dimension
tables (region/nation/supplier/part) stay single-copy — facts across
replicas share dims, the realistic shape. The result: every operator's
WORK scales linearly by construction, so a superlinear runtime in the
sweep indicts the engine (driver bottleneck, single-partition stage,
quadratic candidate generation), never the data.

Output: $SPARK_GRAFT_SCALE_DIR (default /root/repo/.scaledata/sf1),
one directory per table named ``{table}.parquet`` holding one parquet
file per replica — spark.read.parquet reads the directory transparently.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".scaledata", "sf1"),
)
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
OFFSET = 10**12  # key shift per replica; all source keys are << 10^12

DIMS = ["region", "nation"]

# per-table replica SELECT; {r} = replica index, {off} = r * OFFSET
# part/supplier replicate WITH their facts (l_partkey/l_suppkey shift in
# lockstep) — otherwise derived structures keyed on them (the part
# co-purchase graph in triangle_counts) SATURATE instead of scaling:
# 10× orders over the same 20k parts densify then dedupe to ~the same
# edge set, and the sweep reads ~1× work where it should read 10×.
FACT_SQL = {
    "customer": """
        SELECT c_custkey + {off} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM src""",
    "supplier": """
        SELECT s_suppkey + {off} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM src""",
    "part": """
        SELECT p_partkey + {off} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM src""",
    "orders": """
        SELECT o_orderkey + {off} AS o_orderkey,
               o_custkey + {off} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src""",
    "lineitem": """
        SELECT l_orderkey + {off} AS l_orderkey,
               l_partkey + {off} AS l_partkey,
               l_suppkey + {off} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM src""",
    "events": """
        SELECT event_id + {off} AS event_id, ts,
               user_id + {off} AS user_id, event_type, value, props
        FROM src""",
    "documents": r"""
        SELECT doc_id + {off} AS doc_id,
               CASE WHEN {r} = 0 THEN text
                    ELSE regexp_replace(text, '(\S+)', '\1_r{r}', 'g')
               END AS text,
               lang, source,
               CASE WHEN {r} = 0 THEN n_chars
                    ELSE length(regexp_replace(text, '(\S+)', '\1_r{r}', 'g'))
               END AS n_chars
        FROM src""",
    "embeddings": """
        SELECT vec_id + {off} AS vec_id,
               CASE WHEN {r} = 0 THEN embedding
                    ELSE embedding[{shift}+1:len(embedding)]
                         || embedding[1:{shift}]
               END AS embedding,
               label
        FROM src""",
}


def build(out: str = OUT, factor: int = FACTOR) -> str:
    con = duckdb.connect()
    for t in DIMS:
        d = os.path.join(out, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{d}/part-0.parquet' (FORMAT PARQUET)"
        )
    for t, sql in FACT_SQL.items():
        d = os.path.join(out, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{t}.parquet'")
        for r in range(factor):
            q = sql.format(r=r, off=r * OFFSET, shift=(6 * r) % 64)
            con.execute(
                f"COPY ({q}) TO '{d}/part-{r}.parquet' (FORMAT PARQUET)"
            )
        print(f"{t}: {factor} replicas written", file=sys.stderr)
    return out


if __name__ == "__main__":
    out = build()
    print(out)
