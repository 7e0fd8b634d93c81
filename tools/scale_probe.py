"""Scale-probe harness: replicate sf0.1 at k x in /tmp and record how query
wall time scales vs data volume (VERDICT r3 task 6).

The scaled set is a key-shifted union of k copies of the sf0.1 tables —
fact tables (events / orders / lineitem / documents) and the customer
dimension grow k x with disjoint key ranges (offsets are multiples of 400
so every event_id % 16 / % 50 sample-and-tamper residue keeps its
proportion); timestamps are left untouched, which models the realistic
scale-up (same time span, k x density per window). Dimension tables that
TPC-H holds constant (region / nation / supplier / part / embeddings) are
carried over as-is.

Usage:  python tools/scale_probe.py [k] [query ...]
        (default k=3 -> "sf0.3"; default queries = the round-4 probe set)

Prints a markdown table of best-of-2 warm timings at sf0.1 and sf(0.1*k)
with the time-scaling ratio per query; near-linear (ratio <= ~k) is the
pass condition, super-linear is a scale bug.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

BASE = "/root/testdata/sf0.1"

# offsets divisible by 400 (=lcm(16,50)) preserve sampling residues
FACT_SQL = {
    "events": """
        SELECT event_id + i * 100000000 AS event_id, ts,
               user_id + i * 1000000 AS user_id, event_type, value, props
        FROM read_parquet('{base}/events.parquet') CROSS JOIN copies
    """,
    "customer": """
        SELECT c_custkey + i * 1000000 AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM read_parquet('{base}/customer.parquet') CROSS JOIN copies
    """,
    "orders": """
        SELECT o_orderkey + i * 100000000 AS o_orderkey,
               o_custkey + i * 1000000 AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{base}/orders.parquet') CROSS JOIN copies
    """,
    "lineitem": """
        SELECT l_orderkey + i * 100000000 AS l_orderkey, l_partkey,
               l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{base}/lineitem.parquet') CROSS JOIN copies
    """,
    "documents": """
        SELECT doc_id + i * 10000000 AS doc_id, text, lang, source, n_chars
        FROM read_parquet('{base}/documents.parquet') CROSS JOIN copies
    """,
    # replica vectors stay identical — a worst-ish case for dedup blocking
    # (every point gains k-1 exact twins in its LSH/IVF cell)
    "embeddings": """
        SELECT vec_id + i * 10000000 AS vec_id, embedding, label
        FROM read_parquet('{base}/embeddings.parquet') CROSS JOIN copies
    """,
}
DIM_TABLES = ("region", "nation", "supplier", "part")

# Opt-in (SSI_SCALE_PART=1): grow part too, for probing operators whose
# INPUT is the part dimension (graph_hierarchy_rollup). The +i*100000
# shift is NOT chain-faithful for a decimal hierarchy: copy 1's derived
# parents (10000..11999) are real copy-0 keys, so copy 1 grafts onto
# copy 0's trees (deepening fan-in), while copies >= 2 dangle within a
# level or two (the operator treats dangling parents as roots). Row,
# join, and explode VOLUMES scale k-fold; chain-depth distribution is
# mixed — read the probe ratio as volume-scaling evidence, not
# depth-scaling. Kept out of the default probe so part-joining TPC-H
# queries keep their constant-dimension regime.
PART_FACT_SQL = """
    SELECT p_partkey + i * 100000 AS p_partkey, p_name, p_brand, p_type,
           p_size, p_retailprice
    FROM read_parquet('{base}/part.parquet') CROSS JOIN copies
"""

PROBE_QUERIES = [
    # the three queries whose global windows were rewritten this round
    "transform_training_shuffle",
    "analytics_spend_quartiles",
    "text_perplexity_buckets",
    # the five most expensive r3 bench queries
    "pipeline_provider_matrix",
    "streaming_cms_grid",
    "analytics_market_basket",
    "wire_schema_evolution",
    "text_bigram_lm_score",
    # the new streaming config-matrix entries
    "streaming_sign_verify",
    "streaming_provider_matrix",
]


def build_scaled_dir(k: int) -> str:
    scale_part = bool(os.environ.get("SSI_SCALE_PART"))
    out = f"/tmp/ssi_scale_probe/sf{0.1 * k:g}" + ("_part" if scale_part else "")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        "CREATE TEMP TABLE copies AS SELECT unnest(range({k})) AS i".format(k=k)
    )
    fact_sql = dict(FACT_SQL)
    if scale_part:
        fact_sql["part"] = PART_FACT_SQL
    for tbl, sql in fact_sql.items():
        dst = f"{out}/{tbl}.parquet"
        if not os.path.exists(dst):
            con.execute(
                f"COPY ({sql.format(base=BASE)}) TO '{dst}' (FORMAT PARQUET)"
            )
    for tbl in DIM_TABLES:
        dst = f"{out}/{tbl}.parquet"
        if not os.path.exists(dst):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{BASE}/{tbl}.parquet'))"
                f" TO '{dst}' (FORMAT PARQUET)"
            )
    return out


def time_query(fn, spark, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).toPandas()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or PROBE_QUERIES
    scaled = build_scaled_dir(k)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import __spark_entry__ as entry_mod
    from ssiintegrateddatapipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    queries = entry_mod.queries()

    print(f"| query | sf0.1 s | sf{0.1 * k:g} s | time ratio (data {k}x) |")
    print("|---|---|---|---|")
    for name in names:
        fn = queries[name]
        fn(spark, BASE).toPandas()  # warm: compile plans/JIT off the clock
        t_base = time_query(fn, spark, BASE)
        fn(spark, scaled).toPandas()
        t_scaled = time_query(fn, spark, scaled)
        print(
            f"| {name} | {t_base:.2f} | {t_scaled:.2f} "
            f"| {t_scaled / t_base:.2f}x |"
        )


if __name__ == "__main__":
    main()
