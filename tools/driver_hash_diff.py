"""Show first differing pandas-str cells + dtypes for the driver-red queries."""
from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("OLR_TEST_SF_DIR", "/root/testdata/sf0.01")

RED = sys.argv[1:] or [
    "q1_pricing_summary", "q10_returned_items", "proj_filter_rlike",
    "join_broadcast_dim", "join_left_semi", "agg_stats", "agg_rollup",
    "agg_cube", "subquery_in", "subquery_scalar_avg", "q18_large_orders",
    "q7_volume_shipping", "q12_late_lines_by_flag", "cdc_sessionize",
]


def canon(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(str(v) for v in r) for r in pdf[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)


def main():
    import duckdb
    from openlogreplicator_spark.session import get_spark, tune_for_session
    from openlogreplicator_spark.sources.tables import TABLES

    spark = get_spark(app_name="hash-diff", master="local[16]", shuffle_partitions=16)
    tune_for_session(spark)
    import __spark_entry__ as entry

    queries, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    for name in RED:
        df = queries[name](spark, SF_DIR)
        s_pdf = df.toPandas()
        d_pdf = con.execute(oracles[name]).df()
        print(f"\n### {name}")
        print("  spark dtypes:", dict(zip(s_pdf.columns, map(str, s_pdf.dtypes))))
        print("  duck  dtypes:", dict(zip(d_pdf.columns, map(str, d_pdf.dtypes))))
        sc, sr = canon(s_pdf)
        dc, dr = canon(d_pdf)
        ndiff = 0
        for a, b in zip(sr, dr):
            if a != b:
                for col, x, y in zip(sc, a, b):
                    if x != y:
                        print(f"  col={col}: spark={x!r} duck={y!r}")
                ndiff += 1
                if ndiff >= 3:
                    break
    spark.stop()


if __name__ == "__main__":
    main()
