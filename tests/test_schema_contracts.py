"""Safety nets against driver-side testdata regeneration.

Round 2 lesson: the driver regenerated events.parquet with a different
physical timestamp encoding (nanos → micros ⇒ TIMESTAMP_NTZ in Spark 4) and
one query (`cdc_sessionize`) died with a plan-time AnalysisException — slot 3
of the driver's verification window — most plausibly zeroing out the whole
round's CORRECTNESS file. Two guards so that can never happen silently again:

1. `test_query_plan_analyzes`: builds EVERY registered query's DataFrame and
   touches `.schema`. Catalyst analyzes the full plan at that point, so any
   plan-time error (illegal cast, missing column, type mismatch) surfaces in
   seconds without executing a single task.
2. `test_table_schema_contract`: asserts the canonical post-`load_table`
   schema of every table. If the driver regenerates the parquet with a new
   shape, this fails loudly in-repo instead of silently breaking queries.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from openlogreplicator_spark.sources.tables import TABLES, load_table

_QUERIES = entrymod.queries()

# Canonical schema AFTER load_table's normalization layer: `ts` is always
# TimestampType regardless of the file's physical encoding. o_orderdate /
# l_shipdate remain TIMESTAMP_NTZ — every query touching them is
# oracle-green against DuckDB under that type, so the contract pins it.
EXPECTED_SCHEMAS = {
    "region": "struct<r_regionkey:int,r_name:string>",
    "nation": "struct<n_nationkey:int,n_name:string,n_regionkey:int>",
    "customer": (
        "struct<c_custkey:bigint,c_name:string,c_nationkey:int,"
        "c_acctbal:double,c_mktsegment:string>"
    ),
    "supplier": "struct<s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double>",
    "part": (
        "struct<p_partkey:bigint,p_name:string,p_brand:string,p_type:string,"
        "p_size:int,p_retailprice:double>"
    ),
    "orders": (
        "struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,"
        "o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string>"
    ),
    "lineitem": (
        "struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,"
        "l_linenumber:int,l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_tax:double,l_returnflag:string,"
        "l_linestatus:string,l_shipdate:timestamp_ntz>"
    ),
    "events": (
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
        "event_type:string,value:double,props:string>"
    ),
    "documents": "struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>",
    "embeddings": "struct<vec_id:bigint,embedding:array<float>,label:int>",
}


@pytest.mark.parametrize("table", TABLES)
def test_table_schema_contract(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    assert df.schema.simpleString() == EXPECTED_SCHEMAS[table], (
        f"{table} schema drifted — the driver regenerated the testdata with a "
        f"new shape; audit every query that touches it before the next round"
    )


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_plan_analyzes(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    assert len(df.schema.fields) > 0
