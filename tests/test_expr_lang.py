from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.functions.expr_lang import (
    ConditionSyntaxError,
    compile_condition,
    tokenize,
)


def _eval(spark, cond: str, rows: list[dict]) -> list[bool]:
    df = spark.createDataFrame(
        [(r.get("op", ""), r.get("attrs", {})) for r in rows],
        "op string, attrs map<string,string>",
    )
    return [
        r.m for r in df.select(compile_condition(cond).alias("m")).collect()
    ]


def test_tokenize_roundtrip():
    toks = tokenize("[OS_USER_NAME] == 'x y' && ![a] == \"q\" || op != 'd'")
    kinds = [t.kind for t in toks]
    assert kinds == ["attr", "op", "str", "op", "op", "attr", "op", "str",
                     "op", "ident", "op", "str"]


def test_attr_equality(spark):
    rows = [
        {"attrs": {"OS_USER_NAME": "app"}},
        {"attrs": {"OS_USER_NAME": "other"}},
        {"attrs": {}},
    ]
    assert _eval(spark, "[OS_USER_NAME] == 'app'", rows) == [True, False, False]
    assert _eval(spark, "[OS_USER_NAME] != 'app'", rows) == [False, True, False]


def test_and_or_not_parens(spark):
    rows = [
        {"op": "u", "attrs": {"U": "a"}},
        {"op": "d", "attrs": {"U": "a"}},
        {"op": "u", "attrs": {"U": "b"}},
    ]
    cond = "([U] == 'a' && op == 'u') || op == 'd'"
    assert _eval(spark, cond, rows) == [True, True, False]
    assert _eval(spark, "!([U] == 'a')", rows) == [False, False, True]


def test_numeric_compare(spark):
    rows = [{"attrs": {"N": "5"}}, {"attrs": {"N": "7"}}, {"attrs": {}}]
    assert _eval(spark, "[N] == 5", rows) == [True, False, False]
    assert _eval(spark, "[N] != 5", rows) == [False, True, False]


def test_empty_condition_is_true(spark):
    assert _eval(spark, "", [{"attrs": {}}]) == [True]


def test_syntax_errors():
    for bad in ["[a] ==", "(a == 'x'", "a @@ b", "== 'x'"]:
        with pytest.raises(ConditionSyntaxError):
            compile_condition(bad)


def test_precedence_and_binds_tighter(spark):
    rows = [{"op": "x", "attrs": {"A": "1", "B": "2"}}]
    # || of (false && false) with true
    assert _eval(spark, "[A] == '0' && [B] == '0' || [A] == '1'", rows) == [True]
