"""Condition-expression mini-language → Spark Column compiler.

The reference filters DML per-table with a boolean mini-language over
session attributes (`src/common/expression/Expression.cpp:29-290`,
`BoolValue.h:28-55`, `Token.h:32-42`; evaluated per-op in
`DbTable::matchesCondition`, `src/common/DbTable.cpp:144-158`):

    [OS_USER_NAME] == 'appuser' && ([op] == 'u' || [op] == 'd')

Grammar (same surface as the reference):
    expr    := or
    or      := and ('||' and)*
    and     := not ('&&' not)*
    not     := '!' not | cmp
    cmp     := primary (('==' | '!=') primary)?
    primary := '(' expr ')' | '[' IDENT ']' | STRING | NUMBER | IDENT

``[name]`` reads the session-attribute map column; bare identifiers read
plain columns (op, owner, table ...). Compilation emits a Catalyst Column
— the filter runs JVM-side inside WholeStageCodegen, never in Python.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lpar>\()
      | (?P<rpar>\))
      | (?P<attr>\[[A-Za-z_][A-Za-z0-9_]*\])
      | (?P<op>==|!=|&&|\|\||!)
      | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<num>-?\d+(?:\.\d+)?)
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str
    text: str


class ConditionSyntaxError(ValueError):
    pass


def tokenize(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            rest = src[pos:].strip()
            if not rest:
                break
            raise ConditionSyntaxError(f"bad token at: {rest[:20]!r}")
        pos = m.end()
        kind = m.lastgroup
        toks.append(_Tok(kind, m.group(kind)))
    return toks


class _Parser:
    def __init__(self, toks: list[_Tok], attrs_col: str, columns: dict[str, Column]):
        self.toks = toks
        self.i = 0
        self.attrs_col = attrs_col
        self.columns = columns

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def eat(self, kind: str | None = None, text: str | None = None) -> _Tok:
        tok = self.peek()
        if tok is None or (kind and tok.kind != kind) or (text and tok.text != text):
            raise ConditionSyntaxError(
                f"expected {text or kind} at token {self.i}: {tok}"
            )
        self.i += 1
        return tok

    def parse(self) -> Column:
        col = self.or_expr()
        if self.peek() is not None:
            raise ConditionSyntaxError(f"trailing tokens from {self.peek()}")
        return col

    def or_expr(self) -> Column:
        left = self.and_expr()
        while self.peek() and self.peek().text == "||":
            self.eat()
            left = left | self.and_expr()
        return left

    def and_expr(self) -> Column:
        left = self.not_expr()
        while self.peek() and self.peek().text == "&&":
            self.eat()
            left = left & self.not_expr()
        return left

    def not_expr(self) -> Column:
        if self.peek() and self.peek().text == "!":
            self.eat()
            return ~self.not_expr()
        return self.cmp()

    def cmp(self) -> Column:
        left, left_kind = self.primary()
        tok = self.peek()
        if tok and tok.kind == "op" and tok.text in ("==", "!="):
            self.eat()
            right, right_kind = self.primary()
            if "num" in (left_kind, right_kind):
                left = left.cast("double")
                right = right.cast("double")
            res = left == right if tok.text == "==" else left != right
            # reference semantics: comparison with a missing attribute is false
            return F.coalesce(res, F.lit(False))
        if left_kind == "bool":
            return left
        # bare value in boolean position → truthiness of non-empty/non-zero
        if left_kind == "num":
            return F.coalesce(left.cast("double") != 0, F.lit(False))
        return F.coalesce(left != "", F.lit(False))

    def primary(self) -> tuple[Column, str]:
        tok = self.peek()
        if tok is None:
            raise ConditionSyntaxError("unexpected end of condition")
        if tok.kind == "lpar":
            self.eat()
            col = self.or_expr()
            self.eat("rpar")
            return col, "bool"
        if tok.kind == "attr":
            self.eat()
            name = tok.text[1:-1]
            return F.element_at(F.col(self.attrs_col), F.lit(name)), "str"
        if tok.kind == "str":
            self.eat()
            raw = tok.text[1:-1]
            raw = re.sub(r"\\(.)", r"\1", raw)
            return F.lit(raw), "str"
        if tok.kind == "num":
            self.eat()
            return F.lit(float(tok.text) if "." in tok.text else int(tok.text)), "num"
        if tok.kind == "ident":
            self.eat()
            if tok.text in self.columns:
                return self.columns[tok.text], "str"
            return F.col(tok.text), "str"
        raise ConditionSyntaxError(f"unexpected token {tok}")


def compile_condition(
    src: str,
    attrs_col: str = "attrs",
    columns: dict[str, Column] | None = None,
) -> Column:
    """Compile a reference-style condition string to a Spark boolean Column."""
    if not src or not src.strip():
        return F.lit(True)
    return _Parser(tokenize(src), attrs_col, columns or {}).parse()
