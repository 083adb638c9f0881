"""Independent per-dialect SQL validator (the offline stand-in for a
second parsing engine).

The reference's CI executes its generated SQL against four live
engines (reference .github/workflows/ci.yaml:12-44); this container
has none of them and no network, so the next-best check is a parser
that was NOT derived from the generator: a hand-rolled tokenizer +
recursive-descent grammar for exactly the statement shapes
``sources/dialects.py`` and ``planner.py`` emit, with each dialect's
lexical rules (backtick / bracket / double-quote identifier quoting,
``WITH (NOLOCK)`` hints, ``CONVERT(VARCHAR(n), x, 126)``,
``DELETE TOP (n)`` vs ``DELETE ... LIMIT n``) enforced — and the
NON-features enforced too (a backtick reaching the Postgres lexer, or
a LIMIT clause reaching Oracle, is a parse error here exactly as it
would be live).

This is a consumer, not a copy: it shares no code or templates with
the generator, so a malformed string (unbalanced quote, misplaced
hint, wrong CONVERT arity, trailing garbage) fails here even though
golden-string tests — which compare against the SAME generator output
— would happily pin the breakage.

Deliberately NOT general SQL: anything outside the shapes the package
generates is a parse error. Tightness is the point.
"""

from __future__ import annotations

import re

__all__ = ["parse_sql", "ParseError"]


class ParseError(ValueError):
    pass


# per-dialect lexical capabilities
_QUOTES = {
    "mysql": ("`", "`"),
    "tidb": ("`", "`"),
    "pg": ('"', '"'),
    "mssql": ("[", "]"),
    "oracle": ('"', '"'),
    "derby": ('"', '"'),
}
_ALLOWS_LIMIT = {"mysql", "tidb"}  # DELETE ... LIMIT n
_ALLOWS_TOP = {"mssql"}  # DELETE TOP (n)
_ALLOWS_NOLOCK = {"mssql"}
_ALLOWS_PLUS_CONCAT = {"mssql"}  # 's.name + '.' + t.name'

_WORD = re.compile(r"[A-Za-z_][A-Za-z0-9_$#]*")
_NUMBER = re.compile(r"\d+(\.\d+)?([eE][+-]?\d+)?")

_KEYWORDS = frozenset(
    {
        "SELECT", "FROM", "WHERE", "AS", "AND", "OR", "NOT", "IN",
        "JOIN", "ON", "DELETE", "LIMIT", "TOP", "WITH", "NOLOCK",
        "IS", "NULL", "BETWEEN", "LIKE", "FALSE", "TRUE",
    }
)


def _tokenize(sql: str, dialect: str) -> list[tuple[str, str]]:
    """(kind, text) tokens. kind: word/qident/string/number/punct."""
    qo, qc = _QUOTES[dialect]
    out: list[tuple[str, str]] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c.isspace():
            i += 1
            continue
        if c == "'":
            j = i + 1
            while True:
                if j >= n:
                    raise ParseError(f"unterminated string at {i}: {sql!r}")
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2  # doubled-quote escape
                        continue
                    break
                j += 1
            out.append(("string", sql[i + 1 : j]))
            i = j + 1
            continue
        if c == qo:
            j = sql.find(qc, i + 1)
            if j < 0:
                raise ParseError(
                    f"unterminated {qo}identifier{qc} at {i}: {sql!r}"
                )
            body = sql[i + 1 : j]
            if not body or qo in body:
                raise ParseError(f"bad quoted identifier {body!r}")
            out.append(("qident", body))
            i = j + 1
            continue
        if c in "`[]":
            # a foreign dialect's quote char leaking through
            raise ParseError(
                f"character {c!r} is not lexable in dialect {dialect}"
            )
        m = _NUMBER.match(sql, i)
        if m and c.isdigit():
            out.append(("number", m.group(0)))
            i = m.end()
            continue
        m = _WORD.match(sql, i)
        if m:
            out.append(("word", m.group(0)))
            i = m.end()
            continue
        two = sql[i : i + 2]
        if two in (">=", "<=", "<>", "!=") :
            out.append(("punct", two))
            i += 2
            continue
        if c in "(),.*=<>+-":
            if c == "+" and dialect not in _ALLOWS_PLUS_CONCAT:
                raise ParseError(
                    f"'+' outside mssql string concat in {dialect}"
                )
            out.append(("punct", c))
            i += 1
            continue
        raise ParseError(f"unlexable char {c!r} at {i} in {sql!r}")
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], dialect: str):
        self.toks = tokens
        self.pos = 0
        self.dialect = dialect

    # -- token helpers -------------------------------------------------
    def peek(self, ahead: int = 0) -> tuple[str, str]:
        i = self.pos + ahead
        return self.toks[i] if i < len(self.toks) else ("eof", "")

    def next(self) -> tuple[str, str]:
        t = self.peek()
        self.pos += 1
        return t

    def at_word(self, *words: str) -> bool:
        kind, text = self.peek()
        return kind == "word" and text.upper() in words

    def expect_word(self, *words: str) -> str:
        kind, text = self.next()
        if kind != "word" or text.upper() not in words:
            raise ParseError(f"expected {words}, got {kind}:{text!r}")
        return text.upper()

    def expect_punct(self, p: str) -> None:
        kind, text = self.next()
        if kind != "punct" or text != p:
            raise ParseError(f"expected {p!r}, got {kind}:{text!r}")

    # -- grammar -------------------------------------------------------
    def statement(self) -> str:
        kw = self.expect_word("SELECT", "DELETE")
        if kw == "SELECT":
            self.select_rest()
        else:
            self.delete_rest()
        if self.peek()[0] != "eof":
            raise ParseError(f"trailing tokens: {self.toks[self.pos:]}")
        return kw

    def select_rest(self) -> None:
        self.select_item()
        while self.peek() == ("punct", ","):
            self.next()
            self.select_item()
        self.expect_word("FROM")
        self.table_source()
        while self.at_word("JOIN"):
            self.next()
            self.table_source()
            self.expect_word("ON")
            self.condition()
        if self.at_word("WHERE"):
            self.next()
            self.condition()

    def delete_rest(self) -> None:
        if self.at_word("TOP"):
            if self.dialect not in _ALLOWS_TOP:
                raise ParseError(f"DELETE TOP not valid in {self.dialect}")
            self.next()
            self.expect_punct("(")
            if self.next()[0] != "number":
                raise ParseError("TOP (n): n must be a number literal")
            self.expect_punct(")")
        self.expect_word("FROM")
        self.qualified_name()  # no NOLOCK on delete targets
        if self.at_word("WHERE"):
            self.next()
            self.condition()
        if self.at_word("LIMIT"):
            if self.dialect not in _ALLOWS_LIMIT:
                raise ParseError(f"DELETE LIMIT not valid in {self.dialect}")
            self.next()
            if self.next()[0] != "number":
                raise ParseError("LIMIT n: n must be a number literal")

    def select_item(self) -> None:
        if self.peek() == ("punct", "*"):
            self.next()
            return
        self.expr()
        if self.at_word("AS"):
            self.next()
            kind, _ = self.next()
            if kind not in ("word", "qident"):
                raise ParseError("AS must be followed by an identifier")

    def table_source(self) -> None:
        self.qualified_name()
        if self.at_word("WITH"):
            if self.dialect not in _ALLOWS_NOLOCK:
                raise ParseError(f"table hint not valid in {self.dialect}")
            self.next()
            self.expect_punct("(")
            self.expect_word("NOLOCK")
            self.expect_punct(")")
            return
        # optional bare alias (catalog discovery joins use them)
        kind, text = self.peek()
        if kind == "word" and text.upper() not in _KEYWORDS:
            self.next()

    def qualified_name(self) -> None:
        self.name_part()
        while self.peek() == ("punct", "."):
            self.next()
            self.name_part()

    def name_part(self) -> None:
        kind, text = self.next()
        if kind == "qident":
            return
        if kind == "word" and text.upper() not in _KEYWORDS:
            return
        raise ParseError(f"expected identifier, got {kind}:{text!r}")

    # -- expressions / conditions -------------------------------------
    def condition(self) -> None:
        self.or_term()

    def or_term(self) -> None:
        self.and_term()
        while self.at_word("OR"):
            self.next()
            self.and_term()

    def and_term(self) -> None:
        self.comparison()
        while self.at_word("AND"):
            self.next()
            self.comparison()

    def comparison(self) -> None:
        if self.peek() == ("punct", "("):
            self.next()
            self.condition()
            self.expect_punct(")")
            return
        if self.at_word("NOT"):
            self.next()
            self.comparison()
            return
        self.expr()
        if self.at_word("IS"):
            self.next()
            if self.at_word("NOT"):
                self.next()
            self.expect_word("NULL")
            return
        if self.at_word("NOT"):
            self.next()
            self.expect_word("IN", "LIKE", "BETWEEN")
            self.pos -= 1  # re-handle below
        if self.at_word("IN"):
            self.next()
            self.expect_punct("(")
            self.expr()
            while self.peek() == ("punct", ","):
                self.next()
                self.expr()
            self.expect_punct(")")
            return
        if self.at_word("LIKE"):
            self.next()
            self.expr()
            return
        if self.at_word("BETWEEN"):
            self.next()
            self.expr()
            self.expect_word("AND")
            self.expr()
            return
        kind, text = self.peek()
        if kind == "punct" and text in ("=", "<", ">", "<=", ">=", "<>", "!="):
            self.next()
            self.expr()
            return
        # bare boolean expr (e.g. HAS_DBACCESS(name) = 1 handled above;
        # `datistemplate = false` comes through expr + '=' too)

    def expr(self) -> None:
        self.primary()
        while True:
            kind, text = self.peek()
            if kind == "punct" and text == "+":
                if self.dialect not in _ALLOWS_PLUS_CONCAT:
                    raise ParseError(
                        f"'+' concat not valid in {self.dialect}"
                    )
                self.next()
                self.primary()
                continue
            break

    def primary(self) -> None:
        kind, text = self.peek()
        if kind == "punct" and text == "-":  # unary minus on a number
            self.next()
            if self.next()[0] != "number":
                raise ParseError("'-' must precede a number literal")
            return
        if kind in ("string", "number"):
            self.next()
            return
        if kind == "punct" and text == "(":
            self.next()
            self.expr()
            self.expect_punct(")")
            return
        if kind == "word" and text.upper() in ("TRUE", "FALSE", "NULL"):
            self.next()
            return
        if kind == "word" and self.peek(1) == ("punct", "("):
            self.function_call(text)
            return
        if kind in ("word", "qident"):
            self.qualified_name()
            return
        raise ParseError(f"unexpected token {kind}:{text!r} in expression")

    def function_call(self, name: str) -> None:
        fname = name.upper()
        self.next()  # name
        self.expect_punct("(")
        if fname == "CONVERT":
            if self.dialect != "mssql":
                raise ParseError("CONVERT(type, x, style) is mssql-only")
            # CONVERT(VARCHAR(n), expr, style)
            self.expect_word("VARCHAR")
            self.expect_punct("(")
            if self.next()[0] != "number":
                raise ParseError("VARCHAR(n): n must be a number")
            self.expect_punct(")")
            self.expect_punct(",")
            self.expr()
            self.expect_punct(",")
            kind, style = self.next()
            if kind != "number" or style != "126":
                raise ParseError(
                    f"CONVERT style must be 126 (ISO-8601), got {style!r}"
                )
            self.expect_punct(")")
            return
        if self.peek() == ("punct", ")"):  # zero-arg
            self.next()
            return
        if self.peek() == ("punct", "*"):  # COUNT(*)
            self.next()
            self.expect_punct(")")
            return
        self.expr()
        while self.peek() == ("punct", ","):
            self.next()
            self.expr()
        self.expect_punct(")")


def parse_sql(sql: str, dialect: str) -> str:
    """Parse *sql* under *dialect* rules; returns the statement kind
    ('SELECT' / 'DELETE') or raises ParseError."""
    if dialect not in _QUOTES:
        raise ParseError(f"unknown dialect {dialect}")
    return _Parser(_tokenize(sql, dialect), dialect).statement()
