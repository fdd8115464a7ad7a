"""Elasticsearch-like query parser, grammar-identical to the reference
(/root/reference/src/search/elastic_query.rs:519-967).

Grammar recap (with reference cites):
  * lexer: ``+ - ( ) :`` are operators; ``"..."`` quoted strings with ``\\"``
    escapes; identifiers are ``[alnum _ . -]+`` (a leading ``-`` lexes as
    Minus because the operator arm wins first; elastic_query.rs:525-583,
    611-622); ``AND`` / ``OR`` keywords are case-insensitive.
  * ``OR`` has lowest precedence; explicit ``AND`` and the prefix operators
    ``+``/``-`` bind as AND; *implicit adjacency is OR* (true
    Lucene/Elasticsearch semantics; elastic_query.rs:680-726).
  * quoted terms are exact (no tokenization); excluded terms are not
    tokenized either; both register their keywords as per-query special
    terms (elastic_query.rs:757-801).  Other terms' keywords are expanded
    through the probe tokenizer *during* parsing, so special terms
    registered by earlier (left) terms affect later ones — reproduced here
    with a parser-scoped growing set instead of the reference's global
    mutable (tokenization.rs:839-851).
  * parse failures fall back to the bag of identifier tokens
    (elastic_query.rs:941-963); full-input fallback strips non-word chars
    (elastic_query.rs:912-935).
"""

from __future__ import annotations

from dataclasses import dataclass

from probe_spark.functions.tokenizer import tokenize as probe_tokenize
from probe_spark.query.ast import And, Expr, Or, Term


class ParseError(Exception):
    pass


@dataclass(frozen=True)
class Tok:
    kind: str  # plus minus lparen rparen colon and or ident quoted
    value: str = ""


def lex(input_str: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n = 0, len(input_str)
    while i < n:
        ch = input_str[i]
        if ch.isspace():
            i += 1
        elif ch == "+":
            toks.append(Tok("plus"))
            i += 1
        elif ch == "-":
            toks.append(Tok("minus"))
            i += 1
        elif ch == "(":
            toks.append(Tok("lparen"))
            i += 1
        elif ch == ")":
            toks.append(Tok("rparen"))
            i += 1
        elif ch == ":":
            toks.append(Tok("colon"))
            i += 1
        elif ch == '"':
            i += 1
            buf: list[str] = []
            escaped = False
            closed = False
            while i < n:
                c = input_str[i]
                if escaped:
                    buf.append(c)
                    escaped = False
                    i += 1
                elif c == "\\":
                    escaped = True
                    i += 1
                elif c == '"':
                    i += 1
                    closed = True
                    break
                else:
                    buf.append(c)
                    i += 1
            if not closed:
                raise ParseError("unexpected end of input in quoted string")
            toks.append(Tok("quoted", "".join(buf)))
        elif ch.isalnum() or ch in "_.":
            buf = []
            while i < n and (input_str[i].isalnum() or input_str[i] in "_.-"):
                buf.append(input_str[i])
                i += 1
            ident = "".join(buf)
            upper = ident.upper()
            if upper == "AND":
                toks.append(Tok("and"))
            elif upper == "OR":
                toks.append(Tok("or"))
            else:
                toks.append(Tok("ident", ident))
        else:
            i += 1  # skip unknown characters (elastic_query.rs:567-573)
    if not toks:
        raise ParseError("no valid tokens found in input")
    return toks


class _Parser:
    def __init__(self, tokens: list[Tok]):
        self.tokens = tokens
        self.pos = 0
        self.special: set[str] = set()

    def peek(self) -> Tok | None:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def next(self) -> Tok | None:
        t = self.peek()
        if t is not None:
            self.pos += 1
        return t

    def expect(self, kind: str) -> Tok:
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of input")
        if t.kind != kind:
            raise ParseError(f"unexpected token {t.kind}")
        return self.next()  # type: ignore[return-value]

    def parse_expr(self) -> Expr:
        return self.parse_or_expr()

    def parse_or_expr(self) -> Expr:
        left = self.parse_and_expr()
        while (t := self.peek()) is not None and t.kind == "or":
            self.next()
            right = self.parse_and_expr()
            left = Or(left, right)
        return left

    def parse_and_expr(self) -> Expr:
        left = self.parse_factor()
        while (t := self.peek()) is not None:
            if t.kind == "and":
                self.next()
                left = And(left, self.parse_factor())
            elif t.kind == "or":
                break
            elif t.kind in ("plus", "minus"):
                left = And(left, self.parse_factor())
            elif t.kind in ("ident", "quoted", "lparen"):
                # implicit adjacency => OR (elastic_query.rs:711-720)
                left = Or(left, self.parse_factor())
            else:
                break
        return left

    def parse_factor(self) -> Expr:
        t = self.peek()
        if t is not None and t.kind == "lparen":
            self.next()
            expr = self.parse_expr()
            self.expect("rparen")
            return expr
        return self.parse_prefixed_term()

    def parse_prefixed_term(self) -> Expr:
        required = excluded = False
        t = self.peek()
        if t is not None and t.kind == "plus":
            required = True
            self.next()
        elif t is not None and t.kind == "minus":
            excluded = True
            self.next()

        primary = self.parse_primary()
        if not isinstance(primary, Term):
            return primary

        if primary.exact or excluded:
            # register keywords as special, keep unsplit (elastic_query.rs:768-773)
            for kw in primary.keywords:
                self.special.add(kw.lower())
            final = primary.keywords
        else:
            expanded: list[str] = []
            frozen = frozenset(self.special)
            for kw in primary.keywords:
                expanded.extend(s for s in probe_tokenize(kw, frozen) if s)
            final = tuple(expanded)

        return Term(
            keywords=final,
            field=primary.field,
            required=required,
            excluded=excluded,
            exact=primary.exact,
        )

    def parse_primary(self) -> Expr:
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of input")
        if t.kind == "quoted":
            self.next()
            return Term(keywords=(t.value,), exact=True)
        if t.kind == "ident":
            self.next()
            first = t.value
            nxt = self.peek()
            if nxt is not None and nxt.kind == "colon":
                self.next()
                nxt2 = self.peek()
                if nxt2 is not None and nxt2.kind == "ident":
                    self.next()
                    return Term(keywords=(nxt2.value,), field=first)
                if nxt2 is not None and nxt2.kind == "quoted":
                    self.next()
                    return Term(keywords=(nxt2.value,), field=first, exact=True)
                return Term(keywords=(), field=first)
            return Term(keywords=(first,))
        raise ParseError(f"unexpected token {t.kind}")


def parse_query(input_str: str, exact: bool = False) -> tuple[Expr, frozenset[str]]:
    """Parse a query; returns (AST, per-query special terms).

    ``exact=True`` treats the whole input as a single exact term
    (elastic_query.rs:892-904).
    """
    if exact:
        return Term(keywords=(input_str,), exact=True), frozenset(
            [input_str.lower()]
        )

    try:
        tokens = lex(input_str)
    except ParseError:
        cleaned = "".join(
            c for c in input_str if c.isalnum() or c.isspace() or c in "_."
        )
        if not cleaned.strip():
            raise ParseError("no valid tokens found")
        keywords = tuple(s.lower() for s in cleaned.split())
        return Term(keywords=keywords), frozenset()

    parser = _Parser(tokens)
    try:
        parsed = parser.parse_expr()
    except ParseError:
        idents = tuple(t.value for t in tokens if t.kind == "ident")
        if not idents:
            raise ParseError("no valid identifiers found")
        return Term(keywords=idents), frozenset(parser.special)
    return parsed, frozenset(parser.special)
