"""W3C Turtle recursive-descent parser (SURVEY.md §2c, operators P1-P15).

From-scratch re-expression of the reference grammar productions
(`/root/reference/src/parsing.rs:199-839`).  Consumes the token list from
:mod:`kgruntime.ttl.lexer` and returns a lightweight statement-list AST
(plain tuples — this object lives only inside a single ``map_batches``
invocation per document, so it is never serialized or columnarized).

AST shapes
----------
statement  := ('prefix', ns:str, iriref:str, start, end)        # @prefix / PREFIX
            | ('base', iriref:str, start, end)                  # @base / BASE
            | ('triples', subject, po_list, start, end)
subject    := ('iri', iriref:str) | ('compact', prefix, suffix)
            | ('blank_label', label) | ('anon', po_list)
            | ('collection', [object, ...])
po_list    := [(verb, [object, ...]), ...]
verb       := ('a',) | ('iri', s) | ('compact', p, s)
object     := subject shapes
            | ('lit_rdf', string, lang|None, datatype_iri|None)  # datatype_iri is an iri/compact node
            | ('lit_num', lexical, 'integer'|'decimal'|'double')
            | ('lit_bool', bool)

Grammar fidelity notes (all load-bearing, each mirrors a cited guard):

* bare ``[ ... ] .`` statement is legal only when the anonymous subject's
  property list is non-empty (parsing.rs:397-411);
* trailing ``;`` before ``.`` or ``]`` is allowed (parsing.rs:455-463);
* SPARQL ``PREFIX``/``BASE`` take no trailing dot (parsing.rs:305-363);
* a ``@prefix`` name token must have an empty local part
  (parsing.rs:238-247);
* plain string literals default to ``xsd:string`` (parsing.rs:710,749-758);
* a collection may be a subject (parsing.rs:597-607).
"""

from __future__ import annotations

from .lexer import (
    BEGIN, BLANK, COMPACT, END, IRIREF, KEYWORD, LANGTAG, NUMERIC, PUNCT,
    STRING, Token,
)

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

_DIRECTIVE_KEYWORDS = ("@prefix", "@base", "PREFIX", "BASE")


class ParseError(Exception):
    """Unexpected token / EOF (mirrors parsing.rs:27-34)."""

    def __init__(self, kind: str, message: str, start: int, end: int):
        super().__init__(message)
        self.kind = kind
        self.start = start
        self.end = end

    layer = "parse"


class _P:
    __slots__ = ("toks", "i", "n")

    def __init__(self, toks: list[Token]):
        self.toks = toks
        self.i = 0
        self.n = len(toks)

    def peek(self) -> Token | None:
        return self.toks[self.i] if self.i < self.n else None

    def next(self) -> Token | None:
        t = self.peek()
        if t is not None:
            self.i += 1
        return t

    def expect(self, kind: int, value=None, what: str = "token") -> Token:
        t = self.next()
        if t is None:
            raise ParseError("UnexpectedEof", f"expected {what}, found EOF",
                             self._eof_pos(), self._eof_pos())
        if t.kind != kind or (value is not None and t.value != value):
            raise ParseError("Unexpected", f"expected {what}", t.start, t.end)
        return t

    def _eof_pos(self) -> int:
        return self.toks[-1].end if self.toks else 0


def parse_document(toks: list[Token]) -> list[tuple]:
    """P1: statement loop until EOF; the empty document is valid
    (parsing.rs:199-225)."""
    p = _P(toks)
    statements: list[tuple] = []
    while p.peek() is not None:
        statements.append(_statement(p))
    return statements


def _statement(p: _P) -> tuple:
    t = p.peek()
    if t.kind == KEYWORD and t.value in _DIRECTIVE_KEYWORDS:
        return _directive(p)
    return _triples(p)


def _directive(p: _P) -> tuple:
    kw = p.next()
    start = kw.start
    if kw.value in ("@prefix", "PREFIX"):
        name = p.next()
        if name is None or name.kind != COMPACT:
            s, e = _span_of(name, p)
            raise ParseError("Unexpected", "expected prefix name", s, e)
        ns, suffix = name.value
        if suffix != "":
            raise ParseError("Unexpected",
                             "prefix name must have empty local part",
                             name.start, name.end)
        iri = p.expect(IRIREF, what="IRI reference")
        if kw.value == "@prefix":
            dot = p.expect(PUNCT, ".", "`.`")
            return ("prefix", ns, iri.value, start, dot.end)
        return ("prefix", ns, iri.value, start, iri.end)
    else:  # @base / BASE
        iri = p.expect(IRIREF, what="IRI reference")
        if kw.value == "@base":
            dot = p.expect(PUNCT, ".", "`.`")
            return ("base", iri.value, start, dot.end)
        return ("base", iri.value, start, iri.end)


def _triples(p: _P) -> tuple:
    start_tok = p.peek()
    subject = _subject(p)
    t = p.peek()
    if t is not None and t.kind == PUNCT and t.value == ".":
        # bare `[...] .` only with a non-empty anonymous property list
        # (parsing.rs:397-411)
        if not (subject[0] == "anon" and subject[1]):
            raise ParseError("Unexpected", "expected predicate-object list",
                             t.start, t.end)
        po_list: list = []
    else:
        po_list = _po_list(p)
    dot = p.expect(PUNCT, ".", "`.`")
    return ("triples", subject, po_list, start_tok.start, dot.end)


def _po_list(p: _P) -> list:
    result = [_predicate_objects(p)]
    while True:
        t = p.peek()
        if t is None:
            s = p._eof_pos()
            raise ParseError("UnexpectedEof", "EOF in predicate-object list", s, s)
        if t.kind == PUNCT and t.value == ";":
            p.next()
            nxt = p.peek()
            if nxt is not None and (
                (nxt.kind == PUNCT and nxt.value == ".")
                or (nxt.kind == END and nxt.value == "]")
            ):
                break  # trailing `;` (parsing.rs:455-463)
            result.append(_predicate_objects(p))
        elif (t.kind == PUNCT and t.value == ".") or (t.kind == END and t.value == "]"):
            break
        else:
            raise ParseError("Unexpected", "expected `;`, `.` or `]`",
                             t.start, t.end)
    return result


def _predicate_objects(p: _P) -> tuple:
    verb = _verb(p)
    objects = [_object(p)]
    while True:
        t = p.peek()
        if t is None:
            s = p._eof_pos()
            raise ParseError("UnexpectedEof", "EOF in object list", s, s)
        if t.kind == PUNCT and t.value == ",":
            p.next()
            objects.append(_object(p))
        elif (t.kind == PUNCT and t.value in (".", ";")) or (
            t.kind == END and t.value == "]"
        ):
            break
        else:
            raise ParseError("Unexpected", "expected `,`, `;`, `.` or `]`",
                             t.start, t.end)
    return (verb, objects)


def _verb(p: _P) -> tuple:
    t = p.next()
    if t is None:
        s = p._eof_pos()
        raise ParseError("UnexpectedEof", "expected verb", s, s)
    if t.kind == KEYWORD and t.value == "a":
        return ("a",)
    return _iri_from(t)


def _iri_from(t: Token) -> tuple:
    if t.kind == IRIREF:
        return ("iri", t.value)
    if t.kind == COMPACT:
        return ("compact", t.value[0], t.value[1])
    raise ParseError("Unexpected", "expected IRI", t.start, t.end)


def _subject(p: _P) -> tuple:
    t = p.next()
    if t is None:
        s = p._eof_pos()
        raise ParseError("UnexpectedEof", "expected subject", s, s)
    if t.kind == IRIREF:
        return ("iri", t.value)
    if t.kind == COMPACT:
        return ("compact", t.value[0], t.value[1])
    if t.kind == BLANK:
        return ("blank_label", t.value)
    if t.kind == BEGIN and t.value == "[":
        return _anon(p)
    if t.kind == BEGIN and t.value == "(":
        return ("collection", _collection(p))
    raise ParseError("Unexpected", "unexpected token as subject", t.start, t.end)


def _anon(p: _P) -> tuple:
    t = p.peek()
    if t is not None and t.kind == END and t.value == "]":
        p.next()
        return ("anon", [])
    po_list = _po_list(p)
    p.expect(END, "]", "`]`")
    return ("anon", po_list)


def _collection(p: _P) -> list:
    objects = []
    while True:
        t = p.next()
        if t is None:
            s = p._eof_pos()
            raise ParseError("UnexpectedEof", "EOF in collection", s, s)
        if t.kind == END and t.value == ")":
            return objects
        objects.append(_object_from(p, t))


def _object(p: _P) -> tuple:
    t = p.next()
    if t is None:
        s = p._eof_pos()
        raise ParseError("UnexpectedEof", "expected object", s, s)
    return _object_from(p, t)


def _object_from(p: _P, t: Token) -> tuple:
    if t.kind == IRIREF:
        return ("iri", t.value)
    if t.kind == COMPACT:
        return ("compact", t.value[0], t.value[1])
    if t.kind == BLANK:
        return ("blank_label", t.value)
    if t.kind == BEGIN and t.value == "[":
        return _anon(p)
    if t.kind == BEGIN and t.value == "(":
        return ("collection", _collection(p))
    return _literal_from(p, t)


def _literal_from(p: _P, t: Token) -> tuple:
    if t.kind == STRING:
        nxt = p.peek()
        if nxt is not None and nxt.kind == LANGTAG:
            p.next()
            return ("lit_rdf", t.value, nxt.value, None)
        if nxt is not None and nxt.kind == PUNCT and nxt.value == "^^":
            p.next()
            dt_tok = p.next()
            if dt_tok is None:
                s = p._eof_pos()
                raise ParseError("UnexpectedEof", "expected datatype IRI", s, s)
            return ("lit_rdf", t.value, None, _iri_from(dt_tok))
        # default datatype xsd:string (parsing.rs:710)
        return ("lit_rdf", t.value, None, ("iri", XSD_STRING))
    if t.kind == NUMERIC:
        lexical, subtype = t.value
        return ("lit_num", lexical, subtype)
    if t.kind == KEYWORD and t.value == "true":
        return ("lit_bool", True)
    if t.kind == KEYWORD and t.value == "false":
        return ("lit_bool", False)
    raise ParseError("Unexpected", "unexpected token as object", t.start, t.end)


def _span_of(t: Token | None, p: _P) -> tuple[int, int]:
    if t is None:
        e = p._eof_pos()
        return e, e
    return t.start, t.end
