"""AST → triples builder (SURVEY.md §2d, operators B1-B15).

From-scratch re-expression of the reference's semantic core
(`/root/reference/src/build.rs:59-622`).  Stateful in *document order*
only: a per-document ``Context`` (base IRI, prefix map, blank-node
counter) is folded over statements exactly like ``build.rs:207-233`` —
documents never share state, which is what makes the Ray parse stage
embarrassingly parallel (SURVEY.md §3).

Load-bearing reference semantics replicated here:

* ``@base`` is itself resolved against the previous base
  (build.rs:215-218);
* ``@prefix`` IRIs resolve against the current base; later re-declaration
  wins (build.rs:219-224, fixture p09);
* compact IRIs are a *plain string concat* of prefix IRI + suffix — no
  separator logic (build.rs:134-166, fixture p12:
  ``<…/elements>`` + ``atomicNumber`` → ``…/elementsatomicNumber``);
* the subject fragment builds (and allocates blank labels) *before* the
  predicate-object list (build.rs:236-258, fixtures p15/p16);
* anonymous ``[...]`` allocates its label, then recursively emits its
  property-list triples (build.rs:367-376);
* collections expand tail-first; each item is built *before* its cell
  label is allocated; every cell additionally gets the nonstandard
  ``rdf:type rdf:List`` triple; ``()`` is ``rdf:nil``
  (build.rs:402-463, fixtures p18/p20/p23/p25);
* numeric literal lexical forms are kept verbatim (build.rs:557-580);
* booleans become ``"true"/"false"^^xsd:boolean`` (build.rs:533-555);
* datatype IRIs of typed literals resolve through the same base/prefix
  machinery (build.rs:582-607).

Output rows are flat tuples matching the triples Arrow schema
(FIXTURES.md §2): ``(subj, subj_kind, pred, obj, obj_kind, obj_datatype,
obj_lang, span_start, span_end, stmt_index)`` with kind codes
0=IRI 1=BLANK 2=LITERAL.
"""

from __future__ import annotations

from typing import Callable

from .iri import is_valid_iri
from .resolve import is_absolute, resolve

_IRI_OK: dict[str, bool] = {}

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_LIST = RDF_NS + "List"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD + "string"
XSD_BOOLEAN = XSD + "boolean"
XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_DOUBLE = XSD + "double"

_NUM_DT = {"integer": XSD_INTEGER, "decimal": XSD_DECIMAL, "double": XSD_DOUBLE}

IRI = 0
BLANKN = 1
LITERAL = 2


class BuildError(Exception):
    """Builder error (mirrors build.rs:41-55)."""

    def __init__(self, kind: str, message: str, start: int, end: int):
        super().__init__(message)
        self.kind = kind
        self.start = start
        self.end = end

    layer = "build"


def default_labeler(n: int) -> str:
    """Reference-style generator labels ``_:0, _:1, …``
    (rdf_types::generator::Blank, tests/positive.rs:17)."""
    return f"_:{n}"


class Context:
    """Per-document build state (build.rs:94-99).  Never crosses rows."""

    __slots__ = ("base_iri", "prefixes", "counter", "labeler", "relabel",
                 "literal_normalizer")

    def __init__(
        self,
        base_iri: str | None = None,
        labeler: Callable[[int], str] = default_labeler,
        relabel: Callable[[str], str] | None = None,
        literal_normalizer=None,
    ):
        self.base_iri = base_iri
        self.prefixes: dict[str, str] = {}
        self.counter = 0
        self.labeler = labeler
        # labeled blank nodes `_:x`: kept verbatim by the reference
        # (build.rs:364-366); the Ray pipeline rewrites them to
        # `_:{doc_id}/L/x` for global uniqueness (SURVEY.md §1.4)
        self.relabel = relabel
        # optional (value, datatype, lang) -> (value, datatype, lang)
        # hook — Ray-side counterpart of the reference's pluggable
        # vocabularies (build.rs:75-92); None = verbatim literals
        self.literal_normalizer = literal_normalizer

    def fresh_blank(self) -> str:
        label = self.labeler(self.counter)
        self.counter += 1
        return label

    def resolve_iri_ref(self, iri_ref: str, start: int, end: int) -> str:
        if self.base_iri is not None:
            return resolve(self.base_iri, iri_ref)
        if is_absolute(iri_ref):
            return iri_ref
        raise BuildError("NoBaseIri",
                         f"no base IRI to resolve {iri_ref!r}", start, end)

    def resolve_compact(self, prefix: str, suffix: str, start: int, end: int) -> str:
        try:
            iri = self.prefixes[prefix]
        except KeyError:
            raise BuildError("UnknownPrefix",
                             f"unknown prefix {prefix!r}", start, end)
        out = iri + suffix  # plain concat — build.rs:148-150
        # full RFC 3987 absolute-IRI validation of the expansion,
        # mirroring the reference's Iri::new check (build.rs:149-159);
        # memoized per worker — compact IRIs repeat massively
        ok = _IRI_OK.get(out)
        if ok is None:
            ok = is_valid_iri(out)
            if len(_IRI_OK) < 100_000:
                _IRI_OK[out] = ok
        if not ok:
            raise BuildError(
                "InvalidCompactIriSuffix",
                f"invalid compact IRI {prefix!r}:{suffix!r}", start, end)
        return out


def build_document(
    statements: list[tuple],
    base_iri: str | None = None,
    labeler: Callable[[int], str] = default_labeler,
    relabel: Callable[[str], str] | None = None,
    literal_normalizer=None,
) -> list[tuple]:
    """B1: fold statements into a flat triple list (build.rs:59-92)."""
    ctx = Context(base_iri, labeler, relabel, literal_normalizer)
    triples: list[tuple] = []
    for stmt_index, stmt in enumerate(statements):
        tag = stmt[0]
        if tag == "base":
            _, iri_ref, start, end = stmt
            ctx.base_iri = ctx.resolve_iri_ref(iri_ref, start, end)
        elif tag == "prefix":
            _, ns, iri_ref, start, end = stmt
            ctx.prefixes[ns] = ctx.resolve_iri_ref(iri_ref, start, end)
        else:  # triples
            _, subject, po_list, start, end = stmt
            meta = (start, end, stmt_index)
            subj = _build_subject(ctx, subject, triples, meta)
            for verb, objects in po_list:
                _build_po(ctx, subj, verb, objects, triples, meta)
    return triples


def _build_po(ctx, subj, verb, objects, triples, meta):
    """B10: predicate × objects product (build.rs:260-287)."""
    pred = _build_verb(ctx, verb, meta)
    for o in objects:
        obj = _build_object(ctx, o, triples, meta)
        triples.append(subj + (pred,) + obj + meta)


def _build_verb(ctx, verb, meta) -> str:
    if verb[0] == "a":
        return RDF_TYPE  # B9 (build.rs:465-481)
    return _build_iri(ctx, verb, meta)


def _build_iri(ctx, node, meta) -> str:
    start, end, _ = meta
    if node[0] == "iri":
        return ctx.resolve_iri_ref(node[1], start, end)
    return ctx.resolve_compact(node[1], node[2], start, end)


def _blank_id(ctx, label: str) -> str:
    if ctx.relabel is not None:
        return ctx.relabel(label)
    return label


def _build_subject(ctx, node, triples, meta) -> tuple:
    """Returns ``(id, kind)``; may emit nested triples (blank property
    lists, collections) before the caller's own triples — creation order
    matches the reference generator-call order exactly."""
    tag = node[0]
    if tag == "iri" or tag == "compact":
        return (_build_iri(ctx, node, meta), IRI)
    if tag == "blank_label":
        return (_blank_id(ctx, node[1]), BLANKN)
    if tag == "anon":
        b = ctx.fresh_blank()
        subj = (b, BLANKN)
        for verb, objects in node[1]:
            _build_po(ctx, subj, verb, objects, triples, meta)
        return subj
    if tag == "collection":
        return _build_collection(ctx, node[1], triples, meta)
    raise AssertionError(f"not a subject: {tag}")


def _build_collection(ctx, objects, triples, meta) -> tuple:
    """B8: tail-first cons expansion with the extra ``rdf:type rdf:List``
    triple per cell (build.rs:402-463)."""
    head = (RDF_NIL, IRI, "", "")
    for o in reversed(objects):
        item = _build_object(ctx, o, triples, meta)
        node = ctx.fresh_blank()
        cell = (node, BLANKN)
        triples.append(cell + (RDF_TYPE, RDF_LIST, IRI, "", "") + meta)
        triples.append(cell + (RDF_REST,) + head + meta)
        triples.append(cell + (RDF_FIRST,) + item + meta)
        head = (node, BLANKN, "", "")
    return head[:2]


def _literal(ctx, value: str, datatype: str, lang: str) -> tuple:
    if ctx.literal_normalizer is not None:
        value, datatype, lang = ctx.literal_normalizer(value, datatype, lang)
    return (value, LITERAL, datatype, lang)


def _build_object(ctx, node, triples, meta) -> tuple:
    """Returns the 4-tuple ``(obj, obj_kind, obj_datatype, obj_lang)``."""
    tag = node[0]
    if tag == "lit_rdf":
        _, string, lang, dt_node = node
        if lang is not None:
            return _literal(ctx, string, "", lang)
        dt = _build_iri(ctx, dt_node, meta)  # B13 (build.rs:582-607)
        return _literal(ctx, string, dt, "")
    if tag == "lit_num":
        return _literal(ctx, node[1], _NUM_DT[node[2]], "")  # B12 verbatim
    if tag == "lit_bool":
        return _literal(ctx, "true" if node[1] else "false", XSD_BOOLEAN, "")  # B11
    if tag == "iri" or tag == "compact":
        return (_build_iri(ctx, node, meta), IRI, "", "")
    if tag == "blank_label":
        return (_blank_id(ctx, node[1]), BLANKN, "", "")
    if tag == "anon":
        b = ctx.fresh_blank()
        subj = (b, BLANKN)
        for verb, objects in node[1]:
            _build_po(ctx, subj, verb, objects, triples, meta)
        return (b, BLANKN, "", "")
    if tag == "collection":
        head = _build_collection(ctx, node[1], triples, meta)
        return head + ("", "")
    raise AssertionError(f"not an object: {tag}")
