"""Property-based round-trip tests (SURVEY.md §5 item 3).

Strategy: generate random triples as data, serialize them to Turtle
through an independent writer (here, with explicit full IRIs and all
literal forms), parse with the engine, and require exact term-level
equality.  This probes the lexer/parser/builder far outside the golden
corpus's value space.
"""

import string

from hypothesis import given, settings, strategies as st

from kgruntime.ttl import parse_turtle
from kgruntime.ttl.builder import IRI, LITERAL, XSD_STRING
from kgruntime.ttl.nquads import canonical_lines

# IRI path chars kept conservative (the reference validates via charset)
_iri_local = st.text(alphabet=string.ascii_letters + string.digits + "-_",
                     min_size=1, max_size=12)
_plain_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters='"\\\r'),
    max_size=40)
_lang = st.sampled_from(["en", "en-US", "fr", "de-CH-1996", "zh"])


def _iri(local: str) -> str:
    return f"http://example.org/{local}"


_term_obj = st.one_of(
    _iri_local.map(lambda s: ("iri", _iri(s))),
    st.tuples(_plain_text, st.none() | _lang).map(
        lambda t: ("lit", t[0], t[1])),
    st.integers(-10**12, 10**12).map(lambda n: ("int", str(n))),
)

_triple = st.tuples(_iri_local, _iri_local, _term_obj)


def _escape_turtle(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\t", "\\t"))


def _serialize(triples) -> str:
    out = []
    for s, p, o in triples:
        if o[0] == "iri":
            obj = f"<{o[1]}>"
        elif o[0] == "int":
            obj = o[1]
        else:
            lit = f'"{_escape_turtle(o[1])}"'
            obj = lit + (f"@{o[2]}" if o[2] else "")
        out.append(f"<{_iri(s)}> <{_iri(p)}> {obj} .")
    return "\n".join(out)


def _expected_rows(triples):
    rows = []
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    for s, p, o in triples:
        if o[0] == "iri":
            rows.append((_iri(s), IRI, _iri(p), o[1], IRI, "", ""))
        elif o[0] == "int":
            lex = o[1]
            if lex.startswith("+"):
                lex = lex  # verbatim lexical form is preserved
            rows.append((_iri(s), IRI, _iri(p), lex, LITERAL, xsd_int, ""))
        else:
            lang = o[2] or ""
            dt = "" if lang else XSD_STRING
            rows.append((_iri(s), IRI, _iri(p), o[1], LITERAL, dt, lang))
    return rows


@settings(max_examples=150, deadline=None)
@given(st.lists(_triple, max_size=8))
def test_roundtrip_serialize_parse(triples):
    src = _serialize(triples)
    got = canonical_lines(parse_turtle(src))
    exp = canonical_lines(_expected_rows(triples))
    assert got == exp


@settings(max_examples=100, deadline=None)
@given(_plain_text)
def test_string_literal_roundtrip(text):
    src = f'<http://e/s> <http://e/p> "{_escape_turtle(text)}" .'
    rows = parse_turtle(src)
    assert rows[0][3] == text


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",),
                                      blacklist_characters="'\\"),
               max_size=30))
def test_long_string_roundtrip(text):
    # long strings take raw newlines/quotes (single embedded ' allowed)
    src = f"<http://e/s> <http://e/p> '''{text}''' ."
    rows = parse_turtle(src)
    assert rows[0][3] == text


@settings(max_examples=80, deadline=None)
@given(st.integers(-10**15, 10**15),
       st.integers(0, 10**9), st.integers(-30, 30))
def test_numeric_lexical_verbatim(i, frac, exp):
    xsd = "http://www.w3.org/2001/XMLSchema#"
    src = (f"<http://e/s> <http://e/p> {i} .\n"
           f"<http://e/s> <http://e/q> {i}.{frac} .\n"
           f"<http://e/s> <http://e/r> {i}.{frac}E{exp} .")
    rows = parse_turtle(src)
    assert rows[0][3] == str(i) and rows[0][5] == xsd + "integer"
    assert rows[1][3] == f"{i}.{frac}" and rows[1][5] == xsd + "decimal"
    assert rows[2][3] == f"{i}.{frac}E{exp}" and rows[2][5] == xsd + "double"
