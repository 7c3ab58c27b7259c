"""Unit tests for builder semantics (SURVEY.md §2d) and the RFC 3986
resolver (B4)."""

import pytest

from kgruntime.ttl import BuildError, parse_turtle
from kgruntime.ttl.nquads import canonical_lines
from kgruntime.ttl.resolve import is_absolute, remove_dot_segments, resolve


def test_resolve_basic():
    assert resolve("http://a/b/c/d;p?q", "g") == "http://a/b/c/g"
    assert resolve("http://a/b/c/d;p?q", "./g") == "http://a/b/c/g"
    assert resolve("http://a/b/c/d;p?q", "../g") == "http://a/b/g"
    assert resolve("http://a/b/c/d;p?q", "#s") == "http://a/b/c/d;p?q#s"
    assert resolve("http://a/b/c/d;p?q", "?y") == "http://a/b/c/d;p?y"
    assert resolve("http://a/b/c/d;p?q", "//g") == "http://g"
    assert resolve("http://a/b/c/d;p?q", "/g") == "http://a/g"
    assert resolve("http://a/b/c/d;p?q", "") == "http://a/b/c/d;p?q"
    assert resolve("http://a/b/c/d;p?q", "g:h") == "g:h"


def test_resolve_abnormal_rfc3986():
    # RFC 3986 §5.4.2 abnormal examples
    base = "http://a/b/c/d;p?q"
    assert resolve(base, "../../../g") == "http://a/g"
    assert resolve(base, "/./g") == "http://a/g"
    assert resolve(base, "/../g") == "http://a/g"
    assert resolve(base, "g.") == "http://a/b/c/g."
    assert resolve(base, "..g") == "http://a/b/c/..g"
    assert resolve(base, "g?y/./x") == "http://a/b/c/g?y/./x"
    assert resolve(base, "g#s/../x") == "http://a/b/c/g#s/../x"


def test_remove_dot_segments():
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"


def test_is_absolute():
    assert is_absolute("http://a/")
    assert is_absolute("mailto://bob@example.com")
    assert not is_absolute("#frag")
    assert not is_absolute("path/x")


def test_relative_base_resolved_against_old_base():  # B2 (build.rs:215-218)
    rows = parse_turtle(
        "@base <http://one.example/a/> .\n"
        "@base <sub/> .\n"
        "<x> <y> <z> .")
    assert rows[0][0] == "http://one.example/a/sub/x"


def test_prefix_redefinition_wins():  # B3 (fixture p09)
    rows = parse_turtle(
        "@prefix p: <http://one.example/> .\n"
        "@prefix p: <http://two.example/> .\n"
        "p:s p:p p:o .")
    assert rows[0][0] == "http://two.example/s"


def test_prefix_concat_no_separator():  # B5 (fixture p12)
    rows = parse_turtle(
        "@prefix : <http://example.org/elements> .\n"
        ":s :atomicNumber 2 .")
    assert rows[0][2] == "http://example.org/elementsatomicNumber"


def test_no_base_iri_error():
    with pytest.raises(BuildError) as ei:
        parse_turtle("<rel> <http://p/> <http://o/> .")
    assert ei.value.kind == "NoBaseIri"


def test_unknown_prefix_error():
    with pytest.raises(BuildError) as ei:
        parse_turtle("p:s <http://p/> <http://o/> .")
    assert ei.value.kind == "UnknownPrefix"


def test_blank_allocation_order_subject_first():  # fixtures p15/p16
    rows = parse_turtle(
        "@prefix foaf: <http://xmlns.com/foaf/0.1/> .\n"
        '[] foaf:knows [ foaf:name "Bob" ] .')
    lines = canonical_lines(rows)
    assert "_:0 <http://xmlns.com/foaf/0.1/knows> _:1 ." in lines
    assert '_:1 <http://xmlns.com/foaf/0.1/name> "Bob" .' in lines


def test_collection_tail_first_with_list_type():  # B8 (fixture p18)
    rows = parse_turtle(
        "@prefix : <http://example.org/foo> .\n"
        ":subject :predicate ( :a :b :c ) .")
    lines = canonical_lines(rows)
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    assert f"_:0 <{rdf}first> <http://example.org/fooc> ." in lines
    assert f"_:2 <{rdf}first> <http://example.org/fooa> ." in lines
    assert f"_:0 <{rdf}type> <{rdf}List> ." in lines
    assert f"_:0 <{rdf}rest> <{rdf}nil> ." in lines


def test_empty_collection_is_nil():
    rows = parse_turtle(
        "@prefix : <http://e/> .\n:s :p () .")
    assert rows[0][3] == "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"


def test_boolean_and_numeric_literals():  # B11/B12
    rows = parse_turtle(
        # NB spaces before the commas: the reference only recognizes the
        # bare keywords true/false when followed by whitespace/EOF
        # (lexing.rs:720-730), so `true,` is a lex error there too.
        "@prefix : <http://e/> .\n:s :p true , false , 2, 4.5, 3E1 .")
    objs = [(r[3], r[5]) for r in rows]
    xsd = "http://www.w3.org/2001/XMLSchema#"
    assert objs == [
        ("true", xsd + "boolean"), ("false", xsd + "boolean"),
        ("2", xsd + "integer"), ("4.5", xsd + "decimal"),
        ("3E1", xsd + "double")]


def test_datatype_iri_resolved_via_prefix():  # B13
    rows = parse_turtle(
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
        "@prefix : <http://e/> .\n"
        ':s :p "5"^^xsd:int .')
    assert rows[0][5] == "http://www.w3.org/2001/XMLSchema#int"


def test_bare_anonymous_subject_rules():  # P4 guard (parsing.rs:397-411)
    from kgruntime.ttl import ParseError
    parse_turtle("@prefix : <http://e/> .\n[ :p :q ] .")  # legal
    with pytest.raises(ParseError):
        parse_turtle("[] .")


def test_lineage_spans_and_stmt_index():  # B15 / FIXTURES.md §2
    src = ("@prefix : <http://e/> .\n"
           ":s :p :o .\n"
           ":s2 :p2 :o2 .")
    rows = parse_turtle(src)
    assert [r[9] for r in rows] == [1, 2]  # stmt_index counts directives too
    s, e = rows[0][7], rows[0][8]
    assert src[s:e] == ":s :p :o ."
