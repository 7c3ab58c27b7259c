"""Per-operator unit tests for the tokenizer (SURVEY.md §2b L1-L12)."""

import pytest

from kgruntime.ttl.lexer import (
    BEGIN, BLANK, COMPACT, END, IRIREF, KEYWORD, LANGTAG, NUMERIC, PUNCT,
    STRING, LexError, tokenize,
)


def kinds(s):
    return [(t.kind, t.value) for t in tokenize(s)]


def test_whitespace_and_comments():  # L1
    assert kinds("# comment\n  \t <http://a/> # trailing\n") == \
        [(IRIREF, "http://a/")]


def test_langtag_and_at_keywords():  # L2
    assert kinds('"x"@en-US') == [(STRING, "x"), (LANGTAG, "en-US")]
    assert kinds("@prefix")[0] == (KEYWORD, "@prefix")
    assert kinds("@base")[0] == (KEYWORD, "@base")


def test_iriref_escapes():  # L3, L4
    assert kinds("<http://a/\\u0041>") == [(IRIREF, "http://a/A")]
    assert kinds("<http://a/\\U0001F600>") == [(IRIREF, "http://a/\U0001F600")]
    with pytest.raises(LexError):
        tokenize("<http://a/ b>")
    with pytest.raises(LexError):
        tokenize("<http://a/{}>")


def test_string_short_and_long():  # L5
    assert kinds(r'"a\nb"') == [(STRING, "a\nb")]
    assert kinds("'''a''b\"c'''") == [(STRING, "a''b\"c")]
    assert kinds('"""x"" y"""') == [(STRING, 'x"" y')]
    assert kinds(r'"A\t"') == [(STRING, "A\t")]
    # the reference accepts raw newlines even in short strings
    # (lexing.rs:533-535 commented-out check)
    assert kinds('"a\nb"') == [(STRING, "a\nb")]


def test_numeric_fsm():  # L6
    assert kinds("42") == [(NUMERIC, ("42", "integer"))]
    assert kinds("-4.002602") == [(NUMERIC, ("-4.002602", "decimal"))]
    assert kinds("1.663E-4") == [(NUMERIC, ("1.663E-4", "double"))]
    assert kinds("3E1") == [(NUMERIC, ("3E1", "double"))]
    assert kinds(".5") == [(NUMERIC, (".5", "decimal"))]
    assert kinds("+7") == [(NUMERIC, ("+7", "integer"))]
    assert kinds(".") == [(PUNCT, ".")]
    # `1.` (dot not followed by digit/exponent) errors, like the reference FSM
    with pytest.raises(LexError):
        tokenize("1. ")


def test_blank_node_label():  # L7
    assert kinds("_:a") == [(BLANK, "_:a")]
    assert kinds("_:0b.c") == [(BLANK, "_:0b.c")]
    with pytest.raises(LexError):
        tokenize("_ :a")


def test_pn_local_escapes():  # L8, L9
    assert kinds(r"p:a\~b") == [(COMPACT, ("p", "a~b"))]
    assert kinds("p:a%2Fb") == [(COMPACT, ("p", "a/b"))]  # %XX decoded (reference quirk)
    assert kinds("p:") == [(COMPACT, ("p", ""))]
    assert kinds(":x") == [(COMPACT, ("", "x"))]
    assert kinds("p:x:y") == [(COMPACT, ("p", "x:y"))]


def test_keywords_need_boundary():  # L9
    assert kinds("a ")[0] == (KEYWORD, "a")
    assert kinds("true ") == [(KEYWORD, "true")]
    assert kinds("PREFIX ") == [(KEYWORD, "PREFIX")]
    assert kinds("PrEfIx ") == [(KEYWORD, "PREFIX")]  # ASCII-case-insensitive
    assert kinds("BASE ") == [(KEYWORD, "BASE")]
    # `a:x` is a compact IRI, not the keyword
    assert kinds("a:x") == [(COMPACT, ("a", "x"))]


def test_punct_and_delimiters():  # L10
    assert kinds(", ; ^^ ( ) [ ]") == [
        (PUNCT, ","), (PUNCT, ";"), (PUNCT, "^^"),
        (BEGIN, "("), (END, ")"), (BEGIN, "["), (END, "]")]
    with pytest.raises(LexError):
        tokenize("^x")


def test_spans_are_char_offsets():
    toks = tokenize('<http://a/> <http://b/> "x" .')
    assert (toks[0].start, toks[0].end) == (0, 11)
    assert (toks[3].start, toks[3].end) == (28, 29)


def test_bare_name_is_compact_iri_quirk():
    """A bare non-keyword name followed by whitespace lexes as
    CompactIri(name, "") with no colon — reference quirk
    (lexing.rs:726-730 breaks to the PN_LOCAL path)."""
    assert kinds("foo ") == [(COMPACT, ("foo", ""))]
    # and resolves through the prefix map like any compact IRI
    from kgruntime.ttl import BuildError, parse_turtle
    import pytest as _pytest

    with _pytest.raises(BuildError):
        parse_turtle("foo <http://p/> <http://o/> .")


def test_keyword_followed_by_comment_errors():
    """`true#c` — '#' is not whitespace, so the keyword boundary check
    fails exactly like the reference's Unexpected error."""
    with pytest.raises(LexError):
        tokenize("true#c")


def test_dotted_namespace():
    assert kinds("a.b:x") == [(COMPACT, ("a.b", "x"))]
    # trailing dot before colon is an error both here and in the reference
    with pytest.raises(LexError):
        tokenize("ab.:x .")


def test_long_string_fast_path_with_escape():
    # backslash before the closing run forces the slow path
    assert kinds(r'"""a\tb"""') == [(STRING, "a\tb")]
    assert kinds('"""""" ') == [(STRING, "")]


def test_numeric_then_statement_dot():
    toks = kinds("<http://s/> <http://p/> 5 .")
    assert toks[2] == (NUMERIC, ("5", "integer"))
    assert toks[3] == (PUNCT, ".")


def test_iri_ref_grammar_validation():
    """RFC 3987 validator parity cases (reference: iref crate acceptance,
    lexing.rs:450 / build.rs:149)."""
    from kgruntime.ttl.iri import is_valid_iri, is_valid_iri_ref

    good = ["http://example.com/a?b#c", "http://u@h:80/p", "//h/p", "a/b",
            "?q", "#f", "", "http://[2001:db8::1]/x", "urn:uuid:1234",
            "http://例え.jp/パス", "p:a%2Fb", "../rel",
            "mailto:x@y.z", "http://1.2.3.4:99/", "http://h/~u"]
    bad = ["http://ex a", "http://h/[x]", "http://h/%GG", "http://h/%2",
           "1http://e", "http://h:8a/", "http://[1.2.3]/", "http://h/p|q",
           "http://h/a\\b", "%ZZ"]
    for g in good:
        assert is_valid_iri_ref(g), g
    for b in bad:
        assert not is_valid_iri_ref(b), b
    assert is_valid_iri("http://e/x")
    assert not is_valid_iri("rel/x")          # absolute requires scheme
    assert not is_valid_iri("http://h/%G1")
