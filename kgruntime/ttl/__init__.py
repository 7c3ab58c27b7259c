"""Turtle front-end: lexer (L1-L12), parser (P1-P15), builder (B1-B15).

Pure per-document functions — the whole chain runs inside one Ray Data
``map_batches`` UDF invocation (SURVEY.md §1.4: token stream and AST are
never materialized as Datasets).
"""

from .builder import BuildError, build_document, default_labeler
from .lexer import LexError, tokenize
from .parser import ParseError, parse_document


def parse_turtle(
    text: str,
    base_iri: str | None = None,
    labeler=default_labeler,
    relabel=None,
    literal_normalizer=None,
) -> list[tuple]:
    """Tokenize + parse + build one Turtle document into triple rows.

    Mirrors the reference composition ``Document::parse_str`` +
    ``build_triples`` (/root/reference/src/parsing.rs:150-159,
    build.rs:59-73).  Raises LexError / ParseError / BuildError.
    """
    return build_document(parse_document(tokenize(text)), base_iri,
                          labeler, relabel, literal_normalizer)


__all__ = [
    "tokenize", "parse_document", "build_document", "parse_turtle",
    "LexError", "ParseError", "BuildError", "default_labeler",
]
