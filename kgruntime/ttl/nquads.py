"""N-Quads/N-Triples reading and canonical serialization (SURVEY.md §2a S3,
§2e T1-T4).

The reference's test harness parses expected ``.nq`` goldens with an
independent N-Quads parser and compares sorted+deduped triples
(`/root/reference/tests/positive.rs:22-46`).  This module provides the
same two halves for our pytest harness and for the Ray pipeline's
canonical text sink:

* :func:`parse_nquads` — a small line-oriented N-Triples reader used only
  by test fixtures (never in the Ray hot path);
* :func:`triple_to_nquad` — canonical serialization of a triple row.
  Plain-vs-``^^xsd:string`` literals are one and the same triple in RDF
  1.1 (the reference compares *parsed* terms, so both sides normalize);
  we canonicalize by always *omitting* the ``xsd:string`` datatype.
"""

from __future__ import annotations

import re

from .builder import BLANKN, IRI, LITERAL, XSD_STRING

_TERM = re.compile(
    r"\s*(?:"
    r"<([^>]*)>"                      # 1: IRI
    r"|(_:[^\s]+)"                    # 2: blank label
    r'|"((?:[^"\\]|\\.)*)"'           # 3: literal lexical form
    r"(?:\^\^<([^>]*)>|@([A-Za-z0-9\-]+))?"  # 4: datatype / 5: lang
    r")"
)

_UNESCAPE = re.compile(r"\\(?:u([0-9a-fA-F]{4})|U([0-9a-fA-F]{8})|(.))")
_ESCAPES = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
            '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str:
    if "\\" not in s:
        return s

    def sub(m: re.Match) -> str:
        if m.group(1):
            return chr(int(m.group(1), 16))
        if m.group(2):
            return chr(int(m.group(2), 16))
        return _ESCAPES[m.group(3)]

    return _UNESCAPE.sub(sub, s)


def parse_nquads(text: str) -> list[tuple]:
    """Parse N-Triples/N-Quads lines → rows ``(subj, subj_kind, pred, obj,
    obj_kind, obj_datatype, obj_lang)``.  Simple literals normalize to
    ``xsd:string`` (RDF 1.1), matching the reference's term-level compare.
    """
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        terms = []
        pos = 0
        for _ in range(3):
            m = _TERM.match(line, pos)
            if not m:
                raise ValueError(f"bad N-Quads line: {line!r}")
            pos = m.end()
            if m.group(1) is not None:
                terms.append((m.group(1), IRI, "", ""))
            elif m.group(2) is not None:
                terms.append((m.group(2), BLANKN, "", ""))
            else:
                lex = _unescape(m.group(3))
                dt = m.group(4)
                lang = m.group(5)
                if lang:
                    terms.append((lex, LITERAL, "", lang))
                else:
                    terms.append((lex, LITERAL, dt or XSD_STRING, ""))
        s, p, o = terms
        out.append((s[0], s[1], p[0], o[0], o[1], o[2], o[3]))
    return out


_SER_ESC = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r",
            "\t": "\\t", "\b": "\\b", "\f": "\\f"}


def _escape(s: str) -> str:
    return "".join(_SER_ESC.get(c, c) for c in s) if any(
        c in _SER_ESC for c in s) else s


def term_to_nquad(value: str, kind: int, datatype: str = "", lang: str = "") -> str:
    if kind == IRI:
        return f"<{value}>"
    if kind == BLANKN:
        return value
    lex = f'"{_escape(value)}"'
    if lang:
        return f"{lex}@{lang}"
    if datatype and datatype != XSD_STRING:
        return f"{lex}^^<{datatype}>"
    return lex


def triple_to_nquad(subj, subj_kind, pred, obj, obj_kind,
                    obj_datatype="", obj_lang="") -> str:
    """Canonical N-Quads line (no trailing newline)."""
    return (f"{term_to_nquad(subj, subj_kind)} <{pred}> "
            f"{term_to_nquad(obj, obj_kind, obj_datatype, obj_lang)} .")


def canonical_lines(rows) -> list[str]:
    """T1+T2+T3: strip lineage, serialize, sort, dedup
    (tests/positive.rs:22-25)."""
    return sorted({triple_to_nquad(r[0], r[1], r[2], r[3], r[4], r[5], r[6])
                   for r in rows})
