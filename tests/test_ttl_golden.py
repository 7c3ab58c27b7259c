"""Golden-corpus parity: the 29 reference fixtures, exact label equality
(mirrors /root/reference/tests/positive.rs:11-47 — strip → sort → dedup →
compare; NOT graph isomorphism)."""

import glob
import os

import pytest

from kgruntime.ttl import parse_turtle
from kgruntime.ttl.nquads import canonical_lines, parse_nquads

GOLDEN_DIR = "/root/reference/tests/positive"
CASES = sorted(os.path.basename(p)[:-4]
               for p in glob.glob(os.path.join(GOLDEN_DIR, "p*.ttl")))


@pytest.mark.parametrize("name", CASES)
def test_golden(name):
    with open(os.path.join(GOLDEN_DIR, name + ".ttl")) as f:
        src = f.read()
    with open(os.path.join(GOLDEN_DIR, name + ".nq")) as f:
        expected = canonical_lines(parse_nquads(f.read()))
    got = canonical_lines(parse_turtle(src))
    assert got == expected


def test_corpus_precision_recall():
    """Corpus-level P/R vs the reference goldens must be ≥ 0.95
    (BASELINE.json metric) — with exact parity it is 1.0."""
    emitted, expected = set(), set()
    for name in CASES:
        with open(os.path.join(GOLDEN_DIR, name + ".ttl")) as f:
            src = f.read()
        with open(os.path.join(GOLDEN_DIR, name + ".nq")) as f:
            expected |= {(name, l) for l in canonical_lines(parse_nquads(f.read()))}
        emitted |= {(name, l) for l in canonical_lines(parse_turtle(src))}
    inter = len(emitted & expected)
    precision = inter / len(emitted)
    recall = inter / len(expected)
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0


def test_negative_case_has_span():
    from kgruntime.ttl import LexError

    with open("/root/reference/examples/syntax_error.ttl") as f:
        src = f.read()
    with pytest.raises(LexError) as ei:
        parse_turtle(src)
    assert ei.value.kind == "Unexpected"
    assert src[ei.value.start] == " "  # the offending space inside the IRIREF
