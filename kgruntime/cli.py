"""CLI mirroring the reference's example entry point
(`/root/reference/examples/simple.rs:15-37`): parse Turtle files, print
canonical N-Quads to stdout, render lexer/parser/builder errors with a
caret-annotated source snippet (codespan-style diagnostic, S5).

Usage:
    python -m kgruntime.cli FILE.ttl [FILE2.ttl ...]
    python -m kgruntime.cli --corpus DIR OUT_DIR   # Ray pipeline over a
                                                   # documents-table dir
"""

from __future__ import annotations

import sys

from .ttl import BuildError, LexError, ParseError, parse_turtle
from .ttl.nquads import canonical_lines


def _render_diagnostic(path: str, src: str, err) -> str:
    start = max(0, min(err.start, len(src)))
    line_no = src.count("\n", 0, start) + 1
    line_start = src.rfind("\n", 0, start) + 1
    line_end = src.find("\n", start)
    if line_end == -1:
        line_end = len(src)
    col = start - line_start + 1
    width = max(1, min(err.end, line_end) - start)
    gutter = f"{line_no} | "
    caret = " " * (len(gutter) + col - 1) + "^" * width
    return (f"error[{err.layer}/{err.kind}]: {err}\n"
            f"  --> {path}:{line_no}:{col}\n"
            f"{gutter}{src[line_start:line_end]}\n{caret}")


def parse_files(paths: list[str]) -> int:
    status = 0
    for path in paths:
        with open(path) as f:
            src = f.read()
        try:
            rows = parse_turtle(src)
        except (LexError, ParseError, BuildError) as e:
            print(_render_diagnostic(path, src, e), file=sys.stderr)
            status = 1
            continue
        for line in canonical_lines(rows):
            print(line)
    return status


def run_corpus(corpus_dir: str, out_dir: str) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from .pipelines.kg import run_checkpointed

    res = run_checkpointed(corpus_dir, out_dir)
    print(f"processed {len(res['processed'])} fragments, "
          f"skipped {len(res['skipped'])} (already committed)")
    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    if argv[0] == "--corpus":
        if len(argv) != 3:
            print("usage: --corpus CORPUS_DIR OUT_DIR", file=sys.stderr)
            return 2
        return run_corpus(argv[1], argv[2])
    return parse_files(argv)


if __name__ == "__main__":
    raise SystemExit(main())
