"""kgruntime — a Ray-Data-native knowledge-graph construction engine.

Blueprint: /root/repo/SURVEY.md (reference: turtle-syntax v6.0.0 at
/root/reference, re-expressed Ray-Data-first — not a port).

Layout:
    ttl/        Turtle lexer / parser / builder (pure per-doc functions)
    sources/    documents-table readers + deterministic corpus synthesis
    stages/     Ray Data pipeline stages (normalize, extract, linking,
                canonicalization, materialize/checkpoint)
    ops/        large-scale training-data operators (dedup, ANN, text
                analysis, multimodal stubs)
    pipelines/  end-to-end pipeline compositions
    relational.py  Ray Data relational queries with DuckDB-oracle parity
"""

__version__ = "0.1.0"
PARSER_VERSION = "kgruntime-ttl-1"  # recorded in lineage sidecars (N6)
