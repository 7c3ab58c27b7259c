"""Ray Data stages N1 (span normalizer) + fused L/P/B triple extraction
(SURVEY.md §2b/§2c/§2d, §3 Ray lifecycle).

Design (Ray-Data-first, not a port): the reference's char→token→AST→triple
chain is a *per-document pure function*, so the entire front-end fuses
into one stateless ``map_batches`` over zero-copy Arrow batches.  Tokens
and ASTs never touch the object store; only the input documents table and
the output triples table exist as Datasets (SURVEY.md §1.4).

Scale notes (100 TB design intent):
* stateless tasks, no actors — parse state is per-invocation, retries are
  safe (UDF is deterministic and side-effect-free);
* malformed documents are *quarantined as rows*, never raised — a single
  bad doc must not kill a 256-node job (reference fails fast,
  examples/simple.rs:27-37; we deliberately do not);
* errors and triples come out of one pass as a tagged union table
  (``record_kind``), so the expensive parse runs once even when both
  sinks are consumed; split with the vectorized filters below;
* batch_size is kept moderate: long documents fan out to many triple
  rows (output amplification ~10-100×), so a smaller input batch bounds
  the per-task heap (SURVEY.md §4 backpressure row).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..ttl import LexError, ParseError, BuildError, parse_turtle
from ..ttl.builder import BLANKN

# Combined output schema: triples + quarantined errors (FIXTURES.md §2/§3).
TRIPLES_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("subj", pa.string()),
    ("subj_kind", pa.uint8()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_kind", pa.uint8()),
    ("obj_datatype", pa.string()),
    ("obj_lang", pa.string()),
    ("span_start", pa.int32()),
    ("span_end", pa.int32()),
    ("stmt_index", pa.int32()),
    ("record_kind", pa.uint8()),     # 0 = triple, 1 = error
    ("error_layer", pa.string()),    # "lex" | "parse" | "build" | "span"
    ("error_kind", pa.string()),
    ("error_msg", pa.string()),
])

RECORD_TRIPLE = 0
RECORD_ERROR = 1


def concat_text_spans(batch: pa.Table) -> tuple[list[str], list[str], list[str]]:
    """Vectorized unpack of the ``spans`` list<struct> column.

    Returns (doc_ids, concatenated_text_per_doc, span_error_per_doc) where
    span_error is "" for valid rows.  The per-row invariant checked here is
    the input_hint one: kinds ∈ {text, media}, offsets monotonically
    non-decreasing (zero-length media spans may share the next text
    span's offset).
    """
    col = batch["spans"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    offs = flat.field("offset").to_pylist()
    offsets = col.offsets.to_pylist()
    doc_ids = batch["doc_id"].to_pylist()
    out_text: list[str] = []
    out_err: list[str] = []
    for r in range(len(doc_ids)):
        lo, hi = offsets[r], offsets[r + 1]
        err = ""
        parts = []
        prev_off = -1
        for j in range(lo, hi):
            k = kinds[j]
            if k == "text":
                parts.append(texts[j])
            elif k != "media":
                err = f"unknown span kind {k!r}"
                break
            o = offs[j]
            if o is None or o < prev_off:
                err = "span offsets not monotonically non-decreasing"
                break
            prev_off = o
        out_text.append("".join(parts))
        out_err.append(err)
    return doc_ids, out_text, out_err


def normalize_spans(batch: pa.Table) -> pa.Table:
    """N1: validate the span sequence, pass rows through UNCHANGED.

    Output spans are byte-for-byte the input spans (span-sequence
    equality invariant, BASELINE.json input_hint); a ``span_ok`` flag is
    appended for downstream quarantine routing.
    """
    _, _, errs = concat_text_spans(batch)
    ok = pa.array([e == "" for e in errs], pa.bool_())
    return batch.append_column("span_ok", ok)


# Per-process parse memo: (subj,pred,obj,...) rows are a PURE function
# of the document text up to the doc-id prefix in blank labels, and
# exact-duplicate payloads are ubiquitous at web scale (boilerplate,
# mirrors, templated pages — the very reason exact dedup exists).  The
# template caches rows with blank labels carrying a \x00 sentinel
# prefix; per doc the sentinel is swapped for "_:{doc_id}/" on
# blank-kind cells only, byte-identical to a direct labeled parse
# (parity: test_ray_extract.py::test_parse_memo_parity).  Keyed by a
# 128-bit content hash so the memo never pins document texts; capped so
# a fully-distinct corpus costs one dict probe per doc and no growth.
_PARSE_MEMO: dict[bytes, list | None] = {}
_PARSE_MEMO_MAX = 8192
_SENT = "\x00"


def _parse_template(text: str):
    """Rows with sentinel-prefixed blank labels, or None when the text
    does not parse (label choice cannot affect success)."""
    key = hashlib.blake2b(text.encode(), digest_size=16).digest()
    hit = _PARSE_MEMO.get(key, _PARSE_MEMO)       # _PARSE_MEMO ≡ miss
    if hit is not _PARSE_MEMO:
        return hit
    try:
        rows = parse_turtle(
            text,
            labeler=lambda n: _SENT + str(n),
            relabel=lambda lbl: _SENT + "L/" + lbl[2:],
        )
    except (LexError, ParseError, BuildError):
        rows = None
    if len(_PARSE_MEMO) < _PARSE_MEMO_MAX:
        _PARSE_MEMO[key] = rows
    return rows


def parse_batch(batch: pa.Table) -> pa.Table:
    """Fused tokenize→parse→build over one Arrow batch of documents.

    One input row (document) → N output rows (triples), i.e. flat-map
    semantics via map_batches.  Blank-node labels are globally unique yet
    per-doc deterministic: generated → ``_:{doc_id}/{n}``, labeled →
    ``_:{doc_id}/L/{name}`` (SURVEY.md §1.4; reference scope is one parse
    run, build.rs:368).  Distinct payloads parse once per worker process
    (see ``_parse_template``).
    """
    doc_ids, texts, span_errs = concat_text_spans(batch)

    c_doc, c_subj, c_sk, c_pred = [], [], [], []
    c_obj, c_ok, c_dt, c_lang = [], [], [], []
    c_ss, c_se, c_si = [], [], []
    c_rk, c_el, c_ek, c_em = [], [], [], []

    for doc_id, text, span_err in zip(doc_ids, texts, span_errs):
        if span_err:
            _push_error(doc_id, "span", "InvalidSpanSequence", span_err, 0, 0,
                        c_doc, c_subj, c_sk, c_pred, c_obj, c_ok, c_dt,
                        c_lang, c_ss, c_se, c_si, c_rk, c_el, c_ek, c_em)
            continue
        rows = _parse_template(text)
        if rows is None:
            # re-parse for exact diagnostics (error docs are the rare
            # path and land in quarantine anyway)
            prefix = "_:" + doc_id + "/"
            try:
                parse_turtle(
                    text,
                    labeler=lambda n, p=prefix: p + str(n),
                    relabel=lambda lbl, p=prefix: p + "L/" + lbl[2:],
                )
            except (LexError, ParseError, BuildError) as e:
                _push_error(doc_id, e.layer, e.kind, str(e), e.start, e.end,
                            c_doc, c_subj, c_sk, c_pred, c_obj, c_ok, c_dt,
                            c_lang, c_ss, c_se, c_si, c_rk, c_el, c_ek, c_em)
            continue
        prefix = "_:" + doc_id + "/"
        for (subj, sk, pred, obj, ok, dt, lang, ss, se, si) in rows:
            if sk == BLANKN:
                subj = prefix + subj[1:]
            if ok == BLANKN:
                obj = prefix + obj[1:]
            c_doc.append(doc_id)
            c_subj.append(subj); c_sk.append(sk)
            c_pred.append(pred)
            c_obj.append(obj); c_ok.append(ok)
            c_dt.append(dt); c_lang.append(lang)
            c_ss.append(ss); c_se.append(se); c_si.append(si)
            c_rk.append(RECORD_TRIPLE)
            c_el.append(""); c_ek.append(""); c_em.append("")

    return pa.Table.from_arrays(
        [pa.array(c_doc, pa.string()), pa.array(c_subj, pa.string()),
         pa.array(c_sk, pa.uint8()), pa.array(c_pred, pa.string()),
         pa.array(c_obj, pa.string()), pa.array(c_ok, pa.uint8()),
         pa.array(c_dt, pa.string()), pa.array(c_lang, pa.string()),
         pa.array(c_ss, pa.int32()), pa.array(c_se, pa.int32()),
         pa.array(c_si, pa.int32()), pa.array(c_rk, pa.uint8()),
         pa.array(c_el, pa.string()), pa.array(c_ek, pa.string()),
         pa.array(c_em, pa.string())],
        schema=TRIPLES_SCHEMA)


def _push_error(doc_id, layer, kind, msg, start, end,
                c_doc, c_subj, c_sk, c_pred, c_obj, c_ok, c_dt, c_lang,
                c_ss, c_se, c_si, c_rk, c_el, c_ek, c_em):
    c_doc.append(doc_id)
    c_subj.append(""); c_sk.append(0)
    c_pred.append(""); c_obj.append(""); c_ok.append(0)
    c_dt.append(""); c_lang.append("")
    c_ss.append(start); c_se.append(end); c_si.append(-1)
    c_rk.append(RECORD_ERROR)
    c_el.append(layer); c_ek.append(kind); c_em.append(msg)


def keep_triples(batch: pa.Table) -> pa.Table:
    """Vectorized split: triple rows only, lineage columns retained,
    error columns dropped (T1-adjacent; fuses with upstream parse)."""
    import pyarrow.compute as pc
    t = batch.filter(pc.equal(batch["record_kind"], RECORD_TRIPLE))
    return t.drop_columns(["record_kind", "error_layer", "error_kind",
                           "error_msg"])


def keep_errors(batch: pa.Table) -> pa.Table:
    """Vectorized split: quarantine rows only (FIXTURES.md §3 shape)."""
    import pyarrow.compute as pc
    t = batch.filter(pc.equal(batch["record_kind"], RECORD_ERROR))
    return t.select(["doc_id", "span_start", "span_end",
                     "error_layer", "error_kind", "error_msg"])


def extract_triples(docs_ds, batch_size: int = 1024):
    """documents Dataset → combined triples+errors Dataset.

    Stateless task-based ``map_batches`` (plain function → no actor pool
    needed: there is no per-worker state to amortize).  ``batch_size``
    bounds output amplification; blocks of the 100 TB input stream
    through with backpressure — nothing here materializes.
    """
    return docs_ds.map_batches(parse_batch, batch_format="pyarrow",
                               batch_size=batch_size, zero_copy_batch=True)


def triples_dataset(docs_ds, batch_size: int = 1024):
    """documents Dataset → triples-only Dataset (errors dropped)."""
    return extract_triples(docs_ds, batch_size).map_batches(
        keep_triples, batch_format="pyarrow", zero_copy_batch=True)


def errors_dataset(docs_ds, batch_size: int = 1024):
    """documents Dataset → quarantine Dataset (FIXTURES.md §3)."""
    return extract_triples(docs_ds, batch_size).map_batches(
        keep_errors, batch_format="pyarrow", zero_copy_batch=True)
