"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All operate on the flat ``documents`` testdata table
(doc_id:int64, text:string, lang:string, source:string, n_chars:int64)
as stateless vectorized ``map_batches`` stages; the regex/profile state
lives module-level (compiled once per worker process import) or in an
actor ``__init__`` where noted.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = r"\S+"
# BPE-ish word/punct splitter (GPT-2 style, simplified, no lookbehind)
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been for on with as at by "
    "it this that from".split())


def _round6(x: float) -> float:
    """Round-half-away-from-zero at 6 decimals for non-negative ratios —
    matches DuckDB's ROUND so oracle value-hashes agree (Python's builtin
    round is banker's and differs on exact dyadic halves like 125/128)."""
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def token_stats(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_bpe_tokens, avg_token_len) — fully vectorized
    whitespace counting via Arrow regex kernels; BPE-ish count via a
    compiled regex per row (C-speed findall)."""
    text = batch["text"]
    trimmed = pc.utf8_trim_whitespace(text)
    n_tokens = pc.if_else(
        pc.equal(trimmed, ""), pa.scalar(0, pa.int64()),
        pc.cast(pc.count_substring_regex(trimmed, _TOKEN_RE), pa.int64()))
    compact_len = pc.utf8_length(pc.replace_substring_regex(trimmed, r"\s+", ""))
    avg_len = pc.if_else(
        pc.equal(n_tokens, 0), pa.scalar(0.0),
        pc.divide(pc.cast(compact_len, pa.float64()),
                  pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64())))
    n_bpe = pa.array([len(_BPE_RE.findall(t)) for t in text.to_pylist()],
                     pa.int64())
    return pa.Table.from_arrays(
        [batch["doc_id"], n_tokens, n_bpe,
         pc.round(avg_len, ndigits=6, round_mode="half_towards_infinity")],
        names=["doc_id", "n_tokens", "n_bpe_tokens", "avg_token_len"])


def quality_scores(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, stopword_ratio, alpha_ratio, quality) — length /
    stopword / alphabetic heuristics à la C4/Gopher filtering rules."""
    texts = batch["text"].to_pylist()
    n_tok, sw_ratio, alpha_ratio, quality = [], [], [], []
    for t in texts:
        toks = t.split()
        n = len(toks)
        n_tok.append(n)
        if n == 0:
            sw_ratio.append(0.0); alpha_ratio.append(0.0); quality.append(0.0)
            continue
        sw = sum(1 for w in toks if w.lower() in STOPWORDS) / n
        al = sum(1 for w in toks if w.isalpha()) / n
        q = min(1.0, n / 50.0) * (0.5 + 0.5 * al) * (1.0 - 0.5 * sw)
        sw_ratio.append(_round6(sw))
        alpha_ratio.append(_round6(al))
        quality.append(_round6(q))
    return pa.Table.from_arrays(
        [batch["doc_id"], pa.array(n_tok, pa.int64()),
         pa.array(sw_ratio, pa.float64()), pa.array(alpha_ratio, pa.float64()),
         pa.array(quality, pa.float64())],
        names=["doc_id", "n_tokens", "stopword_ratio", "alpha_ratio",
               "quality"])


# --- language ID: character n-gram profiles (tiny, deterministic) ---

_LANG_PROFILES = {
    "en": "the and ing ion to of in er re he",
    "es": "de la que el en los se del las un",
    "fr": "de la le et les des en un du que",
    "de": "der die und den von sch ein ich das mit",
    "it": "di la che il non per una del gli con",
}


class LangId:
    """N-gram-overlap language classifier — actor-pool stage: profiles
    compiled once per actor in ``__init__`` (stateful-stage pattern)."""

    def __init__(self):
        self.profiles = {lang: set(p.split())
                         for lang, p in _LANG_PROFILES.items()}

    def classify(self, text: str) -> str:
        toks = set(re.findall(r"[a-zà-ÿ]+", text.lower()))
        grams = set()
        for t in toks:
            grams.add(t)
            for i in range(len(t) - 2):
                grams.add(t[i:i + 3])
        best, best_score = "und", 0
        for lang, prof in self.profiles.items():
            score = len(grams & prof)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch["text"].to_pylist()]
        return pa.Table.from_arrays(
            [batch["doc_id"], pa.array(preds, pa.string())],
            names=["doc_id", "pred_lang"])


# --- document fingerprint: rolling polynomial hash over tokens ---

_FP_BASE = 1099511628211
_FP_OFFSET = 14695981039346656037
_FP_MASK = (1 << 64) - 1


def fingerprint_tokens(tokens: list[str]) -> int:
    """FNV-style rolling hash over the token sequence (order-sensitive).

    Pure-int with an explicit 64-bit mask: identical values to the
    former numpy-uint64 version (wraparound ≡ mask) without per-token
    numpy scalar overhead or its overflow RuntimeWarning."""
    h = _FP_OFFSET
    for t in tokens:
        h = ((h ^ zlib.crc32(t.encode())) * _FP_BASE) & _FP_MASK
    return h


def fingerprints(batch: pa.Table) -> pa.Table:
    """(doc_id, fingerprint:uint64, prefix_fingerprint:uint64) — full-doc
    rolling hash + first-32-token prefix hash (prefix collisions catch
    truncation-style near-dups)."""
    fps, pfps = [], []
    for t in batch["text"].to_pylist():
        toks = t.split()
        fps.append(fingerprint_tokens(toks))
        pfps.append(fingerprint_tokens(toks[:32]))
    return pa.Table.from_arrays(
        [batch["doc_id"], pa.array(fps, pa.uint64()),
         pa.array(pfps, pa.uint64())],
        names=["doc_id", "fingerprint", "prefix_fingerprint"])


def _explode_words(t: pa.Table, with_lang: bool) -> "object":
    """Batch → polars frame of non-empty single-space-split words
    (str_split(' ') semantics, matching DuckDB's str_split exactly:
    consecutive spaces yield empty tokens, which both sides drop)."""
    import polars as pl

    cols = {"text": pl.from_arrow(t["text"].combine_chunks())}
    if with_lang:
        cols["lang"] = pl.from_arrow(t["lang"].combine_chunks())
    df = pl.DataFrame(cols)
    out = df.with_columns(pl.col("text").str.split(" ").alias("word")) \
        .drop("text").explode("word") \
        .filter(pl.col("word") != "")
    return out


def term_frequencies(docs_ds, top_n: int = 100):
    """Corpus-level top-N word counts — the classic wordcount, shaped
    for scale: each batch pre-aggregates its own (word, cnt) partials
    with a vectorized polars explode+groupby (Rust-side, no Python row
    loop), so the ``groupby(word)`` shuffle carries per-batch-distinct
    words, not one row per token.  The final distributed sort + limit
    keeps only N rows on the driver.  Ties break by word ascending so
    the boundary of the top-N is deterministic."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import polars as pl

        g = _explode_words(t, with_lang=False) \
            .group_by("word").agg(pl.len().cast(pl.Int64).alias("cnt"))
        return g.to_arrow().cast(
            pa.schema([("word", pa.string()), ("cnt", pa.int64())]))

    return docs_ds.select_columns(["text"]) \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("word").aggregate(Sum("cnt", alias_name="cnt")) \
        .sort(["cnt", "word"], descending=[True, False]) \
        .limit(top_n)


TERM_FREQUENCIES_SQL = """
SELECT word, count(*) AS cnt
FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY cnt DESC, word
LIMIT 100
"""


def vocab_per_lang(docs_ds):
    """Distinct-word count per language — exact distributed COUNT
    DISTINCT: per-batch polars explode + unique reduces each block to
    its distinct (lang, word) pairs, one ``groupby`` dedups globally,
    and a second tiny ``groupby(lang)`` counts.  The heavy shuffle
    carries deduplicated pairs (bounded by vocab × langs), never
    one row per token."""
    from ray.data.aggregate import Count

    def partial(t: pa.Table) -> pa.Table:
        g = _explode_words(t, with_lang=True).unique(["lang", "word"])
        return g.to_arrow().cast(
            pa.schema([("lang", pa.string()), ("word", pa.string())]))

    return docs_ds.select_columns(["text", "lang"]) \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["lang", "word"]).count() \
        .groupby("lang").aggregate(Count(alias_name="vocab_size"))


VOCAB_PER_LANG_SQL = """
SELECT lang, count(DISTINCT word) AS vocab_size
FROM (SELECT lang, unnest(str_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY lang
ORDER BY lang
"""


# --- end-to-end corpus cleaning (filter → exact-dedup keep-first) ---

def clean_corpus(docs_ds, min_quality: float = 0.5, min_chars: int = 20):
    """Training-corpus cleaning pipeline: quality/length filter FIRST
    (cheap vectorized predicates shrink the stream before any exchange),
    then collision-safe exact dedup keeping the smallest ``doc_id`` per
    surviving text.  Returns a Dataset of (keep_id, n_copies, quality).

    The dedup shuffle is keyed on (16-byte content hash, text) exactly
    like ``ops/dedup.py:exact_dedup_groups`` — partitioning resolves on
    the hash, the text in the key makes silent collision merges
    impossible, and each batch pre-collapses its duplicates so the
    exchange carries per-batch-distinct rows only.
    """
    from ray.data.aggregate import Min, Sum

    from .dedup import add_text_hash

    def prep(t: pa.Table) -> pa.Table:
        q = quality_scores(t)["quality"]
        keep = pc.and_(pc.greater_equal(q, pa.scalar(min_quality)),
                       pc.greater_equal(t["n_chars"],
                                        pa.scalar(min_chars)))
        t = t.append_column("quality", q).filter(keep)
        t = add_text_hash(t.select(["doc_id", "text", "quality"]))
        # batch-local combiner before the exchange
        g = t.group_by(["text_hash", "text", "quality"],
                       use_threads=False) \
            .aggregate([("doc_id", "min"), ("doc_id", "count")])
        return g.rename_columns(
            ["text_hash", "text", "quality", "keep_id", "cnt"])

    return docs_ds.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby(["text_hash", "text", "quality"]) \
        .aggregate(Min("keep_id", alias_name="keep_id"),
                   Sum("cnt", alias_name="n_copies")) \
        .select_columns(["keep_id", "n_copies", "quality"])
