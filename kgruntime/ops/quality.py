"""Corpus-quality scoring operators beyond simple ratio heuristics:
character-distribution entropy and a two-pass bigram language-model
scorer (the CCNet-style "score every document against a corpus LM"
shape, here with the LM trained on the corpus itself in pass 1).

Both are oracle-checked: every float expression is computed by the
IDENTICAL formula on the DuckDB side and rounded half-away at 6 digits,
so hashes agree despite summation-order differences (terms are O(1)
magnitudes over ≤ a few hundred summands — 1e-15 noise, far below the
rounding grid).

Scale notes:
* ``char_entropy_scores`` is embarrassingly parallel (one vectorized
  numpy pass per batch, no shuffle).
* ``bigram_lm_scores`` ships ONLY count partials through its two
  ``groupby`` exchanges (vocab-sized, never per-token rows); the count
  tables are broadcast once via ``ray.put`` and joined per batch with
  polars (zero-copy, no Python dict probing — CLAUDE.md broadcast
  lesson).  The broadcast is vocabulary²-bounded, independent of corpus
  size; a beyond-broadcast LM would swap the joins onto the bucketed
  path in ``ops/join.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _round6_arr(v: np.ndarray) -> np.ndarray:
    """Vectorized round-half-away-from-zero at 6 digits (DuckDB ROUND)."""
    return np.copysign(np.floor(np.abs(v) * 1e6 + 0.5), v) / 1e6


# ------------------------------------------------------------- entropy

def _entropy_batch(t: pa.Table) -> pa.Table:
    """(doc_id, n_chars_used, char_entropy) — one vectorized pass:
    utf-32 codepoints of the batch-concatenated text keyed by
    ``doc_index << 32 | codepoint``, one ``np.unique`` for all
    per-(doc, char) counts, ``entropy = log2(n) - Σ c·log2(c) / n``."""
    texts = t["text"].to_pylist()
    lens = np.array([len(s) for s in texts], np.int64)
    keep = lens > 0                       # empty docs have no char rows
    if not keep.any():
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_chars_used": pa.array([], pa.int64()),
                         "char_entropy": pa.array([], pa.float64())})
    codes = np.frombuffer("".join(texts).encode("utf-32-le"), np.uint32)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.uint64), lens)
    key = (doc_idx << np.uint64(32)) | codes.astype(np.uint64)
    uniq, counts = np.unique(key, return_counts=True)
    d = (uniq >> np.uint64(32)).astype(np.int64)
    csum = np.zeros(len(texts), np.float64)
    np.add.at(csum, d, counts * np.log2(counts))
    n = lens.astype(np.float64)
    ent = np.where(keep, np.log2(np.maximum(n, 1)) -
                   csum / np.maximum(n, 1), 0.0)
    return pa.table({
        "doc_id": t["doc_id"].filter(pa.array(keep)),
        "n_chars_used": pa.array(lens[keep], pa.int64()),
        "char_entropy": pa.array(_round6_arr(ent[keep]), pa.float64()),
    })


def char_entropy_scores(docs_ds):
    """Per-document Shannon entropy of the character distribution — the
    classic gibberish / boilerplate detector (near-zero entropy =
    repeated filler, very high = random noise).  No shuffle."""
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        _entropy_batch, batch_format="pyarrow", zero_copy_batch=True)


def char_entropy_sql() -> str:
    return r"""
        WITH chars AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c
          FROM documents WHERE length(text) > 0),
        cc AS (SELECT doc_id, c, count(*) AS n
               FROM chars GROUP BY doc_id, c),
        tot AS (SELECT doc_id, sum(n) AS total,
                       sum(n * log2(n)) AS csum
                FROM cc GROUP BY doc_id)
        SELECT doc_id, CAST(total AS BIGINT) AS n_chars_used,
               round(log2(CAST(total AS DOUBLE))
                     - csum / CAST(total AS DOUBLE), 6) AS char_entropy
        FROM tot ORDER BY doc_id
    """


# ------------------------------------------------------------ bigram LM

def _token_partials(t: pa.Table):
    """Batch → (unigram counts, bigram counts) polars frames via
    split/explode/shift — no per-row Python."""
    import polars as pl

    toks = pl.from_arrow(t.select(["doc_id", "text"])) \
        .with_columns(pl.col("text").str.split(" ").alias("w")) \
        .drop("text").explode("w")
    uni = toks.group_by("w").agg(pl.len().alias("n"))
    bi = toks.with_columns(
        pl.col("w").shift(-1).over("doc_id").alias("w2")) \
        .drop_nulls("w2") \
        .group_by(["w", "w2"]).agg(pl.len().alias("n"))
    return uni, bi


def bigram_lm_scores(docs_ds):
    """(doc_id, n_bigrams, lm_score): mean log2 add-one-smoothed bigram
    probability per document, with the bigram LM estimated from the
    corpus itself in pass 1.

    ``score = avg over adjacent pairs (w1, w2) of
    log2((c(w1,w2) + 1) / (c(w1) + V))`` where ``c(w1)`` is the corpus
    unigram count and ``V`` the distinct-unigram count.  Documents with
    fewer than 2 tokens have no bigrams and emit no row (matches the
    SQL, whose bigram join produces nothing for them).
    """
    import polars as pl
    import ray
    from ray.data.aggregate import Sum

    cols = docs_ds.select_columns(["doc_id", "text"])

    def uni_part(t: pa.Table) -> pa.Table:
        return _token_partials(t)[0].to_arrow()

    def bi_part(t: pa.Table) -> pa.Table:
        return _token_partials(t)[1].to_arrow()

    uni = cols.map_batches(uni_part, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("w").aggregate(Sum("n", alias_name="c1")).to_pandas()
    bi = cols.map_batches(bi_part, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["w", "w2"]).aggregate(Sum("n", alias_name="cb")) \
        .to_pandas()
    vocab_v = len(uni)
    lm_ref = ray.put((pl.from_pandas(uni), pl.from_pandas(bi)))

    def score(t: pa.Table) -> pa.Table:
        uni_pl, bi_pl = ray.get(lm_ref)
        toks = pl.from_arrow(t.select(["doc_id", "text"])) \
            .with_columns(pl.col("text").str.split(" ").alias("w")) \
            .drop("text").explode("w")
        pairs = toks.with_columns(
            pl.col("w").shift(-1).over("doc_id").alias("w2")) \
            .drop_nulls("w2") \
            .join(bi_pl, on=["w", "w2"], how="left") \
            .join(uni_pl, on="w", how="left") \
            .with_columns(
                ((pl.col("cb").fill_null(0) + 1.0)
                 / (pl.col("c1") + float(vocab_v))).alias("ratio"))
        # np.log2, not polars .log(2) (= ln/ln2): match DuckDB's log2
        pairs = pairs.with_columns(
            pl.Series("lp", np.log2(pairs["ratio"].to_numpy())))
        g = pairs.group_by("doc_id").agg(
            pl.len().alias("n_bigrams"),
            pl.col("lp").sum().alias("s"))
        out = g.to_arrow()
        n = out["n_bigrams"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        s = out["s"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": out["doc_id"],
            "n_bigrams": pa.array(
                out["n_bigrams"].to_numpy(zero_copy_only=False)
                .astype(np.int64), pa.int64()),
            "lm_score": pa.array(_round6_arr(s / n), pa.float64()),
        })

    return cols.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)


def bigram_lm_sql() -> str:
    return r"""
        WITH toks AS (
          SELECT doc_id,
                 generate_subscripts(str_split(text, ' '), 1) AS i,
                 unnest(str_split(text, ' ')) AS w
          FROM documents),
        big AS (
          SELECT a.doc_id, a.w AS w1, b.w AS w2
          FROM toks a JOIN toks b
            ON a.doc_id = b.doc_id AND b.i = a.i + 1),
        c1 AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
        cb AS (SELECT w1, w2, count(*) AS n FROM big GROUP BY w1, w2),
        v AS (SELECT count(DISTINCT w) AS v FROM toks)
        SELECT big.doc_id, count(*) AS n_bigrams,
               round(avg(log2((cb.n + 1.0) / (c1.n + v.v))), 6)
                 AS lm_score
        FROM big
        JOIN cb ON big.w1 = cb.w1 AND big.w2 = cb.w2
        JOIN c1 ON big.w1 = c1.w
        CROSS JOIN v
        GROUP BY big.doc_id ORDER BY big.doc_id
    """
