"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (training-data pipeline components).

Scale shapes (ray_guide "Aggregation at scale" patterns):

* exact: content-hash column in a vectorized ``map_batches`` →
  hash-shuffle ``groupby(hash)`` keeping ``min(doc_id)`` — native
  aggregation, no per-group Python;
* MinHash-LSH: shingle→minhash per batch (numpy, k permutations via the
  (a·h+b) mod p trick) → explode to (band, band_hash, doc_id) rows →
  ``groupby(band, band_hash)`` → per-bucket candidate pairs →
  Jaccard verification (signature-estimate, broadcast-free) →
  components via the same distributed union-find as entity canon;
* SimHash: 64-bit signatures, hamming≤k via pigeonhole band buckets;
* embedding near-dup: random-hyperplane LSH buckets → exact cosine
  verify inside buckets.

Every stage is batch-vectorized; candidate generation and verification
shuffle only (small) signature/pair rows, never document text.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = np.uint64((1 << 61) - 1)

logger = logging.getLogger(__name__)


def _stable_hash64(data: bytes) -> int:
    """Process-stable 63-bit hash (builtin ``hash`` is SipHash-salted per
    process — never usable as a shuffle key across Ray workers)."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(),
                          "big") & 0x7FFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

# Per-process hasher cache: signature state (permutation coefficients,
# hyperplanes, token memos) is cheap and deterministic to build, so
# these stages run as plain TASK pools — no actor-pool startup/sizing —
# while Ray's long-lived worker processes still reuse one instance per
# process via lru_cache.  Heavy-state stages (LinkScorer, LangId,
# MediaDecoder) remain actor pools.
from functools import lru_cache


@lru_cache(maxsize=8)
def _minhasher(num_perm: int, bands: int, shingle_n: int, seed: int):
    return MinHasher(num_perm=num_perm, bands=bands, shingle_n=shingle_n,
                     seed=seed)


def minhash_explode(batch: pa.Table, num_perm: int = 64, bands: int = 16,
                    shingle_n: int = 3, seed: int = 13) -> pa.Table:
    return _minhasher(num_perm, bands, shingle_n, seed)(batch)


@lru_cache(maxsize=8)
def _simhasher(bands: int, seed: int):
    return SimHasher(bands=bands, seed=seed)


def simhash_explode(batch: pa.Table, bands: int = 4,
                    seed: int = 17) -> pa.Table:
    return _simhasher(bands, seed)(batch)


@lru_cache(maxsize=8)
def _hyperplane_lsh(dim: int, n_planes: int, seed: int, n_tables: int):
    return HyperplaneLSH(dim=dim, n_planes=n_planes, seed=seed,
                         n_tables=n_tables)


def hyperplane_explode(batch: pa.Table, dim: int, n_planes: int = 12,
                       seed: int = 23, n_tables: int = 1) -> pa.Table:
    return _hyperplane_lsh(dim, n_planes, seed, n_tables)(batch)


def add_text_hash(batch: pa.Table) -> pa.Table:
    """Append a 128-bit content hash of ``text`` as a hex string.  At
    billions of docs a 64-bit hash WILL collide (birthday bound ~5B at
    p=0.5); 128-bit blake2b keeps false merges below 1e-18 even at
    10^12 docs, and ``exact_dedup_groups`` re-verifies text within each
    hash group anyway."""
    texts = batch["text"].to_pylist()
    h = [hashlib.blake2b(t.encode(), digest_size=16).hexdigest()
         for t in texts]
    return batch.append_column("text_hash", pa.array(h, pa.string()))


def exact_dedup(docs_ds):
    """Distinct documents by content hash; keeps ``min(doc_id)`` as the
    canonical representative.  Returns (doc_id→keep mapping Dataset) with
    columns (text_hash, keep_id, n_dups)."""
    from ray.data.aggregate import Count, Min

    return docs_ds.map_batches(add_text_hash, batch_format="pyarrow") \
        .groupby("text_hash") \
        .aggregate(Min("doc_id", alias_name="keep_id"),
                   Count(alias_name="n_dups"))


def _local_exact_combine(batch: pa.Table) -> pa.Table:
    """Batch-local combiner: vectorized Arrow group_by collapses in-batch
    duplicates before the exchange."""
    batch = add_text_hash(batch.select(["doc_id", "text"]))
    g = batch.group_by(["text_hash", "text"], use_threads=False) \
        .aggregate([("doc_id", "min"), ("doc_id", "count")])
    return g.rename_columns(["text_hash", "text", "keep_id", "cnt"])


def exact_dedup_groups(docs_ds):
    """Exact duplicate groups with text retained, collision-safe and
    native: the global hash-aggregate keys on (text_hash, text) with the
    16-byte hash LEADING the key, so exchange partitioning and compares
    resolve on the hash and only consult the text on (vanishingly rare)
    hash ties — while keeping text in the key makes a silent collision
    merge impossible.  Returns (text, keep_id, n_dups)."""
    from ray.data.aggregate import Min, Sum

    return docs_ds.map_batches(_local_exact_combine,
                               batch_format="pyarrow") \
        .groupby(["text_hash", "text"]) \
        .aggregate(Min("keep_id", alias_name="keep_id"),
                   Sum("cnt", alias_name="n_dups")) \
        .select_columns(["text", "keep_id", "n_dups"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingles → uint64 hashes (vector)."""
    import zlib

    toks = text.split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    return np.array([zlib.crc32(g.encode()) for g in grams],
                    dtype=np.uint64) if grams else np.array([], np.uint64)


class MinHasher:
    """Signature stage (run as a task pool via ``minhash_explode`` —
    one instance per worker process through the lru_cache factory):
    permutation coefficients drawn once from a fixed seed
    (deterministic across retries/cluster sizes)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_n: int = 3,
                 seed: int = 13):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_n = shingle_n

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_n)
        if len(sh) == 0:
            return np.zeros(self.num_perm, np.uint64)
        # (num_perm, n_shingles) via broadcasting; mod Mersenne prime
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """documents batch → exploded (doc_id, band, band_hash, sig) rows."""
        doc_ids = batch["doc_id"].to_pylist()
        out_doc, out_band, out_hash, out_sig = [], [], [], []
        for d, t in zip(doc_ids, batch["text"].to_pylist()):
            sig = self.signature(t)
            sig_bytes = sig.tobytes()
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                out_doc.append(d)
                out_band.append(b)
                # process-stable hash: builtin hash() is SipHash-salted
                # per worker process and would silently break the
                # cross-actor (band, band_hash) groupby
                out_hash.append(_stable_hash64(chunk.tobytes()))
                out_sig.append(sig_bytes)
        return pa.Table.from_arrays(
            [pa.array(out_doc), pa.array(out_band, pa.int32()),
             pa.array(out_hash, pa.int64()), pa.array(out_sig, pa.binary())],
            names=["doc_id", "band", "band_hash", "sig"])


def _cap_hot_bucket(items: list, cap: int, where: str) -> list:
    """Hot-bucket guard: keep pair generation O(cap²) in a degenerate
    bucket, and LOG how many candidates were dropped (a silent cap reads
    as full recall when it isn't)."""
    if len(items) > cap:
        logger.warning(
            "%s: hot bucket truncated %d -> %d members (%d dropped); "
            "near-dup recall inside this bucket is incomplete",
            where, len(items), cap, len(items) - cap)
        return items[:cap]
    return items


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Candidate pairs within one LSH bucket, with the signature-estimated
    Jaccard (no second pass over text).  Buckets are tiny by
    construction; cap guards a degenerate hot bucket."""
    ids = group["doc_id"].to_pylist()
    sigs = group["sig"].to_pylist()
    uniq = {}
    for i, s in zip(ids, sigs):
        uniq.setdefault(i, s)
    items = _cap_hot_bucket(sorted(uniq.items()), 200, "minhash_lsh")
    a_col, b_col, jac = [], [], []
    for i in range(len(items)):
        ai, asig = items[i]
        av = np.frombuffer(asig, np.uint64)
        for j in range(i + 1, len(items)):
            bi, bsig = items[j]
            bv = np.frombuffer(bsig, np.uint64)
            est = float((av == bv).mean())
            a_col.append(ai); b_col.append(bi); jac.append(est)
    return pa.Table.from_arrays(
        [pa.array(a_col, pa.int64()), pa.array(b_col, pa.int64()),
         pa.array(jac, pa.float64())],
        names=["doc_a", "doc_b", "jaccard_est"])


def minhash_near_dups(docs_ds, threshold: float = 0.7, num_perm: int = 64,
                      bands: int = 16):
    """Near-duplicate pairs (doc_a < doc_b, jaccard_est ≥ threshold)."""
    exploded = docs_ds.map_batches(
        minhash_explode, fn_kwargs={"num_perm": num_perm, "bands": bands},
        batch_format="pyarrow")
    pairs = exploded.groupby(["band", "band_hash"]) \
        .map_groups(_bucket_pairs, batch_format="pyarrow")
    uniq = pairs.groupby(["doc_a", "doc_b"]).max("jaccard_est") \
        .rename_columns({"max(jaccard_est)": "jaccard_est"})
    return uniq.filter(expr=f"jaccard_est >= {threshold}")


def dedup_components(pairs_ds):
    """Near-dup pairs → duplicate clusters via the same distributed
    union-find used for entity canonicalization (stages/canon.py)."""
    from ..stages.canon import connected_components

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pc.cast(t["doc_a"], pa.string()), pc.cast(t["doc_b"], pa.string())],
            names=["src", "dst"])

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow")
    return connected_components(edges)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for verification / small candidate sets)
# ---------------------------------------------------------------------------

def _gram_set(text: str, n: int = 3) -> set:
    """Word n-gram STRING set (SQL-parity twin of ``_shingle_hashes`` —
    hashes can collide within a doc and skew the set cardinality, so the
    oracle-checked path compares the grams themselves)."""
    toks = text.split()
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def exact_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    a = set(_shingle_hashes(text_a, n).tolist())
    b = set(_shingle_hashes(text_b, n).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


def jaccard_adjacent_pairs(docs_ds, num_buckets: int = 8):
    """Oracle-checkable exact Jaccard surface: word-3-gram Jaccard of
    each (even doc_id, doc_id+1) pair via ONE bucketed hash join — a
    deterministic linear-size pair set, so the driver's DuckDB oracle can
    replicate it exactly.  Returns (doc_a, doc_b, jaccard)."""
    from .join import bucketed_hash_join

    def evens(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = t.filter(pa.array(ids % 2 == 0))
        nxt = pc.add(keep["doc_id"].combine_chunks(),
                     pa.scalar(1, pa.int64()))
        return pa.Table.from_arrays(
            [keep["doc_id"], nxt, keep["text"]],
            names=["doc_a", "join_key", "text_a"])

    left = docs_ds.select_columns(["doc_id", "text"]) \
        .map_batches(evens, batch_format="pyarrow", zero_copy_batch=True)
    right = docs_ds.select_columns(["doc_id", "text"]) \
        .rename_columns({"doc_id": "doc_b", "text": "text_b"})
    j = bucketed_hash_join(left, right, "join_key", "doc_b",
                           num_buckets=num_buckets)

    def score(t: pa.Table) -> pa.Table:
        import numpy as np

        out = []
        for x, y in zip(t["text_a"].to_pylist(), t["text_b"].to_pylist()):
            a, b = _gram_set(x), _gram_set(y)
            u = len(a | b)
            v = 1.0 if u == 0 else len(a & b) / u
            out.append(np.floor(v * 1e6 + 0.5) / 1e6)  # half-away, as SQL
        return pa.Table.from_arrays(
            [t["doc_a"], t["join_key"], pa.array(out, pa.float64())],
            names=["doc_a", "doc_b", "jaccard"])

    return j.map_batches(score, batch_format="pyarrow")


def verify_pairs_jaccard(pairs_ds, docs_ds, threshold: float,
                         num_partitions: int = 8):
    """Exact n-gram Jaccard verification of candidate pairs: two bucketed
    hash joins ship only (pair, text) rows — never a full cross product."""
    from .join import bucketed_hash_join

    texts_a = docs_ds.select_columns(["doc_id", "text"]) \
        .rename_columns({"text": "text_a"})
    texts_b = docs_ds.select_columns(["doc_id", "text"]) \
        .rename_columns({"text": "text_b", "doc_id": "doc_id_b"})
    j1 = bucketed_hash_join(pairs_ds, texts_a, "doc_a", "doc_id",
                            num_buckets=num_partitions)
    j2 = bucketed_hash_join(j1, texts_b, "doc_b", "doc_id_b",
                            num_buckets=num_partitions)

    def score(t: pa.Table) -> pa.Table:
        ta = t["text_a"].to_pylist()
        tb = t["text_b"].to_pylist()
        jac = [round(exact_jaccard(x, y), 6) for x, y in zip(ta, tb)]
        out = pa.Table.from_arrays(
            [t["doc_a"], t["doc_b"], pa.array(jac, pa.float64())],
            names=["doc_a", "doc_b", "jaccard"])
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return j2.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash signatures; hamming-≤k candidates via pigeonhole
    band buckets (k+1 bands ⇒ any pair within k shares ≥1 band)."""

    def __init__(self, bands: int = 4, seed: int = 17):
        self.bands = bands
        self.band_bits = 64 // bands
        # token→hash memo, built per actor: corpus vocabulary repeats
        # massively across documents, so the per-token crc32 pair runs
        # once per distinct token per actor, not once per occurrence
        self._memo: dict[str, int] = {}

    def _token_hash(self, t: str) -> int:
        import zlib

        h = self._memo.get(t)
        if h is None:
            h = (zlib.crc32(t.encode()) |
                 (zlib.crc32(t[::-1].encode()) << 32)) & 0xFFFFFFFFFFFFFFFF
            if len(self._memo) < 1_000_000:   # bound actor heap
                self._memo[t] = h
        return h

    def signature(self, text: str) -> int:
        toks = set(text.split())
        if not toks:
            return 0
        # one 64-bit hash per token, then all 64 bit-planes at once:
        # (n_tokens, 64) sign matrix summed down the token axis
        hs = np.array([self._token_hash(t) for t in toks], np.uint64)
        bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) \
            & np.uint64(1)
        acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        sig_bits = (acc > 0).astype(np.uint64)
        return int((sig_bits << np.arange(64, dtype=np.uint64)).sum(
            dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_doc, out_band, out_key, out_sig = [], [], [], []
        mask = (1 << self.band_bits) - 1
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            sig = self.signature(t)
            for b in range(self.bands):
                out_doc.append(d)
                out_band.append(b)
                out_key.append((sig >> (b * self.band_bits)) & mask)
                out_sig.append(sig)
        return pa.Table.from_arrays(
            [pa.array(out_doc), pa.array(out_band, pa.int32()),
             pa.array(out_key, pa.int64()),
             pa.array([s & 0x7FFFFFFFFFFFFFFF for s in out_sig], pa.int64())],
            names=["doc_id", "band", "band_key", "sig"])


def _sim_pairs(group: pa.Table, max_hamming: int) -> pa.Table:
    ids = group["doc_id"].to_pylist()
    sigs = group["sig"].to_pylist()
    uniq = _cap_hot_bucket(sorted(set(zip(ids, sigs))), 200, "simhash")
    a_col, b_col, ham = [], [], []
    for i in range(len(uniq)):
        for j in range(i + 1, len(uniq)):
            d = bin(uniq[i][1] ^ uniq[j][1]).count("1")
            if d <= max_hamming:
                a_col.append(uniq[i][0]); b_col.append(uniq[j][0]); ham.append(d)
    return pa.Table.from_arrays(
        [pa.array(a_col, pa.int64()), pa.array(b_col, pa.int64()),
         pa.array(ham, pa.int32())],
        names=["doc_a", "doc_b", "hamming"])


def simhash_near_dups(docs_ds, max_hamming: int = 3):
    exploded = docs_ds.map_batches(simhash_explode, batch_format="pyarrow")
    pairs = exploded.groupby(["band", "band_key"]).map_groups(
        lambda g: _sim_pairs(g, max_hamming), batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).min("hamming") \
        .rename_columns({"min(hamming)": "hamming"})


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (random hyperplane LSH + in-bucket verify)
# ---------------------------------------------------------------------------

class HyperplaneLSH:
    """Signed-projection buckets; planes drawn once per actor, seeded.

    ``n_tables`` independent tables of ``n_planes`` planes each: a pair
    with hyperplane-collision probability p per plane is recalled with
    1-(1-p^k)^L — k small keeps buckets selective, L recovers recall.
    Each input row explodes to L (table, bucket) rows.
    """

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 23,
                 n_tables: int = 1):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(n_tables, n_planes, dim))
        self.n_tables = n_tables
        self.n_planes = n_planes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        emb = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        out_id, out_bucket, out_emb = [], [], []
        emb_list = batch["embedding"]
        pow2 = (1 << np.arange(self.n_planes)).astype(np.int64)
        for t in range(self.n_tables):
            signs = (emb @ self.planes[t].T) > 0
            keys = signs.dot(pow2) + (t << 40)  # disjoint key space per table
            out_id.append(ids)
            out_bucket.append(keys)
        n = len(ids)
        id_arr = pa.array(np.concatenate(out_id), pa.int64())
        bucket_arr = pa.array(np.concatenate(out_bucket), pa.int64())
        emb_rep = pa.concat_arrays(
            [emb_list.combine_chunks()] * self.n_tables) \
            if isinstance(emb_list, pa.ChunkedArray) else pa.concat_arrays(
            [emb_list] * self.n_tables)
        return pa.Table.from_arrays([id_arr, bucket_arr, emb_rep],
                                    names=["vec_id", "bucket", "embedding"])


def _cos_pairs(group: pa.Table, threshold: float) -> pa.Table:
    ids = _cap_hot_bucket(group["vec_id"].to_pylist(), 256, "embedding_lsh")
    emb = np.array(group["embedding"].to_pylist(),
                   dtype=np.float64)[:len(ids)]
    if len(ids) < 2:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.float64())],
            names=["vec_a", "vec_b", "cosine"])
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    normed = emb / np.maximum(norms, 1e-12)
    sims = normed @ normed.T
    a_col, b_col, cos = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= threshold and ids[i] != ids[j]:
                a, b = sorted((ids[i], ids[j]))
                a_col.append(a); b_col.append(b)
                cos.append(round(float(sims[i, j]), 6))
    return pa.Table.from_arrays(
        [pa.array(a_col, pa.int64()), pa.array(b_col, pa.int64()),
         pa.array(cos, pa.float64())],
        names=["vec_a", "vec_b", "cosine"])


def embedding_near_dups(emb_ds, dim: int, threshold: float = 0.95,
                        n_planes: int = 10, n_tables: int = 1):
    bucketed = emb_ds.map_batches(
        hyperplane_explode,
        fn_kwargs={"dim": dim, "n_planes": n_planes, "n_tables": n_tables},
        batch_format="pyarrow")
    pairs = bucketed.groupby("bucket").map_groups(
        lambda g: _cos_pairs(g, threshold), batch_format="pyarrow")
    return pairs.groupby(["vec_a", "vec_b"]).max("cosine") \
        .rename_columns({"max(cosine)": "cosine"})
