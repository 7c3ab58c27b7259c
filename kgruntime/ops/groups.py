"""Coarse-grouped map_groups — the scale fix for fine-grained groupbys.

``ds.groupby(keys).map_groups(fn)`` pays a per-GROUP split/convert cost
inside Ray; with an unbounded key (LSH band buckets, text hashes) the
group count grows with the corpus and that overhead dominates — the
round-5 curate_corpus ablation measured 253 s for a 31.8M-group
sort-aggregate and 167 s for a 9.4k-group map_groups at 38.4M docs
(BASELINE.md).  This helper keeps the SEMANTICS of per-key groups but
exchanges on a COARSE bucket (hash(keys) % ~4×CPUs): within each
coarse block the rows are lexsorted by the true keys and ``fn`` runs
per key-slice IN-PROCESS — Ray group overhead is paid ~128×, not
|distinct keys|×.

Losslessness: equal keys hash to the same coarse bucket, so every true
group arrives intact in exactly one block.

Options:
- ``min_group_size``: skip groups smaller than this (lossless for
  pair-generation fns, where singleton buckets emit nothing —
  and on realistic corpora MOST LSH buckets are singletons).
- ``passthrough_max_size``: groups ≤ this size are emitted unchanged
  without calling ``fn`` (lossless when fn is the identity on small
  groups, e.g. a top-k cap).  Mutually exclusive with min_group_size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MIX = np.int64(-7046029254386353131)   # splitmix64 odd constant


def coarse_group_map(ds, keys, fn, coarse: int | None = None,
                     min_group_size: int = 1,
                     passthrough_max_size: int = 0):
    """Equivalent of ``ds.groupby(keys).map_groups(fn,
    batch_format="pyarrow")`` for INTEGER key columns, exchanged on a
    coarse bucket.  ``fn`` receives each true key group as a pa.Table
    (without the helper's bucket column) and must return a pa.Table
    with a consistent schema."""
    from .join import default_num_buckets

    if isinstance(keys, str):
        keys = [keys]
    if coarse is None:
        coarse = default_num_buckets()

    def add_cg(t: pa.Table) -> pa.Table:
        acc = None
        for k in keys:
            v = t[k].combine_chunks().to_numpy(zero_copy_only=False) \
                .astype(np.int64, copy=False)
            m = v * _MIX               # int64 wrap is fine (hash mix)
            acc = m if acc is None else acc ^ m
        return t.append_column(
            "__cg", pa.array((acc % coarse).astype("int32"), pa.int32()))

    def per_coarse(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__cg"])
        cols = [g[k].combine_chunks().to_numpy(zero_copy_only=False)
                for k in keys]
        order = np.lexsort(tuple(reversed(cols)))
        gs = g.take(pa.array(order))
        n = gs.num_rows
        change = np.zeros(n, bool)
        change[0] = True
        for a in cols:
            asorted = a[order]
            change[1:] |= asorted[1:] != asorted[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        outs = []
        passthrough = []
        for s, e in zip(starts, ends):
            size = e - s
            if size < min_group_size:
                continue
            if passthrough_max_size and size <= passthrough_max_size:
                passthrough.append((s, size))
                continue
            outs.append(fn(gs.slice(s, size)))
        if passthrough:
            # one vectorized take for all small groups
            idx = np.concatenate([np.arange(s, s + z)
                                  for s, z in passthrough])
            outs.append(gs.take(pa.array(idx)))
        if not outs:
            # empty result with fn's schema: probe fn on an empty slice
            return fn(gs.slice(0, 0))
        return pa.concat_tables(outs, promote_options="default") \
            .combine_chunks()

    return ds.map_batches(add_cg, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("__cg").map_groups(per_coarse, batch_format="pyarrow")
