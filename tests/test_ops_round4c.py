"""Round-4 (fourth wave) operators: prefix-filtered exact set-similarity
join, PMI collocations, phrase search, RFM segmentation, GIF codec."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


# --------------------------------------------- set-similarity join

def test_set_sim_join_identical_and_disjoint(ray_session):
    from kgruntime.ops.dedup import set_sim_join

    rows = [(1, "a b c d e f"), (2, "a b c d e f"),
            (3, "p q r s t u"), (4, "v w x y z aa")]
    out = set_sim_join(_docs(rows).repartition(2)).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert out[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]
    assert out["jaccard"].tolist() == [1.0]
    assert out["n_inter"].tolist() == [4]   # 4 distinct trigrams
    assert out["n_union"].tolist() == [4]


def test_set_sim_join_threshold_is_exact(ray_session):
    from kgruntime.ops.dedup import set_sim_join

    # docs 1/2 share 3 of 5 union trigrams (J=0.6, exactly τ); doc 3
    # shares only 1 trigram with doc 1 (J=1/7 < τ)
    rows = [(1, "a b c d e f"),       # abc bcd cde def  (4)
            (2, "a b c d e g"),       # abc bcd cde deg  (4) ∩=3 ∪=5
            (3, "a b c z1 z2 z3 z4")]
    out = set_sim_join(_docs(rows), tau_num=3, tau_den=5).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert out[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]
    assert out["n_inter"].tolist() == [3]
    assert out["n_union"].tolist() == [5]
    assert out["jaccard"].tolist() == [0.6]


def test_set_sim_join_size_filter_blocks_containment(ray_session):
    from kgruntime.ops.dedup import set_sim_join

    # doc 2's trigram set strictly contains doc 1's, but sizes 2 vs 8
    # fail τ·max ≤ min, so the pair must not appear even though they
    # share every prefix token
    rows = [(1, "a b c d"),
            (2, "a b c d e f g h i j")]
    out = set_sim_join(_docs(rows)).to_pandas()
    assert len(out) == 0


def test_set_sim_join_repartition_invariant(ray_session):
    from kgruntime.ops.dedup import set_sim_join

    rows = [(i, f"common base words here t{i % 3}") for i in range(12)]
    a = set_sim_join(_docs(rows).repartition(1)).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    b = set_sim_join(_docs(rows).repartition(5)).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # cross-group pairs share 2 of 4 union trigrams (J=0.5 < τ); only
    # the 3 identical groups pair up: 3 * C(4,2)
    assert len(a) == 18
    assert (a["jaccard"] == 1.0).all()
