"""Round-4 (fifth wave) operators: data-quality audit, lexical top-k
retrieval, entity clusters, interval overlap, hourly LOCF, MG heavy
hitters, RRF fusion."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# --------------------------------------------- dq_audit

def _dirty_tables():
    import ray.data as rd

    orders = rd.from_arrow(pa.table({
        "o_orderkey": pa.array([1, 2, 2, 3, 4], pa.int64()),   # dup 2
        "o_custkey": pa.array([10, 10, 20, None, 99], pa.int64()),
        "o_totalprice": pa.array([5.0, -1.0, 3.0, 2.0, 0.0],
                                 pa.float64()),
    }))
    lineitem = rd.from_arrow(pa.table({
        # orderkey 7 has no parent order (2 rows)
        "l_orderkey": pa.array([1, 1, 2, 7, 7], pa.int64()),
        "l_quantity": pa.array([1.0, 55.0, None, 46.0, 0.0],
                               pa.float64()),
        "l_discount": pa.array([0.0, 0.2, 0.05, 0.09, -0.01],
                               pa.float64()),
    }))
    customer = rd.from_arrow(pa.table({
        "c_custkey": pa.array([10, 20], pa.int64()),
    }))
    return orders, lineitem, customer


def test_dq_audit_detects_injected_violations(ray_session):
    from kgruntime.ops.dq import dq_audit

    orders, lineitem, customer = _dirty_tables()
    out = dq_audit(orders.repartition(2), lineitem.repartition(2),
                   customer)
    got = dict(zip(out["check_name"], out["n_violations"]))
    assert got == {
        "lineitem_null_quantity": 1,
        "lineitem_quantity_domain": 2,        # 55 and 0
        "lineitem_discount_domain": 2,        # 0.2 and -0.01
        "lineitem_policy_qty_gt45": 2,        # 55 and 46
        "lineitem_policy_disc_gt8pct": 2,     # 0.2 and 0.09
        "orders_null_custkey": 1,
        "orders_nonpositive_total": 2,        # -1 and 0
        "orders_dup_orderkey": 1,             # key 2 twice
        "lineitem_fk_orderkey": 2,            # both rows of key 7
        "orders_fk_custkey": 2,               # custkey None + 99
    }
    # int64 and deterministic ordering for the oracle hash
    assert out["n_violations"].dtype == np.int64
    assert list(out["check_name"]) == sorted(out["check_name"])


def test_dq_audit_clean_tables_all_zero(ray_session):
    import ray.data as rd

    from kgruntime.ops.dq import dq_audit

    orders = rd.from_arrow(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 20], pa.int64()),
        "o_totalprice": pa.array([5.0, 4.0], pa.float64())}))
    lineitem = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_quantity": pa.array([1.0, 45.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.08], pa.float64())}))
    customer = rd.from_arrow(pa.table({
        "c_custkey": pa.array([10, 20], pa.int64())}))
    out = dq_audit(orders, lineitem, customer)
    assert (out["n_violations"] == 0).all()
    assert len(out) == 10


# --------------------------------------------- lexical_topk

def _docs(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_lexical_topk_rare_term_dominates(ray_session):
    from kgruntime.ops.text import lexical_topk

    # N=4; "rare" df=1, "common" df=3.  scale=1000:
    # w(rare)  = (4-1)*1000 // 2 = 1500
    # w(common)= (4-3)*1000 // 4 = 250
    rows = [(1, "rare common x"),          # 1500 + 250 = 1750
            (2, "common common common y"), # 3*250 = 750
            (3, "common z"),               # 250
            (4, "nothing here")]
    out = lexical_topk(_docs(rows).repartition(2),
                       "rare common", k=3, scale=1000).to_pandas()
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["score"].tolist() == [1750, 750, 250]


def test_lexical_topk_tie_breaks_on_doc_id(ray_session):
    from kgruntime.ops.text import lexical_topk

    rows = [(9, "t a"), (2, "t b"), (5, "t c")]
    out = lexical_topk(_docs(rows), "t", k=2, scale=1000).to_pandas()
    assert out["doc_id"].tolist() == [2, 5]


# --------------------------------------------- rrf_fusion

def test_rrf_fusion_combines_both_rankings(ray_session):
    import ray.data as rd

    from kgruntime.ops.ann import rrf_fusion

    # lexical: doc 1 > doc 2 ("hit" df=2, N=3); embedding (query =
    # [1,0]): vec 3 (dot 1.0) > vec 2 (0.6) > vec 1 (0.0)
    docs = _docs([(1, "hit hit a"), (2, "hit b"), (3, "c d")])
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[0.0, 1.0], [0.6, 0.8], [1.0, 0.0]],
                              pa.list_(pa.float32())),
    }))
    qvec = np.array([1.0, 0.0])
    out = rrf_fusion(docs, emb, "hit", qvec, r=3, k=3,
                     rrf_k=60, rrf_scale=10 ** 6, lex_scale=1000)
    # doc 2: lex rank 2 + emb rank 2 -> 16129+16129 = 32258
    # doc 1: lex rank 1 + emb rank 3 -> 16393+15873 = 32266
    # doc 3: emb rank 1 only         -> 16393
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["rrf_score"].tolist() == [32266, 32258, 16393]
    assert out["lex_rank"].tolist() == [1, 2, 0]
    assert out["emb_rank"].tolist() == [3, 2, 1]


# --------------------------------------------- entity_clusters

def test_entity_clusters_transitive_merge(ray_session):
    import ray.data as rd

    from kgruntime.ops.linkage import entity_clusters

    # chain: "acme corp" ~1~ "acme corpX" ~1~ "acme corpXY" (ends are
    # dist 2 apart — still one entity via transitivity); "zeta widgets"
    # matches nothing (needs a shared token AND dist<=1)
    names = ["acme corp", "acme corpX", "acme corpXY",
             "acme corpX",                        # dup record collapses
             "zeta widgets"]
    ds = rd.from_arrow(pa.table({"p_name": pa.array(names, pa.string())}))
    out = entity_clusters(ds, max_dist=1).to_pandas() \
        .sort_values("name").reset_index(drop=True)
    assert out["name"].tolist() == ["acme corp", "acme corpX",
                                    "acme corpXY"]
    assert set(out["canonical"]) == {"acme corp"}
    assert out["cluster_size"].tolist() == [3, 3, 3]


# --------------------------------------------- session_incident_overlap

def test_session_incident_overlap_counts_touched_busy_hours(ray_session):
    import ray.data as rd

    from kgruntime.ops.sessions import session_incident_overlap

    # hour 10:xx holds 4 events (busy), hour 11:xx holds 1, hour 13:xx
    # holds 1 (mean = 2, busy threshold 1.2*mean = 2.4 -> only hour 10)
    ts = pd.to_datetime([
        "2024-01-01 10:00:00", "2024-01-01 10:05:00",
        "2024-01-01 10:50:00", "2024-01-01 11:15:00",   # user 1: 45-min
                                            # gap -> TWO sessions
        "2024-01-01 10:59:00",                          # user 2 in busy hour
        "2024-01-01 13:00:00",                          # user 3 off-peak
    ])
    ev = rd.from_arrow(pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 2, 3], pa.int64()),
    }))
    out = session_incident_overlap(ev).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    # user 1 session A [10:00,10:05] -> busy hour 10; session B
    # [10:50,11:15] spans hours 10-11 -> still 1 busy; user 2's
    # one-event session sits inside hour 10 -> 1; user 3 none
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["n_incidents"].tolist() == [1, 1, 1]
    assert sorted(out["n_events"].tolist()) == [1, 2, 2]


# --------------------------------------------- user_hourly_locf

def test_user_hourly_locf_carries_last_value(ray_session):
    import ray.data as rd

    from kgruntime.ops.sessions import user_hourly_locf

    # user 1: 10:30 v=1.00, 13:10 v=2.50 -> grid hours 10,11,12,13
    # hour 10 -> 100, hour 11 -> 100, hour 12 -> 100, hour 13 -> 250
    # duplicate-ts tie at 13:10: event_id 3 (v=2.50) wins over 2 (9.99)
    ts = pd.to_datetime(["2024-01-01 10:30:00", "2024-01-01 13:10:00",
                         "2024-01-01 13:10:00"])
    ev = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "value": pa.array([1.0, 9.99, 2.5], pa.float64()),
    }))
    out = user_hourly_locf(ev).to_pandas()
    assert out["user_id"].tolist() == [1]
    assert out["n_hours"].tolist() == [4]
    assert out["sum_locf_cents"].tolist() == [100 + 100 + 100 + 250]


# --------------------------------------------- mg_heavy_trigrams

def test_mg_heavy_trigrams_exact_over_threshold(ray_session):
    from kgruntime.ops.sketch import mg_heavy_trigrams

    # "a b c" x4, "x y z" x1, "p q r" x1 -> total 6 trigrams.
    # k=2 -> report threshold cnt*3 > 12 i.e. cnt > 4 ... use k=3:
    # threshold cnt*4 > 12 -> cnt > 3 -> only "a b c" (4)
    rows = [(1, "a b c"), (2, "a b c"), (3, "a b c"), (4, "a b c"),
            (5, "x y z"), (6, "p q r")]
    out = mg_heavy_trigrams(_docs(rows).repartition(3), k=3).to_pandas()
    assert out["trigram"].tolist() == ["a b c"]
    assert out["cnt"].tolist() == [4]


def test_mg_heavy_trigrams_block_boundaries_cannot_hide_heavy(ray_session):
    from kgruntime.ops.sketch import mg_heavy_trigrams

    # the heavy item spread evenly over many blocks still surfaces
    rows = [(i, "h h h") for i in range(10)] + \
           [(100 + i, f"u{i} v{i} w{i}") for i in range(10)]
    out = mg_heavy_trigrams(_docs(rows).repartition(10), k=5).to_pandas()
    # total 20; threshold cnt*6 > 40 -> cnt >= 7 -> only "h h h" (10)
    assert out["trigram"].tolist() == ["h h h"]
    assert out["cnt"].tolist() == [10]


# --------------------------------------------- lpa_communities

def _edges(pairs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "user_a": pa.array([p[0] for p in pairs], pa.int64()),
        "user_b": pa.array([p[1] for p in pairs], pa.int64()),
    }))


def test_lpa_separates_bridged_cliques(ray_session):
    from kgruntime.ops.graph import lpa_communities

    # two 4-cliques {1..4} and {11..14} joined by ONE bridge (4,11):
    # connected components would merge them; frequency LPA keeps two
    # communities because clique-internal votes outnumber the bridge
    k1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    k2 = [(a, b) for a in range(11, 15) for b in range(a + 1, 15)]
    out = lpa_communities(_edges(k1 + k2 + [(4, 11)]), rounds=4)
    comm = dict(zip(out["user_id"], out["community"]))
    assert len({comm[u] for u in (1, 2, 3)}) == 1
    assert len({comm[u] for u in (11, 12, 13, 14)}) == 1
    assert comm[1] != comm[12]


def test_lpa_empty_edges(ray_session):
    from kgruntime.ops.graph import lpa_communities

    out = lpa_communities(_edges([]), rounds=3)
    assert len(out) == 0
    assert list(out.columns) == ["user_id", "community"]


# --------------------------------------------- bootstrap_stats

def test_bootstrap_stats_deterministic_and_mean_near_one(ray_session):
    import ray.data as rd

    from kgruntime.ops.sample import bootstrap_stats

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "n_chars": pa.array([10] * 200, pa.int64())}))
    a = bootstrap_stats(docs, n_replicates=5).to_pandas()
    b = bootstrap_stats(docs.repartition(4), n_replicates=5).to_pandas()
    # block-boundary independent and retry-stable
    pd.testing.assert_frame_equal(a, b)
    assert a["replicate"].tolist() == [0, 1, 2, 3, 4]
    # Poisson(1): each replicate resamples ~N rows (loose 3-sigma band)
    assert all(150 <= n <= 250 for n in a["n_rows"])
    assert (a["sum_chars"] == a["n_rows"] * 10).all()


# --------------------------------------------- media phash near-dups

def test_phash_near_dups_finds_groups_not_cross(ray_session):
    import ray.data as rd

    from kgruntime.ops.media import (phash_near_dups,
                                     synth_png_neardup_table)

    tbl = synth_png_neardup_table(n_groups=6, variants=3)
    out = phash_near_dups(rd.from_arrow(tbl)).to_pandas()
    grp = lambda r: r.split("/")[-2]
    # every pair stays within one synth group...
    assert all(grp(a) == grp(b) for a, b in zip(out["ref_a"],
                                                out["ref_b"]))
    # ...and every group's 3 variants pair completely (3 pairs x 6)
    assert len(out) == 18
    assert (out["hamming"] <= 6).all()


def test_dhash_invariant_to_tiny_noise_only():
    import numpy as np

    from kgruntime.ops.media import _dhash64

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (24, 32, 3)).astype(np.int16)
    noisy = img.copy()
    noisy[::7, ::9] += 1
    inverted = (255 - img)
    h = _dhash64(np.clip(img, 0, 255).astype(np.uint8))
    hn = _dhash64(np.clip(noisy, 0, 255).astype(np.uint8))
    hi = _dhash64(np.clip(inverted, 0, 255).astype(np.uint8))
    assert bin(h ^ hn).count("1") <= 6
    assert bin(h ^ hi).count("1") > 20


# --------------------------------------------- cdc_chunk_dedup

def test_cdc_shared_passage_chunks_align_under_shift(ray_session):
    from kgruntime.ops.dedup import cdc_chunk_dedup

    # the same long passage embedded at DIFFERENT offsets: content-
    # defined boundaries re-align, so interior chunks still dedup
    passage = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12 p13 p14 p15 p16"
    rows = [(1, "intro " + passage),
            (2, "a b c d e " + passage),
            (3, "q r s t u v w x y z")]
    out = cdc_chunk_dedup(_docs(rows).repartition(2), k=3, div=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2, 3]
    # docs 1 and 2 share at least one interior chunk; doc 3 shares none
    assert out.loc[0, "n_dup_chunks"] >= 1
    assert out.loc[1, "n_dup_chunks"] >= 1
    assert out.loc[2, "n_dup_chunks"] == 0
    # chunk partition covers every token exactly once per doc
    assert (out["n_chunks"] >= 1).all()


def test_cdc_identical_docs_fully_dup(ray_session):
    from kgruntime.ops.dedup import cdc_chunk_dedup

    rows = [(1, "w1 w2 w3 w4 w5 w6 w7 w8"),
            (2, "w1 w2 w3 w4 w5 w6 w7 w8")]
    out = cdc_chunk_dedup(_docs(rows), k=3, div=4).to_pandas()
    assert (out["n_dup_chunks"] == out["n_chunks"]).all()


# --------------------------------------------- embargo_split_audit

def test_embargo_split_audit_counts_and_leak(ray_session):
    import ray.data as rd

    from kgruntime.ops.sample import embargo_split_audit

    # range 00:00..10:00, cut at 70% = 07:00, embargo 1h -> test 08:00+
    ts = pd.to_datetime(["2024-01-01 00:00:00",   # train (u1)
                         "2024-01-01 05:00:00",   # train (u2)
                         "2024-01-01 07:30:00",   # embargo (u3)
                         "2024-01-01 09:00:00",   # test  (u1 -> leak)
                         "2024-01-01 10:00:00"])  # test  (u4)
    ev = rd.from_arrow(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 2, 3, 1, 4], pa.int64()),
        "value": pa.array([1.0] * 5, pa.float64()),
    }))
    out = embargo_split_audit(ev, train_pct=70,
                              embargo_us=3_600_000_000)
    assert out["n_train"].tolist() == [2]
    assert out["n_embargo"].tolist() == [1]
    assert out["n_test"].tolist() == [2]
    assert out["n_leak_users"].tolist() == [1]


# --------------------------------------------- cluster_safe_split

def test_cluster_safe_split_keeps_neardups_together(ray_session):
    from kgruntime.ops.dedup import cluster_safe_split, \
        minhash_dup_clusters

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    rows = [(1, base), (2, base + " phi"),          # near-dup pair
            (3, "one two three four five six seven eight nine ten "
                "eleven twelve thirteen fourteen fifteen sixteen "
                "seventeen eighteen nineteen twenty")]
    ds = _docs(rows)
    clusters = minhash_dup_clusters(ds).to_pandas()
    assert set(clusters["doc_id"]) == {1, 2}        # 1-2 really cluster
    out = cluster_safe_split(ds).to_pandas()
    # docs 1+2 travel as ONE cluster: totals = 3 docs over 2 clusters
    assert out["n_docs"].sum() == 3
    assert out["n_clusters"].sum() == 2
    # no split holds exactly 1 of the pair: every (split) n_docs -
    # n_clusters difference accounts pairs wholly
    for _, r in out.iterrows():
        assert r["n_docs"] != r["n_clusters"] or r["n_docs"] in (0, 1, 2)


# --------------------------------------------- vocab_coverage

def test_vocab_coverage_exact_thresholds(ray_session):
    from kgruntime.ops.text import vocab_coverage

    # counts: a=6, b=3, c=1 -> total 10; cum: 6, 9, 10
    rows = [(1, "a a a b"), (2, "a a a b b c")]
    out = vocab_coverage(_docs(rows).repartition(2), pcts=(50, 90, 99))
    assert out["k_terms"].tolist() == [1, 2, 3]     # 6>=5, 9>=9, 10>=9.9
    assert out["covered_tokens"].tolist() == [6, 9, 10]
    assert out["total_tokens"].tolist() == [10, 10, 10]
