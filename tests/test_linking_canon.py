"""Tests for N2/N3 (mention detection, LinkScorer pool), N4 (distributed
union-find), N5 (dedup + salted partitioned write), N6/N7 (manifest,
resume)."""

import os

import pyarrow as pa
import pytest

from kgruntime.stages.canon import (
    assignment_to_mapping, canonicalize_triples, connected_components,
)
from kgruntime.stages.extract import triples_dataset
from kgruntime.stages.linking import (
    LinkScorer, build_alias_table, detect_mentions, link_edges_dataset,
    mentions_dataset, normalize_name,
)
from kgruntime.stages.materialize import (
    commit_fragment, committed_fragments, dedup_triples, local_dedup,
    pending_fragments,
)
from kgruntime.synth import make_documents_table


def _docs(ray, n=29):
    import ray.data as rd
    return rd.from_arrow(make_documents_table(n, seed=7))


def test_normalize_name():
    assert normalize_name("  Green   Goblin! ") == "green goblin"
    assert normalize_name("Человек-паук") == ""  # non-latin strips (heuristic)
    assert normalize_name("Dave Beckett") == "dave beckett"


def test_link_scorer_unit():
    aliases = build_alias_table(["Green Goblin", "Dave Beckett", "Bob"])
    s = LinkScorer(alias_table=aliases, threshold=0.5)
    assert s.score("green goblin") == ("http://kb.example/entity/green-goblin", 1.0)
    ent, sim = s.score("green goblin jr")
    assert ent == "http://kb.example/entity/green-goblin" and 0.5 <= sim < 1.0
    assert s.score("zzz unknown") is None


def test_mention_detection_vectorized(ray_session):
    tri = triples_dataset(_docs(ray_session, n=2))  # p01, p02 clones
    m = mentions_dataset(tri).take_all()
    texts = {r["mention_text"] for r in m}
    assert "Green Goblin" in texts and "Spiderman" in texts
    # lang-tagged literal is a mention too
    assert "Человек-паук" in texts
    # typed non-string literals are not mentions
    assert all(r["mention_text"] != "2" for r in m)


def test_union_find_merges_star(ray_session):
    import ray.data as rd

    edges = rd.from_items([
        {"src": "_:d1/0", "dst": "http://kb.example/entity/bob", "score": 1.0,
         "doc_id": "d1", "mention_text": "Bob"},
        {"src": "_:d2/0", "dst": "http://kb.example/entity/bob", "score": 1.0,
         "doc_id": "d2", "mention_text": "Bob"},
        # a chain: c1 - c2 - c3 (tests multi-round propagation)
        {"src": "http://x/c1", "dst": "http://x/c2", "score": 1.0,
         "doc_id": "d3", "mention_text": "c"},
        {"src": "http://x/c2", "dst": "http://x/c3", "score": 1.0,
         "doc_id": "d3", "mention_text": "c"},
    ])
    labels = connected_components(edges, num_partitions=2)
    mapping = {r["node"]: r["label"] for r in labels.take_all()}
    # IRI-ranked canonical: blanks map to the KB IRI, not vice versa
    assert mapping["_:d1/0"] == "http://kb.example/entity/bob"
    assert mapping["_:d2/0"] == "http://kb.example/entity/bob"
    assert mapping["http://kb.example/entity/bob"] == "http://kb.example/entity/bob"
    assert mapping["http://x/c1"] == "http://x/c1"
    assert mapping["http://x/c2"] == "http://x/c1"
    assert mapping["http://x/c3"] == "http://x/c1"


def test_union_find_driver_vs_distributed(ray_session):
    """Both CC modes must compute the identical assignment."""
    import random

    import ray.data as rd

    rng = random.Random(5)
    rows = []
    # small graph: the distributed path pays O(diameter) shuffle rounds,
    # which is the >20M-edge regime's tool — keep the parity check tiny
    for c in range(6):
        nodes = [f"http://x/{c}/{i}" for i in range(rng.randint(2, 3))]
        nodes += [f"_:d{c}/{i}" for i in range(rng.randint(0, 2))]
        rng.shuffle(nodes)
        for a, b in zip(nodes, nodes[1:]):
            rows.append({"src": a, "dst": b})
    edges = rd.from_items(rows)
    drv = {r["node"]: r["label"]
           for r in connected_components(edges, mode="driver").take_all()}
    dist = {r["node"]: r["label"]
            for r in connected_components(edges, mode="distributed",
                                          num_partitions=4).take_all()}
    assert drv == dist


def test_canonicalize_broadcast_and_join(ray_session):
    import ray.data as rd

    tri = rd.from_items([
        {"subj": "_:d1/0", "subj_kind": 1, "pred": "http://p/",
         "obj": "_:d2/0", "obj_kind": 1, "obj_datatype": "", "obj_lang": "",
         "span_start": 0, "span_end": 1, "stmt_index": 0},
        {"subj": "http://s/", "subj_kind": 0, "pred": "http://p/",
         "obj": "x", "obj_kind": 2,
         "obj_datatype": "http://www.w3.org/2001/XMLSchema#string",
         "obj_lang": "", "span_start": 0, "span_end": 1, "stmt_index": 1},
    ])
    mapping = {"_:d1/0": "http://kb/a", "_:d2/0": "http://kb/b"}
    out = canonicalize_triples(tri, mapping=mapping).take_all()
    remapped = {(r["subj"], r["obj"]) for r in out}
    assert ("http://kb/a", "http://kb/b") in remapped
    assert ("http://s/", "x") in remapped

    labels = rd.from_items([
        {"node": "_:d1/0", "label": "http://kb/a"},
        {"node": "_:d2/0", "label": "http://kb/b"},
    ])
    out2 = canonicalize_triples(tri, labels_ds=labels, via="join",
                                num_partitions=2).take_all()
    assert {(r["subj"], r["obj"]) for r in out2} == remapped


def test_local_dedup_combiner():
    t = pa.table({
        "subj": ["a", "a", "b"], "pred": ["p", "p", "p"],
        "obj": ["o", "o", "o"], "obj_datatype": ["", "", ""],
        "obj_lang": ["", "", ""], "subj_kind": pa.array([0, 0, 0], pa.uint8()),
        "obj_kind": pa.array([0, 0, 0], pa.uint8()),
        "doc_id": ["d", "d", "d"],
        "span_start": pa.array([1, 2, 3], pa.int32()),
        "span_end": pa.array([2, 3, 4], pa.int32()),
        "stmt_index": pa.array([0, 1, 2], pa.int32()),
    })
    out = local_dedup(t)
    assert out.num_rows == 2
    assert set(out.schema.names) == set(t.schema.names)


def test_global_dedup(ray_session):
    # p22: "\n" short-string escape ≡ real newline in long string → 1 triple
    tri = triples_dataset(_docs(ray_session, n=29))
    import pyarrow.compute as pc

    doc22 = f"doc-{21:06d}"  # p22 is golden index 21
    d = dedup_triples(tri.filter(expr=f'doc_id == "{doc22}"')
                      if hasattr(tri, "filter") else tri)
    rows = [r for r in d.take_all()]
    assert len(rows) == 1
    assert rows[0]["obj"] == "The first line\nThe second line\n  more"


def test_end_to_end_pipeline_and_checkpoint(ray_session, tmp_path):
    from kgruntime.pipelines.kg import build_kg, run_checkpointed
    from kgruntime.synth import write_corpus

    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, 40, seed=11, rows_per_file=10)  # 4 fragments
    out_dir = str(tmp_path / "store")

    res = run_checkpointed(corpus, out_dir, epoch=0, fragments_per_round=2)
    assert len(res["processed"]) == 4 and not res["skipped"]
    assert committed_fragments(out_dir) == {f"part-{i:05d}" for i in range(4)}

    # resume: nothing left to do
    res2 = run_checkpointed(corpus, out_dir, epoch=0, fragments_per_round=2)
    assert res2["processed"] == [] and len(res2["skipped"]) == 4

    # partial-commit resume: drop one manifest → the WHOLE round (its
    # commit unit) reruns, so no fragment's triples can end up in two
    # round directories (exactly-once store)
    os.remove(os.path.join(out_dir, "_manifest", "fragment-part-00002.json"))
    res3 = run_checkpointed(corpus, out_dir, epoch=0, fragments_per_round=2)
    assert res3["processed"] == ["part-00002", "part-00003"]
    assert sorted(res3["skipped"]) == ["part-00000", "part-00001"]

    # exactly-once: the resumed store is identical to a fresh one-shot run
    # (zero duplicate and zero missing rows from the partial rerun)
    import ray.data as rd
    fresh_dir = str(tmp_path / "store_fresh")
    run_checkpointed(corpus, fresh_dir, epoch=0, fragments_per_round=2)
    key_cols = ["subj", "pred", "obj", "obj_datatype", "obj_lang"]

    def rows(d):
        df = rd.read_parquet(os.path.join(d, "data")).to_pandas()
        return sorted(map(tuple, df[key_cols].itertuples(index=False)))

    assert rows(out_dir) == rows(fresh_dir)

    # manifests carry lineage + counters
    from kgruntime.stages.materialize import read_manifests
    m = read_manifests(out_dir)
    assert all(x["parser_version"] for x in m)
    assert all("docs" in x["counters"] and "round_triples" in x["counters"]
               and "malformed_span_rejects" in x["counters"] for x in m)


def test_linking_to_canonical_flow(ray_session):
    """Same name in several docs → blanks canonicalize to one KB entity."""
    from kgruntime.pipelines.kg import build_kg

    docs = _docs(ray_session, n=58)  # two clones of every golden
    res = build_kg(docs)
    assert "edges" in res
    canon = res["canonical"].take_all()
    # p15 clones: [] foaf:knows [ foaf:name "Bob" ] — every clone's Bob-blank
    # must collapse onto the same KB IRI
    bob = "http://kb.example/entity/bob"
    name_rows = [r for r in canon
                 if r["pred"] == "http://xmlns.com/foaf/0.1/name"
                 and r["obj"] == "Bob"]
    assert len(name_rows) == 1 and name_rows[0]["subj"] == bob


def test_build_kg_staged_matches_build_kg(ray_session, tmp_path):
    """The staged (parse-once, parquet staging) pipeline produces the
    same canonical store as the in-memory variant."""
    from kgruntime.pipelines.kg import build_kg, build_kg_staged

    docs = _docs(ray_session, n=40)
    mem = build_kg(docs, materialize_intermediate=True)["canonical"] \
        .take_all()
    staged = build_kg_staged(_docs(ray_session, n=40),
                             str(tmp_path / "staging"),
                             keep_buckets=False)["canonical"].take_all()
    key = ["subj", "pred", "obj", "obj_datatype", "obj_lang"]
    assert sorted(tuple(r[k] for k in key) for r in mem) == \
        sorted(tuple(r[k] for k in key) for r in staged)


def test_build_kg_fused_matches_build_kg(ray_session):
    """The fused parse+link shape must produce the identical canonical
    store as the staged/unfused pipeline (given the same alias table)."""
    from kgruntime.pipelines.kg import build_kg, build_kg_fused
    from kgruntime.stages.linking import build_alias_table
    from kgruntime.synth import goldens
    from kgruntime.ttl import parse_turtle
    from kgruntime.ttl.builder import LITERAL, XSD_STRING

    names = {r[3] for _, src, _ in goldens() for r in parse_turtle(src)
             if r[4] == LITERAL and (r[5] == XSD_STRING or r[6])}
    aliases = build_alias_table(names)

    ref = build_kg(_docs(ray_session, n=58), alias_table=aliases,
                   materialize_intermediate=True)["canonical"].take_all()
    fused = build_kg_fused(_docs(ray_session, n=58), alias_table=aliases,
                           keep_buckets=False)["canonical"].take_all()
    key = ["subj", "subj_kind", "pred", "obj", "obj_kind",
           "obj_datatype", "obj_lang"]
    assert sorted(tuple(r[k] for k in key) for r in ref) == \
        sorted(tuple(r[k] for k in key) for r in fused)


def test_remap_never_rewrites_literals(ray_session):
    """A literal whose lexical value equals a mapped node id must keep
    its original value (kind 2 masks the remap on both paths)."""
    import ray.data as rd

    tri = rd.from_items([
        {"subj": "http://s/", "subj_kind": 0, "pred": "http://p/",
         "obj": "_:d1/0", "obj_kind": 2,   # literal that LOOKS like a node
         "obj_datatype": "http://www.w3.org/2001/XMLSchema#string",
         "obj_lang": "", "span_start": 0, "span_end": 1, "stmt_index": 0},
        {"subj": "_:d1/0", "subj_kind": 1, "pred": "http://p/",
         "obj": "_:d1/0", "obj_kind": 1, "obj_datatype": "", "obj_lang": "",
         "span_start": 0, "span_end": 1, "stmt_index": 1},
    ])
    mapping = {"_:d1/0": "http://kb/a"}
    out = canonicalize_triples(tri, mapping=mapping).take_all()
    by_stmt = {r["stmt_index"]: r for r in out}
    assert by_stmt[0]["obj"] == "_:d1/0"          # literal untouched
    assert by_stmt[0]["obj_kind"] == 2
    assert by_stmt[1]["obj"] == "http://kb/a"     # node remapped

    labels = rd.from_items([{"node": "_:d1/0", "label": "http://kb/a"}])
    out2 = canonicalize_triples(tri, labels_ds=labels, via="join",
                                num_partitions=2).take_all()
    by_stmt2 = {r["stmt_index"]: r for r in out2}
    assert by_stmt2[0]["obj"] == "_:d1/0"
    assert by_stmt2[0]["obj_kind"] == 2
    assert by_stmt2[1]["obj"] == "http://kb/a"


def test_link_scorer_tfidf_properties():
    """Char-trigram TF-IDF scorer: exact hit = 1.0, typo'd variants score
    high, unrelated text scores None/low, and scoring is deterministic
    across separately-built instances (retry safety)."""
    aliases = build_alias_table(
        ["Green Goblin", "Green Lantern", "Dave Beckett", "Bob"])
    a = LinkScorer(alias_table=aliases, threshold=0.5)
    b = LinkScorer(alias_table=aliases, threshold=0.5)

    assert a.score("dave beckett") == ("http://kb.example/entity/dave-beckett", 1.0)
    ent, sim = a.score("dave becket")          # single-char typo
    assert ent == "http://kb.example/entity/dave-beckett" and sim > 0.7
    # shared-prefix confusables rank correctly
    ent_g, sim_g = a.score("green goblin sr")
    assert ent_g == "http://kb.example/entity/green-goblin"
    assert a.score("xyzzy") is None
    # determinism across instances
    for q in ["dave becket", "green goblin sr", "green lan", "bob"]:
        assert a.score(q) == b.score(q)


def test_exploded_join_remap_matches_legacy(ray_session, monkeypatch):
    """The single-shuffle exploded join remap (hits-broadcast AND
    co-shuffle variants) must agree with the legacy two-join path on a
    collection-shaped table where many triples share (doc_id,
    stmt_index) and the same blank node recurs as subj and obj — the
    shape that would multiply rows under a (doc, stmt)-only join key."""
    import ray.data as rd

    from kgruntime.stages import canon

    tri = pa.table({
        "doc_id": ["d1"] * 5 + ["d2"] * 2,
        "stmt_index": pa.array([0, 0, 0, 0, 1, 0, 0], pa.int32()),
        "subj": ["_:c0", "_:c0", "_:c1", "_:c1", "http://x/s",
                 "_:c0", "_:z"],
        "subj_kind": pa.array([1, 1, 1, 1, 0, 1, 1], pa.uint8()),
        "pred": ["first", "rest", "first", "rest", "p", "first", "p"],
        "obj": ["A", "_:c1", "B", "nil", "_:c0", "_:q", "_:c0"],
        # obj "A"/"B" are literals; "_:c0" also appears as a LITERAL
        # lexical value nowhere here (covered by
        # test_remap_never_rewrites_literals)
        "obj_kind": pa.array([2, 1, 2, 0, 1, 1, 1], pa.uint8()),
    })
    labels = pa.table({
        "node": ["_:c0", "_:c1", "_:q", "_:z"],
        "label": ["http://kb/L", "_:c1", "http://kb/Q", "_:z"],
    })
    tds, lds = rd.from_arrow(tri), rd.from_arrow(labels)

    def run(f):
        rows = f(tds, lds, 4).take_all()
        assert len(rows) == tri.num_rows          # no multiplication
        rows.sort(key=lambda r: (r["doc_id"], r["stmt_index"],
                                 r["pred"], r["subj"], r["obj"]))
        return [(r["doc_id"], r["stmt_index"], r["subj"], r["subj_kind"],
                 r["obj"], r["obj_kind"]) for r in rows]

    expected = run(canon._join_remap_legacy)
    assert run(canon._join_remap_exploded) == expected      # hits bcast
    monkeypatch.setattr(canon, "HITS_BROADCAST_MAX", 0)     # co-shuffle
    assert run(canon._join_remap_exploded) == expected
