"""Round-5 operators: planner-driven BGP, MJPEG/AVI frame sampling,
registry index, and the round's new pipelines."""

from __future__ import annotations

import pyarrow as pa
import pytest

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
FOAF = "http://xmlns.com/foaf/0.1/"
REL = "http://www.perceive.net/schemas/relationship/enemyOf"


def _catalog(counts: dict[str, int]) -> pa.Table:
    preds = sorted(counts)
    n = [counts[p] for p in preds]
    return pa.table({
        "pred": pa.array(preds, pa.string()),
        "n_triples": pa.array(n, pa.int64()),
        "n_subj": pa.array(n, pa.int64()),
        "n_obj": pa.array(n, pa.int64()),
        "subj_fanout_ppm": pa.array([1_000_000] * len(n), pa.int64()),
        "obj_fanout_ppm": pa.array([1_000_000] * len(n), pa.int64()),
    })


# ----------------------------------------------------------- planner


def test_plan_star_join_orders_cheapest_first():
    from kgruntime.stages.materialize import plan_star_join

    preds = ["p:a", "p:b", "p:c"]
    assert plan_star_join(
        _catalog({"p:a": 100, "p:b": 1, "p:c": 50}), preds) == [1, 2, 0]
    # flipping the statistics flips the chosen plan
    assert plan_star_join(
        _catalog({"p:a": 1, "p:b": 100, "p:c": 50}), preds) == [0, 2, 1]
    # absent predicate plans as empty → first
    assert plan_star_join(
        _catalog({"p:a": 5, "p:c": 9}), preds)[0] == 1


@pytest.fixture(scope="module")
def kg_store(ray_session):
    import ray.data as rd

    from kgruntime.pipelines.kg import build_kg
    from kgruntime.synth import make_documents_table

    docs = rd.from_arrow(make_documents_table(120, seed=42))
    return build_kg(docs)["canonical"].materialize()


def test_planned_star_bgp_plan_invariant(kg_store):
    """The planner's answer equals BOTH fixed join orders (inner joins
    on one key commute), and is non-empty on the synthetic store."""
    from kgruntime.stages.materialize import planned_star_bgp

    preds = [RDF + "type", FOAF + "name", REL]

    def run(catalog=None):
        df = planned_star_bgp(kg_store, preds, catalog=catalog) \
            .to_pandas().sort_values(["s", "v0", "v1", "v2"]) \
            .reset_index(drop=True)
        return df

    chosen = run()
    fwd = run(_catalog({preds[0]: 1, preds[1]: 2, preds[2]: 3}))
    rev = run(_catalog({preds[0]: 3, preds[1]: 2, preds[2]: 1}))
    assert len(chosen) > 0
    assert chosen.equals(fwd)
    assert chosen.equals(rev)


def test_planned_star_bgp_uses_catalog_order(kg_store):
    """The executed order follows the statistics: with the real catalog,
    the cheapest pattern (enemyOf, 2 triples) leads, not rdf:type."""
    from kgruntime.stages.materialize import (plan_star_join,
                                              predicate_catalog)

    preds = [RDF + "type", FOAF + "name", REL]
    cat = predicate_catalog(kg_store)
    order = plan_star_join(cat, preds)
    counts = {p: c for p, c in zip(cat["pred"].to_pylist(),
                                   cat["n_triples"].to_pylist())}
    assert order[0] == min(range(3),
                           key=lambda i: (counts.get(preds[i], 0),
                                          preds[i]))
    assert order != [0, 1, 2] or \
        counts[preds[0]] <= counts[preds[1]] <= counts[preds[2]]


def test_planned_star_bgp_empty_pattern(kg_store):
    from kgruntime.stages.materialize import planned_star_bgp

    out = planned_star_bgp(
        kg_store, [RDF + "type", "http://nowhere/px", FOAF + "name"])
    assert out.count() == 0
    assert list(out.schema().names) == ["s", "v0", "v1", "v2"]
