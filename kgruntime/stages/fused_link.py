"""Fused parse + doc-local entity linking (opt-in pipeline variant).

Insight (NOTES_r1 §2): a blank node's KB link is *derivable inside its
own document* — its name literal plus the broadcast alias table — so the
per-doc part of the canonical mapping (which grows linearly with the
corpus and eventually outgrows broadcast) never needs to exist as a
global structure.  This stage:

1. parses a batch of documents (same fused L/P/B as stages/extract);
2. per document, scores name-literal mentions against the alias table
   (same LinkScorer semantics, loaded once per actor);
3. rewrites linked BLANK ids to their KB canonical in place
   (doc-local, no shuffle, no global mapping);
4. emits the residual IRI↔KB equivalences as edge rows (record_kind=2)
   riding in the same output table — this edge set is bounded by the
   number of *distinct linked IRIs*, not by corpus size, so the
   downstream union-find + broadcast remap stay broadcast-scale at any
   corpus size.

Multi-name blanks bridge KB entities exactly as in the unfused
pipeline: the blank rewrites to its rank-minimum KB locally, and the
bridged KB↔KB equivalence is emitted as an IRI edge so the global
union-find still merges them.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..ttl.builder import BLANKN, LITERAL, XSD_STRING
from .extract import RECORD_TRIPLE, parse_batch
from .linking import LinkScorer, normalize_name

RECORD_EDGE = 2


class FusedParseLink:
    """Actor-pool stage: documents batch → triples (blank-canonicalized)
    + quarantine rows + IRI-equivalence edge rows, in one pass."""

    def __init__(self, alias_ref=None, alias_table: dict | None = None,
                 threshold: float = 0.85):
        self.scorer = LinkScorer(alias_ref=alias_ref,
                                 alias_table=alias_table,
                                 threshold=threshold)
        self.threshold = threshold

    def _doc_rewrites(self, doc_rows: dict) -> tuple[dict, list[tuple]]:
        """One document's rows → (blank→kb rewrite dict, iri-edge list)."""
        subj = doc_rows["subj"]
        subj_kind = doc_rows["subj_kind"]
        obj = doc_rows["obj"]
        obj_kind = doc_rows["obj_kind"]
        dt = doc_rows["obj_datatype"]
        lang = doc_rows["obj_lang"]
        # entity → set of KB targets from its name-literal mentions
        targets: dict[tuple, set] = {}
        memo = self.scorer._memo
        for i in range(len(subj)):
            if obj_kind[i] != LITERAL:
                continue
            if not (dt[i] == XSD_STRING or lang[i]):
                continue
            text = obj[i]
            if text in memo:
                res = memo[text]
            else:
                res = self.scorer.score(normalize_name(text))
                if res is not None and res[1] < self.threshold:
                    res = None
                memo[text] = res
            if res is None:
                continue
            targets.setdefault((subj[i], subj_kind[i]), set()).add(res[0])
        rewrites: dict[str, str] = {}
        edges: list[tuple] = []
        for (ent, kind), kbs in targets.items():
            canon = min(kbs)
            # bridged KB entities merge globally
            edges.extend((canon, other) for other in kbs if other != canon)
            if kind == BLANKN:
                rewrites[ent] = canon      # resolved locally, no shuffle
            else:
                edges.append((ent, canon))  # IRI link → global union-find
        return rewrites, edges

    def __call__(self, batch: pa.Table) -> pa.Table:
        parsed = parse_batch(batch)
        if parsed.num_rows == 0:
            return parsed
        # rows are doc-contiguous (parse emits per doc); walk doc groups
        cols = {c: parsed[c].to_pylist()
                for c in ("doc_id", "subj", "subj_kind", "obj", "obj_kind",
                          "obj_datatype", "obj_lang", "record_kind")}
        n = parsed.num_rows
        rewrites: dict[str, str] = {}
        edge_rows: list[tuple] = []
        start = 0
        for i in range(1, n + 1):
            if i == n or cols["doc_id"][i] != cols["doc_id"][start]:
                doc = {k: v[start:i] for k, v in cols.items()}
                if all(rk == RECORD_TRIPLE for rk in doc["record_kind"]):
                    rw, ed = self._doc_rewrites(doc)
                    # blank ids are doc-scoped → no cross-doc collisions
                    rewrites.update(rw)
                    edge_rows.extend((cols["doc_id"][start],) + e
                                     for e in ed)
                start = i
        # vectorized rewrite of blank ids (batch-local dict, small)
        if rewrites:
            get = rewrites.get
            for col, kind_col in (("subj", "subj_kind"), ("obj", "obj_kind")):
                vals = cols[col]
                kinds = cols[kind_col]
                new_vals = [get(v, v) if k == BLANKN else v
                            for v, k in zip(vals, kinds)]
                new_kinds = [0 if (k == BLANKN and v in rewrites) else k
                             for v, k in zip(vals, kinds)]
                ci = parsed.schema.get_field_index(col)
                parsed = parsed.set_column(ci, col,
                                           pa.array(new_vals, pa.string()))
                ki = parsed.schema.get_field_index(kind_col)
                parsed = parsed.set_column(ki, kind_col,
                                           pa.array(new_kinds, pa.uint8()))
        if not edge_rows:
            return parsed
        n_e = len(edge_rows)
        empty_s = pa.array([""] * n_e, pa.string())
        zeros = pa.array([0] * n_e, pa.uint8())
        zeros32 = pa.array([0] * n_e, pa.int32())
        edge_table = pa.Table.from_arrays(
            [pa.array([e[0] for e in edge_rows], pa.string()),   # doc_id
             pa.array([e[1] for e in edge_rows], pa.string()),   # subj=src
             zeros,
             empty_s,                                            # pred
             pa.array([e[2] for e in edge_rows], pa.string()),   # obj=dst
             zeros,
             empty_s, empty_s,                                   # dt, lang
             zeros32, zeros32, pc.cast(zeros32, pa.int32()),
             pa.array([RECORD_EDGE] * n_e, pa.uint8()),
             empty_s, empty_s, empty_s],
            schema=parsed.schema)
        return pa.concat_tables([parsed, edge_table])


def keep_edges(batch: pa.Table) -> pa.Table:
    """Edge rows → (src, dst) equivalence pairs."""
    t = batch.filter(pc.equal(batch["record_kind"], RECORD_EDGE))
    return pa.Table.from_arrays(
        [t["subj"], t["obj"]], names=["src", "dst"])
