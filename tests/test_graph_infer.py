"""Graph inference: symmetric/inverse rewrites and length-2 transitive
rules over hand-built fixtures (mirrors the reference's
SimpleGraphInferenceEngineTest / GraphConsistencyPostProcessors tests)."""

import pyarrow as pa
import pytest

from stanford_relation_extractor_ray.schemas import FILLS_SCHEMA
from stanford_relation_extractor_ray.stages import graph_infer


def _fills_ds(rows):
    import ray.data as rd
    full = []
    for i, (s, st, p, o, ot, sc) in enumerate(rows):
        full.append({"subj": s, "subj_type": st, "pred": p, "obj": o,
                     "obj_type": ot, "score": sc, "doc_id": f"d{i}",
                     "sent_idx": 0, "subj_span": [0, 1],
                     "obj_span": [2, 3]})
    return rd.from_arrow(pa.Table.from_pylist(full, schema=FILLS_SCHEMA))


def test_symmetric_rewrite_adds_mirror(ray_session):
    ds = _fills_ds([
        ("Alice Smith", "PERSON", "per:spouse", "Bob Jones", "PERSON",
         0.8),
        ("Acme", "ORGANIZATION", "org:founded", "1999", "DATE", 0.9),
    ])
    rows = {(r["subj"], r["pred"], r["obj"]): r["score"]
            for r in graph_infer.symmetric_inverse_rewrite(ds).take_all()}
    assert ("Bob Jones", "per:spouse", "Alice Smith") in rows
    assert rows[("Bob Jones", "per:spouse", "Alice Smith")] == \
        pytest.approx(0.8 * graph_infer.REWRITE_DAMPING)
    # original edges kept at original score
    assert rows[("Alice Smith", "per:spouse", "Bob Jones")] == 0.8
    # DATE-valued relations don't mirror
    assert ("1999", "org:founded", "Acme") not in rows


def test_inverse_rewrite_children_parents(ray_session):
    ds = _fills_ds([
        ("Alice Smith", "PERSON", "per:children", "Carol Smith",
         "PERSON", 0.9),
        # pre-existing reverse edge with higher score must win
        ("Carol Smith", "PERSON", "per:parents", "Alice Smith",
         "PERSON", 0.95),
    ])
    rows = {(r["subj"], r["pred"], r["obj"]): r["score"]
            for r in graph_infer.symmetric_inverse_rewrite(ds).take_all()}
    assert rows[("Carol Smith", "per:parents", "Alice Smith")] == 0.95
    assert rows[("Alice Smith", "per:children", "Carol Smith")] == \
        pytest.approx(max(0.9, 0.95 * graph_infer.REWRITE_DAMPING))


def test_transitive_grandparent_org(ray_session):
    ds = _fills_ds([
        ("SubCo", "ORGANIZATION", "org:parents", "MidCo",
         "ORGANIZATION", 0.9),
        ("MidCo", "ORGANIZATION", "org:parents", "TopCo",
         "ORGANIZATION", 0.8),
        ("Zed Corp", "ORGANIZATION", "org:founded", "1999", "DATE", 1.0),
    ])
    inf = graph_infer.transitive_infer(ds).take_all()
    got = {(r["subj"], r["pred"], r["obj"]): r["score"] for r in inf}
    assert got == {("SubCo", "org:parents", "TopCo"):
                   pytest.approx(0.9 * 0.8 * graph_infer.RULE_DAMPING)}


def test_transitive_membership_through_org(ray_session):
    ds = _fills_ds([
        ("Alice Smith", "PERSON", "per:member_of", "SubOrg",
         "ORGANIZATION", 1.0),
        ("SubOrg", "ORGANIZATION", "org:member_of", "Umbrella",
         "ORGANIZATION", 0.5),
    ])
    inf = graph_infer.transitive_infer(ds).take_all()
    got = {(r["subj"], r["pred"], r["obj"]) for r in inf}
    assert got == {("Alice Smith", "per:member_of", "Umbrella")}
    (row,) = inf
    assert row["subj_type"] == "PERSON"
    assert row["obj_type"] == "ORGANIZATION"


def test_transitive_no_self_loop(ray_session):
    ds = _fills_ds([
        ("A Corp", "ORGANIZATION", "org:parents", "B Corp",
         "ORGANIZATION", 0.9),
        ("B Corp", "ORGANIZATION", "org:parents", "A Corp",
         "ORGANIZATION", 0.9),
    ])
    inf = graph_infer.transitive_infer(ds).take_all()
    assert all(r["subj"] != r["obj"] for r in inf)
    assert inf == []


def test_intersect_fills(ray_session):
    a = _fills_ds([
        ("Alice Smith", "PERSON", "per:title", "curator", "TITLE", 0.9),
        ("Alice Smith", "PERSON", "per:age", "44", "NUMBER", 0.5),
    ])
    b = _fills_ds([
        ("Alice Smith", "PERSON", "per:title", "curator", "TITLE", 0.7),
        ("Bob Jones", "PERSON", "per:title", "surgeon", "TITLE", 0.8),
    ])
    out = graph_infer.intersect_fills(a, b).take_all()
    assert len(out) == 1
    r = out[0]
    assert (r["subj"], r["pred"], r["obj"]) == \
        ("Alice Smith", "per:title", "curator")
    assert r["score"] == 0.7                   # conservative min
    assert r["doc_id"] == "d0"                 # provenance from side A


def test_intersect_fills_empty_side(ray_session):
    a = _fills_ds([
        ("Alice Smith", "PERSON", "per:title", "curator", "TITLE", 0.9),
    ])
    b = _fills_ds([])
    assert graph_infer.intersect_fills(a, b).take_all() == []


def _edge(s, p, o, st="ORGANIZATION", ot="ORGANIZATION", score=0.9):
    return {"subj": s, "subj_type": st, "pred": p, "obj": o,
            "obj_type": ot, "score": score, "doc_id": "d0",
            "sent_idx": 0, "subj_span": [0, 1], "obj_span": [2, 3]}


def test_prune_by_distance(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from stanford_relation_extractor_ray.schemas import FILLS_SCHEMA
    from stanford_relation_extractor_ray.stages.graph_infer import \
        prune_by_distance
    # chain Q -> A -> B -> C -> D -> E plus a disconnected X -> Y
    chain = [_edge("Q", "org:parents", "A"),
             _edge("A", "org:parents", "B"),
             _edge("B", "org:parents", "C"),
             _edge("C", "org:parents", "D"),
             _edge("D", "org:parents", "E"),
             _edge("X", "org:parents", "Y")]
    ds = rd.from_arrow(pa.Table.from_pylist(chain, schema=FILLS_SCHEMA))
    kept = {r["subj"] for r in
            prune_by_distance(ds, ["Q"], max_dist=2).take_all()}
    # subjects within distance 2 of Q: Q, A, B (C is at distance 3)
    assert kept == {"Q", "A", "B"}
    ds2 = rd.from_arrow(pa.Table.from_pylist(chain, schema=FILLS_SCHEMA))
    kept4 = {r["subj"] for r in
             prune_by_distance(ds2, ["Q"], max_dist=4).take_all()}
    assert "X" not in kept4 and "D" in kept4


def test_mine_rules(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from stanford_relation_extractor_ray.schemas import FILLS_SCHEMA
    from stanford_relation_extractor_ray.stages.graph_infer import \
        mine_rules
    rows = []
    # 3 supported instances of parents∘parents => parents
    for i in range(3):
        rows += [_edge(f"A{i}", "org:parents", f"B{i}"),
                 _edge(f"B{i}", "org:parents", f"C{i}"),
                 _edge(f"A{i}", "org:parents", f"C{i}")]
    # 1 unsupported path of the same shape
    rows += [_edge("A9", "org:parents", "B9"),
             _edge("B9", "org:parents", "C9")]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=FILLS_SCHEMA))
    mined = mine_rules(ds, min_support=2, min_confidence=0.3)
    got = {(r.p, r.q, r.head): (r.support, r.total, round(r.confidence, 3))
           for r in mined.itertuples()}
    assert ("org:parents", "org:parents", "org:parents") in got
    sup, total, conf = got[("org:parents", "org:parents",
                            "org:parents")]
    assert sup == 3 and total == 4 and conf == 0.75
