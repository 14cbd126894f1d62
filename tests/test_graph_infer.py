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
