"""Ensemble AGREE_* voting modes (mirrors the reference's
EnsembleRelationExtractorTest.java:84-131 mock-classifier outcomes) and
the alternate-names extractor."""

import pyarrow as pa
import pytest

from stanford_relation_extractor_ray.stages.classify import \
    ensemble_combine

# three mock components: {relation: (score, best_i, best_s)}
C1 = {"per:spouse": (0.9, 0, 0.9), "per:age": (0.6, 1, 0.6)}
C2 = {"per:spouse": (0.8, 2, 0.8)}
C3 = {}


def test_agree_any_unions_and_noisy_ors():
    out = ensemble_combine([C1, C2, C3], "any")
    assert set(out) == {"per:spouse", "per:age"}
    assert out["per:spouse"][0] == pytest.approx(1 - 0.1 * 0.2)
    assert out["per:age"][0] == pytest.approx(0.6)
    # provenance from the highest-weight agreeing component
    assert out["per:spouse"][1] == 0


def test_agree_all_requires_every_component():
    assert ensemble_combine([C1, C2], "all") \
        == {"per:spouse": (pytest.approx(1 - 0.1 * 0.2), 0, 0.9)}
    assert ensemble_combine([C1, C2, C3], "all") == {}


def test_agree_most_majority():
    out = ensemble_combine([C1, C2, C3], "most")   # need >= 2 of 3
    assert set(out) == {"per:spouse"}


def test_agree_two():
    assert set(ensemble_combine([C1, C2, C3], "two")) == {"per:spouse"}
    assert ensemble_combine([C1, C3], "two") == {}


def test_agree_first_is_order_dependent():
    assert ensemble_combine([C3, C2, C1], "first") == C2
    assert ensemble_combine([C1, C2], "first") == C1
    assert ensemble_combine([C3], "first") == {}


def test_alternate_names_distinct_sentence_threshold(ray_session):
    import ray.data as rd
    from stanford_relation_extractor_ray.stages.altnames import \
        alternate_name_fills
    rows = [
        # "Bobby J" alias of "Robert Jones" in 2 distinct sentences
        {"subj": "Robert Jones", "subj_type": "PERSON",
         "raw_subj": "Bobby J", "doc_id": "d1", "sent_idx": 0},
        {"subj": "Robert Jones", "subj_type": "PERSON",
         "raw_subj": "Bobby J", "doc_id": "d2", "sent_idx": 3},
        # duplicate observation of the same sentence — counts once
        {"subj": "Robert Jones", "subj_type": "PERSON",
         "raw_subj": "Bobby J", "doc_id": "d2", "sent_idx": 3},
        # alias with only 1 distinct sentence — below threshold
        {"subj": "Robert Jones", "subj_type": "PERSON",
         "raw_subj": "R. Jones", "doc_id": "d3", "sent_idx": 1},
        # surface == canonical: no alias evidence
        {"subj": "Robert Jones", "subj_type": "PERSON",
         "raw_subj": "Robert Jones", "doc_id": "d4", "sent_idx": 0},
        # ORG alias across 2 sentences
        {"subj": "Acme Corporation", "subj_type": "ORGANIZATION",
         "raw_subj": "ACME", "doc_id": "d5", "sent_idx": 0},
        {"subj": "Acme Corporation", "subj_type": "ORGANIZATION",
         "raw_subj": "ACME", "doc_id": "d5", "sent_idx": 2},
    ]
    t = pa.Table.from_pylist(rows)
    out = alternate_name_fills(rd.from_arrow(t), min_sentences=2) \
        .take_all()
    got = {(r["subj"], r["pred"], r["obj"]) for r in out}
    assert got == {
        ("Robert Jones", "per:alternate_names", "Bobby J"),
        ("Acme Corporation", "org:alternate_names", "ACME"),
    }
    # fills carry real provenance: the min (doc_id, sent_idx) evidence
    prov = {r["obj"]: (r["doc_id"], r["sent_idx"]) for r in out}
    assert prov == {"Bobby J": ("d1", 0), "ACME": ("d5", 0)}
