"""Corpus generator invariants: determinism, schema, interleaving."""

import pyarrow as pa

from stanford_relation_extractor_ray.corpus import (
    DOCUMENTS_SCHEMA, doc_plan, gold_triple_set)
from stanford_relation_extractor_ray.world import World, get_world


def test_world_deterministic():
    w1, w2 = World(42), World(42)
    assert [e.canonical for e in w1.entities] == \
        [e.canonical for e in w2.entities]
    assert w1.kb_triples() == w2.kb_triples()


def test_doc_plan_deterministic():
    w = get_world(42)
    for d in (0, 7, 123):
        assert doc_plan(d, w) == doc_plan(d, W := get_world(42))


def test_spans_shape_and_interleaving():
    w = get_world(42)
    n_media = 0
    for d in range(50):
        spans, gold = doc_plan(d, w)
        assert spans, d
        offsets = [s["offset"] for s in spans]
        assert offsets == sorted(offsets)
        for s in spans:
            assert set(s) == {"kind", "text", "media_ref", "offset"}
            if s["kind"] == "text":
                assert s["text"] and not s["media_ref"]
            else:
                n_media += 1
                assert s["media_ref"] and not s["text"]
        # gold spans point at real token ranges of the right sentence
        texts = [s["text"] for s in spans if s["kind"] == "text"]
        for g in gold:
            toks = texts[g["sent_idx"]].split(" ")
            a, b = g["subj_span"]
            assert 0 <= a < b <= len(toks)
    assert n_media > 0          # interleaving actually happens


def test_gold_triples_nonempty_and_stable():
    g1 = gold_triple_set(100)
    g2 = gold_triple_set(100)
    assert g1 == g2 and len(g1) > 50
