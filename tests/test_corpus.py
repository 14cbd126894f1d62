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


def test_docs_batch_columnar_equals_dict_path():
    """The columnar span fast path (_docs_batch via doc_plan out_cols)
    is byte-identical to the public dict-returning doc_plan — same rng
    stream (inlined choice/randint/sample draws), same span fields."""
    import numpy as np
    import pyarrow as pa
    from stanford_relation_extractor_ray.corpus import (
        DOCUMENTS_SCHEMA, SPAN_STRUCT, _docs_batch, doc_plan)
    from stanford_relation_extractor_ray.world import get_world

    w = get_world(123)
    n = 1500
    got = _docs_batch({"id": np.arange(n, dtype=np.int64)}, 123)
    doc_ids, span_lists = [], []
    for did in range(n):
        spans, gold = doc_plan(did, w)          # dict path, with gold
        doc_ids.append(f"d{did:09d}")
        span_lists.append(spans)
    want = pa.Table.from_arrays(
        [pa.array(doc_ids, pa.string()),
         pa.array(span_lists, pa.list_(SPAN_STRUCT))],
        schema=DOCUMENTS_SCHEMA)
    assert got.equals(want)


def test_doc_plan_gold_invariant_to_fast_flags():
    """with_gold=False changes nothing about the span stream, and the
    has-date-of-death flag reproduces the gold-scan control flow."""
    from stanford_relation_extractor_ray.corpus import doc_plan
    from stanford_relation_extractor_ray.world import get_world

    w = get_world(42)
    for did in range(400):
        spans_full, gold = doc_plan(did, w)
        spans_fast, none = doc_plan(did, w, with_gold=False)
        assert spans_full == spans_fast
        assert none is None and isinstance(gold, list)
