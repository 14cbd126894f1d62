"""substring_spans: exact repeated token-n-gram span detection.

Pins the map-side combine + single-groupby semantics: distinct-doc
counts and occurrence counts must be exact regardless of how documents
are split across blocks (each document is one row, so per-batch
partials are exact by construction).
"""

import ray.data as rd

from stanford_relation_extractor_ray.stages.dedup import substring_spans

DOCS = [
    {"doc_id": 1, "text": "the quick brown fox jumps over the dog"},
    {"doc_id": 2, "text": "a quick brown fox jumps high today ok"},
    # doc 3 repeats the shared gram twice in one document
    {"doc_id": 3, "text": "quick brown fox jumps x quick brown fox "
                          "jumps y"},
    {"doc_id": 4, "text": "short text"},                # < n tokens
    {"doc_id": 5, "text": ""},                          # empty
]


def _run(n_blocks: int):
    ds = rd.from_items(DOCS).repartition(n_blocks)
    out = substring_spans(ds, n=4, min_docs=2).take_all()
    return [(r["gram"], r["n_docs"], r["n_occ"]) for r in out]


def test_substring_spans_counts(ray_session):
    rows = _run(1)
    assert ("quick brown fox jumps", 3, 4) in rows
    # every reported gram is in >= 2 distinct docs
    assert all(nd >= 2 for (_g, nd, _no) in rows)
    # sorted by gram
    assert [g for (g, _n, _o) in rows] == \
        sorted(g for (g, _n, _o) in rows)


def test_substring_spans_partition_invariant(ray_session):
    assert _run(1) == _run(5)
