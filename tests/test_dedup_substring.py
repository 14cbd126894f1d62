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


def test_span_scrubber_closes_the_loop(ray_session):
    """detect → scrub → re-detect finds nothing: the flagged grams
    are gone from every document after one SpanScrubber pass."""
    import ray

    from stanford_relation_extractor_ray.stages.dedup import SpanScrubber

    ds = rd.from_items(DOCS)
    flagged = {r["gram"]
               for r in substring_spans(ds, n=4, min_docs=2)
               .take_all()}
    assert flagged
    ref = ray.put(flagged)
    scrubbed = rd.from_items(DOCS).map_batches(
        SpanScrubber, fn_constructor_kwargs={"grams_ref": ref, "n": 4},
        batch_format="pyarrow", concurrency=1).materialize()
    assert substring_spans(scrubbed, n=4, min_docs=2).count() == 0
    # untouched docs pass through byte-identical
    texts = {r["doc_id"]: r["text"] for r in scrubbed.take_all()}
    assert texts[4] == "short text" and texts[5] == ""
