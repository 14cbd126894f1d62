"""Within-sentence relation competition (RelationFilter analog)."""

import pyarrow as pa

from stanford_relation_extractor_ray.stages.competition import \
    competition_filter


def _t(rows):
    return pa.Table.from_pylist(rows)


def test_competition_drops_weak_pairs_per_sentence():
    t = _t([
        {"doc_id": "d1", "sent_idx": 0, "obj": "a", "score": 1.0},
        {"doc_id": "d1", "sent_idx": 0, "obj": "b", "score": 0.6},
        {"doc_id": "d1", "sent_idx": 0, "obj": "c", "score": 0.3},
        # a different sentence has its own max
        {"doc_id": "d1", "sent_idx": 1, "obj": "d", "score": 0.2},
        {"doc_id": "d2", "sent_idx": 0, "obj": "e", "score": 0.05},
    ])
    out = competition_filter(t, keep_ratio=0.5).to_pylist()
    kept = {r["obj"] for r in out}
    # c (0.3 < 0.5*1.0) dropped; d and e are their sentences' own max
    assert kept == {"a", "b", "d", "e"}


def test_competition_empty_and_single():
    assert competition_filter(_t([])).num_rows == 0
    one = _t([{"doc_id": "d", "sent_idx": 0, "obj": "x", "score": 0.01}])
    assert competition_filter(one).num_rows == 1
