"""Within-sentence relation competition (SURVEY.md §2.2).

Ray-Data shape of the reference's ``RelationFilter``
(``kbp/slotfilling/process/RelationFilter.java:73-``, 3-step apply):
when several candidate (entity, slot) pairs share a sentence, the
pairs that score far below the sentence's best pair are noise and are
dropped before bag assembly.

Sentence-locality makes this a per-batch transform with NO shuffle —
but only when the batch holds whole sentences. That holds inside
``FusedExtractor.__call__`` (candidates are produced per document
batch) and for ``pair()`` output consumed at the producing batch size;
a re-batched stream must co-partition by (doc_id, sent_idx) first.
Off by default (the reference gates it behind a Props flag too): it
trades recall for precision.
"""

from __future__ import annotations

import pyarrow as pa

KEEP_RATIO = 0.5       # keep pairs scoring >= ratio × sentence max


def competition_filter(batch: pa.Table, *, score_col: str = "score",
                       keep_ratio: float = KEEP_RATIO) -> pa.Table:
    """Scored candidate rows → rows surviving sentence competition."""
    if batch.num_rows == 0:
        return batch
    doc = batch.column("doc_id").to_pylist()
    sent = batch.column("sent_idx").to_pylist()
    score = batch.column(score_col).to_pylist()
    best: dict[tuple, float] = {}
    for d, s, sc in zip(doc, sent, score):
        k = (d, s)
        if sc > best.get(k, 0.0):
            best[k] = sc
    mask = [sc >= keep_ratio * best[(d, s)]
            for d, s, sc in zip(doc, sent, score)]
    return batch.filter(pa.array(mask))


def apply(candidates, *, score_col: str = "score",
          keep_ratio: float = KEEP_RATIO, batch_size: int = 8192):
    """Dataset version (stateless tasks)."""
    return candidates.map_batches(
        lambda b: competition_filter(b, score_col=score_col,
                                     keep_ratio=keep_ratio),
        batch_format="pyarrow", batch_size=batch_size)
