"""Alternate-names extraction (SURVEY.md §2.2 / §2.6).

Ray-Data shape of the reference's ``AlternateNamesExtractor``
(``kbp/slotfilling/evaluate/AlternateNamesExtractor.java``): an alias
surface observed for a linked entity in at least ``min_sentences``
DISTINCT sentences yields a ``per:/org:alternate_names`` fill.

Evidence comes from the candidates table: a candidate whose raw subject
surface differs from its linked canonical subject is one (canonical,
alias) observation with its (doc_id, sent_idx) sentence key. The
distinct-sentence count is a pre-aggregated distributed count:
per-batch sets first, then a small ``groupby`` over (canonical, alias)
partials — the groupby input is one row per distinct pair per batch,
not one per observation.
"""

from __future__ import annotations

import pyarrow as pa

from ..schemas import FILLS_SCHEMA

ALT_SCORE = 0.9


def alternate_name_fills(candidates_with_surface, *,
                         min_sentences: int = 2):
    """Dataset with (subj, subj_type, raw_subj, doc_id, sent_idx) →
    alternate_names fills Dataset.

    ``raw_subj`` is the pre-linking surface; rows where it equals the
    canonical subject carry no alias evidence and are dropped in the
    first (vectorized) pass.
    """
    from ray.data.aggregate import Count

    def partial(batch: pa.Table) -> pa.Table:
        subj = batch.column("subj").to_pylist()
        styp = batch.column("subj_type").to_pylist()
        raw = batch.column("raw_subj").to_pylist()
        doc = batch.column("doc_id").to_pylist()
        sent = batch.column("sent_idx").to_pylist()
        seen: set[tuple] = set()
        for s, t, r, d, x in zip(subj, styp, raw, doc, sent):
            if r and r != s:
                seen.add((s, t, r, d, x))
        ks = sorted(seen)
        return pa.table({
            "subj": pa.array([k[0] for k in ks], pa.string()),
            "subj_type": pa.array([k[1] for k in ks], pa.string()),
            "alias": pa.array([k[2] for k in ks], pa.string()),
            "doc_id": pa.array([k[3] for k in ks], pa.string()),
            "sent_idx": pa.array([k[4] for k in ks], pa.int32())})

    counted = (candidates_with_surface
               .map_batches(partial, batch_format="pyarrow")
               .groupby(["subj", "subj_type", "alias", "doc_id",
                         "sent_idx"])
               .count()      # dedup across batches: one row per sentence
               .groupby(["subj", "subj_type", "alias"])
               .aggregate(Count(alias_name="n_sentences")))

    def to_fills(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = batch.filter(pc.greater_equal(
            batch.column("n_sentences"), min_sentences))
        subj = keep.column("subj").to_pylist()
        styp = keep.column("subj_type").to_pylist()
        alias = keep.column("alias").to_pylist()
        n = keep.num_rows
        pred = ["per:alternate_names" if t == "PERSON"
                else "org:alternate_names" for t in styp]
        return pa.Table.from_arrays(
            [pa.array(subj, pa.string()),
             pa.array(styp, pa.string()),
             pa.array(pred, pa.string()),
             pa.array(alias, pa.string()),
             pa.array(styp, pa.string()),
             pa.array([ALT_SCORE] * n, pa.float64()),
             pa.array([""] * n, pa.string()),
             pa.array([-1] * n, pa.int32()),
             pa.array([[0, 0]] * n, pa.list_(pa.int32())),
             pa.array([[0, 0]] * n, pa.list_(pa.int32()))],
            schema=FILLS_SCHEMA)

    return counted.map_batches(to_fills, batch_format="pyarrow")
