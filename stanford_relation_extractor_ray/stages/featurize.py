"""Featurization: candidate rows → feature-string lists.

Ray-Data shape of the reference's FeatureFactory template application
(``kbp/slotfilling/process/FeatureFactory.java`` — the active
``relationFeatures`` template families: arg types, arg order, surface
distance bins, adjacent words, span unigrams between the args) as a
stateless ``map_batches``. Feature strings keep the reference's
"template:value" convention so a real template library drops into the
same column contract (``features: list<string>``).
"""

from __future__ import annotations

import pyarrow as pa

from ..schemas import FEATURIZED_SCHEMA


def featurize_batch(batch: pa.Table) -> pa.Table:
    subj_t = batch.column("subj_type").to_pylist()
    obj_t = batch.column("obj_type").to_pylist()
    between = batch.column("between").to_pylist()
    sb = batch.column("subj_begin").to_pylist()
    ob = batch.column("obj_begin").to_pylist()

    feats: list[list[str]] = []
    for st, ot, bw, s0, o0 in zip(subj_t, obj_t, between, sb, ob):
        order = "SO" if s0 <= o0 else "OS"
        bw_toks = bw.split(" ") if bw else []
        f = [
            f"types:{st}:{ot}",
            f"order:{order}",
            f"dist:{min(len(bw_toks), 10)}",
            f"between:{bw}",
            f"types_between:{st}:{bw}:{ot}",
        ]
        f.extend(f"bw:{t}" for t in bw_toks)
        feats.append(f)

    return pa.Table.from_arrays(
        [batch.column(n) for n in batch.column_names] +
        [pa.array(feats, pa.list_(pa.string()))],
        schema=FEATURIZED_SCHEMA)


def featurize(candidates, *, batch_size: int = 4096):
    return candidates.map_batches(featurize_batch, batch_format="pyarrow",
                                  batch_size=batch_size)
