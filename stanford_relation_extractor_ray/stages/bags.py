"""Bag assembly: featurized candidates → MIML sentence bags.

Ray-Data shape of the reference's ``Featurizer.java:35-51`` /
``KBPProcess.java:113-180`` grouping of singleton datums by ``KBPair`` —
the pipeline's **first shuffle**, ``groupby`` on the pair key.

Skew design (SURVEY.md §4): hot entities ("United States"-type keys) are
salted — the group key carries ``salt = crc32(doc_id) % n_salt`` so one
hot pair splits into ``n_salt`` partial bags that are classified
independently; scores are then combined per triple with a cheap noisy-or
merge (stages/classify.py:combine_fills), never re-assembling the giant
bag. Bags are additionally capped at ``max_sentences`` per partial bag
(reference caps sentences per entity at 500,
``StanfordMIMLRE.properties:30``).

Exact duplicate datums within a bag (same provenance + feature set) are
dropped, mirroring ``SentenceGroup.removeDuplicateDatums``
(``kbp/common/SentenceGroup.java:174-214``).
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from ..schemas import BAGS_SCHEMA

BAG_KEY = ["subj", "subj_type", "obj", "obj_type"]
MAX_SENTENCES_PER_BAG = 500


def add_salt(batch: pa.Table, n_salt: int) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    salt = pa.array([zlib.crc32(d.encode()) % n_salt for d in doc_ids],
                    pa.int32())
    return batch.append_column("salt", salt)


def _make_bags(group: pa.Table) -> pa.Table:
    """One group = one (pair key, salt); emit a single bag row."""
    rows = group.sort_by([("doc_id", "ascending"),
                          ("sent_idx", "ascending")])
    n = min(rows.num_rows, MAX_SENTENCES_PER_BAG)
    rows = rows.slice(0, n)
    cols = {name: rows.column(name).to_pylist()
            for name in ("subj", "subj_type", "obj", "obj_type", "doc_id",
                         "sent_idx", "subj_begin", "subj_end", "obj_begin",
                         "obj_end", "features")}
    # exact datum dedup on (provenance, feature set)
    seen: set[tuple] = set()
    keep = []
    for i in range(n):
        sig = (cols["doc_id"][i], cols["sent_idx"][i],
                tuple(cols["features"][i]))
        if sig in seen:
            continue
        seen.add(sig)
        keep.append(i)
    arrays = [
        pa.array([cols["subj"][keep[0]]], pa.string()),
        pa.array([cols["subj_type"][keep[0]]], pa.string()),
        pa.array([cols["obj"][keep[0]]], pa.string()),
        pa.array([cols["obj_type"][keep[0]]], pa.string()),
        pa.array([len(keep)], pa.int32()),
        pa.array([[cols["features"][i] for i in keep]],
                 pa.list_(pa.list_(pa.string()))),
        pa.array([[cols["doc_id"][i] for i in keep]],
                 pa.list_(pa.string())),
        pa.array([[cols["sent_idx"][i] for i in keep]],
                 pa.list_(pa.int32())),
        pa.array([[cols["subj_begin"][i] for i in keep]],
                 pa.list_(pa.int32())),
        pa.array([[cols["subj_end"][i] for i in keep]],
                 pa.list_(pa.int32())),
        pa.array([[cols["obj_begin"][i] for i in keep]],
                 pa.list_(pa.int32())),
        pa.array([[cols["obj_end"][i] for i in keep]],
                 pa.list_(pa.int32())),
    ]
    return pa.Table.from_arrays(arrays, schema=BAGS_SCHEMA)


def assemble(featurized, *, n_salt: int = 4, batch_size: int = 4096):
    """featurized candidates → bags (salted groupby; shuffle #1)."""
    salted = featurized.map_batches(
        lambda b: add_salt(b, n_salt), batch_format="pyarrow",
        batch_size=batch_size)
    return salted.groupby(BAG_KEY + ["salt"]).map_groups(
        _make_bags, batch_format="pyarrow")
