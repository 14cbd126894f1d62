"""Sources and sinks mirroring the reference's I/O surface (SURVEY.md §2.1).

- Candidate-sentence TSV reader — the fork's "virtual IR"
  (``kbp/slotfilling/evaluate/SimpleSlotFiller.java:110-157``): TSV rows
  ``eid \\t relation \\t score \\t provenance \\t ... \\t sentence`` where
  provenance is ``docId:...:sentIdx:a-b:c-d``
  (``kbp/common/SentenceDouble.java:10-29``).
- KB triple TSV reader (``kbp/slotfilling/ir/KBPIR.java:165-178``):
  ``entityName \\t entityType \\t relation \\t slotValue \\t slotType``.
- TAC query XML reader (``kbp/slotfilling/spec/TaskXMLParser.java:58-96``)
  — small driver-side read returning the query-entity list (broadcast by
  the caller).
- Official-output writer (``kbp/slotfilling/spec/
  OfficialOutputWriter.java:48-101``): per-query lines sorted by relation,
  NIL rows for relations with no fill.
- predictions.tab sink (``kbp/slotfilling/evaluate/
  KBPEvaluator.java:173-187``): machine-readable scored fills.

Readers return streaming ``ray.data.Dataset``s (``read_text`` +
vectorized per-batch parsing); the parse never touches the driver.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa

CANDIDATE_SENTENCES_SCHEMA = pa.schema([
    ("entity_id", pa.string()),
    ("relation", pa.string()),
    ("score", pa.float64()),
    ("doc_id", pa.string()),
    ("sent_idx", pa.int32()),
    ("slot_value_span", pa.list_(pa.int32())),
    ("entity_span", pa.list_(pa.int32())),
    ("sentence", pa.string()),
])

KB_TRIPLES_SCHEMA = pa.schema([
    ("entity_name", pa.string()),
    ("entity_type", pa.string()),
    ("relation", pa.string()),
    ("slot_value", pa.string()),
    ("slot_type", pa.string()),
])

_PROV_RE = re.compile(
    r"^(?P<doc>.+?):(?P<sent>\d+):(?P<sva>\d+)-(?P<svb>\d+)"
    r":(?P<ema>\d+)-(?P<emb>\d+)$")


def parse_provenance(prov: str) -> tuple[str, int, list, list] | None:
    """``docId:sentIdx:a-b:c-d`` → (doc_id, sent_idx, sv_span, em_span);
    docId may itself contain colons (the regex anchors on the numeric
    tail, matching the reference's right-to-left split)."""
    m = _PROV_RE.match(prov)
    if m is None:
        return None
    return (m.group("doc"), int(m.group("sent")),
            [int(m.group("sva")), int(m.group("svb"))],
            [int(m.group("ema")), int(m.group("emb"))])


def read_candidate_sentences(path: str):
    """TSV file(s) → candidate-sentences Dataset (the virtual IR)."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch.column("text").to_pylist()
        cols: dict[str, list] = {n: []
                                 for n in CANDIDATE_SENTENCES_SCHEMA.names}
        for line in lines:
            if not line.strip():
                continue
            parts = line.split("\t")
            if len(parts) < 5:
                continue
            prov = parse_provenance(parts[3])
            if prov is None:
                continue
            cols["entity_id"].append(parts[0])
            cols["relation"].append(parts[1])
            try:
                cols["score"].append(float(parts[2]))
            except ValueError:
                cols["score"].append(0.0)
            cols["doc_id"].append(prov[0])
            cols["sent_idx"].append(prov[1])
            cols["slot_value_span"].append(prov[2])
            cols["entity_span"].append(prov[3])
            cols["sentence"].append(parts[-1])
        return pa.Table.from_arrays(
            [pa.array(cols[n], t) for n, t in
             zip(CANDIDATE_SENTENCES_SCHEMA.names,
                 CANDIDATE_SENTENCES_SCHEMA.types)],
            schema=CANDIDATE_SENTENCES_SCHEMA)

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")


def read_kb_triples(path: str):
    """KB triple TSV → triples Dataset."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch.column("text").to_pylist()
        rows = [ln.split("\t") for ln in lines if ln.strip()]
        rows = [r for r in rows if len(r) >= 5]
        return pa.Table.from_arrays(
            [pa.array([r[i] for r in rows], pa.string())
             for i in range(5)],
            schema=KB_TRIPLES_SCHEMA)

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")


def read_query_entities(path: str) -> list[dict]:
    """TAC query XML → list of official query entities (driver-side;
    the list is tiny and is broadcast by callers).

    Expected shape (TaskXMLParser semantics):
    ``<kbpslotfill><query id="..."><name>..</name><enttype>PER|ORG
    </enttype><docid>..</docid><ignore>rel1 rel2</ignore></query>...``
    """
    import xml.etree.ElementTree as ET

    out = []
    root = ET.parse(path).getroot()
    for q in root.iter("query"):
        name = q.findtext("name", "").strip()
        etype = q.findtext("enttype", "").strip().upper()
        out.append({
            "query_id": q.get("id", ""),
            "name": name,
            "type": {"PER": "PERSON", "ORG": "ORGANIZATION"}.get(
                etype, etype),
            "doc_id": q.findtext("docid", "").strip(),
            "ignored_slots": (q.findtext("ignore", "") or "").split(),
        })
    return out


def write_official_output(fills, path: str, run_id: str = "ray1",
                          all_relations: list[str] | None = None,
                          list_strategy: str = "ALL", top_k: int = 3):
    """Consistent fills Dataset → official TAC slot-filling output.

    Lines ``subj \\t relation \\t run_id \\t doc_id \\t slot_value``
    sorted by (subj, relation, slot value); relations in
    ``all_relations`` with no fill for a subject get a NIL line, as the
    official writer emits (``OfficialOutputWriter.java:134-150``). The
    sort happens on the (small, aggregated) fills table — never on the
    corpus.

    ``list_strategy`` (``KBPEvaluator.java:94-98,218``): for
    LIST-cardinality relations emit ALL fills, the single BEST by
    score, or the TOP ``top_k`` by score (SINGLE relations are top-1
    by construction after consistency).

    Scale bound: this sink (and ``write_predictions_tab``) collects
    the fills table to the driver for the single official file — the
    table is per-query-entity post-consistency output, bounded by
    #queries × #relations × list size, NOT corpus-sized. Corpus-scale
    outputs go through ``storage.write_table`` (partitioned Parquet).
    """
    if list_strategy not in ("ALL", "BEST", "TOP"):
        raise ValueError(f"unknown list strategy: {list_strategy}")
    rows = fills.sort(["subj", "pred", "obj"]).take_all()
    if list_strategy != "ALL":
        keep = 1 if list_strategy == "BEST" else top_k
        by_key: dict[tuple, list[dict]] = {}
        for r in rows:
            by_key.setdefault((r["subj"], r["pred"]), []).append(r)
        rows = []
        for key in sorted(by_key):
            grp = sorted(by_key[key],
                         key=lambda r: (-r["score"], r["obj"]))[:keep]
            rows.extend(sorted(grp, key=lambda r: r["obj"]))
    by_subj: dict[str, list[dict]] = {}
    for r in rows:
        by_subj.setdefault(r["subj"], []).append(r)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for subj in sorted(by_subj):
            fills_here = by_subj[subj]
            filled = {r["pred"] for r in fills_here}
            rels = sorted(set(all_relations or []) | filled)
            for rel in rels:
                matching = [r for r in fills_here if r["pred"] == rel]
                if not matching:
                    f.write(f"{subj}\t{rel}\t{run_id}\tNIL\n")
                    continue
                for r in matching:
                    f.write(f"{subj}\t{rel}\t{run_id}\t"
                            f"{r['doc_id']}\t{r['obj']}\n")
    return path


def write_predictions_tab(fills, path: str):
    """Machine-readable scored fills: one TSV row per fill —
    score, subj, subj_type, pred, obj, obj_type, doc_id, sent_idx,
    spans (KBPEvaluator.java:173-187)."""
    rows = fills.sort(["subj", "pred", "obj"]).take_all()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            ss, os_ = r["subj_span"], r["obj_span"]
            f.write("\t".join([
                f"{r['score']:.6f}", r["subj"], r["subj_type"],
                r["pred"], r["obj"], r["obj_type"], r["doc_id"],
                str(r["sent_idx"]),
                f"{ss[0]}-{ss[1]}", f"{os_[0]}-{os_[1]}"]) + "\n")
    return path
