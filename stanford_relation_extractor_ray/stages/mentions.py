"""Relation-mention pairing: sentences → candidate (entity, slot) rows.

Ray-Data shape of the reference's EntityMention / SlotMention /
RelationMention annotators (``kbp/slotfilling/process/
EntityMentionAnnotator.java:49-132``, ``SlotMentionAnnotator.java:83-272``,
``RelationMentionAnnotator.java:95-296`` ALL_PAIRS mode): a stateless
``map_batches`` that emits one output row per (entity mention, slot
mention) pair — a vectorized flat_map.

Semantics preserved:
- entity mentions are PERSON/ORGANIZATION (pronouns resolved to their
  antecedent surface);
- slot mentions are every typed mention, including PERSON/ORGANIZATION
  (ALL_PAIRS, RelationMentionAnnotator.java:214-222);
- a distance gate drops pairs further apart than MAX_DISTANCE tokens
  (Utils.closeEnough, kbp/common/Utils.java:353-365);
- at most one candidate per (subj, obj) pair per sentence, keeping the
  nearest-span pair (extractedPairs dedup,
  RelationMentionAnnotator.java:109,177-183).
"""

from __future__ import annotations

import pyarrow as pa

from ..schemas import CANDIDATES_SCHEMA

MAX_DISTANCE = 12


def pair_mentions(batch: pa.Table) -> pa.Table:
    from .featurize import context_features

    doc_ids = batch.column("doc_id").to_pylist()
    sent_idxs = batch.column("sent_idx").to_pylist()
    texts = batch.column("text").to_pylist()
    mentions_col = batch.column("mentions").to_pylist()
    has_ctx = "pos" in batch.column_names \
        and "dep_edges" in batch.column_names
    pos_col = batch.column("pos").to_pylist() if has_ctx else None
    deps_col = batch.column("dep_edges").to_pylist() if has_ctx else None

    cols: dict[str, list] = {n: [] for n in CANDIDATES_SCHEMA.names}
    for row_i, (doc_id, sent_idx, text, mentions) in enumerate(zip(
            doc_ids, sent_idxs, texts, mentions_col)):
        if not mentions or len(mentions) < 2:
            continue
        tokens = text.split(" ")
        if has_ctx:
            pos = pos_col[row_i]
            edges = [(d["head"], d["dep"], d["label"])
                     for d in deps_col[row_i]]
            ment_spans = [(m["begin"], m["end"], m["ner"])
                          for m in mentions]
        best: dict[tuple, tuple] = {}
        for em in mentions:
            if em["ner"] not in ("PERSON", "ORGANIZATION"):
                continue
            subj_surface = em["antecedent"] or em["surface"]
            for sm in mentions:
                if sm is em or sm["antecedent"]:
                    continue                      # slot can't be a pronoun
                if not (em["end"] <= sm["begin"] or sm["end"] <= em["begin"]):
                    continue                      # overlapping spans
                if em["end"] <= sm["begin"]:
                    gap = sm["begin"] - em["end"]
                else:
                    gap = em["begin"] - sm["end"]
                if gap > MAX_DISTANCE:
                    continue
                key = (subj_surface, sm["surface"])
                prev = best.get(key)
                if prev is not None and prev[0] <= gap:
                    continue
                lo, hi = ((em["end"], sm["begin"])
                          if em["end"] <= sm["begin"]
                          else (sm["end"], em["begin"]))
                between = " ".join(tokens[lo:hi])
                best[key] = (gap, em, sm, subj_surface, between)
        for gap, em, sm, subj_surface, between in best.values():
            cols["subj"].append(subj_surface)
            cols["subj_type"].append(em["ner"])
            cols["obj"].append(sm["surface"])
            cols["obj_type"].append(sm["ner"])
            cols["doc_id"].append(doc_id)
            cols["sent_idx"].append(sent_idx)
            cols["subj_begin"].append(em["begin"])
            cols["subj_end"].append(em["end"])
            cols["obj_begin"].append(sm["begin"])
            cols["obj_end"].append(sm["end"])
            cols["between"].append(between)
            cols["ctx_features"].append(
                context_features(tokens, pos, edges, ment_spans,
                                 (em["begin"], em["end"]),
                                 (sm["begin"], sm["end"]))
                if has_ctx else [])
    return pa.Table.from_arrays(
        [pa.array(cols[n], t) for n, t in
         zip(CANDIDATES_SCHEMA.names, CANDIDATES_SCHEMA.types)],
        schema=CANDIDATES_SCHEMA)


def pair_candidates_fused(annotator, batch: pa.Table,
                          with_ctx: bool = False) -> pa.Table:
    """Fused path: documents batch → candidates table directly, no
    intermediate Arrow sentences table and no per-mention dicts
    (mention tuples come from ``NLPAnnotator.iter_sentences``). Same
    pairing semantics as ``pair_mentions`` — equality is pinned by
    tests/test_pipeline_e2e.py::test_fast_path_equals_bag_path.
    ``with_ctx`` runs the tagger/parser and attaches sentence-context
    features (needed only when an LR model consumes them — the
    pattern-only fast path skips the parse entirely).

    Sentences with no RESOLVED pronoun mention pair identically every
    time their text recurs, so their candidate rows (and ctx features)
    are memoized per text on the annotator — on template-generated /
    dedup-bearing corpora this skips the O(m²) pairing loop for the
    vast majority of sentences (97% duplicate rate measured on the
    bench corpus)."""
    from .featurize import context_features

    memo = getattr(annotator, "_pair_memo", None)
    if memo is None:
        memo = annotator._pair_memo = {}

    def compute_rows(tokens, mentions):
        if with_ctx:
            pos, edges = annotator.analyze(tokens)
            ment_spans = [(m[2], m[3], m[1]) for m in mentions]
        best: dict[tuple, tuple] = {}
        for em in mentions:
            e_surf, e_ner, e_b, e_e, e_ante = em
            if e_ner != "PERSON" and e_ner != "ORGANIZATION":
                continue
            subj_surface = e_ante or e_surf
            for sm in mentions:
                if sm is em or sm[4]:
                    continue                  # slot can't be a pronoun
                s_b, s_e = sm[2], sm[3]
                if e_e <= s_b:
                    gap = s_b - e_e
                elif s_e <= e_b:
                    gap = e_b - s_e
                else:
                    continue                  # overlapping spans
                if gap > MAX_DISTANCE:
                    continue
                key = (subj_surface, sm[0])
                prev = best.get(key)
                if prev is not None and prev[0] <= gap:
                    continue
                lo, hi = (e_e, s_b) if e_e <= s_b else (s_e, e_b)
                between = " ".join(tokens[lo:hi])
                best[key] = (gap, em, sm, subj_surface, between)
        return [
            (subj_surface, em[1], sm[0], sm[1], em[2], em[3],
             sm[2], sm[3], between,
             context_features(tokens, pos, edges, ment_spans,
                              (em[2], em[3]), (sm[2], sm[3]))
             if with_ctx else [])
            for gap, em, sm, subj_surface, between in best.values()]

    cols: dict[str, list] = {n: [] for n in CANDIDATES_SCHEMA.names}
    for doc_id, sent_idx, tokens, mentions, text in \
            annotator.iter_sentences(batch):
        if len(mentions) < 2:
            continue
        if any(m[4] for m in mentions):       # resolved pronoun: dynamic
            rows = compute_rows(tokens, mentions)
        else:
            rows = memo.get(text)
            if rows is None:
                if len(memo) >= 500_000:
                    memo.clear()
                rows = memo[text] = compute_rows(tokens, mentions)
        for (subj_surface, s_t, obj, o_t, sb, se, ob, oe, between,
             ctx) in rows:
            cols["subj"].append(subj_surface)
            cols["subj_type"].append(s_t)
            cols["obj"].append(obj)
            cols["obj_type"].append(o_t)
            cols["doc_id"].append(doc_id)
            cols["sent_idx"].append(sent_idx)
            cols["subj_begin"].append(sb)
            cols["subj_end"].append(se)
            cols["obj_begin"].append(ob)
            cols["obj_end"].append(oe)
            cols["between"].append(between)
            cols["ctx_features"].append(ctx)
    return pa.Table.from_arrays(
        [pa.array(cols[n], t) for n, t in
         zip(CANDIDATES_SCHEMA.names, CANDIDATES_SCHEMA.types)],
        schema=CANDIDATES_SCHEMA)


def vote_span_ner(mentions, span: tuple[int, int]) -> str | None:
    """NER vote over a token span (``RelationMentionAnnotator.java:
    368-376`` voteOnSpanNEType): each typed mention votes with its
    token overlap; argmax wins, ties broken by tag name for
    determinism. ``mentions`` iterates (begin, end, ner) triples or
    mention dicts."""
    b, e = span
    votes: dict[str, int] = {}
    for m in mentions:
        if isinstance(m, dict):
            mb, me, ner = m["begin"], m["end"], m["ner"]
        else:
            mb, me, ner = m[0], m[1], m[2]
        ov = min(e, me) - max(b, mb)
        if ov > 0:
            votes[ner] = votes.get(ner, 0) + ov
    if not votes:
        return None
    return min(votes, key=lambda t: (-votes[t], t))


def pair(sentences, *, batch_size: int = 1024):
    """sentences Dataset → candidates Dataset (stateless tasks)."""
    return sentences.map_batches(pair_mentions, batch_format="pyarrow",
                                 batch_size=batch_size)
