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

#: POS tags a slot mention may neither start nor end on
#: (``SlotMentionAnnotator.java:148-152,168-171``)
_INVALID_SLOT_POS = frozenset({"IN", "DT", "RB", "EX", "POS"})


def scan_slot_mentions(tokens: list[str], pos: list[str],
                       ner: list[str], ante: list[str],
                       entity_mask: list[bool],
                       entity_ner: str | None) -> list[tuple]:
    """Maximal same-NER-run slot-mention scan with POS fixups — the
    ``SlotMentionAnnotator.extractSlotMentions`` token loop
    (``SlotMentionAnnotator.java:134-192``), over token-level layers
    instead of a value lexicon:

    - a run starts on a non-blank NER tag, outside the (query) entity
      mask, never on IN/DT/RB/EX/POS;
    - it extends while the NER tag matches and the token is unmasked;
    - trailing IN/DT/RB/EX/POS tokens are trimmed (POS fixup);
    - a run whose last NER tag equals the entity's and which abuts a
      masked token is dropped (dangling edge of the entity mention,
      the "[George Bush] Sr." rule, ``:174-176``);
    - the first antecedent seen inside the run is carried (normalized
      name), except for DATE/NUMBER (``:183``).

    Returns (begin, end, ner_tag, antecedent) tuples. With a model NER
    swapped into ``NLPAnnotator`` this scan is what frees slot
    mentions from the lexicon; over the deterministic stand-in's
    layers it reproduces the lexicon mention spans (runs of one
    value's tokens) plus the merge/trim/dangling rules.
    """
    n = len(tokens)
    out: list[tuple] = []
    start = 0
    while start < n:
        tag = ner[start]
        if not tag or entity_mask[start] \
                or pos[start] in _INVALID_SLOT_POS:
            start += 1
            continue
        a = ante[start]
        end = start + 1
        while end < n:
            if ner[end] != tag or entity_mask[end]:
                break       # token `end` is outside the run — its
                            # antecedent must not leak onto it
            if not a:
                a = ante[end]
            end += 1
        while end > start + 1 and pos[end - 1] in _INVALID_SLOT_POS:
            end -= 1
        if end < n and entity_mask[end] and entity_ner is not None \
                and ner[end - 1] == entity_ner:
            start = end
            continue
        out.append((start, end, tag,
                    a if tag not in ("DATE", "NUMBER") else ""))
        start = end
    return out


def _token_layers(n: int, mention_tuples) -> tuple[list, list]:
    """Per-token (ner, antecedent) layers from mention tuples
    (surface, ner, begin, end, antecedent)."""
    ner = [""] * n
    ante = [""] * n
    for _s, tag, b, e, a in mention_tuples:
        for i in range(b, min(e, n)):
            ner[i] = tag
            if a:
                ante[i] = a
    return ner, ante


def slots_for_subject(tokens: list[str], pos: list[str],
                      mention_tuples, subj_resolved: str,
                      layers: tuple | None = None) -> list[tuple]:
    """Slot mentions for one subject: the same-NER-run scan with the
    subject's mentions (every mention resolving to the same surface —
    the reference's per-query entityMentions) masked out. Returns
    mention-shaped tuples (surface, ner, begin, end, antecedent).
    ``layers`` lets callers reuse per-sentence ``_token_layers``."""
    n = len(tokens)
    ner, ante = layers if layers is not None \
        else _token_layers(n, mention_tuples)
    mask = [False] * n
    entity_ner = None
    for s, tag, b, e, a in mention_tuples:
        if (a or s) == subj_resolved:
            entity_ner = tag
            for i in range(b, min(e, n)):
                mask[i] = True
    return [(" ".join(tokens[b:e]), tag, b, e, a)
            for b, e, tag, a in scan_slot_mentions(
                tokens, pos, ner, ante, mask, entity_ner)]


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
        else:
            from .deps import pos_tag
            pos = pos_tag(tokens)
        ment_tuples = [(m["surface"], m["ner"], m["begin"], m["end"],
                        m["antecedent"]) for m in mentions]
        layers = _token_layers(len(tokens), ment_tuples)
        best: dict[tuple, tuple] = {}
        for em in mentions:
            if em["ner"] not in ("PERSON", "ORGANIZATION"):
                continue
            subj_surface = em["antecedent"] or em["surface"]
            # slot side: the same-NER-run scan with this subject's
            # mentions masked (SlotMentionAnnotator semantics)
            for s_surf, s_ner, s_b, s_e, s_a in slots_for_subject(
                    tokens, pos, ment_tuples, subj_surface,
                    layers=layers):
                if s_a:
                    continue                  # slot can't be a pronoun
                if em["end"] <= s_b:
                    gap = s_b - em["end"]
                elif s_e <= em["begin"]:
                    gap = em["begin"] - s_e
                else:
                    continue                  # overlapping spans
                if gap > MAX_DISTANCE:
                    continue
                key = (subj_surface, s_surf)
                prev = best.get(key)
                if prev is not None and prev[0] <= gap:
                    continue
                lo, hi = ((em["end"], s_b) if em["end"] <= s_b
                          else (s_e, em["begin"]))
                between = " ".join(tokens[lo:hi])
                best[key] = (gap, em, (s_surf, s_ner, s_b, s_e),
                             subj_surface, between)
        for gap, em, sm, subj_surface, between in best.values():
            cols["subj"].append(subj_surface)
            cols["subj_type"].append(em["ner"])
            cols["obj"].append(sm[0])
            cols["obj_type"].append(sm[1])
            cols["doc_id"].append(doc_id)
            cols["sent_idx"].append(sent_idx)
            cols["subj_begin"].append(em["begin"])
            cols["subj_end"].append(em["end"])
            cols["obj_begin"].append(sm[2])
            cols["obj_end"].append(sm[3])
            cols["between"].append(between)
            cols["ctx_features"].append(
                context_features(tokens, pos, edges, ment_spans,
                                 (em["begin"], em["end"]),
                                 (sm[2], sm[3]))
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
        from .deps import pos_tag
        if with_ctx:
            pos, edges = annotator.analyze(tokens)
            ment_spans = [(m[2], m[3], m[1]) for m in mentions]
        else:
            pos = pos_tag(tokens)
        layers = _token_layers(len(tokens), mentions)
        best: dict[tuple, tuple] = {}
        for em in mentions:
            e_surf, e_ner, e_b, e_e, e_ante = em
            if e_ner != "PERSON" and e_ner != "ORGANIZATION":
                continue
            subj_surface = e_ante or e_surf
            # slot side: same-NER-run scan, this subject masked
            for sm in slots_for_subject(tokens, pos, mentions,
                                        subj_surface, layers=layers):
                if sm[4]:
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

    # Row POOL + occurrence expansion: candidate rows are appended to
    # flat pool columns once per DISTINCT sentence text (~3% of
    # occurrences on the bench corpus; dynamic pronoun sentences get
    # one-off pool entries), and each occurrence records only its pool
    # slot + (doc_id, sent_idx). The output columns are then one Arrow
    # C++ gather per field over numpy-built indices — the previous
    # 12-appends-per-candidate Python loop ran per OCCURRENCE row.
    # Occurrence order and within-sentence row order are preserved, so
    # the table is identical row-for-row.
    import numpy as np

    pool: list = [[] for _ in range(10)]     # flat rows, pool-major
    pool_starts: list[int] = [0]             # per-entry start offsets
    key_slot: dict[str, int] = {}            # text → pool entry
    occ_slot: list[int] = []
    occ_doc: list[str] = []
    occ_sent: list[int] = []

    def add_pool(rows) -> int:
        for r in rows:
            for j in range(10):
                pool[j].append(r[j])
        pool_starts.append(pool_starts[-1] + len(rows))
        return len(pool_starts) - 2

    for doc_id, sent_idx, tokens, mentions, text in \
            annotator.iter_sentences(batch):
        if len(mentions) < 2:
            continue
        if any(m[4] for m in mentions):       # resolved pronoun: dynamic
            rows = compute_rows(tokens, mentions)
            if not rows:
                continue
            slot = add_pool(rows)
        else:
            slot = key_slot.get(text)
            if slot is None:
                rows = memo.get(text)
                if rows is None:
                    if len(memo) >= 500_000:
                        memo.clear()
                    rows = memo[text] = compute_rows(tokens, mentions)
                slot = key_slot[text] = add_pool(rows)
        occ_slot.append(slot)
        occ_doc.append(doc_id)
        occ_sent.append(sent_idx)

    starts_np = np.asarray(pool_starts, np.int64)
    slots = np.asarray(occ_slot, np.int64) if occ_slot \
        else np.empty(0, np.int64)
    counts = starts_np[slots + 1] - starts_np[slots]
    total = int(counts.sum())
    occ_of_row = np.repeat(np.arange(len(slots)), counts)
    win_starts = np.concatenate(([0], np.cumsum(counts)[:-1])) \
        if len(counts) else np.empty(0, np.int64)
    within = np.arange(total) - np.repeat(win_starts, counts)
    idx = pa.array(np.repeat(starts_np[slots], counts) + within,
                   pa.int64())
    occ_idx = pa.array(occ_of_row, pa.int64())

    pool_fields = ["subj", "subj_type", "obj", "obj_type",
                   "subj_begin", "subj_end", "obj_begin", "obj_end",
                   "between", "ctx_features"]   # row-tuple field order
    gathered = {
        nm: pa.array(pool[j],
                     CANDIDATES_SCHEMA.field(nm).type).take(idx)
        for j, nm in enumerate(pool_fields)}
    gathered["doc_id"] = pa.array(occ_doc, pa.string()).take(occ_idx)
    gathered["sent_idx"] = pa.array(occ_sent, pa.int32()).take(occ_idx)
    return pa.Table.from_arrays(
        [gathered[n] for n in CANDIDATES_SCHEMA.names],
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
