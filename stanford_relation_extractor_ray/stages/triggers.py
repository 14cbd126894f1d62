"""Relation trigger-word marking (the PreFeaturizerAnnotator piece).

Behavioral parity target (no code copied):
``kbp/slotfilling/process/PreFeaturizerAnnotator.java:418-437``
(``markTriggerWords``) with the ``TriggerSeq`` lexicon loaded at
``:65-93`` from ``index.relationtriggers``
(``StanfordMIMLRE.properties:15`` → ``edu/stanford/nlp/kbp/
keywords_no_ml``, 220 ``relation<TAB>phrase`` rows). The lexicon here
derives from this world's relation connector phrases
(``vocab.RELATIONS[*].phrases``) — the same role the KBP keyword file
plays for the reference corpus. Marks are consumed by the
``span_words_trigger`` / ``dependency_path_trigger`` feature families
(``FeatureFactory.java:512-518, 972-983``), which — like the
reference's shipped config (``relationFeatures``,
``StanfordMIMLRE.properties:89``) — are available but not in the
active template set.

Matching mirrors the reference: case-insensitive token-sequence
match, trigger sequences applied in descending length so the longest
phrase wins a span, B-/I- marks, and a matched span is skipped past
(no overlapping rematch within one sequence). One deliberate
deviation: the reference's scan bound (``start < size - len``) drops
a match that ends exactly at the last token; we use the inclusive
bound — in this world connector phrases are never sentence-final, so
outputs agree.
"""

from __future__ import annotations

from functools import lru_cache


@lru_cache(maxsize=1)
def trigger_seqs() -> tuple:
    """``(label, tokens)`` trigger sequences, longest first (ties
    broken by label then phrase for cross-process determinism; the
    reference breaks ties by lexicon file order)."""
    from ..vocab import RELATIONS
    seqs, seen = [], set()
    for name in sorted(RELATIONS):
        for ph in RELATIONS[name].phrases:
            toks = tuple(t for t in
                         ph.replace(",", " ").lower().split() if t)
            if toks and (name, toks) not in seen:
                seen.add((name, toks))
                seqs.append((name, toks))
    seqs.sort(key=lambda s: (-len(s[1]), s[0], s[1]))
    return tuple(seqs)


def trigger_marks(tokens: list[str]) -> list:
    """BIO trigger marks for a token list: ``B-<relation>`` /
    ``I-<relation>`` / ``None`` per token."""
    low = [t.lower() for t in tokens]
    marks: list = [None] * len(tokens)
    for label, seq in trigger_seqs():
        length = len(seq)
        start = 0
        while start <= len(low) - length:
            if tuple(low[start:start + length]) == seq:
                marks[start] = "B-" + label
                for i in range(1, length):
                    marks[start + i] = "I-" + label
                start += length
            else:
                start += 1
    return marks
