"""NLP annotation stage: documents → sentences with typed mentions.

The Ray-Data shape of the reference's CoreNLP + PostIR step
(``SimpleSlotFiller.java:360-429``, ``PostIRAnnotator.java:291-322``): a
**stateful actor pool** via ``map_batches(NLPAnnotator, concurrency=N,
batch_format="pyarrow")``. All expensive setup — the NER lexicon compiled
into one longest-match-first alternation regex, the date/number/url
patterns — happens once per actor in ``__init__``; ``__call__`` is a
per-batch pass whose inner work is C-level regex scanning.

The annotator is a deterministic stand-in with the same record contract
as a real model (SURVEY.md §7.0): swap the class, keep the pipeline.

Mention detection = longest-match lexicon NER (priority URL > DATE >
lexicon > NUMBER > pronoun, no overlaps) and pronoun antecedent
resolution = most recent preceding PERSON (He/She) or ORGANIZATION (It)
mention in the document — the high-precision slice of the reference's
``PostIRAnnotator`` antecedent computation.

Media spans (kind != "text") are not consumed here; the pipeline carries
the original ``documents`` dataset through untouched for the span-sequence
invariant (see pipelines/kg.py).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..schemas import MENTION_STRUCT, SENTENCES_SCHEMA
from ..world import get_world

PRONOUNS = {"He": "PERSON", "She": "PERSON", "It": "ORGANIZATION"}


class NLPAnnotator:
    """Actor-pool batch transform: documents table → sentences table."""

    def __init__(self, seed: int = 42):
        world = get_world(seed)
        self.lexicon = world.ner_lexicon()
        # longest-first alternation → leftmost-longest lexicon match
        surfaces = sorted(self.lexicon, key=len, reverse=True)
        self.lex_re = re.compile(
            r"\b(?:" + "|".join(re.escape(s) for s in surfaces) + r")\b")
        self.date_re = re.compile(
            r"\b(?:January|February|March|April|May|June|July|August|"
            r"September|October|November|December) \d{1,2} , \d{4}\b")
        self.url_re = re.compile(r"\bwww\.[a-z0-9.\-]+\.[a-z]{2,}\b")
        self.num_re = re.compile(r"\b\d+\b")
        self.pron_re = re.compile(r"\b(?:He|She|It)\b")

    def _mentions(self, sent: str, last_seen: dict[str, str]) -> list[dict]:
        taken: list[tuple[int, int]] = []
        found: list[tuple[int, int, str, str, str]] = []

        def add(rx, tag_of, antecedent_of=None):
            for m in rx.finditer(sent):
                a, b = m.span()
                if any(a < t1 and b > t0 for t0, t1 in taken):
                    continue
                surface = m.group(0)
                tag = tag_of(surface)
                if tag is None:
                    continue
                ante = antecedent_of(surface) if antecedent_of else ""
                if antecedent_of and not ante:
                    continue            # unresolvable pronoun → drop
                taken.append((a, b))
                found.append((a, b, surface, tag, ante))

        add(self.url_re, lambda s: "URL")
        add(self.date_re, lambda s: "DATE")
        add(self.lex_re, self.lexicon.get)
        add(self.num_re, lambda s: "NUMBER")
        add(self.pron_re, PRONOUNS.get,
            lambda s: last_seen.get(PRONOUNS[s], ""))

        found.sort()
        out = []
        for a, b, surface, tag, ante in found:
            # char span → token span (tokens are single-space separated)
            tok_begin = sent.count(" ", 0, a)
            tok_end = tok_begin + surface.count(" ") + 1
            out.append({"surface": surface, "ner": tag,
                        "begin": tok_begin, "end": tok_end,
                        "antecedent": ante})
            if tag in ("PERSON", "ORGANIZATION") and not ante:
                last_seen[tag] = surface
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        span_lists = batch.column("spans").to_pylist()
        out_doc, out_idx, out_text, out_ntok, out_mentions = \
            [], [], [], [], []
        for doc_id, spans in zip(doc_ids, span_lists):
            last_seen: dict[str, str] = {}
            sent_idx = 0
            for span in spans:
                if span["kind"] != "text":
                    continue
                text = span["text"]
                out_doc.append(doc_id)
                out_idx.append(sent_idx)
                out_text.append(text)
                out_ntok.append(text.count(" ") + 1 if text else 0)
                out_mentions.append(self._mentions(text, last_seen))
                sent_idx += 1
        return pa.Table.from_arrays(
            [pa.array(out_doc, pa.string()),
             pa.array(out_idx, pa.int32()),
             pa.array(out_text, pa.string()),
             pa.array(out_ntok, pa.int32()),
             pa.array(out_mentions, pa.list_(MENTION_STRUCT))],
            schema=SENTENCES_SCHEMA)


def annotate(documents, *, seed: int = 42, concurrency=None,
             batch_size: int = 512, num_cpus: float = 1):
    """documents Dataset → sentences Dataset (actor pool)."""
    if concurrency is None:
        from ..runtime import pool_size
        concurrency = pool_size()
    return documents.map_batches(
        NLPAnnotator, fn_constructor_kwargs={"seed": seed},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus)
