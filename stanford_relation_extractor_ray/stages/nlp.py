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


_MONTHS = frozenset([
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December"])


class NLPAnnotator:
    """Actor-pool batch transform: documents table → sentences table.

    Mention detection is a single greedy left-to-right token scan with a
    token-trie of lexicon surfaces (longest match wins) plus token-level
    date/number/url/pronoun recognizers — O(tokens) dict lookups per
    sentence, no regex alternation scan (a 150-way ``re`` alternation
    measured ~40× slower on the bench corpus).
    """

    def __init__(self, seed: int = 42,
                 max_sentence_tokens: int | None = None):
        # max-sentence-length gate (reference: index.maxsentencelength
        # = 50 train/parse, 150 provenance, StanfordMIMLRE.properties
        # :24,73; TextOps.java:426,452) — None disables the gate
        self.max_sentence_tokens = max_sentence_tokens
        world = get_world(seed)
        self.lexicon = world.ner_lexicon()
        # token trie: first token → {token tuple → tag}, longest first
        self.trie: dict[str, list[tuple[tuple, str, str]]] = {}
        for surface, tag in self.lexicon.items():
            toks = tuple(surface.split(" "))
            self.trie.setdefault(toks[0], []).append(
                (toks, tag, surface))
        for cands in self.trie.values():
            cands.sort(key=lambda c: -len(c[0]))

    def _mentions(self, tokens: list[str],
                  last_seen: dict[str, str]) -> list[tuple]:
        """→ list of (surface, ner, begin, end, antecedent) tuples.

        Tuples, not dicts: the fused extraction path consumes these
        directly in the pairing loop and dict construction/lookup was
        a measured ~15% of actor CPU."""
        out = []
        n = len(tokens)
        i = 0
        while i < n:
            tok = tokens[i]
            # lexicon trie (longest match first)
            cands = self.trie.get(tok)
            matched = False
            if cands is not None:
                for toks, tag, surface in cands:
                    ln = len(toks)
                    if i + ln <= n and tuple(tokens[i:i + ln]) == toks:
                        out.append((surface, tag, i, i + ln, ""))
                        if tag in ("PERSON", "ORGANIZATION"):
                            last_seen[tag] = surface
                        i += ln
                        matched = True
                        break
            if matched:
                continue
            if tok in _MONTHS and i + 3 < n and tokens[i + 1].isdigit() \
                    and tokens[i + 2] == "," and tokens[i + 3].isdigit():
                out.append((" ".join(tokens[i:i + 4]), "DATE",
                            i, i + 4, ""))
                i += 4
                continue
            if tok.startswith("www.") and "." in tok[4:]:
                out.append((tok, "URL", i, i + 1, ""))
                i += 1
                continue
            if tok.isdigit():
                out.append((tok, "NUMBER", i, i + 1, ""))
                i += 1
                continue
            tag = PRONOUNS.get(tok)
            if tag is not None:
                ante = last_seen.get(tag, "")
                if ante:
                    out.append((tok, tag, i, i + 1, ante))
                i += 1
                continue
            i += 1
        return out

    def iter_sentences(self, batch: pa.Table):
        """Yield (doc_id, sent_idx, tokens, mention_tuples) per text
        span — the fused path's dict-free surface."""
        doc_ids = batch.column("doc_id").to_pylist()
        span_lists = batch.column("spans").to_pylist()
        for doc_id, spans in zip(doc_ids, span_lists):
            last_seen: dict[str, str] = {}
            sent_idx = 0
            cap = self.max_sentence_tokens
            for span in spans:
                if span["kind"] != "text":
                    continue
                text = span["text"]
                tokens = text.split(" ") if text else []
                if cap is not None and len(tokens) > cap:
                    sent_idx += 1    # gate long sentences, keep indices
                    continue
                yield doc_id, sent_idx, tokens, \
                    self._mentions(tokens, last_seen)
                sent_idx += 1

    def analyze(self, tokens: list[str]):
        """→ (pos, dep_edges) via the deterministic tagger/parser
        stand-in (stages/deps.py; reference: CoreNLP pos + parse
        annotators, ``StanfordMIMLRE.properties:6``)."""
        from .deps import parse, pos_tag
        pos = pos_tag(tokens)
        return pos, parse(tokens, pos)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_doc, out_idx, out_text, out_ntok, out_mentions = \
            [], [], [], [], []
        out_pos, out_deps = [], []
        for doc_id, sent_idx, tokens, ments in self.iter_sentences(batch):
            out_doc.append(doc_id)
            out_idx.append(sent_idx)
            out_text.append(" ".join(tokens))
            out_ntok.append(len(tokens))
            out_mentions.append(
                [{"surface": s, "ner": t, "begin": b, "end": e,
                  "antecedent": a} for s, t, b, e, a in ments])
            pos, edges = self.analyze(tokens)
            out_pos.append(pos)
            out_deps.append([{"head": h, "dep": d, "label": l}
                             for h, d, l in edges])
        from ..schemas import DEP_EDGE_STRUCT
        return pa.Table.from_arrays(
            [pa.array(out_doc, pa.string()),
             pa.array(out_idx, pa.int32()),
             pa.array(out_text, pa.string()),
             pa.array(out_ntok, pa.int32()),
             pa.array(out_mentions, pa.list_(MENTION_STRUCT)),
             pa.array(out_pos, pa.list_(pa.string())),
             pa.array(out_deps, pa.list_(DEP_EDGE_STRUCT))],
            schema=SENTENCES_SCHEMA)


def annotate(documents, *, seed: int = 42, concurrency=None,
             batch_size: int = 512, num_cpus: float = 1,
             max_sentence_tokens: int | None = None):
    """documents Dataset → sentences Dataset (actor pool)."""
    if concurrency is None:
        from ..runtime import pool_size
        concurrency = pool_size()
    return documents.map_batches(
        NLPAnnotator,
        fn_constructor_kwargs={"seed": seed,
                               "max_sentence_tokens":
                                   max_sentence_tokens},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus)
