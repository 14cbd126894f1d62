"""Featurization: candidate rows → feature-string lists.

Ray-Data shape of the reference's FeatureFactory template application
(``kbp/slotfilling/process/FeatureFactory.java``) as a stateless
``map_batches``, covering the ACTIVE template set of
``/root/reference/StanfordMIMLRE.properties:89``::

    arg_words, arg_type, arg_order, full_tree_path,
    surface_distance_binary, surface_distance_bins, adjacent_words,
    entities_between_args, entity_counts_binary, entity_counts_bins,
    span_words_unigrams, dependency_path_lowlevel, dependency_path_words

Two halves, split by what context they need:

- ``context_features`` — templates needing the WHOLE sentence (tokens,
  POS, dep graph, all mentions): adjacent_words
  (``FeatureFactory.java:363-377``), entities_between_args
  (``:400-413``), entity_counts_binary/bins (``:415-446``), and the
  dependency templates (stages/deps.py). Computed at PAIRING time
  (stages/mentions.py) where the sentence is in hand, carried on the
  candidate row as ``ctx_features`` — the Ray-Data analog of the
  reference featurizing straight off the RelationMention's sentence.
- ``featurize_batch`` — templates derivable from the candidate row
  alone (types, order, distances, span words), concatenated with
  ``ctx_features``.

Feature strings keep the reference's whitespace→``_`` post-processing
(``FeatureFactory.java:133-137``) so a real template library drops into
the same column contract (``features: list<string>``).
"""

from __future__ import annotations

import pyarrow as pa

from ..schemas import FEATURIZED_SCHEMA
from .deps import dep_features


def context_features(tokens: list[str], pos, edges,
                     mentions, em_span: tuple, sm_span: tuple) -> list[str]:
    """Sentence-context templates for one (entity, slot) candidate.

    ``mentions`` iterates (begin, end, ner) triples of ALL typed
    mentions in the sentence (entity + slot mentions, the reference's
    EntityMentionsAnnotation ∪ SlotMentionsAnnotation).
    """
    n = len(tokens)
    feats: list[str] = []
    # adjacent_words: words immediately left/right of each arg extent
    for argn, (b, e) in enumerate((em_span, sm_span)):
        if b > 0:
            feats.append(f"leftarg{argn}-{tokens[b - 1]}")
        if e < n:
            feats.append(f"rightarg{argn}-{tokens[e]}")
    # entities_between_args: NER type of every other mention whose head
    # lies strictly between the two arg heads
    h0, h1 = em_span[1] - 1, sm_span[1] - 1
    lo, hi = (h0, h1) if h0 < h1 else (h1, h0)
    counts: dict[str, int] = {}
    for mb, me, ner in mentions:
        counts[ner] = counts.get(ner, 0) + 1
        mh = me - 1
        if lo < mh < hi:
            feats.append(f"entity_between_args:_{ner}")
    # entity_counts_binary / entity_counts_bins per type present
    for ner in sorted(counts):
        c = counts[ner]
        feats.append(f"entity_counts_{ner}:_{c}")
        if c < 4:
            feats.append(f"entity_counts_bin{c}")
        elif c < 6:
            feats.append("entity_counts_bin_lt6")
        elif c < 10:
            feats.append("entity_counts_bin_lt10")
        else:
            feats.append("entity_counts_bin_ge10")
    # dependency templates (+ full_tree_path stand-in)
    if edges:
        feats.extend(dep_features(tokens, pos, edges, em_span, sm_span))
    return feats


def featurize_batch(batch: pa.Table) -> pa.Table:
    subj_t = batch.column("subj_type").to_pylist()
    obj = batch.column("obj").to_pylist()
    obj_t = batch.column("obj_type").to_pylist()
    between = batch.column("between").to_pylist()
    sb = batch.column("subj_begin").to_pylist()
    se = batch.column("subj_end").to_pylist()
    ob = batch.column("obj_begin").to_pylist()
    oe = batch.column("obj_end").to_pylist()
    ctx = batch.column("ctx_features").to_pylist() \
        if "ctx_features" in batch.column_names else [[]] * len(obj)

    feats: list[list[str]] = []
    for st, o, ot, bw, s0, s1, o0, o1, cx in zip(
            subj_t, obj, obj_t, between, sb, se, ob, oe, ctx):
        order = "SO" if s0 <= o0 else "OS"
        bw_toks = bw.split(" ") if bw else []
        # syntactic heads = last span token (head-final chunks)
        dist = abs((s1 - 1) - (o1 - 1))
        f = [
            # legacy conjunctions kept for the pattern component
            f"types:{st}:{ot}",
            f"order:{order}",
            f"dist:{min(len(bw_toks), 10)}",
            f"between:{bw}",
            f"types_between:{st}:{bw}:{ot}",
            # arg_type (FeatureFactory.java:169-171)
            f"arg1type={st}_and_arg2type={ot}",
            # surface_distance_binary / _bins (:259-276)
            f"surface_distance_{dist}",
        ]
        if dist < 4:
            f.append(f"surface_distance_bin{dist}")
        elif dist < 6:
            f.append("surface_distance_bin_lt6")
        elif dist < 10:
            f.append("surface_distance_bin_lt10")
        else:
            f.append("surface_distance_bin_ge10")
        # arg_order (:180-183)
        if s1 - 1 < o1 - 1:
            f.append("arg1BeforeArg2")
        # arg_words with doNotLexicalizeFirstArg=true — the KBP config
        # (:349-355; set at KBPProcess): only arg2's head word
        f.append(f"word_arg1:_{o.rsplit(' ', 1)[-1]}")
        # span_words_unigrams (:489-493)
        f.extend(f"span_word:{t}" for t in bw_toks)
        f.extend(cx)
        feats.append(f)

    cols = [batch.column(n) for n in FEATURIZED_SCHEMA.names
            if n in batch.column_names and n != "features"]
    names = [n for n in FEATURIZED_SCHEMA.names
             if n in batch.column_names and n != "features"]
    t = pa.Table.from_arrays(cols, names=names)
    return t.append_column("features",
                           pa.array(feats, pa.list_(pa.string())))


def featurize(candidates, *, batch_size: int = 4096):
    return candidates.map_batches(featurize_batch, batch_format="pyarrow",
                                  batch_size=batch_size)
