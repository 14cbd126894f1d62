"""Fixed Arrow schemas for every stage boundary (SURVEY.md §7.0: schemas
first; every stage validates against these).

Stage dataflow:

    documents ─ nlp.annotate ─→ sentences ─ mentions.pair ─→ candidates
      ─ link.EntityLinker ─→ linked candidates ─ featurize ─→ featurized
      ─ bags.assemble (groupby, salted) ─→ bags ─ classify.EnsembleScorer
      ─→ fills ─ consistency (per-entity map_groups) ─→ consistent fills
      ─ canonicalize ─→ nodes / edges
"""

from __future__ import annotations

import pyarrow as pa

from .corpus import DOCUMENTS_SCHEMA, SPAN_STRUCT  # noqa: F401  (re-export)

MENTION_STRUCT = pa.struct([
    pa.field("surface", pa.string()),      # observed surface form
    pa.field("ner", pa.string()),          # NER tag (vocab.NER_TAGS)
    pa.field("begin", pa.int32()),         # token index, inclusive
    pa.field("end", pa.int32()),           # token index, exclusive
    pa.field("antecedent", pa.string()),   # resolved surface for pronouns
])

DEP_EDGE_STRUCT = pa.struct([
    pa.field("head", pa.int32()),          # governor token index
    pa.field("dep", pa.int32()),           # dependent token index
    pa.field("label", pa.string()),        # collapsed-style relation
])

SENTENCES_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("sent_idx", pa.int32()),              # index among TEXT spans
    ("text", pa.string()),
    ("n_tokens", pa.int32()),
    ("mentions", pa.list_(MENTION_STRUCT)),
    ("pos", pa.list_(pa.string())),        # rule POS tags per token
    ("dep_edges", pa.list_(DEP_EDGE_STRUCT)),
])

CANDIDATES_SCHEMA = pa.schema([
    ("subj", pa.string()),                 # entity mention surface (resolved)
    ("subj_type", pa.string()),
    ("obj", pa.string()),                  # slot value surface
    ("obj_type", pa.string()),
    ("doc_id", pa.string()),
    ("sent_idx", pa.int32()),
    ("subj_begin", pa.int32()), ("subj_end", pa.int32()),
    ("obj_begin", pa.int32()), ("obj_end", pa.int32()),
    ("between", pa.string()),              # tokens between the two spans
    # sentence-context features computed at pairing time, where the
    # whole sentence (tokens, POS, dep graph, all mentions) is in hand:
    # adjacent words, entities-between, entity counts, dep-path features
    ("ctx_features", pa.list_(pa.string())),
])

FEATURIZED_SCHEMA = pa.schema(
    list(zip(CANDIDATES_SCHEMA.names,
             CANDIDATES_SCHEMA.types)) + [
        ("features", pa.list_(pa.string())),
    ])

BAGS_SCHEMA = pa.schema([
    ("subj", pa.string()), ("subj_type", pa.string()),
    ("obj", pa.string()), ("obj_type", pa.string()),
    ("n_sentences", pa.int32()),
    # one feature-list per supporting sentence (MIML bag; reference
    # SentenceGroup, kbp/common/SentenceGroup.java:20-335)
    ("sent_features", pa.list_(pa.list_(pa.string()))),
    # provenance per sentence, aligned with sent_features
    ("prov_doc_id", pa.list_(pa.string())),
    ("prov_sent_idx", pa.list_(pa.int32())),
    ("prov_subj_begin", pa.list_(pa.int32())),
    ("prov_subj_end", pa.list_(pa.int32())),
    ("prov_obj_begin", pa.list_(pa.int32())),
    ("prov_obj_end", pa.list_(pa.int32())),
])

FILLS_SCHEMA = pa.schema([
    ("subj", pa.string()), ("subj_type", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()), ("obj_type", pa.string()),
    ("score", pa.float64()),
    ("doc_id", pa.string()),               # best-provenance sentence
    ("sent_idx", pa.int32()),
    ("subj_span", pa.list_(pa.int32())),
    ("obj_span", pa.list_(pa.int32())),
])

NODES_SCHEMA = pa.schema([
    ("entity_id", pa.string()),
    ("name", pa.string()),
    ("type", pa.string()),
    ("aliases", pa.list_(pa.string())),
])

EDGES_SCHEMA = pa.schema([
    ("subj_id", pa.string()),
    ("subj", pa.string()), ("subj_type", pa.string()),
    ("pred", pa.string()),
    ("obj_id", pa.string()),
    ("obj", pa.string()), ("obj_type", pa.string()),
    ("score", pa.float64()),
    ("doc_id", pa.string()), ("sent_idx", pa.int32()),
])


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
