"""End-to-end knowledge-graph construction pipeline.

The Ray-Data re-expression of the reference's slot-filling lifecycle
(SURVEY.md §3.1): documents → NLP annotate (actor pool) → mention pairing
(stateless flat-map) → subject entity-linking (actor pool, broadcast
aliases) → featurize → salted-key bag groupby (shuffle #1) → ensemble
classification (actor pool) → per-triple combine → object linking →
per-entity greedy consistency (groupby.map_groups) → canonicalization
(blocking groupby + driver union-find, shuffle #2) → node/edge tables.

Two entry styles:
- ``extract_fills(docs)`` — the streaming lazy pipeline for one shard.
- ``run_kg(...)`` — the resumable job: shards the doc-id range, runs and
  checkpoints each shard's fills to Parquet with a per-partition lineage
  manifest (state/manifest.py), then runs the global stages over the
  union of shard outputs. Rerunning after a kill skips completed shards.

The per-row span-sequence invariant: the pipeline never mutates the
``documents`` dataset — media spans and span order flow to any document
re-emission unchanged (``passthrough_documents`` is the identity stage
tests verify against).
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..corpus import documents_dataset
from ..state.manifest import Manifest, digest
from ..stages import bags, classify, consistency, featurize, link, \
    mentions, nlp
from ..stages.canonicalize import canonical_map, materialize_graph


def passthrough_documents(documents):
    """Identity re-emission of documents (span invariant surface)."""
    return documents.map_batches(lambda b: b, batch_format="pyarrow")


def extract_fills(documents, *, seed: int = 42, aliases_ref=None,
                  model_ref=None, n_salt: int = 4, nlp_concurrency=None,
                  scorer_concurrency=None, use_bags: bool = False):
    """documents Dataset → raw (partial) fills Dataset (lazy, streaming).

    Default is the fast path: per-candidate scoring with in-batch
    partial noisy-or aggregation (classify.CandidateScorer) — provably
    equivalent to explicit bag assembly because noisy-or distributes
    over bag partitions, and one full shuffle cheaper. ``use_bags=True``
    runs the literal reference dataflow (salted bag groupby →
    bag scorer) instead; both feed the same ``combine_fills`` merge.
    """
    if use_bags:
        sentences = nlp.annotate(documents, seed=seed,
                                 concurrency=nlp_concurrency)
        cands = mentions.pair(sentences)
        cands = link.link(cands, aliases_ref=aliases_ref, seed=seed)
        feats = featurize.featurize(cands)
        bagged = bags.assemble(feats, n_salt=n_salt)
        return classify.classify(bagged, model_ref=model_ref,
                                 concurrency=scorer_concurrency)
    from ..stages.extract_fused import extract
    return extract(documents, seed=seed, aliases_ref=aliases_ref,
                   model_ref=model_ref, concurrency=nlp_concurrency)


def finalize_fills(fills, *, seed: int = 42, aliases_ref=None,
                   fused: bool = True, objective: str = "TOP",
                   mixing_time: int = 10):
    """raw fills → consistent, object-linked fills (global stages).

    Default is the single-shuffle fused path
    (``consistency.combine_enforce``); ``fused=False`` runs the
    three-stage chain (combine → link → enforce) it is equivalent to.
    ``objective`` selects the consistency engine (TOP greedy / SUM
    Gibbs restarts).
    """
    if fused:
        return consistency.combine_enforce(
            fills, aliases_ref=aliases_ref, seed=seed,
            objective=objective, mixing_time=mixing_time)
    fills = classify.combine_fills(fills)
    fills = link.link(fills, aliases_ref=aliases_ref, seed=seed)
    return consistency.enforce(fills, objective=objective,
                               mixing_time=mixing_time, seed=seed)


def extract_alternate_names(documents, *, seed: int = 42,
                            aliases_ref=None, min_sentences: int = 2):
    """documents → per:/org:alternate_names fills from alias surfaces
    observed in ≥ min_sentences distinct sentences (the
    AlternateNamesExtractor path — stages/altnames.py)."""
    from ..stages.altnames import alternate_name_fills
    sentences = nlp.annotate(documents, seed=seed)
    cands = mentions.pair(sentences)
    cands = cands.map_batches(
        lambda b: _linked_keep_raw(b, aliases_ref, seed),
        batch_format="pyarrow")
    return alternate_name_fills(cands, min_sentences=min_sentences)


def _linked_keep_raw(batch, aliases_ref, seed):
    from ..stages.link import EntityLinker, _WORKER_LINKERS
    key = ("keepraw",
           aliases_ref.hex() if hasattr(aliases_ref, "hex") else None,
           seed)
    linker = _WORKER_LINKERS.get(key)
    if linker is None:
        linker = EntityLinker(aliases_ref, seed, keep_raw=True)
        _WORKER_LINKERS[key] = linker
    return linker(batch)


def _model_fingerprint(model_ref) -> str:
    """Stable fingerprint of the scorer model for checkpoint lineage:
    a shard checkpointed under one model must not be reused for a rerun
    with different weights (the shard digest folds this in)."""
    if model_ref is None:
        return "pattern-only"
    import hashlib

    import ray
    d = ray.get(model_ref) if hasattr(model_ref, "hex") else model_ref
    if d is None:
        return "pattern-only"
    h = hashlib.sha256()
    for key in sorted(d):
        h.update(key.encode())
        import numpy as np
        h.update(np.ascontiguousarray(d[key]).tobytes())
    return h.hexdigest()[:16]


def build_graph(consistent_fills):
    """→ (nodes Dataset-backed Table, edges Dataset)."""
    cmap, _w = canonical_map(consistent_fills)
    return materialize_graph(consistent_fills, cmap)


def run_kg(n_docs: int, *, seed: int = 42, model_ref=None,
           checkpoint_dir: str | None = None, n_shards: int = 8,
           n_salt: int = 4, out_dir: str | None = None):
    """The full resumable job. Returns dict with fills/nodes/edges.

    With ``checkpoint_dir``, each doc-id shard's fills are materialized
    to ``<dir>/fills/part=<k>/`` guarded by a lineage manifest; a rerun
    recomputes only missing or stale shards.
    """
    import ray
    import ray.data as rd

    aliases_ref = link.build_alias_ref(seed)

    if checkpoint_dir is None:
        docs = documents_dataset(n_docs, seed)
        fills = extract_fills(docs, seed=seed, aliases_ref=aliases_ref,
                              model_ref=model_ref, n_salt=n_salt)
    else:
        man = Manifest(checkpoint_dir, "fills")
        per = (n_docs + n_shards - 1) // n_shards
        model_fp = _model_fingerprint(model_ref)
        for k in range(n_shards):
            lo, hi = k * per, min((k + 1) * per, n_docs)
            if lo >= hi:
                continue
            d = digest("fills", seed, lo, hi, n_salt, model_fp)
            part = f"{k:04d}"
            if man.is_done(part, d):
                continue
            tmp = man.begin(part)
            docs = rd.range(hi - lo).map_batches(
                lambda b, lo=lo: {"id": b["id"] + lo},
                batch_format="numpy")
            from ..corpus import _docs_batch
            docs = docs.map_batches(
                lambda b: _docs_batch(b, seed), batch_format="numpy",
                batch_size=2048)
            shard_fills = extract_fills(
                docs, seed=seed, aliases_ref=aliases_ref,
                model_ref=model_ref, n_salt=n_salt)
            shard_fills.write_parquet(tmp)
            import pyarrow.dataset as pads
            rows = pads.dataset(tmp).count_rows()
            man.commit(part, d, rows)
        fills = rd.read_parquet(man.completed_files())

    consistent = finalize_fills(fills, seed=seed, aliases_ref=aliases_ref)
    # consistency/canonicalization consume the fills twice → materialize
    # the (small) consistent-fills table once, not the whole corpus.
    consistent = consistent.materialize()
    nodes, edges = build_graph(consistent)
    if out_dir is not None:
        import ray.data as rd

        from ..storage import write_table
        os.makedirs(out_dir, exist_ok=True)
        write_table(edges, os.path.join(out_dir, "edges"))
        write_table(rd.from_arrow(nodes), os.path.join(out_dir, "nodes"))
    return {"fills": consistent, "nodes": nodes, "edges": edges}
