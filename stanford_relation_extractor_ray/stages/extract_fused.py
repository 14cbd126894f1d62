"""Fused per-document extraction stage.

The modular stage chain (nlp → pair → link → featurize → score) is four
map stages, two of them actor pools. Three concurrent actor pools on
one node either starve each other (fixed pools reserve idle CPUs) or
spend the job's wall-clock scaling up (autoscaling pools ramp from 1) —
both measured on the bench corpus. Since every one of these stages is a
pure per-row transform with no shuffle between them, the scalable shape
is ONE actor pool whose ``__call__`` runs the whole chain per batch:
documents in, per-batch partial fills out. Intermediate tables never
leave the actor, the object store carries only documents and (tiny)
partial fills, and a single pool can own most of the node.

The fused actor composes the SAME component classes the modular stages
use (NLPAnnotator, EntityLinker, CandidateScorer, featurize_batch,
pair_mentions) — behavior is identical by construction and the
equivalence is pinned by tests/test_pipeline_e2e.py.
"""

from __future__ import annotations

import pyarrow as pa

from .classify import CandidateScorer
from .featurize import featurize_batch
from .link import EntityLinker
from .mentions import pair_mentions
from .nlp import NLPAnnotator


class FusedExtractor:
    def __init__(self, seed: int = 42, aliases_ref=None, model_ref=None):
        self.nlp = NLPAnnotator(seed)
        self.linker = EntityLinker(aliases_ref, seed)
        self.scorer = CandidateScorer(model_ref)
        self.need_features = self.scorer.lr is not None

    def __call__(self, batch: pa.Table) -> pa.Table:
        sents = self.nlp(batch)
        cands = pair_mentions(sents)
        cands = self.linker(cands)
        if self.need_features:
            cands = featurize_batch(cands)
        return self.scorer(cands)


def extract(documents, *, seed: int = 42, aliases_ref=None,
            model_ref=None, concurrency=None, batch_size: int = 512,
            num_cpus: float = 1):
    """documents Dataset → partial fills Dataset (single actor pool)."""
    if concurrency is None:
        from ..runtime import pool_size
        # one pool owns most of the pool budget; the object-linker pool
        # downstream (finalize_fills) takes the rest
        concurrency = pool_size(share=0.9, num_cpus=num_cpus)
    return documents.map_batches(
        FusedExtractor,
        fn_constructor_kwargs={"seed": seed, "aliases_ref": aliases_ref,
                               "model_ref": model_ref},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus)
