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
from .mentions import pair_candidates_fused
from .nlp import NLPAnnotator


class FusedExtractor:
    def __init__(self, seed: int = 42, aliases_ref=None, model_ref=None):
        # the per-batch chain allocates millions of short-lived Python
        # objects; the default gen-0 threshold (700) makes cyclic GC a
        # measurable fraction of actor CPU at high concurrency. Raise
        # the thresholds — Ray's raylet already broadcasts periodic
        # gc.collect() requests to workers, bounding any cycle growth.
        import gc
        gc.set_threshold(100_000, 50, 50)
        self.nlp = NLPAnnotator(seed)
        self.linker = EntityLinker(aliases_ref, seed)
        self.scorer = CandidateScorer(model_ref)
        self.need_features = self.scorer.lr is not None

    def __call__(self, batch: pa.Table) -> pa.Table:
        cands = pair_candidates_fused(self.nlp, batch,
                                      with_ctx=self.need_features)
        cands = self.linker(cands)
        if self.need_features:
            cands = featurize_batch(cands)
        return self.scorer(cands)


def extract(documents, *, seed: int = 42, aliases_ref=None,
            model_ref=None, concurrency=None, batch_size: int = 4096,
            num_cpus: float = 1):
    """documents Dataset → partial fills Dataset (single actor pool)."""
    if concurrency is None:
        from ..runtime import pool_size
        # this pool is the only fixed reservation in the fused pipeline
        # (the linker downstream runs as stateless tasks) — take the
        # whole pool budget
        concurrency = pool_size(share=1.0, num_cpus=num_cpus)
    from ray.data import DataContext
    ctx = DataContext.get_current()
    # deeper per-actor task queues close dispatch gaps that left actors
    # ~70% utilized (measured: 2M-doc extract 49s → 42s at 32 CPUs)
    ctx.max_tasks_in_flight_per_actor = max(
        ctx.max_tasks_in_flight_per_actor or 0, 8)
    return documents.map_batches(
        FusedExtractor,
        fn_constructor_kwargs={"seed": seed, "aliases_ref": aliases_ref,
                               "model_ref": model_ref},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus)
