"""Scoring harness: P/R/F1, PR curves, threshold sweep, AUC.

Mirrors the reference's evaluation infrastructure semantics
(``kbp/slotfilling/evaluate/KBPScore.java:29-80`` — AUC ``:45-59``,
optimal-F1 threshold ``:65-80``; threshold sweep 0.0→1.0 in
``KBPEvaluator.java:372-429``; gold join ``GoldResponseSet.java:236-310``
with equivalence-class-aware matching via the entity linker).

The sweep sorts fills by score descending (a tiny table by this stage —
the sort happens on the aggregated fills, never the corpus) and computes
cumulative P/R on the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..functions.text import same_entity


@dataclass
class Score:
    precision: float
    recall: float
    f1: float
    auc: float
    optimal_threshold: float
    optimal_f1: float


def _matches(triple, gold_set, linker_aware: bool) -> bool:
    if triple in gold_set:
        return True
    if not linker_aware:
        return False
    s, p, o = triple
    for gs, gp, go in gold_set:
        if p == gp and s == gs and same_entity(o, go, "PERSON"):
            return True
    return False


def score_fills(fill_rows: list[dict], gold_set: set,
                linker_aware: bool = False) -> Score:
    """fill_rows: dicts with subj/pred/obj/score. gold_set: triples."""
    seen = set()
    scored = []
    for r in sorted(fill_rows, key=lambda r: (-r["score"], r["subj"],
                                              r["pred"], r["obj"])):
        t = (r["subj"], r["pred"], r["obj"])
        if t in seen:
            continue
        seen.add(t)
        scored.append((r["score"], _matches(t, gold_set, linker_aware)))

    n_gold = max(1, len(gold_set))
    tp = 0
    auc = 0.0
    prev_r = 0.0
    best_f1, best_thr = 0.0, 0.0
    for i, (s, ok) in enumerate(scored, 1):
        tp += ok
        p, r = tp / i, tp / n_gold
        auc += p * (r - prev_r)
        prev_r = r
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        if f1 > best_f1:
            best_f1, best_thr = f1, s
    n = max(1, len(scored))
    p, r = tp / n, tp / n_gold
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return Score(p, r, f1, auc, best_thr, best_f1)
