"""Graph inference over the fills/edges table (SURVEY.md §2.10, §2.8).

Ray-Data shape of the reference's transitive & symmetric relation
rewrites (``kbp/slotfilling/evaluate/GraphConsistencyPostProcessors.java:
317-353`` transitive closure, ``:355-414`` symmetric rewrite) and the
antecedent-matching Horn rules of ``evaluate/inference/
SimpleGraphInferenceEngine.java`` restricted to length-2 paths:

- ``symmetric_inverse_rewrite`` — per-row flat-map emitting the
  mirrored/inverted edge for symmetric relations (spouse, siblings,
  org membership) and inverse pairs (children↔parents,
  subsidiaries↔parents), then an exact per-triple max-score combine.
  No shuffle beyond the (small) triple combine.
- ``transitive_infer`` — bounded-depth (length-2) rule application
  ``A -p→ B, B -q→ C ⇒ A -head→ C`` as a hash-partitioned self-join:
  left rows keyed by obj, right rows keyed by subj, one
  ``groupby(join_pid)`` co-locates both sides, the joined edges get
  score = s₁·s₂·damping. The join key is the bridge entity, so hot
  bridges are bounded by the per-partition group; at corpus scale the
  edges table is already aggregated (one row per triple), orders of
  magnitude smaller than the corpus.
"""

from __future__ import annotations

import pyarrow as pa

from ..schemas import FILLS_SCHEMA

SYMMETRIC = frozenset({"per:spouse", "per:siblings"})
INVERSES = {
    "per:children": "per:parents",
    "per:parents": "per:children",
    "org:subsidiaries": "org:parents",
    "org:parents": "org:subsidiaries",
    "org:members": "org:member_of",
    "org:member_of": "org:members",
}
REWRITE_DAMPING = 0.9

# (p, q, head): A -p→ B and B -q→ C infer A -head→ C
DEFAULT_RULES = (
    ("org:parents", "org:parents", "org:parents"),
    ("per:member_of", "org:member_of", "per:member_of"),
)
RULE_DAMPING = 0.8


def _mirror_rows(batch: pa.Table) -> pa.Table:
    names = FILLS_SCHEMA.names
    cols = {n: batch.column(n).to_pylist() for n in names}
    out = {n: list(cols[n]) for n in names}
    n_rows = batch.num_rows
    for i in range(n_rows):
        pred = cols["pred"][i]
        new_pred = pred if pred in SYMMETRIC else INVERSES.get(pred)
        if new_pred is None:
            continue
        # mirrored edge only meaningful between two linked entities
        if cols["obj_type"][i] not in ("PERSON", "ORGANIZATION"):
            continue
        out["subj"].append(cols["obj"][i])
        out["subj_type"].append(cols["obj_type"][i])
        out["pred"].append(new_pred)
        out["obj"].append(cols["subj"][i])
        out["obj_type"].append(cols["subj_type"][i])
        out["score"].append(cols["score"][i] * REWRITE_DAMPING)
        out["doc_id"].append(cols["doc_id"][i])
        out["sent_idx"].append(cols["sent_idx"][i])
        out["subj_span"].append(cols["obj_span"][i])
        out["obj_span"].append(cols["subj_span"][i])
    return pa.Table.from_arrays(
        [pa.array(out[n], t) for n, t in
         zip(FILLS_SCHEMA.names, FILLS_SCHEMA.types)],
        schema=FILLS_SCHEMA)


def _max_combine(fills):
    """Exact per-triple combine keeping the highest-score row (the
    original edge wins over a damped rewrite of itself). Coarse hash
    partitions, same pattern as classify.combine_fills."""
    import numpy as np
    import pandas as pd

    from ..runtime import cluster_cpus
    from .classify import TRIPLE_KEY
    n_parts = max(16, cluster_cpus() * 4)

    def add_pid(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            df["pid"] = np.array([], dtype=np.int32)
            return df
        key = df["subj"].str.cat([df[c] for c in TRIPLE_KEY[1:]],
                                 sep="|")
        df["pid"] = (pd.util.hash_pandas_object(key, index=False)
                     .to_numpy() % n_parts).astype(np.int32)
        return df

    def best(df: pd.DataFrame) -> pd.DataFrame:
        # rounded score key: max-per-triple selection must not flip on
        # batch-layout ulps of upstream float products (consistency.
        # _sort_key has the full rationale)
        df = df.assign(_sk=df["score"].round(9))
        df = df.sort_values(TRIPLE_KEY + ["_sk", "doc_id", "sent_idx"],
                            ascending=[True] * len(TRIPLE_KEY)
                            + [False, True, True], kind="mergesort")
        return df.drop_duplicates(TRIPLE_KEY, keep="first")[
            list(FILLS_SCHEMA.names)]

    return (fills.map_batches(add_pid, batch_format="pandas")
            .groupby("pid")
            .map_groups(best, batch_format="pandas")
            .select_columns(FILLS_SCHEMA.names))


def symmetric_inverse_rewrite(fills):
    """fills → fills ∪ mirrored/inverted edges (max-score per triple)."""
    return _max_combine(
        fills.map_batches(_mirror_rows, batch_format="pyarrow"))


def intersect_fills(fills_a, fills_b):
    """Triples present in BOTH fills datasets — the reference's
    ``IntersectSlotFiller`` (``kbp/slotfilling/evaluate/
    IntersectSlotFiller.java``; RD note §2.8: inner join on the triple
    key). Shape: tag each side, union, coarse-pid groupby, keep
    triples seen on both sides; score = min of the two (the
    conservative combination), provenance from side A."""
    import numpy as np
    import pandas as pd

    from ..runtime import cluster_cpus
    from .classify import TRIPLE_KEY
    n_parts = max(16, cluster_cpus() * 4)

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["side"] = side
            if len(df):
                key = df["subj"].str.cat(
                    [df[c] for c in TRIPLE_KEY[1:]], sep="|")
                df["pid"] = (pd.util.hash_pandas_object(key, index=False)
                             .to_numpy() % n_parts).astype(np.int32)
            else:
                df["pid"] = np.array([], dtype=np.int32)
            return df
        return fn

    both = fills_a.map_batches(tag("A"), batch_format="pandas").union(
        fills_b.map_batches(tag("B"), batch_format="pandas"))

    def keep_both(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=list(FILLS_SCHEMA.names))
        sides = df.groupby(TRIPLE_KEY, sort=False)["side"].nunique()
        min_s = df.groupby(TRIPLE_KEY, sort=False)["score"].min()
        a = df[df["side"] == "A"].drop_duplicates(TRIPLE_KEY) \
            .set_index(TRIPLE_KEY)
        a = a[sides.reindex(a.index).to_numpy() >= 2]
        if len(a) == 0:
            return pd.DataFrame(columns=list(FILLS_SCHEMA.names))
        a["score"] = min_s.reindex(a.index)
        return a.reset_index()[list(FILLS_SCHEMA.names)]

    return (both.groupby("pid")
            .map_groups(keep_both, batch_format="pandas")
            .select_columns(FILLS_SCHEMA.names))


def prune_by_distance(fills, query_entities, max_dist: int = 4):
    """Keep edges whose subject lies within graph distance ≤ max_dist
    of a query entity — the reference's EntityGraph pruning
    (``InferentialSlotFiller.java:55-200`` +
    ``graph/GraphAlgorithms.java:13``).

    Iterative frontier expansion: ``max_dist`` rounds of a distributed
    edge scan against the broadcast frontier set (``ray.put`` per
    round; the frontier is bounded by the ≤-max_dist neighborhood of
    the query set, orders of magnitude smaller than the corpus — the
    edge table itself never leaves the cluster)."""
    import ray

    reached = {str(q) for q in query_entities}
    frontier = set(reached)
    for _ in range(max_dist):
        if not frontier:
            break
        ref = ray.put(frontier)

        def neighbors(batch: pa.Table, _ref=ref) -> pa.Table:
            fr = ray.get(_ref)
            subj = batch.column("subj").to_pylist()
            obj = batch.column("obj").to_pylist()
            out = {o for s, o in zip(subj, obj) if s in fr} \
                | {s for s, o in zip(subj, obj) if o in fr}
            out = sorted(out)
            return pa.table({"n": pa.array(out, pa.string())})

        found = {r["n"] for r in
                 fills.map_batches(neighbors,
                                   batch_format="pyarrow").take_all()}
        frontier = found - reached
        reached |= found

    keep_ref = ray.put(reached)

    def keep(batch: pa.Table) -> pa.Table:
        ks = ray.get(keep_ref)
        mask = pa.array([s in ks
                         for s in batch.column("subj").to_pylist()])
        return batch.filter(mask)

    return fills.map_batches(keep, batch_format="pyarrow")


def mine_rules(fills, *, min_support: int = 2,
               min_confidence: float = 0.3):
    """Mine length-2 Horn rules (p, q ⇒ head) from the KG — the
    ``MineInferentialPaths`` analog (path counting instead of the
    path-trie): enumerate A-p→B-q→C bridge paths (the
    ``transitive_infer`` join shape), co-locate them with the direct
    A-head→C edges on a coarse (subj, obj) partition, and score each
    (p, q, head) by support / #paths(p, q). Output:
    (p, q, head, support, total, confidence), confidence-desc."""
    import pandas as pd

    from ..runtime import cluster_cpus
    n_parts = max(16, cluster_cpus() * 4)

    def tag(batch: pa.Table) -> pa.Table:
        """One row per edge per side (L bridges on obj, R on subj)."""
        subj = batch.column("subj").to_pylist()
        pred = batch.column("pred").to_pylist()
        obj = batch.column("obj").to_pylist()
        rows = {"subj": [], "pred": [], "obj": [], "side": [],
                "bridge": []}
        for s, p, o in zip(subj, pred, obj):
            for side, key in (("L", o), ("R", s)):
                rows["subj"].append(s)
                rows["pred"].append(p)
                rows["obj"].append(o)
                rows["side"].append(side)
                rows["bridge"].append(key)
        t = pa.table({k: pa.array(v) for k, v in rows.items()})
        pid = pd.util.hash_pandas_object(
            pd.Series(rows["bridge"], dtype="object"),
            index=False).to_numpy() % n_parts
        return t.append_column(
            "pid", pa.array(pid.astype("int32"), pa.int32()))

    def paths(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["side"] == "L"]
        right = df[df["side"] == "R"]
        j = left.merge(right, left_on="bridge", right_on="bridge",
                       suffixes=("_l", "_r"))
        j = j[j["subj_l"] != j["obj_r"]]
        out = j[["subj_l", "pred_l", "pred_r", "obj_r"]]
        out.columns = ["subj", "p", "q", "obj"]
        return out.drop_duplicates()

    path_ds = (fills.map_batches(tag, batch_format="pyarrow")
               .groupby("pid")
               .map_groups(paths, batch_format="pandas"))

    # co-locate paths with direct edges on (subj, obj)
    def tag_pair(df: pd.DataFrame, kind: str) -> pd.DataFrame:
        df = df.copy()
        df["kind"] = kind
        key = df["subj"].str.cat(df["obj"], sep="|")
        df["ppid"] = (pd.util.hash_pandas_object(key, index=False)
                      .to_numpy() % n_parts).astype("int32")
        return df

    edges_flat = fills.map_batches(
        lambda b: tag_pair(
            b.select(["subj", "pred", "obj"]).to_pandas()
            .rename(columns={"pred": "p"}).assign(q=""),
            "E"), batch_format="pyarrow")
    paths_flat = path_ds.map_batches(
        lambda df: tag_pair(df, "P"), batch_format="pandas")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        heads: dict[tuple, list] = {}
        for s, o, p in zip(*(df.loc[df["kind"] == "E", c]
                             for c in ("subj", "obj", "p"))):
            heads.setdefault((s, o), []).append(p)
        rows = []
        # paths() dedups only within its bridge-hashed partition: the
        # same (subj,p,q,obj) path via bridges in different partitions
        # survives. All copies converge HERE (ppid keys on subj|obj),
        # so the global distinct lives in this partition — without it,
        # support/total depend on n_parts, i.e. on cluster size.
        pdf = df[df["kind"] == "P"].drop_duplicates(
            ["subj", "p", "q", "obj"])
        for s, o, p, q in zip(pdf["subj"], pdf["obj"], pdf["p"],
                              pdf["q"]):
            rows.append((p, q, "", 0, 1))     # one total per path
            for h in heads.get((s, o), ()):   # supported heads
                rows.append((p, q, h, 1, 0))
        out = pd.DataFrame(rows, columns=["p", "q", "head",
                                          "support", "total"])
        # in-partition pre-aggregation: the driver sees one row per
        # (p, q, head) per partition, not per path
        return out.groupby(["p", "q", "head"], as_index=False).sum()

    scored = (paths_flat.union(edges_flat)
              .groupby("ppid")
              .map_groups(score, batch_format="pandas"))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        totals = df.groupby(["p", "q"])["total"].sum()
        sup = df[df["head"] != ""].groupby(
            ["p", "q", "head"])["support"].sum().reset_index()
        sup["total"] = sup.set_index(["p", "q"]).index.map(totals) \
            .astype("int64")
        sup["confidence"] = sup["support"] / sup["total"]
        sup = sup[(sup["support"] >= min_support)
                  & (sup["confidence"] >= min_confidence)]
        return sup.sort_values(["confidence", "support"],
                               ascending=False, kind="mergesort")

    rows = scored.take_all()
    df = pd.DataFrame(rows) if rows else pd.DataFrame(
        columns=["p", "q", "head", "support", "total"])
    return combine(df)


def transitive_infer(fills, rules=DEFAULT_RULES,
                     damping: float = RULE_DAMPING):
    """fills → inferred length-2-path edges (NOT unioned with input;
    callers union + combine as desired). The output itself is
    duplicate-free: the in-partition ``seen`` set only dedups triples
    inferred via bridges in ONE partition, so the result is routed
    through the per-triple max combine to collapse the same triple
    inferred via bridge entities hashed to different partitions."""
    import numpy as np
    import pandas as pd

    from ..runtime import cluster_cpus
    n_parts = max(16, cluster_cpus() * 4)
    left_preds = {p for p, _q, _h in rules}
    right_preds = {q for _p, q, _h in rules}

    def tag(batch: pa.Table) -> pa.Table:
        """Emit one row per (edge, side) with the bridge-entity join
        key: left rows bridge on obj, right rows on subj."""
        names = FILLS_SCHEMA.names
        cols = {n: batch.column(n).to_pylist() for n in names}
        out = {n: [] for n in names}
        sides, keys = [], []
        for i in range(batch.num_rows):
            pred = cols["pred"][i]
            for side, pset, key in (
                    ("L", left_preds, cols["obj"][i]),
                    ("R", right_preds, cols["subj"][i])):
                if pred in pset:
                    for n in names:
                        out[n].append(cols[n][i])
                    sides.append(side)
                    keys.append(key)
        t = pa.Table.from_arrays(
            [pa.array(out[n], ty) for n, ty in
             zip(FILLS_SCHEMA.names, FILLS_SCHEMA.types)],
            schema=FILLS_SCHEMA)
        t = t.append_column("side", pa.array(sides, pa.string()))
        t = t.append_column("bridge", pa.array(keys, pa.string()))
        pid = pd.util.hash_pandas_object(
            pd.Series(keys, dtype="object"), index=False).to_numpy() \
            % n_parts if keys else np.array([], dtype=np.uint64)
        return t.append_column("pid",
                               pa.array(pid.astype("int32"), pa.int32()))

    def join(group: pa.Table) -> pa.Table:
        names = FILLS_SCHEMA.names
        cols = {n: group.column(n).to_pylist() for n in names}
        sides = group.column("side").to_pylist()
        bridges = group.column("bridge").to_pylist()
        lefts: dict[str, list[int]] = {}
        rights: dict[str, list[int]] = {}
        for i, (s, b) in enumerate(zip(sides, bridges)):
            (lefts if s == "L" else rights).setdefault(b, []).append(i)
        out = {n: [] for n in names}
        seen = set()
        for b in sorted(set(lefts) & set(rights)):
            for li in lefts[b]:
                for ri in rights[b]:
                    for p, q, head in rules:
                        if cols["pred"][li] != p \
                                or cols["pred"][ri] != q:
                            continue
                        subj, obj = cols["subj"][li], cols["obj"][ri]
                        if subj == obj:
                            continue
                        key = (subj, head, obj)
                        if key in seen:
                            continue
                        seen.add(key)
                        out["subj"].append(subj)
                        out["subj_type"].append(cols["subj_type"][li])
                        out["pred"].append(head)
                        out["obj"].append(obj)
                        out["obj_type"].append(cols["obj_type"][ri])
                        out["score"].append(cols["score"][li]
                                            * cols["score"][ri]
                                            * damping)
                        out["doc_id"].append(cols["doc_id"][li])
                        out["sent_idx"].append(cols["sent_idx"][li])
                        out["subj_span"].append(cols["subj_span"][li])
                        out["obj_span"].append(cols["obj_span"][ri])
        return pa.Table.from_arrays(
            [pa.array(out[n], ty) for n, ty in
             zip(FILLS_SCHEMA.names, FILLS_SCHEMA.types)],
            schema=FILLS_SCHEMA)

    return _max_combine(
        fills.map_batches(tag, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(join, batch_format="pyarrow"))
