"""Label-propagation canonicalization (the above-gate scale path)
equals driver union-find, and converges on multi-hop chains."""

import pyarrow as pa
import pytest

from stanford_relation_extractor_ray.schemas import FILLS_SCHEMA
from stanford_relation_extractor_ray.stages import canonicalize as C


def _fill(subj, subj_type="PERSON", obj="Toronto", obj_type="CITY",
          score=0.9):
    return {"subj": subj, "subj_type": subj_type,
            "pred": "per:cities_of_residence" if subj_type == "PERSON"
            else "org:city_of_headquarters",
            "obj": obj, "obj_type": obj_type, "score": score,
            "doc_id": "d0", "sent_idx": 0,
            "subj_span": [0, 2], "obj_span": [5, 6]}


@pytest.fixture()
def variant_fills(ray_session):
    import ray.data as rd
    rows = [
        # 3-surface variant cluster sharing the "acme" block (nickname
        # and acronym variants are the LINKER's job upstream; the
        # canonicalize stage merges shared-token residual variants)
        _fill("Acme Dynamics Corporation", "ORGANIZATION", score=0.8),
        _fill("Acme Dynamics", "ORGANIZATION", score=0.3),
        _fill("Acme Dynamics Corp", "ORGANIZATION", score=0.5),
        _fill("Julie Laurent", score=0.7),         # singleton
    ]
    return rd.from_arrow(
        pa.Table.from_pylist(rows, schema=FILLS_SCHEMA)).materialize()


def test_propagation_equals_union_find(ray_session, variant_fills,
                                       monkeypatch):
    cmap_uf, w_uf = C.canonical_map(variant_fills)
    # non-trivial cluster actually formed, rep = highest weight
    assert cmap_uf[("Acme Dynamics", "ORGANIZATION")] == \
        "Acme Dynamics Corporation"
    assert cmap_uf[("Acme Dynamics Corp", "ORGANIZATION")] == \
        "Acme Dynamics Corporation"
    monkeypatch.setattr(C, "SMALL_SURFACES", 0)    # force scale path
    cmap_lp, w_lp = C.canonical_map(variant_fills)
    assert cmap_lp == cmap_uf
    assert w_lp == w_uf


def test_propagate_components_multi_hop(ray_session):
    """A 4-node chain needs >1 propagation round; all nodes must end
    on one root."""
    import ray.data as rd
    pairs = rd.from_items([
        {"a": "A", "b": "B", "type": "PERSON"},
        {"a": "B", "b": "C", "type": "PERSON"},
        {"a": "C", "b": "D", "type": "PERSON"},
        {"a": "X", "b": "Y", "type": "PERSON"},    # second component
    ])
    rows = C.propagate_components(pairs)
    roots = {r["node"]: r["label"] for r in rows}
    assert len({roots[k] for k in ("A|PERSON", "B|PERSON", "C|PERSON",
                                   "D|PERSON")}) == 1
    assert len({roots["X|PERSON"], roots["Y|PERSON"]}) == 1
    assert roots["A|PERSON"] != roots["X|PERSON"]


def test_cc_ds_gate_paths_equal(ray_session, monkeypatch):
    """connected_components_ds: driver union-find (small gate) ==
    min-label propagation (scale path)."""
    import ray.data as rd
    from stanford_relation_extractor_ray.stages import dedup as D
    pairs = rd.from_items([
        {"id_a": 1, "id_b": 2}, {"id_a": 2, "id_b": 30},
        {"id_a": 400, "id_b": 5}, {"id_a": 9, "id_b": 10},
    ])
    small = D.connected_components_ds(pairs)
    monkeypatch.setattr(D, "SMALL_CC_PAIRS", 0)
    large = D.connected_components_ds(pairs)
    assert sorted(small, key=lambda r: r["id"]) == \
        sorted(large, key=lambda r: r["id"])
    roots = {r["id"]: r["root"] for r in small}
    assert roots[30] == 1 and roots[400] == 5 and roots[10] == 9


def test_propagate_components_long_chain_pointer_jumping(ray_session):
    """A 16-hop chain converges in ≤8 rounds: the per-round
    label↔node links collapse chains in O(log diameter) rounds
    (plain min-propagation would need 16); the loop raises rather
    than returning unconverged labels. (A 40-chain inside max_iter=10
    is verified the same way, but each round is a fixed-latency Ray
    execution, too slow for the suite.)"""
    import ray.data as rd
    pairs = rd.from_items([
        {"a": f"N{i:03d}", "b": f"N{i + 1:03d}", "type": "ORGANIZATION"}
        for i in range(16)])
    rows = C.propagate_components(pairs, max_iter=8)
    roots = {r["node"]: r["label"] for r in rows}
    assert set(roots.values()) == {"N000|ORGANIZATION"}


def test_build_graph_distributed_tier_equals_driver(
        ray_session, variant_fills, monkeypatch):
    """Above the gate, build_graph runs the fully distributed tier
    (Dataset-only canonical map, co-partition rewrite joins,
    distributed nodes) — same nodes and edges as the driver tier."""
    from stanford_relation_extractor_ray.pipelines.kg import build_graph

    def norm_nodes(obj):
        df = obj.to_pandas()
        df["aliases"] = df["aliases"].map(list)
        return sorted(map(tuple, df.to_numpy().tolist()))

    def norm_edges(ds):
        df = ds.to_pandas()
        df["score"] = df["score"].round(9)
        return sorted(map(tuple, df.to_numpy().tolist()))

    nodes_small, edges_small = build_graph(variant_fills)
    n_small, e_small = norm_nodes(nodes_small), norm_edges(edges_small)
    monkeypatch.setattr(C, "SMALL_SURFACES", 0)
    nodes_big, edges_big = build_graph(variant_fills)
    assert norm_nodes(nodes_big) == n_small
    assert norm_edges(edges_big) == e_small
    # the distributed tier actually produced a Dataset, not a Table
    assert not isinstance(nodes_big, __import__("pyarrow").Table)
