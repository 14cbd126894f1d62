"""Spherical k-means (stages/clustering.py): partition invariance —
the repo's determinism bar — plus basic clustering sanity."""

import numpy as np
import pyarrow as pa


def _toy_ds(n_parts: int):
    """Three well-separated direction bundles on the unit sphere."""
    import ray.data as rd
    rng = np.random.RandomState(0)
    base = np.eye(3)[[0, 1, 2]]
    rows = []
    for i in range(60):
        v = base[i % 3] + rng.normal(scale=0.05, size=3)
        rows.append({"vec_id": i, "embedding": v.tolist()})
    return rd.from_items(rows).repartition(n_parts)


def test_kmeans_partition_invariant(ray_session):
    """Identical assignments AND centroids at 1 vs 6 partitions: the
    fixed-point integer reduction makes the update order-invariant."""
    from stanford_relation_extractor_ray.stages.clustering import \
        kmeans
    a1, c1 = kmeans(_toy_ds(1), k=3, n_iter=4)
    a6, c6 = kmeans(_toy_ds(6), k=3, n_iter=4)
    assert np.array_equal(c1, c6)
    m1 = {r["vec_id"]: r["cluster"] for r in a1.take_all()}
    m6 = {r["vec_id"]: r["cluster"] for r in a6.take_all()}
    assert m1 == m6


def test_kmeans_separates_bundles(ray_session):
    """The three direction bundles land in three distinct clusters,
    pure per bundle."""
    from stanford_relation_extractor_ray.stages.clustering import \
        kmeans
    assigned, cent = kmeans(_toy_ds(3), k=3, n_iter=4)
    rows = assigned.take_all()
    assert len(rows) == 60
    by_bundle: dict[int, set] = {}
    for r in rows:
        by_bundle.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    assert all(len(cs) == 1 for cs in by_bundle.values())
    assert len(set().union(*by_bundle.values())) == 3
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)


def test_kmeans_fewer_rows_than_k(ray_session):
    import ray.data as rd

    from stanford_relation_extractor_ray.stages.clustering import \
        kmeans
    ds = rd.from_items([
        {"vec_id": i, "embedding": [1.0 * (i == j) for j in range(3)]}
        for i in range(2)])
    assigned, cent = kmeans(ds, k=5, n_iter=2)
    assert len(cent) == 2
    assert len(assigned.take_all()) == 2
