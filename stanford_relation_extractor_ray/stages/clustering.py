"""Distributed spherical k-means over an embedding column — semantic
clustering for corpus curation (topic balancing, per-cluster sampling,
semantic-dup triage above the pairwise near-dup ops in ``dedup``).

Scale shape per iteration: ONE streaming pass (`map_batches`) emitting
k partial rows per batch (cluster → int64 vector sum + count), a tiny
``groupby("cluster")`` over k×B partial rows, and a k-row driver
collect for the centroid update — the data never shuffles, only the
k×dim partials do. Centroids broadcast into the next pass via
`ray.put`.

Determinism across runs, partitionings and cluster sizes (the repo
bar, cf. ``similarity.centroid_sample``):

- init = ``centroid_sample`` (seeded hash order, partition-invariant);
- every reduction is in INTEGER space: vectors are fixed-point
  quantized once (×2^20, round-half-away), so partial sums are exact
  and order-invariant — no float-summation-order ulps, which is what
  makes a float k-means parallelism-dependent. Headroom: dim-wise
  |Σq| < 2^63 holds to ~4×10^12 rows per cluster at |v| ≤ 1;
- assignment = argmax dot(v, centroid) with first-max (lowest cluster
  index) tie-break; a fixed iteration count, no float convergence
  test.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_Q = 1 << 20            # fixed-point scale


def _quantize(mat: np.ndarray) -> np.ndarray:
    # round half away from zero, matching _round_col's tie discipline
    return (np.sign(mat) * np.floor(np.abs(mat) * _Q + 0.5)) \
        .astype(np.int64)


def _assign(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    # argmax cosine == argmax dot for unit centroids (|v| is constant
    # per row); np.argmax takes the FIRST max — the deterministic tie
    return np.argmax(mat @ centroids.T, axis=1)


def kmeans(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
           k: int = 8, n_iter: int = 5, seed: int = 13):
    """Cluster ``ds[vec_col]`` into ``k`` spherical clusters.

    Returns ``(assigned, centroids)``: ``assigned`` is ``ds`` with a
    ``cluster`` int32 column (lazy — consume it downstream), and
    ``centroids`` the final unit-norm (k, dim) array.
    """
    import ray

    from .similarity import centroid_sample

    centroids = centroid_sample(ds, k, vec_col=vec_col,
                                id_col=id_col, seed=seed)
    k = len(centroids)              # tiny inputs may yield < k seeds
    dim = centroids.shape[1]

    quant = ds.map_batches(
        lambda b: pa.table({
            id_col: b.column(id_col),
            vec_col: b.column(vec_col),
        }), batch_format="pyarrow").materialize()

    for _ in range(n_iter):
        cent_ref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            cent = ray.get(cent_ref)
            from .similarity import vec_matrix
            mat = vec_matrix(batch.column(vec_col))
            lab = _assign(mat, cent)
            q = _quantize(mat)
            rows = {"cluster": [], "count": [], "qsum": []}
            for c in np.unique(lab):
                sel = q[lab == c]
                rows["cluster"].append(int(c))
                rows["count"].append(int(sel.shape[0]))
                rows["qsum"].append(sel.sum(axis=0,
                                            dtype=np.int64).tolist())
            return pa.table({
                "cluster": pa.array(rows["cluster"], pa.int32()),
                "count": pa.array(rows["count"], pa.int64()),
                "qsum": pa.array(rows["qsum"],
                                 pa.list_(pa.int64(), dim)),
            })

        def merge(df):
            import pandas as pd
            qs = np.vstack(df["qsum"].to_numpy()).astype(np.int64)
            return pd.DataFrame({
                "cluster": [int(df["cluster"].iloc[0])],
                "count": [int(df["count"].sum())],
                "qsum": [qs.sum(axis=0, dtype=np.int64).tolist()]})

        stats = (quant.map_batches(partial, batch_format="pyarrow")
                 .groupby("cluster")
                 .map_groups(merge, batch_format="pandas")
                 .to_pandas())

        new = centroids.copy()      # empty clusters keep their seed
        for _, row in stats.iterrows():
            mean = (np.asarray(row["qsum"], dtype=np.float64)
                    / (_Q * row["count"]))
            nrm = np.linalg.norm(mean)
            if nrm > 0:
                new[int(row["cluster"])] = mean / nrm
        centroids = new

    cent_ref = ray.put(centroids)

    def tag(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        from .similarity import vec_matrix
        mat = vec_matrix(batch.column(vec_col))
        return batch.append_column(
            "cluster", pa.array(_assign(mat, cent).astype(np.int32)))

    return ds.map_batches(tag, batch_format="pyarrow"), centroids
