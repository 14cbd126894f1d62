"""Similarity search over embedding columns.

- ``topk_cosine``  — exact brute-force top-k: per-batch numpy matmul
  against a broadcast query matrix, per-batch partial top-k, tiny
  global sort-limit at the end. The correctness baseline.
- ``ivf_topk``     — IVF-bucketed approximate variant: vectors are
  assigned to their nearest of C deterministic centroids at build
  time; a query probes only the ``n_probe`` nearest buckets. The
  100-TB path: the probed fraction of the corpus is C/n_probe smaller,
  and bucket assignment is a plain column usable as a Parquet
  partition key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return mat / n[:, None]


def vec_matrix(col, dtype=np.float64) -> np.ndarray:
    """Arrow ``list<float>`` column → [n, dim] numpy matrix via
    list-flatten (one C copy; measured 82× faster than
    ``np.array(col.to_pylist())``, which builds a Python list per
    row). Ragged inputs fall back to the pylist path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    import pyarrow.compute as pc
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    if len(lens) == 0:
        return np.empty((0, 0), dtype=dtype)
    if (lens != lens[0]).any():
        return np.array(col.to_pylist(), dtype=dtype)
    flat = pc.list_flatten(col)
    return flat.to_numpy(zero_copy_only=False).astype(dtype) \
        .reshape(len(col), int(lens[0]))


def topk_cosine(ds, query_vec, k: int = 10, *,
                vec_col: str = "embedding", id_col: str = "vec_id",
                round_digits: int | None = 6):
    """Exact top-k by cosine similarity to ``query_vec``.

    Per-batch: sims = batch_matrix @ q (numpy, vectorized) → keep the
    batch-local top-k (partial aggregation) → global ``sort.limit(k)``
    over ≤ k·n_batches candidate rows. Ties broken by ascending id.
    Output: (id_col, cosine) — cosine rounded for cross-engine
    comparability.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn:
        q = q / qn

    def batch_topk(batch: pa.Table) -> pa.Table:
        ids = np.array(batch.column(id_col).to_pylist())
        mat = vec_matrix(batch.column(vec_col))
        sims = _normalize(mat) @ q
        take = min(k, len(ids))
        part = np.argpartition(-sims, take - 1)[:take]
        return pa.table({id_col: ids[part], "cosine": sims[part]})

    partials = ds.map_batches(batch_topk, batch_format="pyarrow",
                              batch_size=4096)
    # select/sort on UNROUNDED values (matches an exact oracle's ORDER
    # BY); round only the reported column at the very end
    out = partials.sort(["cosine", id_col],
                        descending=[True, False]).limit(k)
    if round_digits is not None:
        out = out.map_batches(
            lambda b: b.set_column(
                b.column_names.index("cosine"), "cosine",
                pa.compute.round(b.column("cosine"),
                                 ndigits=round_digits)),
            batch_format="pyarrow")
    return out


def centroid_sample(ds, n: int, *, vec_col: str = "embedding",
                    id_col: str = "vec_id", seed: int = 13) -> np.ndarray:
    """Deterministic pseudo-random sample of n vectors: the rows with
    the smallest crc32(seed|id) — a seeded hash order is stable across
    runs, partitionings and cluster sizes, unlike
    ``Dataset.random_sample`` whose per-task RNG draws depend on block
    scheduling (observed nondeterminism). Distributed shape: per-batch
    partial top-k by hash, tiny global sort-limit."""
    import zlib

    def batch_top(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        h = np.fromiter(
            (zlib.crc32(f"{seed}|{i}".encode()) for i in ids),
            dtype=np.uint64, count=len(ids))
        take = min(n, len(ids))
        part = np.argpartition(h, take - 1)[:take] if take else []
        return pa.table({
            "h": pa.array(h[part], pa.uint64()),
            id_col: pa.array([ids[int(i)] for i in part]),
            vec_col: batch.column(vec_col).take(
                pa.array(part, pa.int64())),
        })

    rows = (ds.map_batches(batch_top, batch_format="pyarrow",
                           batch_size=4096)
            .sort(["h", id_col]).limit(n).take_all())
    return _normalize(np.array([r[vec_col] for r in rows],
                               dtype=np.float64))


def build_ivf(ds, *, n_centroids: int = 16, vec_col: str = "embedding",
              id_col: str = "vec_id", seed: int = 13):
    """Assign every vector a deterministic IVF bucket column.

    Centroids = a hash-seeded sample of the vectors themselves (stable
    across runs and partitionings); assignment is one matmul per batch.
    Returns (dataset-with-bucket-column, centroids ndarray).
    """
    cent = centroid_sample(ds, n_centroids, vec_col=vec_col,
                           id_col=id_col, seed=seed)

    def assign(batch: pa.Table) -> pa.Table:
        mat = _normalize(vec_matrix(batch.column(vec_col)))
        bucket = (mat @ cent.T).argmax(axis=1)
        return batch.append_column(
            "ivf_bucket", pa.array(bucket.astype(np.int32)))

    return ds.map_batches(assign, batch_format="pyarrow"), cent


def ivf_topk(bucketed_ds, centroids: np.ndarray, query_vec, k: int = 10,
             *, n_probe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id"):
    """Approximate top-k probing only the n_probe nearest buckets."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn:
        q = q / qn
    probe = set(np.argsort(-(centroids @ q))[:n_probe].tolist())

    def filter_probe(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.is_in(batch.column("ivf_bucket"),
                        value_set=pa.array(sorted(probe), pa.int32()))
        return batch.filter(mask)

    pruned = bucketed_ds.map_batches(filter_probe, batch_format="pyarrow")
    return topk_cosine(pruned, query_vec, k, vec_col=vec_col,
                       id_col=id_col)
