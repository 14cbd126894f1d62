"""Deduplication operators over document datasets.

First-class large-scale training-data-pipeline components (beyond the
reference's per-entity dedup — its near-dup machinery,
``HeuristicSlotfillPostProcessors.java:672-739`` + min-hash blocking
plan SURVEY.md §7.2/7.3, generalized corpus-wide):

- ``exact_dedup``       — content-hash groupby, keep first (min id).
- ``minhash_lsh_pairs`` — shingle → minhash → banded LSH buckets →
  candidate pairs → exact-Jaccard verification. The scale path: only
  bucket-mates are compared, never all pairs.
- ``simhash_pairs``     — 64-bit simhash, banded by pigeonhole so any
  pair within the hamming radius shares ≥1 of (radius+1) bands —
  exact, no false negatives.
- ``jaccard_pairs``     — blocked exact n-gram-Jaccard join (the
  verification kernel standalone, for oracle-checkable small blocks).
- ``embedding_dup_pairs`` — exact cosine near-dup via per-batch numpy
  matmul against a broadcast matrix (brute force; see
  stages/similarity.py for the bucketed scale path).

All hash functions are deterministic (crc32/blake2, seeded
multiply-shift) so results are reproducible across processes and
cluster sizes.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def shingles(text: str, k: int = 3) -> set[str]:
    toks = text.split(' ')
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def minhash_signature(sh: set[str], a: np.ndarray, b: np.ndarray
                      ) -> np.ndarray:
    if not sh:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    hv = np.fromiter((zlib.crc32(s.encode()) for s in sh),
                     dtype=np.uint64, count=len(sh))
    # (a*h + b) mod p for all perms × shingles, vectorized
    vals = (a[:, None] * hv[None, :] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


# ---------------------------------------------------------------------------


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per distinct text (hash-partition + per-group
    first; reference analog ``keysToNotDuplicate`` global dedup,
    ``KBPTrainer.java:155,246``). Output: (id_col, text_col)."""
    from ray.data.aggregate import Min

    return (ds.select_columns([id_col, text_col])
            .groupby(text_col)
            .aggregate(Min(id_col, alias_name=id_col))
            .select_columns([id_col, text_col]))


def minhash_lsh_pairs(ds, *, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3,
                      num_perm: int = 128, bands: int = 64,
                      threshold: float = 0.5, seed: int = 7):
    """Near-duplicate pairs via MinHash + banded LSH + exact verify.

    Dataflow: per-batch signature computation (vectorized numpy) →
    flat-map to (band, band_hash, id, shingle-set-digest) rows →
    ``groupby(band, band_hash)`` → within-bucket candidate pairs →
    exact Jaccard verification on re-read shingle sets → distinct
    pairs. Output: (id_a, id_b, jaccard) with id_a < id_b.

    With r = num_perm/bands rows per band, a pair with true Jaccard j
    shares ≥1 band w.p. 1-(1-j^r)^bands — at the defaults (r=2, b=64)
    detection at j≥0.5 is ≈1-1e-8, so the verified output equals the
    exact-join oracle with overwhelming probability while only
    comparing bucket-mates.
    """
    r = num_perm // bands
    a, b = _perm_params(num_perm, seed)

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_band, out_hash, out_text = [], [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_signature(shingles(t, k), a, b)
            for bi in range(bands):
                h = hashlib.blake2b(
                    sig[bi * r:(bi + 1) * r].tobytes(),
                    digest_size=8).hexdigest()
                out_id.append(i)
                out_band.append(bi)
                out_hash.append(h)
                out_text.append(t)
        return pa.table({"id": out_id, "band": out_band,
                         "bhash": out_hash, "text": out_text})

    banded = ds.map_batches(to_bands, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("id").to_pylist()
        texts = group.column("text").to_pylist()
        order = np.argsort(ids)
        out_a, out_b, out_j = [], [], []
        sh = [shingles(texts[i], k) for i in order]
        ids = [ids[i] for i in order]
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                if ids[x] == ids[y]:
                    continue
                inter = len(sh[x] & sh[y])
                union = len(sh[x] | sh[y])
                j = inter / union if union else 0.0
                if j >= threshold:
                    out_a.append(ids[x])
                    out_b.append(ids[y])
                    out_j.append(j)
        return pa.table({"id_a": out_a, "id_b": out_b,
                         "jaccard": np.array(out_j, dtype=np.float64)})

    pairs = banded.groupby(["band", "bhash"]).map_groups(
        bucket_pairs, batch_format="pyarrow")
    # a pair can surface from several bands → distinct
    from ray.data.aggregate import Max
    return (pairs.groupby(["id_a", "id_b"])
            .aggregate(Max("jaccard", alias_name="jaccard")))


def simhash64(text: str, k: int = 1) -> int:
    v = np.zeros(64, dtype=np.int64)
    for s in shingles(text, k):
        h = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
        bits = np.unpackbits(
            np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
        v += bits.astype(np.int64) * 2 - 1
    return int.from_bytes(np.packbits(v > 0).tobytes(), "big")


def simhash_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                  radius: int = 3, k: int = 1):
    """Near-dup pairs with hamming(simhash) ≤ radius.

    Banding by pigeonhole: the 64-bit hash splits into (radius+1)
    blocks; any pair within the radius is identical on ≥1 block, so
    bucketing on (block index, block value) finds every such pair —
    no false negatives, verification filters bucket collisions.
    Output: (id_a, id_b, hamming), id_a < id_b.
    """
    n_blocks = radius + 1
    width = 64 // n_blocks

    def to_blocks(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out = {"id": [], "block": [], "bval": [], "sh": []}
        for i, t in zip(ids, texts):
            h = simhash64(t, k)
            for bi in range(n_blocks):
                out["id"].append(i)
                out["block"].append(bi)
                out["bval"].append((h >> (bi * width)) &
                                   ((1 << width) - 1))
                out["sh"].append(h)
        return pa.table({
            "id": pa.array(out["id"]),
            "block": pa.array(out["block"], pa.int32()),
            "bval": pa.array(out["bval"], pa.int64()),
            "sh": pa.array(out["sh"], pa.uint64())})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("id").to_pylist()
        hs = group.column("sh").to_pylist()
        seen = sorted(set(zip(ids, hs)))
        out_a, out_b, out_d = [], [], []
        for x in range(len(seen)):
            for y in range(x + 1, len(seen)):
                if seen[x][0] == seen[y][0]:
                    continue
                d = bin(seen[x][1] ^ seen[y][1]).count("1")
                if d <= radius:
                    out_a.append(seen[x][0])
                    out_b.append(seen[y][0])
                    out_d.append(d)
        return pa.table({"id_a": out_a, "id_b": out_b,
                         "hamming": np.array(out_d, dtype=np.int64)})

    from ray.data.aggregate import Min
    blocks = ds.map_batches(to_blocks, batch_format="pyarrow")
    pairs = blocks.groupby(["block", "bval"]).map_groups(
        bucket_pairs, batch_format="pyarrow")
    return (pairs.groupby(["id_a", "id_b"])
            .aggregate(Min("hamming", alias_name="hamming")))


def jaccard_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                  block_cols: tuple = ("lang",), k: int = 3,
                  threshold: float = 0.5):
    """Exact blocked n-gram-Jaccard join: all pairs within a block.

    The oracle-checkable exact variant (blocks must be small); the LSH
    op above is the at-scale path. Output: (id_a, id_b, jaccard).
    """
    def block_pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        texts = group.column(text_col).to_pylist()
        order = np.argsort(ids)
        sh = [shingles(texts[i], k) for i in order]
        idv = [ids[i] for i in order]
        out_a, out_b, out_j = [], [], []
        for x in range(len(idv)):
            for y in range(x + 1, len(idv)):
                union = len(sh[x] | sh[y])
                j = len(sh[x] & sh[y]) / union if union else 0.0
                if j >= threshold:
                    out_a.append(idv[x])
                    out_b.append(idv[y])
                    out_j.append(j)
        return pa.table({"id_a": out_a, "id_b": out_b,
                         "jaccard": np.array(out_j, dtype=np.float64)})

    return ds.groupby(list(block_cols)).map_groups(
        block_pairs, batch_format="pyarrow")


def connected_components(pairs_rows: list[tuple]) -> dict:
    """Driver-side union-find over near-dup pairs (the pair list is
    small relative to the corpus). → {id: cluster_representative}."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in sorted(pairs_rows):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in parent}


def embedding_dup_pairs(ds, *, vec_col: str = "embedding",
                        id_col: str = "vec_id", threshold: float = 0.5):
    """Exact cosine near-dup pairs: per-batch numpy matmul against the
    broadcast full matrix (``ray.put`` once). Output:
    (id_a, id_b, cosine), id_a < id_b. Brute force — the IVF-bucketed
    variant in stages/similarity.py is the 100-TB path."""
    import ray

    all_rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in all_rows])
    mat = np.array([r[vec_col] for r in all_rows], dtype=np.float32)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    ref = ray.put((ids, matn))

    def batch_pairs(batch: pa.Table) -> pa.Table:
        g_ids, g_mat = ray.get(ref)
        b_ids = np.array(batch.column(id_col).to_pylist())
        b_mat = np.array(batch.column(vec_col).to_pylist(),
                         dtype=np.float32)
        bn = np.linalg.norm(b_mat, axis=1)
        bn[bn == 0] = 1.0
        sims = (b_mat / bn[:, None]) @ g_mat.T
        out_a, out_b, out_s = [], [], []
        for i in range(len(b_ids)):
            hit = np.where(sims[i] >= threshold)[0]
            for j in hit:
                if b_ids[i] < g_ids[j]:
                    out_a.append(int(b_ids[i]))
                    out_b.append(int(g_ids[j]))
                    out_s.append(float(sims[i, j]))
        return pa.table({"id_a": out_a, "id_b": out_b,
                         "cosine": np.array(out_s, dtype=np.float64)})

    return ds.map_batches(batch_pairs, batch_format="pyarrow")
