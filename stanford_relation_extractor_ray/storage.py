"""Table storage: Lance when available, Parquet otherwise.

The target deployment stores corpus / node / edge tables as Lance
datasets (``ray.data.read_lance`` / ``Dataset.write_lance``). This
container has no ``pylance``, so every call degrades to Parquet with
the same directory-per-table layout; the API is the seam — callers
never name a format.
"""

from __future__ import annotations


def _have_lance() -> bool:
    try:
        import lance                          # noqa: F401
        return True
    except Exception:
        return False


def read_table(path: str, *, columns=None):
    """→ streaming Dataset from a Lance dataset or Parquet directory."""
    import ray.data as rd
    if _have_lance():
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def write_table(ds, path: str):
    """Dataset → Lance dataset / partitioned Parquet directory."""
    if _have_lance():
        ds.write_lance(path)
    else:
        ds.write_parquet(path)
    return path
