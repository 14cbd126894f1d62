"""Per-partition lineage manifests for checkpoint-resumable stages.

Replaces the reference's Postgres key→blob caches
(``kbp/common/PostgresUtils.java``, redo flags ``cache.*.redo``) with the
batch-native pattern: each materialized stage writes one directory per
input partition, atomically (write to ``<dir>.tmp`` then rename), plus a
manifest row recording (stage, partition, input digest, row count). A
rerun skips partitions whose manifest row matches the current input
digest — kill the job at any point and restart it with the same
arguments to resume.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil


def digest(*parts) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


class Manifest:
    def __init__(self, root: str, stage: str):
        self.dir = os.path.join(root, stage)
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "_MANIFEST.json")
        self._rows: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._rows = json.load(f)

    def partition_dir(self, partition: str) -> str:
        return os.path.join(self.dir, f"part={partition}")

    def is_done(self, partition: str, input_digest: str) -> bool:
        row = self._rows.get(partition)
        return (row is not None and row.get("digest") == input_digest
                and os.path.isdir(self.partition_dir(partition)))

    def begin(self, partition: str) -> str:
        """→ temp dir to write into; commit() renames it into place."""
        tmp = self.partition_dir(partition) + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        return tmp

    def commit(self, partition: str, input_digest: str,
               row_count: int) -> None:
        tmp = self.partition_dir(partition) + ".tmp"
        final = self.partition_dir(partition)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        self._rows[partition] = {"digest": input_digest,
                                 "rows": row_count}
        with open(self.path + ".tmp", "w") as f:
            json.dump(self._rows, f, indent=1, sort_keys=True)
        os.replace(self.path + ".tmp", self.path)

    def completed_dirs(self) -> list[str]:
        return [self.partition_dir(p) for p in sorted(self._rows)
                if os.path.isdir(self.partition_dir(p))]

    def completed_files(self, suffix: str = ".parquet") -> list[str]:
        out = []
        for d in self.completed_dirs():
            out.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                       if f.endswith(suffix))
        return out
