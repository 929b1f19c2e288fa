"""Fence-file storage for the executor-parallel Kinesis reader.

The parallel reader's executors report attained shard positions
through tiny JSON "fence" files under ``positionDir`` (the engine's
DynamoDB-checkpoint analogue — reference subscriber.go:65-75 commits
per-shard sequence numbers to DynamoDB; here the durable store is a
filesystem the driver and executors share).

Why ``pyarrow.fs`` and not Hadoop's FileSystem API (which the DLQ
markers in ``streaming/sink.py`` use): fences are WRITTEN inside
``DataSourceStreamReader.read()``, which runs in plain Python worker
processes on executors where no py4j JVM gateway exists — the Hadoop
API is driver-only. PyArrow's filesystem layer is pure
Python-callable, ships in the container, and resolves the same URI
schemes ``checkpointLocation`` accepts: plain local paths,
``file://``, ``s3://`` (plus the Hadoop aliases ``s3a://``/``s3n://``,
normalized here), ``hdfs://`` (via libhdfs where installed), and
``gs://``. Pointing ``positionDir`` at shared storage therefore works
with exactly the URI the user already passes for checkpoints.

Atomicity: on local filesystems, writes go to a ``.tmp-<pid>`` sibling
and are renamed into place (atomic, so readers never observe a torn
fence). Object stores publish whole objects atomically, so the write
is direct there — a reader sees the old fence or the new one, never a
prefix. Readers additionally tolerate unparsable fences (half-written
under crash) by skipping them until the next trigger.
"""

from __future__ import annotations

import json
import os

__all__ = ["FenceStore"]

#: Hadoop URI scheme aliases pyarrow doesn't register natively.
_SCHEME_ALIASES = {"s3a://": "s3://", "s3n://": "s3://"}


def _normalize(path: str) -> str:
    for alias, canon in _SCHEME_ALIASES.items():
        if path.startswith(alias):
            return canon + path[len(alias):]
    return path


class FenceStore:
    """Directory of JSON fence files addressed by name, over any
    pyarrow-resolvable filesystem. Instances are cheap and picklable
    (the filesystem handle is resolved lazily per process), so a
    store can ride an ``InputPartition`` to the executors."""

    def __init__(self, base: str):
        self.base = _normalize(base)
        self._resolved = None  # (fs, root), memoized per process

    # -- filesystem plumbing ------------------------------------------

    def __getstate__(self):
        return {"base": self.base}

    def __setstate__(self, state):
        self.base = state["base"]
        self._resolved = None

    def _resolve(self):
        # memoized: FileSystem.from_uri builds a fresh client (S3 etc.)
        # each call, and _merge_fences touches every fence per trigger —
        # one filesystem handle per FenceStore instance, not per file
        if self._resolved is None:
            from pyarrow import fs as pafs

            if "://" in self.base:
                fs, root = pafs.FileSystem.from_uri(self.base)
            else:
                fs, root = pafs.LocalFileSystem(), self.base
            self._resolved = (fs, root.rstrip("/"))
        return self._resolved

    def _is_local(self, fs) -> bool:
        from pyarrow import fs as pafs

        return isinstance(fs, pafs.LocalFileSystem)

    # -- operations ----------------------------------------------------

    def list_names(self) -> list[str]:
        """Basenames of all files directly under the store (no
        recursion); empty when the directory doesn't exist yet."""
        from pyarrow import fs as pafs

        fs, root = self._resolve()
        try:
            infos = fs.get_file_info(
                pafs.FileSelector(root, recursive=False, allow_not_found=True)
            )
        except Exception:  # transient listing failure: retry next trigger
            return []
        return [
            i.base_name for i in infos if i.type == pafs.FileType.File
        ]

    def read_json(self, name: str) -> dict | None:
        """Parsed fence, or None when absent/torn (caller retries at
        the next trigger — same contract as the old POSIX reader)."""
        fs, root = self._resolve()
        try:
            with fs.open_input_stream(f"{root}/{name}") as f:
                return json.loads(f.read().decode("utf-8"))
        except Exception:
            return None

    def write_json(self, name: str, obj: dict) -> None:
        fs, root = self._resolve()
        payload = json.dumps(obj).encode("utf-8")
        fs.create_dir(root, recursive=True)
        final = f"{root}/{name}"
        if self._is_local(fs):
            # tmp + rename: POSIX-atomic, no torn reads
            tmp = f"{final}.tmp-{os.getpid()}"
            with fs.open_output_stream(tmp) as f:
                f.write(payload)
            fs.move(tmp, final)
        else:
            # object stores publish whole objects atomically
            with fs.open_output_stream(final) as f:
                f.write(payload)

    def delete(self, name: str) -> None:
        fs, root = self._resolve()
        try:
            fs.delete_file(f"{root}/{name}")
        except Exception:
            pass  # already gone / concurrent prune: idempotent

    def delete_all(self) -> None:
        fs, root = self._resolve()
        try:
            fs.delete_dir(root)
        except Exception:
            pass
