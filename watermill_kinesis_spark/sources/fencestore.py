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

Atomicity: on local filesystems, writes go to a ``.tmp-<pid>-<uuid>``
sibling and are renamed into place (atomic, so readers never observe
a torn fence; the uuid component keeps duplicate task attempts on a
SHARED filesystem — NFS/EFS with colliding worker pids — from
interleaving into one tmp file). Object stores publish whole objects
atomically, so the write is direct there — a reader sees the old
fence or the new one, never a prefix. Readers additionally tolerate
unparsable fences (half-written under crash) by skipping them until
the next trigger.

Error discipline (r6 review): ABSENCE and TORN CONTENT map to
None/[]/no-op — those are the states the protocol retries through.
Real I/O failures (auth denial, network, permission) PROPAGATE from
``read_json`` and ``delete`` — a retried task that silently ignored
its replay fence would re-read past the fenced window, and a commit
whose pruning silently no-ops would grow the fence dir unboundedly.
``list_names`` alone still degrades to [] on listing errors (the
planner runs every trigger and the reader's fail-fast guard fires
after three fence-less batches) but it REMEMBERS the error in
``last_list_error`` so that guard's message can surface the true
cause instead of blaming configuration.
"""

from __future__ import annotations

import errno
import json
import os
import uuid as uuidlib


def _is_not_found(e: OSError) -> bool:
    """Absent-KEY classification for pyarrow filesystem errors, which
    surface missing paths as OSError with backend-specific text
    ('No such file' locally, 'Path does not exist' on S3FileSystem,
    'No such object' on GCS). errno ENOENT is authoritative when the
    backend sets it; the message patterns are the fallback and stay
    OBJECT-scoped on purpose — a bare 'not found' would also match
    bucket-level 404s and auth-proxy errors, reclassifying a
    misconfigured store as 'all fences absent' (silent replay from
    TRIM_HORIZON instead of the fail-fast). Anything unmatched is a
    REAL transport/auth failure and must propagate (r6 fence-store
    error discipline); an always-absent store is still caught by the
    reader's three-fence-less-batches fail-fast."""
    if getattr(e, "errno", None) == errno.ENOENT:
        return True
    msg = str(e).lower()
    return (
        "no such file" in msg
        or "path does not exist" in msg
        or "no such object" in msg
        or "file does not exist" in msg
    )

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
        self._dir_ensured = False
        #: the last listing failure, surfaced by the reader's
        #: fences-never-visible fail-fast guard
        self.last_list_error: Exception | None = None

    # -- filesystem plumbing ------------------------------------------

    def __getstate__(self):
        return {"base": self.base}

    def __setstate__(self, state):
        self.base = state["base"]
        self._resolved = None
        self._dir_ensured = False
        self.last_list_error = None

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
        recursion); empty when the directory doesn't exist yet. A
        listing FAILURE also returns [] (the planner must keep
        running; the reader fail-fasts after three fence-less
        batches) but is recorded in ``last_list_error`` so that
        fail-fast can report the real cause."""
        from pyarrow import fs as pafs

        fs, root = self._resolve()
        try:
            infos = fs.get_file_info(
                pafs.FileSelector(root, recursive=False, allow_not_found=True)
            )
        except Exception as e:  # remembered, surfaced by the guard
            self.last_list_error = e
            return []
        self.last_list_error = None
        return [
            i.base_name for i in infos if i.type == pafs.FileType.File
        ]

    def read_json(self, name: str) -> dict | None:
        """Parsed fence; None ONLY when the fence is absent or torn
        (half-written JSON under crash) — the states the replay
        protocol is designed to retry through. Any other I/O failure
        propagates: a retried task that treated an auth/network error
        as 'no fence' would silently re-poll past the window its
        first attempt already fenced (r6 review)."""
        fs, root = self._resolve()
        try:
            with fs.open_input_stream(f"{root}/{name}") as f:
                raw = f.read()
        except FileNotFoundError:
            return None
        except OSError as e:
            # pyarrow maps missing object-store keys to OSError with a
            # recognizable message; real transport errors re-raise
            if _is_not_found(e):
                return None
            raise
        try:
            return json.loads(raw.decode("utf-8"))
        except (ValueError, UnicodeDecodeError):
            return None  # torn fence: skip until next trigger

    def write_json(self, name: str, obj: dict) -> None:
        fs, root = self._resolve()
        payload = json.dumps(obj).encode("utf-8")
        if not self._dir_ensured:
            # once per process, not per fence write: on object stores
            # every create_dir is a round trip on the hot path
            fs.create_dir(root, recursive=True)
            self._dir_ensured = True
        final = f"{root}/{name}"
        if self._is_local(fs):
            # tmp + rename: POSIX-atomic, no torn reads. pid+uuid so
            # duplicate attempts on a shared FS never share a tmp path
            tmp = f"{final}.tmp-{os.getpid()}-{uuidlib.uuid4().hex[:8]}"
            with fs.open_output_stream(tmp) as f:
                f.write(payload)
            fs.move(tmp, final)
        else:
            # object stores publish whole objects atomically
            with fs.open_output_stream(final) as f:
                f.write(payload)

    def delete(self, name: str) -> None:
        """Idempotent for ALREADY-GONE files only; an access-denied or
        transport failure propagates — silently un-pruned fences grow
        the dir (and every trigger's listing) without bound."""
        fs, root = self._resolve()
        try:
            fs.delete_file(f"{root}/{name}")
        except FileNotFoundError:
            pass  # already gone / concurrent prune: idempotent
        except OSError as e:
            if _is_not_found(e):
                return
            raise

    def delete_all(self) -> None:
        fs, root = self._resolve()
        try:
            fs.delete_dir(root)
        except FileNotFoundError:
            pass
        except OSError as e:
            if _is_not_found(e):
                return
            raise
