"""Small-file filesystem abstraction for commit manifests and the
registry.

The reference supports local, GCS and S3 registry stores
(sdk/python/feast/registry.py:503-611: LocalRegistryStore /
GCSRegistryStore / S3RegistryStore, one class per SDK).  Spark-native
design: ONE remote implementation over the Hadoop ``FileSystem`` API the
cluster already ships — the same connectors Spark itself reads data
through — so every scheme the deployment can read (``hdfs://``,
``s3a://``, ``gs://``, ``abfss://``, ``file://``) works without extra
Python SDKs.  ``LocalFS`` is the pure-Python twin for driverless tools
and tests.

These handle ONLY small control-plane objects (manifests, registry
JSON); bulk data always moves through Spark readers/writers.
"""

from __future__ import annotations

import os
import uuid


class StoreFS:
    """Contract: byte-level ops on small control files.

    ``write_bytes_atomic`` must never expose a partially written object
    to readers: local/HDFS implementations write a temp file and rename;
    object stores satisfy it natively (single-object PUT is all-or-
    nothing on S3/GCS/ABFS).
    """

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def write_bytes_atomic(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def list_subdirs(self, path: str) -> list[str]:
        raise NotImplementedError

    def list_files(self, path: str) -> list[str]:
        """Names of the plain files directly under ``path`` ([] if the
        directory does not exist).  Lets driver-side code read a tiny
        Spark-written parquet dir (e.g. IVF centroids: C rows) without
        paying a Spark job for it."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def mkdirs(self, path: str) -> None:
        raise NotImplementedError

    def cache_token(self) -> str:
        """Cheap identity folded into control-plane cache keys
        (``io/model_cache.py``) so two DIFFERENT StoreFS backends
        serving the same path STRING cannot alias each other's
        entries.  Class name is enough in practice: remote paths carry
        their scheme+bucket in the string itself (``s3a://bucket/..``),
        so only a cross-BACKEND collision is possible."""
        return type(self).__name__

    def lock(self, path: str):
        """Best-effort mutual exclusion around a read-check-write of the
        control file at ``path`` (``io/epochs.commit_manifest``'s CAS).
        Default: a no-op context manager — on object stores the
        check+PUT window is narrowed but not closed (a real deployment
        maps the check to a conditional put: S3 If-Match, GCS
        ifGenerationMatch — see SCALE.md); LocalFS closes it with an
        OS advisory lock, making same-host interleaved commits strictly
        serialized."""
        import contextlib

        return contextlib.nullcontext()


class LocalFS(StoreFS):
    """POSIX implementation; atomicity via same-directory ``os.replace``."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def write_bytes_atomic(self, path: str, data: bytes) -> None:
        if os.path.dirname(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def list_subdirs(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return [d for d in os.listdir(path) if os.path.isdir(os.path.join(path, d))]

    def list_files(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return [
            f for f in os.listdir(path) if os.path.isfile(os.path.join(path, f))
        ]

    def delete(self, path: str) -> None:
        import shutil

        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def lock(self, path: str):
        """``flock`` on a ``<path>.lock`` sidecar: released on close OR
        process death (no stale-lockfile failure mode), so same-host
        concurrent committers serialize and the CAS in
        ``commit_manifest`` observes a quiescent head."""
        import contextlib
        import fcntl

        @contextlib.contextmanager
        def _flock():
            if os.path.dirname(path):
                os.makedirs(os.path.dirname(path), exist_ok=True)
            fd = os.open(f"{path}.lock", os.O_CREAT | os.O_RDWR, 0o644)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX)
                yield
            finally:
                os.close(fd)  # closing releases the flock

        return _flock()


class HadoopFS(StoreFS):
    """Hadoop ``FileSystem`` implementation via the active session's JVM.

    Accepts any URI the cluster's Hadoop conf can resolve.  Writes go to
    a temp object then ``delete + rename`` — rename is atomic on HDFS;
    on S3A/GCS the connector implements rename as copy+delete, but the
    payloads here are sub-kilobyte manifests where the close() of the
    temp PUT is itself atomic, so the non-atomic window only risks a
    retryable miss, never a torn read.
    """

    def __init__(self, spark):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _jpath(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _jfs(self, path: str):
        return self._jpath(path).getFileSystem(self._conf)

    def exists(self, path: str) -> bool:
        return self._jfs(path).exists(self._jpath(path))

    def read_bytes(self, path: str) -> bytes:
        # py4j passes arrays by value, so FSDataInputStream.readFully
        # cannot fill a Python buffer; commons-io (on every Spark/Hadoop
        # classpath) drains the stream JVM-side and returns byte[]
        stream = self._jfs(path).open(self._jpath(path))
        try:
            return bytes(
                self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()

    def write_bytes_atomic(self, path: str, data: bytes) -> None:
        fs = self._jfs(path)
        target = self._jpath(path)
        tmp = self._jpath(f"{path}.tmp.{uuid.uuid4().hex}")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()
        if fs.exists(target):
            fs.delete(target, False)
        if not fs.rename(tmp, target):
            raise IOError(f"rename {tmp} -> {target} failed")

    def list_subdirs(self, path: str) -> list[str]:
        fs = self._jfs(path)
        p = self._jpath(path)
        if not fs.exists(p):
            return []
        return [
            s.getPath().getName() for s in fs.listStatus(p) if s.isDirectory()
        ]

    def list_files(self, path: str) -> list[str]:
        fs = self._jfs(path)
        p = self._jpath(path)
        if not fs.exists(p):
            return []
        return [s.getPath().getName() for s in fs.listStatus(p) if s.isFile()]

    def delete(self, path: str) -> None:
        fs = self._jfs(path)
        p = self._jpath(path)
        if fs.exists(p):
            fs.delete(p, True)

    def mkdirs(self, path: str) -> None:
        self._jfs(path).mkdirs(self._jpath(path))
