"""Atomic commit + lineage helpers for checkpoint-resumable index builds.

Pattern mirrored from the reference's cache-commit discipline
(lib_core/datamart_core/fscache.py:266-277): write to a temp name in the
same filesystem, then ``os.rename`` (atomic on POSIX). A segment directory
is only visible under its final name once its MANIFEST.json exists, so
resume = "skip any segment whose manifest is committed".
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import threading
import uuid

MANIFEST_NAME = "MANIFEST.json"
INDEX_MANIFEST_NAME = "index.json"
WRITE_LOCK_NAME = ".write.lock"


class _IndexLock:
    __slots__ = ("tlock", "fd", "depth")

    def __init__(self) -> None:
        self.tlock = threading.RLock()
        self.fd: int | None = None
        self.depth = 0


_LOCKS: dict[str, _IndexLock] = {}
_LOCKS_GUARD = threading.Lock()


@contextlib.contextmanager
def index_write_lock(index_dir: str, shared: bool = False):
    """Advisory lock serializing index mutators across threads AND
    processes (the reference guards its shared FS cache the same way:
    lib_core/datamart_core/fscache.py flock discipline). Mutators
    (build/delta/compact/delete/restore) take it exclusive; consistent
    point-in-time copiers (snapshot) take it ``shared`` so they exclude
    compaction's segment-dir deletion without excluding each other.

    Reentrant per thread (tiered_merge → compact_segments); the flock is
    held on ``index_dir/.write.lock`` for the outermost scope only."""
    import fcntl

    key = os.path.realpath(index_dir)
    with _LOCKS_GUARD:
        lk = _LOCKS.setdefault(key, _IndexLock())
    lk.tlock.acquire()
    # acquisition failures (ENOLCK, EMFILE, ENOSPC, …) must leave the
    # depth counter untouched — a decrement-without-increment would go
    # negative and make every LATER scope skip the flock silently
    try:
        if lk.depth == 0:
            os.makedirs(index_dir, exist_ok=True)
            fd = os.open(
                os.path.join(index_dir, WRITE_LOCK_NAME),
                os.O_CREAT | os.O_RDWR,
                0o644,
            )
            try:
                fcntl.flock(
                    fd, fcntl.LOCK_SH if shared else fcntl.LOCK_EX
                )
            except BaseException:
                os.close(fd)
                raise
            lk.fd = fd
        lk.depth += 1
    except BaseException:
        lk.tlock.release()
        raise
    try:
        yield
    finally:
        lk.depth -= 1
        if lk.depth == 0 and lk.fd is not None:
            fcntl.flock(lk.fd, fcntl.LOCK_UN)
            os.close(lk.fd)
            lk.fd = None
        lk.tlock.release()


def current_index_version(index_dir: str) -> int:
    """Monotonic mutation counter carried in index.json (0 = no
    manifest yet). Every committed mutation bumps it, so a reader or
    cache can detect that the active view changed without diffing
    segment listings."""
    idx_path = os.path.join(index_dir, INDEX_MANIFEST_NAME)
    if not os.path.isfile(idx_path):
        return 0
    with open(idx_path) as f:
        return int(json.load(f).get("version", 0))


def write_index_manifest(index_dir: str, obj: dict) -> dict:
    """Atomically publish index.json with the version bumped."""
    obj = dict(obj)
    obj["version"] = current_index_version(index_dir) + 1
    atomic_write_json(
        os.path.join(index_dir, INDEX_MANIFEST_NAME), obj
    )
    return obj


def bump_index_version(index_dir: str) -> int:
    """Republish index.json unchanged except version+1 — for committed
    mutations that don't alter the segment list (tombstone deletes).
    Without the bump, version-keyed caches (search_on_demand's engine
    cache) would keep serving deleted docs forever. No-op (returns 0)
    when no manifest exists yet: nothing can have cached such an index.
    Call under the index write lock."""
    idx_path = os.path.join(index_dir, INDEX_MANIFEST_NAME)
    if not os.path.isfile(idx_path):
        return 0
    with open(idx_path) as f:
        obj = json.load(f)
    obj["version"] = int(obj.get("version", 0)) + 1
    atomic_write_json(idx_path, obj)
    return obj["version"]


def atomic_write_json(path: str, obj: dict) -> None:
    # unique tmp suffix: two processes writing the same target (e.g.
    # the phrase-df sidecar from two engines) must not truncate each
    # other's in-flight tmp or race the rename. Stale tmps from
    # crashed writers are swept best-effort (age-gated so a LIVE
    # concurrent writer's in-flight tmp is never unlinked).
    import glob as _glob
    import time as _time

    for stale in _glob.glob(f"{path}.tmp.*"):
        try:
            if _time.time() - os.path.getmtime(stale) > 600:
                os.unlink(stale)
        except OSError:
            pass
    tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:6]}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = path + ".tmp." + str(os.getpid())
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def commit_segment_dir(tmp_dir: str, final_dir: str) -> None:
    """Atomically promote a fully-built temp segment dir to its final name."""
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.rename(tmp_dir, final_dir)


def segment_is_committed(seg_dir: str) -> bool:
    return os.path.isfile(os.path.join(seg_dir, MANIFEST_NAME))


def read_manifest(seg_dir: str) -> dict:
    with open(os.path.join(seg_dir, MANIFEST_NAME)) as f:
        return json.load(f)


def list_committed_segments(index_dir: str) -> list[str]:
    seg_root = os.path.join(index_dir, "segments")
    if not os.path.isdir(seg_root):
        return []
    out = []
    for name in sorted(os.listdir(seg_root)):
        seg = os.path.join(seg_root, name)
        if name.startswith("seg-") and segment_is_committed(seg):
            out.append(seg)
    return out


def active_segments(index_dir: str) -> list[str]:
    """Committed segment dirs that index.json lists as active.

    index.json is the authority once it exists: compaction commits its
    merged segment under a FRESH name, repoints index.json at it, and only
    then deletes the superseded dirs — so a crash mid-swap leaves either
    (old dirs active, new dir orphaned) or (new dir active, old dirs
    orphaned), never a duplicate-doc view. Falls back to the plain
    directory scan when index.json is absent or stale (e.g. a build that
    crashed before writing it)."""
    committed = list_committed_segments(index_dir)
    idx_path = os.path.join(index_dir, INDEX_MANIFEST_NAME)
    if os.path.isfile(idx_path):
        with open(idx_path) as f:
            names = set(json.load(f).get("segments", []))
        active = [d for d in committed if os.path.basename(d) in names]
        if active:
            return active
    return committed
