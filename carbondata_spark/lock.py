"""Single-writer file lock for manifest commits.

Reference parity: the reference guards metadata/load operations with
LocalFileLock / HdfsFileLock / ZooKeeperLocking
(core/src/main/java/org/carbondata/core/locks/, used from
cubeSchema.scala:1816-1827). In the rebuild a local O_EXCL lock file plus
atomic manifest rename is sufficient: cluster deployments would swap this
for a storage-native conditional-put, but the commit protocol (take lock →
read manifest → write tmp → atomic replace → release) stays identical.
"""

from __future__ import annotations

import contextlib
import os
import time


class LockTimeout(Exception):
    pass


def _lock_is_stale(lock_path: str, stale_s: float) -> bool:
    """A lock is stale when its holder pid is dead, or the file is older
    than ``stale_s`` (holder on another host / unreadable pid). Mirrors
    the reference's recoverable-lock behavior: a crashed loader must not
    wedge every subsequent manifest commit."""
    try:
        with open(lock_path) as f:
            pid = int(f.read().strip() or "0")
    except (OSError, ValueError):
        pid = 0
    if pid > 0:
        try:
            os.kill(pid, 0)  # signal 0: existence probe only
        except ProcessLookupError:
            return True
        except PermissionError:
            pass  # alive, owned by another user
        else:
            return False  # holder alive
    try:
        return time.time() - os.path.getmtime(lock_path) > stale_s
    except OSError:
        return False  # vanished — normal release race, retry acquisition


@contextlib.contextmanager
def file_lock(path: str, timeout_s: float = 60.0, poll_s: float = 0.05, stale_s: float = 300.0):
    """Acquire ``path``.lock exclusively; blocks up to ``timeout_s``.

    Crash recovery: if the lock file's recorded pid is no longer alive
    (or the file is older than ``stale_s``), the lock is broken and
    re-contended — a process that died mid-commit cannot permanently
    block the table (the manifest itself stays consistent because writes
    are atomic renames).
    """
    lock_path = path + ".lock"
    deadline = time.monotonic() + timeout_s
    fd = None
    while True:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            break
        except FileExistsError:
            if _lock_is_stale(lock_path, stale_s):
                with contextlib.suppress(FileNotFoundError):
                    os.remove(lock_path)
                continue  # re-contend immediately (O_EXCL arbitrates)
            if time.monotonic() > deadline:
                raise LockTimeout(f"could not acquire {lock_path} within {timeout_s}s")
            time.sleep(poll_s)
    try:
        yield
    finally:
        if fd is not None:
            os.close(fd)
        with contextlib.suppress(FileNotFoundError):
            os.remove(lock_path)
