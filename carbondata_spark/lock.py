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


@contextlib.contextmanager
def file_lock(path: str, timeout_s: float = 60.0, poll_s: float = 0.05):
    """Acquire ``path``.lock exclusively; blocks up to ``timeout_s``."""
    lock_path = path + ".lock"
    deadline = time.monotonic() + timeout_s
    fd = None
    while True:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            break
        except FileExistsError:
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
