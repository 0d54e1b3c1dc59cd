"""Process-lifetime temp directories for query_defs build caches.

store_q / lifecycle_q build store tables and format dumps once per
(sf_dir, Spark app) and cache the paths in module-level ``_BUILT``
dicts — the driver pays each build once, but the trees used to outlive
the process (ADVICE r10). This registry hands out ``tempfile.mkdtemp``
directories and removes every one at interpreter exit; by then the
JVM is either stopped or no longer reading them, so a plain rmtree is
safe. Callers keep caching the *paths*; only the lifetime is managed
here.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_DIRS: list[str] = []


def mkdtemp(prefix: str) -> str:
    """``tempfile.mkdtemp`` that is rmtree'd at process exit."""
    path = tempfile.mkdtemp(prefix=prefix)
    _DIRS.append(path)
    return path


@atexit.register
def _cleanup() -> None:
    while _DIRS:
        shutil.rmtree(_DIRS.pop(), ignore_errors=True)
