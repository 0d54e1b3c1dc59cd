"""Process-lifetime temp-dir registry (query_defs/_tmpdirs.py): the
ADVICE-r10 fix for store_q/lifecycle_q build caches leaking their trees
past process exit."""

from __future__ import annotations

import os


def test_mkdtemp_registers_and_cleanup_removes(monkeypatch):
    from carbondata_spark.query_defs import _tmpdirs

    # isolate from the suite's own live build caches: _cleanup drains the
    # module-global list, and the real one holds store trees other tests
    # still read through their _BUILT caches
    monkeypatch.setattr(_tmpdirs, "_DIRS", [])
    a = _tmpdirs.mkdtemp(prefix="carbondata_tmpdirs_test_")
    b = _tmpdirs.mkdtemp(prefix="carbondata_tmpdirs_test_")
    with open(os.path.join(b, "x"), "w") as f:
        f.write("payload")  # non-empty trees must go too
    assert os.path.isdir(a) and os.path.isdir(b)
    assert _tmpdirs._DIRS == [a, b]
    _tmpdirs._cleanup()
    assert not os.path.exists(a) and not os.path.exists(b)
    assert _tmpdirs._DIRS == []


def test_cleanup_survives_already_removed_dirs(monkeypatch):
    import shutil

    from carbondata_spark.query_defs import _tmpdirs

    monkeypatch.setattr(_tmpdirs, "_DIRS", [])
    a = _tmpdirs.mkdtemp(prefix="carbondata_tmpdirs_test_")
    shutil.rmtree(a)  # someone cleaned up early — exit must not raise
    _tmpdirs._cleanup()
    assert _tmpdirs._DIRS == []


def test_cleanup_fires_at_interpreter_exit():
    """End-to-end: a fresh interpreter that mkdtemp's through the
    registry and exits normally must leave no directory behind — this is
    the atexit wiring itself, not just _cleanup's body."""
    import subprocess
    import sys

    code = (
        "from carbondata_spark.query_defs import _tmpdirs\n"
        "print(_tmpdirs.mkdtemp(prefix='carbondata_tmpdirs_exit_'))\n"
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=repo_root,
        check=True,
    )
    path = out.stdout.strip().splitlines()[-1]
    assert path.startswith("/") and "carbondata_tmpdirs_exit_" in path
    assert not os.path.exists(path)
