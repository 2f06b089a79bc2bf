"""Filesystem sandbox for paths parsed out of SLT text.

The SLT corpus is untrusted input: a statement can declare any
``fs:///path/`` location, and the harness (re)creates/cleans such
locations with ``shutil.rmtree``. Without a guard, a test file saying
``fs:///home/`` would recursively delete that directory. Every
harness-side destructive or creating operation on a path that came from
SQL text (or from an error-message regex) must pass through this module.

Policy: the resolved real path must live strictly BELOW one of the
allowed roots — the system temp dir (``/tmp`` on this image, where the
whole reference corpus points), the harness stage root, or the session's
``spark-warehouse`` — never be a root itself, and never escape via
symlinks/``..``.
"""

from __future__ import annotations

import os
import shutil
import tempfile


def _roots() -> list[str]:
    roots = [tempfile.gettempdir(), "/tmp", os.path.abspath("spark-warehouse")]
    return [os.path.realpath(r) for r in roots]


def is_sandboxed(path: str) -> bool:
    """True iff ``path`` resolves strictly below an allowed root."""
    if not path:
        return False
    real = os.path.realpath(path)
    for root in _roots():
        if real != root and real.startswith(root.rstrip(os.sep) + os.sep):
            return True
    return False


def ensure_sandboxed(path: str) -> str:
    """Return the path if sandboxed, else raise (reference-style 2501)."""
    if not is_sandboxed(path):
        raise RuntimeError(
            f"[2501] location {path!r} is outside the allowed local "
            "filesystem sandbox (must be under the temp dir)"
        )
    return path


def safe_rmtree(path: str) -> None:
    """``shutil.rmtree(ignore_errors=True)`` restricted to the sandbox;
    silently a no-op outside it (callers treat cleanup as best-effort)."""
    if is_sandboxed(path):
        shutil.rmtree(path, ignore_errors=True)
