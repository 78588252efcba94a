"""Process-scoped temp directories with exit-time cleanup.

Staging spools, checkpoints and sink dirs are per-process scratch; they
must not accumulate across driver/bench/test runs."""

from __future__ import annotations

import atexit
import shutil
import tempfile

_CREATED: list[str] = []


def mkdtemp(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix)
    _CREATED.append(d)
    return d


@atexit.register
def _cleanup() -> None:
    for d in _CREATED:
        shutil.rmtree(d, ignore_errors=True)
