"""Shared CLI input plumbing: stdin ('-') spooling.

The reference tools accept '-' for at most one input stream per
invocation (ref: testsuite/i17-stdin.pl contract; bathsearch.c /
bathfetch.c cmdline checks).  Our readers are path-based, so stdin is
spooled to a temp file that lives for the process lifetime.
"""

from __future__ import annotations

import atexit
import os
import shutil
import sys
import tempfile


def spool_stdin(suffix: str = ".in") -> str:
    """Copy stdin to a temp file and return its path."""
    fd, path = tempfile.mkstemp(suffix=suffix, prefix="bath_stdin_")
    with os.fdopen(fd, "w") as fh:
        shutil.copyfileobj(sys.stdin, fh)
    atexit.register(lambda p=path: os.path.exists(p) and os.remove(p))
    return path
