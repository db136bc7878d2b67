"""Determinism contract (ref: testsuite i2-search-variation.sh): the
same search run twice produces byte-identical output (modulo timing
lines), and --fs output differs from non-fs output."""

import re
import subprocess
import sys

TUT = "/root/reference/tutorial"


def _run(*opts):
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch", *opts,
         f"{TUT}/AMP_N.bhmm", f"{TUT}/target-AMP_N.fa"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    # strip timing lines
    return re.sub(r"# (CPU time|Mc/sec):.*", "", r.stdout)


def test_search_deterministic():
    assert _run() == _run()


def test_fs_deterministic_and_differs():
    a = _run("--fs")
    b = _run("--fs")
    assert a == b
    assert a != _run()
