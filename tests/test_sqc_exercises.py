"""Option-exercise tier: every user-facing flag runs end-to-end and
produces a valid result (ref: testsuite/testsuite.sqc level-1
"Option tests" section)."""

import numpy as np
import pytest

from bath_tpu.cli import bathbuild, bathsearch
from bath_tpu.hmmfile import read_hmm, read_hmms

TS = "/root/reference/testsuite"

FASTCAL = ["--EmL", "10", "--EvL", "10", "--EfL", "10"]

BUILD_CASES = [
    ("default", []),
    ("-n", ["-n", "foo"]),
    ("--ct", ["--ct", "11"]),
    ("--hand", ["--hand"]),
    ("--symfrac", ["--symfrac", "1.0"]),
    ("--fragthresh", ["--fragthresh", "0.4"]),
    ("--wpb", ["--wpb"]),
    ("--wgsc", ["--wgsc"]),
    ("--wblosum-wid", ["--wblosum", "--wid", "0.5"]),
    ("--wnone", ["--wnone"]),
    ("--eent", ["--eent"]),
    ("--eentexp", ["--eentexp"]),
    ("--eclust-eid", ["--eclust", "--eid", "0.60"]),
    ("--enone", ["--enone"]),
    ("--eset", ["--eset", "1.0"]),
    ("--ere", ["--eent", "--ere", "0.55"]),
    ("--esigma", ["--eent", "--esigma", "44.0"]),
    ("--pnone", ["--pnone"]),
    ("--plaplace", ["--plaplace"]),
    ("--EmN", ["--EmN", "250"]),
    ("--EvN", ["--EvN", "250"]),
    ("--EfN", ["--EfN", "250"]),
    ("--Eft", ["--Eft", "0.045"]),
    ("--seed", ["--seed", "7"]),
    ("--maxinsertlen", ["--maxinsertlen", "10"]),
    ("--nofs", ["--nofs"]),
    ("--fsprob", ["--fsprob", "0.005"]),
]


@pytest.mark.parametrize("tag,flags",
                         BUILD_CASES, ids=[c[0] for c in BUILD_CASES])
def test_sqc_bathbuild_options(tmp_path, tag, flags):
    out = tmp_path / "m.bhmm"
    rc = bathbuild.main([str(out), f"{TS}/20aa.sto",
                         "-o", str(tmp_path / "log")]
                        + FASTCAL + flags)
    assert rc == 0
    h = read_hmm(str(out))
    assert h.M > 0
    assert np.all(np.isfinite(h.mat[1:]))
    assert np.all(h.mat[1:] >= 0)


def test_sqc_bathbuild_seqfile(tmp_path):
    """Unaligned FASTA input -> one single-seq model per sequence
    (ref: sqc build/seq exercise on globins.fa)."""
    out = tmp_path / "m.bhmm"
    rc = bathbuild.main([str(out), f"{TS}/globins.fa",
                         "-o", str(tmp_path / "log")] + FASTCAL)
    assert rc == 0
    hs = list(read_hmms(str(out)))
    assert len(hs) == 2 and all(h.M > 0 for h in hs)


SEARCH_CASES = [
    ("default", []),
    ("--fs", ["--fs"]),
    ("--fsonly", ["--fsonly"]),
    ("--max", ["--max"]),
    ("--nobias", ["--nobias"]),
    ("--nonull2", ["--nonull2"]),
    ("--noali", ["--noali"]),
    ("--notrans", ["--notrans"]),
    ("--acc", ["--acc"]),
    ("--notextw", ["--notextw"]),
    ("--frameline", ["--fs", "--frameline"]),
    ("--cigar", ["--fs", "--cigar"]),
    ("-E", ["-E", "1e-5"]),
    ("-T", ["-T", "20"]),
    ("-Z", ["-Z", "100"]),
    ("--incE", ["--incE", "1e-5"]),
    ("--incT", ["--incT", "50"]),
    ("--F1F2F3F4", ["--F1", "0.1", "--F2", "0.01", "--F3", "1e-4",
                    "--F4", "1e-3"]),
    ("-l", ["-l", "30"]),
    ("-M", ["-M"]),
    ("--strand-plus", ["--strand", "plus"]),
]


@pytest.mark.parametrize("tag,flags", SEARCH_CASES,
                         ids=[c[0] for c in SEARCH_CASES])
def test_sqc_bathsearch_options(tmp_path, tag, flags):
    out = str(tmp_path / "o.out")
    tbl = str(tmp_path / "o.tbl")
    rc = bathsearch.run(["-o", out, "--tblout", tbl]
                        + flags
                        + [f"{TS}/2OG-FeII_Oxy_3.bhmm",
                           f"{TS}/2OG-FeII_Oxy_3-nt.fa"])
    assert rc == 0
    body = open(out).read()
    assert "[ok]" in body
    rows = [ln for ln in open(tbl) if not ln.startswith("#")]
    # the 10 family nt seqs are strong hits under any option subset
    # except thresholds that restrict reporting
    if tag not in ("-T", "--incT", "-E"):
        assert len(rows) >= 5, body[-2000:]


def test_sqc_bathsearch_msa_query(tmp_path):
    """Multi-MSA Stockholm query (2 globin MSAs) vs the 45-seq nt DB
    (ref: sqc bathsearch/msa exercise)."""
    out = str(tmp_path / "o.out")
    rc = bathsearch.run(["-o", out, f"{TS}/globins4_2.sto",
                         f"{TS}/globins45-nt.fa"])
    assert rc == 0
    body = open(out).read()
    assert body.count("Query:") == 2
    assert body.count("[ok]") == 1


def test_sqc_bathsearch_seq_query(tmp_path):
    """Unaligned protein FASTA query (2 seqs -> 2 single-seq models)
    (ref: sqc bathsearch/seq exercise)."""
    out = str(tmp_path / "o.out")
    rc = bathsearch.run(["-o", out, f"{TS}/globins.fa",
                         f"{TS}/globins45-nt.fa"])
    assert rc == 0
    body = open(out).read()
    assert body.count("Query:") == 2
