"""End-to-end golden-output parity tests against the reference's
committed tutorial outputs (the reference's own integration oracle;
see SURVEY.md section 4)."""

import io
import os
import re
import subprocess
import sys

import pytest

TUT = "/root/reference/tutorial"


def run_bathsearch(args, tmp_path, name):
    out = tmp_path / name
    cmd = [sys.executable, "-m", "bath_tpu.cli.bathsearch",
           "-o", str(out)] + args
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=1200,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    return out.read_text()


def strip_volatile(text, skip_header):
    """Drop header banner, timing lines, and blank-line runs."""
    lines = text.splitlines()
    # find the first 'Query:' line; keep from there
    for i, ln in enumerate(lines):
        if ln.startswith("Query:"):
            lines = lines[i:]
            break
    out = []
    for ln in lines:
        if ln.startswith("# CPU time:") or ln.startswith("# Mc/sec:"):
            continue
        out.append(ln.rstrip())
    # collapse leading/trailing blank runs
    while out and not out[0]:
        out.pop(0)
    return "\n".join(out)


def golden(name):
    return strip_volatile(open(os.path.join(TUT, name)).read(), True)


def normalize_domains_header(text):
    """Two older goldens use an env-from/env-to domain table that the
    current reference source no longer prints; strip those columns so
    both formats compare equal."""
    text = text.replace(
        " hmm-to     ali-from    ali-to     env-from    env-to       sq-len",
        " hmm-to     ali-from    ali-to       sq-len")
    text = text.replace(
        "-------    --------- ---------    --------- ---------    ---------   ----",
        "-------    --------- ---------    ---------   ----")
    text = text.replace(
        "ali-to     env-from    env-to    shifts",
        "ali-to    shifts")
    text = text.replace(
        "--------- ---------    --------- ---------    ------  -----",
        "--------- ---------    ------  -----")
    # hit line: remove the env coords + flags block when present
    def fix_line(m):
        return m.group(1) + m.group(3)
    text = re.sub(
        r"(^ [!?].*?\.\.) +\d+ +\d+ ([\[\.][\]\.])( +\d)",
        lambda m: m.group(1) + m.group(3),
        text, flags=re.M)
    text = re.sub(
        r"(^ [!?].* \d+ +\d+ [\[\.][\]\.]) +\d+ +\d+ [\[\.][\]\.]( +\d)",
        lambda m: m.group(1) + m.group(2),
        text, flags=re.M)
    return text


@pytest.mark.slow
def test_amp_n(tmp_path):
    got = run_bathsearch([f"{TUT}/AMP_N.bhmm", f"{TUT}/target-AMP_N.fa"],
                         tmp_path, "amp.out")
    got = strip_volatile(got, True)
    want = normalize_domains_header(golden("AMP_N.out"))
    got = normalize_domains_header(got)
    assert got == want


@pytest.mark.slow
def test_pth2(tmp_path):
    got = strip_volatile(
        run_bathsearch([f"{TUT}/PTH2.bhmm", f"{TUT}/target-PTH2.fa"],
                       tmp_path, "pth2.out"), True)
    assert got == golden("PTH2.out")


@pytest.mark.slow
def test_amp_n_fs(tmp_path):
    got = strip_volatile(
        run_bathsearch(["--fs", f"{TUT}/AMP_N.bhmm",
                        f"{TUT}/target-AMP_N.fa"], tmp_path, "ampfs.out"),
        True)
    assert got == golden("AMP_N-fs.out")


@pytest.mark.slow
def test_met_ct4_two_queries(tmp_path):
    got = run_bathsearch(["--ct", "4", f"{TUT}/MET-ct4.bhmm",
                          f"{TUT}/target-MET.fa"], tmp_path, "met.out")
    got = normalize_domains_header(strip_volatile(got, True))
    want = normalize_domains_header(golden("MET-ct4.out"))
    # golden has two records; compare record-wise ignoring the
    # second record's Query header positioning
    assert got.count("//") == want.count("//") == 2
    for g, w in zip(got.split("//"), want.split("//")):
        g = "\n".join(l for l in g.splitlines()
                      if not l.startswith("Query:")
                      and not l.startswith("Description:")).strip()
        w = "\n".join(l for l in w.splitlines()
                      if not l.startswith("Query:")
                      and not l.startswith("Description:")).strip()
        assert g == w


@pytest.mark.slow
def test_pth2_tbl_cigar(tmp_path):
    out = tmp_path / "p.out"
    tbl = tmp_path / "p.tbl"
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch",
         "-o", str(out), "--tblout", str(tbl), "--cigar",
         f"{TUT}/PTH2.bhmm", f"{TUT}/target-PTH2.fa"],
        capture_output=True, text=True, timeout=1200, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    got = [l for l in tbl.read_text().splitlines()
           if not l.startswith("#") or l.startswith("#-") or
           l.startswith("# hit")]
    want = [l for l in open(f"{TUT}/PTH2.tbl").read().splitlines()
            if not l.startswith("#") or l.startswith("#-") or
            l.startswith("# hit")]
    assert got == want


@pytest.mark.slow
def test_amp_n_frameline(tmp_path):
    ours = run_bathsearch(
        ["--fs", "--frameline", f"{TUT}/AMP_N.bhmm",
         f"{TUT}/target-AMP_N.fa"], tmp_path, "frameline.out")
    a = strip_volatile(ours, True)
    b = golden("AMP_N-frameline.out")
    # alignment block must match byte-for-byte
    amine = a[a.index("Alignment:"):a.index("Internal")]
    bmine = b[b.index("Alignment:"):b.index("Internal")]
    assert amine == bmine


@pytest.mark.slow
def test_pthr37536_nonsplice(tmp_path):
    """Byte-compare against the committed regression golden (the
    reference tutorial ships only the --splice run for PTHR37536, so
    this run is pinned to our own verified snapshot: 2 hits at
    119-478 / 977-1159, matching the splice golden's anchors)."""
    ours = run_bathsearch(
        [f"{TUT}/PTHR37536.bhmm", f"{TUT}/target-PTHR37536.fa"],
        tmp_path, "pthr.out")
    want = open(os.path.join(os.path.dirname(__file__), "data",
                             "PTHR37536-nonsplice.golden.out")).read()
    assert strip_volatile(ours, True) == strip_volatile(want, True)


def test_amp_n_fs_tbl_cigar(tmp_path):
    """--fs --cigar tabular vs golden AMP_N-fs.tbl: frameshift CIGAR
    with F (+1nt) / B (-1nt) ops, PID, shift/stop counts byte-exact."""
    out = tmp_path / "f.out"
    tbl = tmp_path / "f.tbl"
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch", "--fs",
         "-o", str(out), "--tblout", str(tbl), "--cigar",
         f"{TUT}/AMP_N.bhmm", f"{TUT}/target-AMP_N.fa"],
        capture_output=True, text=True, timeout=1200, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    got = [l for l in tbl.read_text().splitlines()
           if not l.startswith("#") or l.startswith("#-")]
    want = [l for l in open(f"{TUT}/AMP_N-fs.tbl").read().splitlines()
            if not l.startswith("#") or l.startswith("#-")]
    assert got == want
