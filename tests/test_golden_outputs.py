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
    """Full-file byte parity vs tutorial/AMP_N-frameline.out.  The
    normalizer is applied to the GOLDEN side only: the committed file
    predates the reference's removal of the env-from/env-to domain
    columns, and our frameline hit lines carry two bracket blocks
    (hmm + ali), which the env-stripping regex would over-strip."""
    ours = run_bathsearch(
        ["--fs", "--frameline", f"{TUT}/AMP_N.bhmm",
         f"{TUT}/target-AMP_N.fa"], tmp_path, "frameline.out")
    a = strip_volatile(ours, True)
    b = normalize_domains_header(golden("AMP_N-frameline.out"))
    assert a == b


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


def test_met_plain_default_code(tmp_path):
    """tutorial/MET.out closure.  The committed MET.out is a 6-line
    truncated header from an older reference version: it records
    `--ct 4` with plain MET.bhmm (which the current reference rejects
    at bathsearch.c:759 — codon-table mismatch) and a
    '# frameshift probability' header line no current source prints.
    What IS reproducible: (a) the header lines the current format
    shares with the golden must match byte-for-byte in label text and
    column width; (b) the full plain-MET.bhmm default-code run,
    pinned against our verified snapshot (byte-identical across the
    numpy and jax backends, checked when pinned)."""
    out = tmp_path / "met_plain.out"
    env = dict(os.environ, BATH_BACKEND="numpy")
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch",
         "-o", str(out), f"{TUT}/MET.bhmm", f"{TUT}/target-MET.fa"],
        capture_output=True, text=True, timeout=1200,
        cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    text = out.read_text()
    # (a) shared header lines: same labels, value at column 49
    def value_col(line, label):
        val = line[len(label):]
        return len(label) + (len(val) - len(val.lstrip()))
    for label in ("# query HMM file:", "# target sequence database:",
                  "# codon translation table:"):
        ln_gold = next(l for l in open(f"{TUT}/MET.out")
                       if l.startswith(label))
        ln_ours = next(l for l in text.splitlines()
                       if l.startswith(label))
        assert value_col(ln_gold, label) == 49 \
            == value_col(ln_ours, label), (ln_gold, ln_ours)
    # (b) full-file byte parity vs the pinned snapshot
    want = open(os.path.join(os.path.dirname(__file__), "data",
                             "MET-plain.golden.out")).read()
    assert strip_volatile(text, True) == strip_volatile(want, True)


def test_target_gida_smoke(tmp_path):
    """tutorial/target-gidA.fa fixture smoke (the tutorial never
    references it in a command): clean full-pipeline run with correct
    residue accounting, no hits expected for the unrelated
    three_seqs models."""
    out = tmp_path / "gida.out"
    env = dict(os.environ, BATH_BACKEND="numpy")
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch",
         "-o", str(out), f"{TUT}/three_seqs.bhmm",
         f"{TUT}/target-gidA.fa"],
        capture_output=True, text=True, timeout=1200,
        cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    text = out.read_text()
    assert text.count("//") == 3 and text.rstrip().endswith("[ok]")
    nres = sum(len(l.strip()) for l in
               open(f"{TUT}/target-gidA.fa") if not l.startswith(">"))
    assert f"({2 * nres} residues searched)" in text


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
