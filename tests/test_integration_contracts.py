"""Ports of the reference's integration-test contracts
(ref: testsuite/i1-build-variation.sh, i2-search-variation.sh,
i7-bathbuild-fragments.pl, i8-nonresidues.pl, i10-duplicate-names.pl,
i17-stdin.pl).  The i8 bit scores are the reference's own hard-coded
golden values."""

import subprocess
import sys

import pytest

from bath_tpu.cli import bathbuild, bathfetch, bathsearch, bathstat

TS = "/root/reference/testsuite"
TUT = "/root/reference/tutorial"

FRAG_STO = """# STOCKHOLM 1.0

#=GF ID test

seq1 ACDEFGHIKL------------------------------
seq2 ----------MNPQRSTVWY--------------------
seq3 --------------------ACDEFGHIKL----------
seq4 ------------------------------MNPQRSTVWY
//
"""

STAR1 = ">test1\nGCATGTGACGAGTTTGGCCATATAAAA*TTATGAATCCACAGCGCTCAACT" \
        "GTATGGTAT\n"
STAR2 = ">test2\nGCATGTGACGAGTTTGGCCATATAAAAC*TTATGAATCCACAGCGCTCAAC" \
        "TGTATGGTAT\n"


def _strip(path):
    return [ln for ln in open(path).read().splitlines()
            if not ln.startswith("#") and not ln.startswith("DATE")]


# --- i7: fragment-heavy alignments ----------------------------------
def test_i7_fragment_alignment_builds_full_model(tmp_path):
    sto = tmp_path / "frag.sto"
    sto.write_text(FRAG_STO)
    out = tmp_path / "frag.bhmm"
    rc = bathbuild.main([str(out), str(sto),
                         "-o", str(tmp_path / "log")])
    assert rc == 0
    from bath_tpu.hmmfile import read_hmm
    assert read_hmm(str(out)).M == 40


def test_i7_fragthresh_zero_fails(tmp_path):
    sto = tmp_path / "frag.sto"
    sto.write_text(FRAG_STO)
    out = tmp_path / "frag.bhmm"
    with pytest.raises(Exception):
        rc = bathbuild.main([str(out), str(sto), "--fragthresh", "0.0",
                             "-o", str(tmp_path / "log")])
        assert rc != 0
        raise RuntimeError("nonzero rc")


# --- i1: build reproducibility --------------------------------------
def test_i1_build_determinism_and_seed_variation(tmp_path):
    sto = tmp_path / "frag.sto"
    sto.write_text(FRAG_STO)
    outs = []
    for tag, extra in (("a", []), ("b", []), ("s1", ["--seed", "1"]),
                       ("s2", ["--seed", "2"])):
        f = tmp_path / f"{tag}.bhmm"
        rc = bathbuild.main([str(f), str(sto),
                             "-o", str(tmp_path / "log")] + extra)
        assert rc == 0
        outs.append(f)
    assert _strip(outs[0]) == _strip(outs[1])
    assert _strip(outs[2]) != _strip(outs[3])


# --- i8: '*' nonresidues with the reference's golden scores ---------
def _tbl_scores(path):
    rows = [ln.split() for ln in open(path) if not ln.startswith("#")]
    return [(r[1], float(r[12]), float(r[13])) for r in rows]


def test_i8_nonresidue_star_scores(tmp_path):
    fa1 = tmp_path / "1.fa"
    fa1.write_text(STAR1)
    fa2 = tmp_path / "2.fa"
    fa2.write_text(STAR2)
    hmm = f"{TS}/20aa.bhmm"
    o = str(tmp_path / "out")

    tbl = str(tmp_path / "a.tbl")
    assert bathsearch.run(["--tblout", tbl, "-o", o, hmm,
                           str(fa1)]) == 0
    assert _tbl_scores(tbl) == [("test1", 64.9, 0.1)]

    tbl = str(tmp_path / "b.tbl")
    assert bathsearch.run(["--fsonly", "--tblout", tbl, "-o", o, hmm,
                           str(fa1)]) == 0
    assert _tbl_scores(tbl) == [("test1", 62.2, 0.1)]

    tbl = str(tmp_path / "c.tbl")
    assert bathsearch.run(["-l", "10", "--tblout", tbl, "-o", o, hmm,
                           str(fa2)]) == 0
    assert _tbl_scores(tbl) == [("test2", 27.9, 2.8),
                                ("test2", 24.2, 0.6)]

    tbl = str(tmp_path / "d.tbl")
    assert bathsearch.run(["-l", "10", "--fsonly", "--tblout", tbl,
                           "-o", o, hmm, str(fa2)]) == 0
    assert _tbl_scores(tbl) == [("test2", 56.9, 0.1)]


# --- i10: duplicate model / sequence names --------------------------
def test_i10_duplicate_names(tmp_path):
    sto = tmp_path / "two.sto"
    sto.write_text("""# STOCKHOLM 1.0

seq1 ACDEFGHIKLMNPQRSTVWY
seq2 ACDEFGHIKLMNPQRSTVWY
seq3 ACDEFGHIKLMNPQRSTVWY
//
# STOCKHOLM 1.0

seq1 ACDEFGHIKLLMNPQRSTVWY
seq2 ACDEFGHIKLLMNPQRSTVWY
seq3 ACDEFGHIKLLMNPQRSTVWY
//
""")
    fa = tmp_path / "dup.fa"
    seq = "GCATGTGACGAGTTTGGCCATATAAAACTTATGAATCCACAGCGCTCAACTGT" \
          "ATGGTAT"
    fa.write_text(f">seq\n{seq}\n>seq\n{seq}\n")
    hmms = tmp_path / "two.bhmm"
    rc = bathbuild.main([str(hmms), str(sto),
                         "-o", str(tmp_path / "log")])
    assert rc == 0
    tbl = str(tmp_path / "t.tbl")
    assert bathsearch.run(["--tblout", tbl, "-o", str(tmp_path / "o"),
                           str(hmms), str(fa)]) == 0
    rows = [ln for ln in open(tbl) if not ln.startswith("#")]
    assert len(rows) == 4


# --- i9: optional annotation propagation ----------------------------
def test_i9_annotation_propagation(tmp_path):
    """MSA #=GF ID/AC flow into the query columns; EMBL-format target
    ID/AC/DE flow into the target columns of --tblout
    (ref: i9-optional-annotation.pl)."""
    sto = tmp_path / "two.sto"
    sto.write_text("""# STOCKHOLM 1.0
#=GF ID ali1
#=GF AC XX01234.5
#=GF DE A test description

seq1 ACDEFGHIKLMNPQRSTVWY
seq2 ACDEFGHIKLMNPQRSTVWY
seq3 ACDEFGHIKLMNPQRSTVWY
//
# STOCKHOLM 1.0
#=GF ID ali2

seq1 ACDEFGHIKLMNPQRSTVWY
seq2 ACDEFGHIKLMNPQRSTVWY
seq3 ACDEFGHIKLMNPQRSTVWY
//
""")
    seq = tmp_path / "t.embl"
    dna = "GCATGTGACGAGTTTGGCCATATAAAACTTATGAATCCACAGCGCTCAACT" \
          "GTATGGTAT"
    seq.write_text(f"""ID   test1   STANDARD;  PRT;  20 AA.
AC   AC00001;
DE   Sequence description
SQ   SEQUENCE   20 AA; 99999 MW;  FFFFFFFFFFFFFFFF CRC64;
     {dna}
//
ID   test2   STANDARD;  PRT;  20 AA.
SQ   SEQUENCE   20 AA; 99999 MW;  FFFFFFFFFFFFFFFF CRC64;
     {dna}
//
""")
    hmms = tmp_path / "two.bhmm"
    assert bathbuild.main([str(hmms), str(sto),
                           "-o", str(tmp_path / "log")]) == 0
    tbl = str(tmp_path / "t.tbl")
    assert bathsearch.run(["--tblout", tbl, "-o", str(tmp_path / "o"),
                           str(hmms), str(seq)]) == 0
    rows = [ln.split() for ln in open(tbl) if not ln.startswith("#")]
    assert len(rows) == 4
    assert rows[0][1] == "test1" and rows[0][2] == "AC00001"
    assert rows[0][3] == "ali1" and rows[0][4] == "XX01234.5"
    assert rows[1][1] == "test2" and rows[1][2] == "-"
    assert rows[2][3] == "ali2" and rows[2][4] == "-"
    # description column carries the EMBL DE text
    assert "Sequence description" in " ".join(rows[0])


# --- i17: stdin ('-') plumbing --------------------------------------
def _run(cmd, stdin_file=None):
    fh = open(stdin_file) if stdin_file else subprocess.DEVNULL
    try:
        return subprocess.run(
            [sys.executable, "-m"] + cmd, stdin=fh,
            capture_output=True, text=True, timeout=600,
            cwd="/root/repo")
    finally:
        if stdin_file:
            fh.close()


def _body(text):
    return [ln for ln in text.splitlines() if not ln.startswith("#")]


def test_i17_bathsearch_stdin(tmp_path):
    fa = tmp_path / "t.fa"
    fa.write_text(STAR1)
    hmm = f"{TS}/20aa.bhmm"
    base = _run(["bath_tpu.cli.bathsearch", hmm, str(fa)])
    assert base.returncode == 0
    vq = _run(["bath_tpu.cli.bathsearch", "-", str(fa)],
              stdin_file=hmm)
    assert vq.returncode == 0
    vd = _run(["bath_tpu.cli.bathsearch", hmm, "-"],
              stdin_file=str(fa))
    assert vd.returncode == 0
    assert _body(base.stdout) == _body(vq.stdout)
    assert _body(base.stdout) == _body(vd.stdout)
    bad = _run(["bath_tpu.cli.bathsearch", "-", "-"])
    assert bad.returncode != 0


def test_i17_bathbuild_stdin(tmp_path):
    sto = tmp_path / "frag.sto"
    sto.write_text(FRAG_STO)
    f1 = tmp_path / "f1.bhmm"
    f2 = tmp_path / "f2.bhmm"
    r1 = _run(["bath_tpu.cli.bathbuild", str(f1), str(sto)])
    assert r1.returncode == 0
    r2 = _run(["bath_tpu.cli.bathbuild", "--informat", "stockholm",
               str(f2), "-"], stdin_file=str(sto))
    assert r2.returncode == 0
    assert _strip(f1) == _strip(f2)
    bad = _run(["bath_tpu.cli.bathbuild", "-", str(sto)])
    assert bad.returncode != 0


def test_mxfile_matches_builtin_blosum62(tmp_path):
    """--mxfile with a BLOSUM62 matrix file reproduces the built-in
    --mx BLOSUM62 output exactly; unknown --mx names are rejected
    (ref: bathsearch.c --mx/--mxfile, p7_builder_SetScoreSystem)."""
    from bath_tpu.scorematrix import AA_ORDER, blosum62
    S = blosum62().astype(int)
    mx = tmp_path / "mx.txt"
    with open(mx, "w") as fh:
        fh.write("   " + "  ".join(AA_ORDER) + "\n")
        for i, a in enumerate(AA_ORDER):
            fh.write(a + " " + " ".join("%2d" % v for v in S[i])
                     + "\n")
    q = tmp_path / "q.fa"
    q.write_text(">q20\nACDEFGHIKLMNPQRSTVWY\n")
    t = tmp_path / "t.fa"
    t.write_text(STAR1)
    a = _run(["bath_tpu.cli.bathsearch", str(q), str(t)])
    b = _run(["bath_tpu.cli.bathsearch", "--mxfile", str(mx), str(q),
              str(t)])
    assert a.returncode == 0 and b.returncode == 0
    assert _body(a.stdout) == _body(b.stdout)
    c = _run(["bath_tpu.cli.bathsearch", "--mx", "PAM30", str(q),
              str(t)])
    assert c.returncode != 0


def test_crick_watson_strand_aliases(tmp_path):
    """--crick keeps the plus-strand AMP_N hit; --watson drops it
    (ref: bathsearch.c --crick/--watson hidden aliases)."""
    hmm = f"{TUT}/AMP_N.bhmm"
    fa = f"{TUT}/target-AMP_N.fa"
    a = _run(["bath_tpu.cli.bathsearch", "--crick", hmm, fa])
    b = _run(["bath_tpu.cli.bathsearch", "--watson", hmm, fa])
    assert a.returncode == 0 and b.returncode == 0
    assert "47.8" in a.stdout and "47.8" not in b.stdout


def test_i17_bathfetch_bathstat_stdin(tmp_path):
    hmm = f"{TUT}/tRNA-proteins.bhmm"
    a = _run(["bath_tpu.cli.bathfetch", hmm, "PTH2"])
    b = _run(["bath_tpu.cli.bathfetch", "-", "PTH2"], stdin_file=hmm)
    assert a.returncode == 0 and b.returncode == 0
    assert a.stdout == b.stdout and "PTH2" in a.stdout
    bad = _run(["bath_tpu.cli.bathfetch", "--index", "-"],
               stdin_file=hmm)
    assert bad.returncode != 0
    key = tmp_path / "k"
    key.write_text("PTH2\n")
    c = _run(["bath_tpu.cli.bathfetch", "-f", "-", str(key)],
             stdin_file=hmm)
    assert c.returncode == 0 and c.stdout == a.stdout
    s1 = _run(["bath_tpu.cli.bathstat", hmm])
    s2 = _run(["bath_tpu.cli.bathstat", "-"], stdin_file=hmm)
    assert s1.returncode == 0 and s2.returncode == 0
    assert _body(s1.stdout) == _body(s2.stdout)
