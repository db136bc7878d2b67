"""Degenerate-input robustness: the tools must handle tiny, empty,
ambiguous and malformed inputs without crashing (the reference's
esl fatal-error discipline: clean message + nonzero exit)."""

import os


from bath_tpu.cli import bathbuild, bathsearch
from bath_tpu.hmmfile import read_hmm

TUT = "/root/reference/tutorial"
HMM = f"{TUT}/AMP_N.bhmm"


def _fa(tmp_path, body, name="t"):
    p = tmp_path / "t.fa"
    p.write_text(f">{name}\n{body}\n")
    return str(p)


def test_target_below_min_window(tmp_path):
    """Targets shorter than 15 nt are skipped, run still succeeds."""
    fa = _fa(tmp_path, "ACGTACGTAC")
    out = tmp_path / "o"
    assert bathsearch.run(["-o", str(out), HMM, fa]) == 0
    assert "[ok]" in out.read_text()


def test_target_all_ambiguous(tmp_path):
    fa = _fa(tmp_path, "N" * 300)
    assert bathsearch.run(["-o", str(tmp_path / "o"), HMM, fa]) == 0


def test_target_lowercase_and_degenerate(tmp_path):
    fa = _fa(tmp_path, "acgtrykmswbdhvn" * 20)
    assert bathsearch.run(["-o", str(tmp_path / "o"), HMM, fa]) == 0


def test_target_all_stop_codons(tmp_path):
    fa = _fa(tmp_path, "TAA" * 100)
    assert bathsearch.run(["-o", str(tmp_path / "o"), HMM, fa]) == 0


def test_empty_record_in_db(tmp_path):
    p = tmp_path / "t.fa"
    p.write_text(">t1\n\n>t2\n" + "ACGT" * 30 + "\n")
    assert bathsearch.run(["-o", str(tmp_path / "o"), HMM,
                           str(p)]) == 0


def test_missing_files_clean_errors(tmp_path, capsys):
    assert bathsearch.run(["-o", os.devnull, HMM,
                           str(tmp_path / "nope.fa")]) == 1
    assert bathsearch.run(["-o", os.devnull,
                           str(tmp_path / "nope.bhmm"),
                           f"{TUT}/target-AMP_N.fa"]) == 1
    assert bathbuild.main([str(tmp_path / "o.bhmm"),
                           str(tmp_path / "nope.sto")]) == 1


def test_single_sequence_msa_builds(tmp_path):
    sto = tmp_path / "one.sto"
    sto.write_text("# STOCKHOLM 1.0\n\nseq1 ACDEFGHIKL\n//\n")
    out = tmp_path / "o.bhmm"
    rc = bathbuild.main([str(out), str(sto),
                         "-o", str(tmp_path / "log")])
    assert rc == 0
    assert read_hmm(str(out)).M == 10


def test_gappy_degenerate_msa_builds(tmp_path):
    sto = tmp_path / "g.sto"
    sto.write_text("# STOCKHOLM 1.0\n\n"
                   "seq1 AC-BX-KL\nseq2 AC-DE-KL\n//\n")
    out = tmp_path / "o.bhmm"
    rc = bathbuild.main([str(out), str(sto),
                         "-o", str(tmp_path / "log")])
    assert rc == 0
    assert read_hmm(str(out)).M > 0
