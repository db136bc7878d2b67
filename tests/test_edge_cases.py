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


def test_hmmer2_format_read(tmp_path):
    """HMMER2.0 ASCII models parse through the format-autodetect
    chain, convert to H3 semantics (renormalized, bg inserts,
    calibrated) and flow through bathconvert
    (ref: p7_hmmfile.c read_asc20hmm :1816)."""
    import subprocess
    import sys

    import numpy as np

    h2 = (
        "HMMER2.0  [2.3.2]\n"
        "NAME  mini2\nACC   T2ACC\nDESC  tiny hmmer2 model\n"
        "LENG  3\nALPH  Amino\nRF    no\nCS    no\nMAP   no\n"
        "NSEQ  5\nGA    10.0 8.0\n"
        "NULE  " + "  ".join(["0"] * 20) + "\n"
        "HMM        A      C      D      E      F      G      H      "
        "I      K      L      M      N      P      Q      R      S"
        "      T      V      W      Y\n"
        "         m->m   m->i   m->d   i->m   i->i   d->m   d->d   "
        "b->m   m->e\n"
        "           0      *  -1000\n"
        "     1   2000  " + "  ".join(["-500"] * 19) + "\n"
        "     -   " + "  ".join(["0"] * 20) + "\n"
        "     -   -100  -2000  -3000  -100  -5000  -100  -2000      "
        "0     -1\n"
        "     2   -500   2000  " + "  ".join(["-500"] * 18) + "\n"
        "     -   " + "  ".join(["0"] * 20) + "\n"
        "     -   -100  -2000  -3000  -100  -5000  -100  -2000      "
        "0     -1\n"
        "     3   -500   -500   2000  " + "  ".join(["-500"] * 17)
        + "\n"
        "     -   " + "  ".join(["0"] * 20) + "\n"
        "     -      *      *      *      *      *      *      *"
        "      0      0\n"
        "//\n")
    src = tmp_path / "mini2.hmm"
    src.write_text(h2)
    from bath_tpu.hmmfile import read_hmm
    h = read_hmm(str(src))
    assert h.M == 3 and h.name == "mini2" and h.acc == "T2ACC"
    # consensus residues A, C, D; rows renormalized; calibrated
    assert [int(np.argmax(h.mat[k])) for k in (1, 2, 3)] == [0, 1, 2]
    for k in range(h.M + 1):
        assert abs(h.t[k, 0] + h.t[k, 1] + h.t[k, 2] - 1.0) < 1e-5
    assert h.evparam[1] != 0.0      # MSV lambda set by calibration
    assert h.cutoff[0] == 10.0 and h.cutoff[1] == 8.0
    # flows through bathconvert to BATH3/f
    out = tmp_path / "mini2.bhmm"
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathconvert", str(out),
         str(src)], capture_output=True, text=True, timeout=600,
        cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.read_text().startswith("BATH3/f")


def test_empty_target_clean_error(tmp_path):
    """An empty target database fails with a clean message, not a
    traceback (ref: bathsearch.c:642 p7_Fail on eslEFORMAT)."""
    import subprocess
    import sys
    fa = tmp_path / "empty.fa"
    fa.write_text("")
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch",
         "-o", "/dev/null",
         "/root/reference/tutorial/AMP_N.bhmm", str(fa)],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode == 1
    assert "Traceback" not in r.stderr
    assert "empty or misformatted" in r.stderr


def test_corrupt_hmm_clean_errors(tmp_path):
    """Truncated/corrupt HMM files fail with clean one-line errors
    across the tools, never tracebacks."""
    import subprocess
    import sys
    full = open("/root/reference/tutorial/AMP_N.bhmm").read()
    cases = {"trunc": full[:200], "half": full[:len(full) // 2],
             "noslash": full.replace("//", "")}
    for name, content in cases.items():
        p = tmp_path / f"{name}.bhmm"
        p.write_text(content)
        r = subprocess.run(
            [sys.executable, "-m", "bath_tpu.cli.bathsearch",
             "-o", "/dev/null", str(p),
             "/root/reference/tutorial/target-AMP_N.fa"],
            capture_output=True, text=True, timeout=600,
            cwd="/root/repo")
        assert r.returncode == 1, name
        assert "Traceback" not in r.stderr, (name, r.stderr[-500:])


def test_gzip_inputs(tmp_path):
    """Gzip-compressed query/target/MSA files read transparently (the
    reference pipes .gz through gzip; esl_sqio/p7_hmmfile do_gzip)."""
    import gzip
    import subprocess
    import sys
    hz = tmp_path / "q.bhmm.gz"
    tz = tmp_path / "t.fa.gz"
    hz.write_bytes(gzip.compress(
        open("/root/reference/tutorial/AMP_N.bhmm", "rb").read()))
    tz.write_bytes(gzip.compress(
        open("/root/reference/tutorial/target-AMP_N.fa", "rb").read()))
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch",
         str(hz), str(tz)],
        capture_output=True, text=True, timeout=900, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "47.8" in r.stdout


def test_streaming_windows_identical(tmp_path):
    """The streaming FASTA window reader reproduces the materializing
    loop exactly: coords, context, dsq, and the is_last flag — across
    line wraps, block-boundary sequence ends, and empty records."""
    import random

    import numpy as np

    from bath_tpu.alphabet import dna
    from bath_tpu.sequence import (_windows_of, parse_seqfile,
                                   read_windows)

    abc = dna()
    rng = random.Random(13)
    for trial in range(25):
        text = []
        for s in range(rng.randint(1, 4)):
            L = rng.choice([0, 1, 100, 256, 512, 999, 1000, 3000])
            seq = "".join(rng.choice("ACGTN") for _ in range(L))
            text.append(f">s{s} d{s}\n")
            w = rng.choice([1, 60, 10000])
            for i in range(0, len(seq), w):
                text.append(seq[i:i + w] + "\n")
        path = tmp_path / f"t{trial}.fa"
        path.write_text("".join(text))
        ctx, blk = rng.choice([(0, 256), (10, 100), (402, 1000)])
        got = list(read_windows(str(path), context=ctx,
                                block_length=blk))
        want = []
        for idx, (nm, acc, de, t) in enumerate(
                parse_seqfile(str(path), abc)):
            want.extend(_windows_of(abc, idx, nm, acc, de,
                                    abc.digitize(t), ctx, blk))
        assert len(got) == len(want)
        for (gw, gl), (ww, wl) in zip(got, want):
            assert gl == wl
            assert (gw.name, gw.start, gw.end, gw.W, gw.C,
                    gw.idx) == (ww.name, ww.start, ww.end, ww.W,
                                ww.C, ww.idx)
            assert np.array_equal(gw.dsq, ww.dsq)


def test_streaming_windows_megaline(tmp_path):
    """Single-line (unwrapped) FASTA streams identically — the eager
    body consumption must match the line-based path exactly."""
    import random

    import numpy as np

    from bath_tpu.alphabet import dna
    from bath_tpu.sequence import (_windows_of, parse_seqfile,
                                   read_windows)

    rng = random.Random(3)
    seq = "".join(rng.choice("ACGT") for _ in range(50000))
    p = tmp_path / "mega.fa"
    p.write_text(f">one\n{seq}\n>two x\nACGTACGT\n")
    abc = dna()
    got = list(read_windows(str(p), context=30, block_length=999))
    want = []
    for idx, (nm, acc, de, t) in enumerate(parse_seqfile(str(p),
                                                         abc)):
        want.extend(_windows_of(abc, idx, nm, acc, de,
                                abc.digitize(t), 30, 999))
    assert len(got) == len(want)
    for (gw, gl), (ww, wl) in zip(got, want):
        assert gl == wl and gw.idx == ww.idx
        assert (gw.start, gw.end, gw.W, gw.C) == \
            (ww.start, ww.end, ww.W, ww.C)
        assert np.array_equal(gw.dsq, ww.dsq)


def test_corrupt_ssi_falls_back(tmp_path):
    """A truncated or garbage .ssi next to the target must fall back
    to the streaming offset scan, not crash."""
    import shutil

    from bath_tpu.alphabet import dna
    from bath_tpu.sequence import LazySeqLookup

    fa = tmp_path / "t.fa"
    shutil.copy(f"{TUT}/target-PTHR37536.fa", fa)
    full = open(f"{TUT}/target-PTHR37536.fa.ssi", "rb").read()
    (tmp_path / "t.fa.ssi").write_bytes(full[:100])
    lk = LazySeqLookup(str(fa), dna())
    assert "seq1" in lk and lk["seq1"][2] == 1300
    (tmp_path / "t.fa.ssi").write_bytes(b"garbage")
    lk = LazySeqLookup(str(fa), dna())
    assert "seq1" in lk


def test_lazy_seq_lookup(tmp_path):
    """LazySeqLookup fetches byte-identical dsq/idx/L vs eager
    read_fasta, for plain and gzipped FASTA (the --splice pass uses it
    to avoid holding the whole genome in memory; ref: splice.c
    GetSubSequence via SSI)."""
    import gzip

    import numpy as np

    from bath_tpu.alphabet import dna
    from bath_tpu.sequence import LazySeqLookup, read_fasta

    fa = (">chr1 first\nACGTACGTAC\nGTNNACGT\n"
          ">chr2\nTTTTGGGGCCCCAAAA\n"
          ">chr3 last\nacgt\n")
    p = tmp_path / "db.fa"
    p.write_text(fa)
    pz = tmp_path / "db.fa.gz"
    with gzip.open(pz, "wt") as fh:
        fh.write(fa)

    abc = dna()
    eager = {sq.name: (sq.dsq, si, sq.n)
             for si, sq in enumerate(read_fasta(str(p), abc))}
    for path in (p, pz):
        lazy = LazySeqLookup(str(path), abc, max_cached=2)
        assert "chr2" in lazy and "nope" not in lazy
        # access out of order to exercise the LRU
        for name in ("chr3", "chr1", "chr2", "chr1", "chr3"):
            dsq, si, L = lazy[name]
            edsq, esi, eL = eager[name]
            assert (si, L) == (esi, eL)
            assert np.array_equal(dsq, edsq)
