"""Splicing subsystem: spliced Viterbi self-consistency, synthetic
junction recovery, and end-to-end --splice vs the reference's golden
exon table (ref fixtures: tutorial/PTHR37536.*, testsuite/tmem-258.*)."""

import subprocess
import sys

import numpy as np
import pytest

from bath_tpu.bg import Background
from bath_tpu.codontable import CodonTable
from bath_tpu.gencode import GeneticCode
from bath_tpu.hmmfile import read_hmm
from bath_tpu.profile import profile_config_fs
from bath_tpu.rng import Randomness
from bath_tpu.splice.viterbi_spliced import (T_P, viterbi_spliced,
                                             viterbi_spliced_trace)

TUT = "/root/reference/tutorial"
TS = "/root/reference/testsuite"


@pytest.fixture(scope="module")
def gm1():
    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    bg = Background()
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    return hmm, profile_config_fs(hmm, bg, gcode, 1, 100), gcode


def test_spliced_viterbi_junction_recovery(gm1):
    """Two consensus exons joined by a GT..AG intron: the spliced
    Viterbi must find exactly one P state at the exact junction."""
    hmm, gm, gcode = gm1
    r = Randomness(7)
    ct = CodonTable(gcode)
    aminos = np.argmax(hmm.mat[1:61, :20], axis=1)
    ex1 = ct.reverse_translate(r, aminos[:30])
    ex2 = ct.reverse_translate(r, aminos[30:])
    A, Cn, G, T = 0, 1, 2, 3
    intron = np.concatenate([[G, T], r.sample_iid(np.full(4, 0.25), 46),
                             [A, G]])
    dsq = np.concatenate([ex1, intron, ex2]).astype(np.int32)
    L = len(dsq)
    gx = viterbi_spliced(dsq, gm, 1, L, 1, 60, min_intron=30)
    assert np.isfinite(gx.xC[L])
    tr = viterbi_spliced_trace(dsq, gm, gx, 1, L, 1, 60, min_intron=30)
    ps = [(k, i, c) for s, k, i, c in zip(tr.st, tr.k, tr.i, tr.c)
          if s == T_P]
    assert ps == [(31, 143, 0)]
    # trace score is self-consistent and positive for a perfect match
    assert tr.vitsc > 50


def _run_splice(hmmfile, fafile, extbl=None, tbl=None):
    cmd = [sys.executable, "-m", "bath_tpu.cli.bathsearch", "--splice"]
    if extbl:
        cmd += ["--exontblout", extbl]
    if tbl:
        cmd += ["--tblout", tbl]
    cmd += [hmmfile, fafile]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def _strip_run_meta(text):
    """Drop run-specific lines (banner, paths, timing) before
    byte-comparison against a committed golden."""
    drop = ("# BATH", "# bath_tpu", "# Freely", "# - - -", "# query",
            "# target", "# output", "# per-seq", "# enable",
            "# Program:", "# Version:", "# Pipeline", "# Date:",
            "# Current", "# Option", "# Query file", "# Target file",
            "# CPU time", "# Mc/sec", "# bathsearch")
    return [ln for ln in text.splitlines()
            if not any(ln.startswith(p) for p in drop)]


def test_splice_pthr37536_vs_golden(tmp_path):
    """The tutorial's 4-exon case is byte-exact vs the committed
    goldens: the .out alignment display (exon blocks, split-codon
    R/P/A columns, signal coords), the per-exon table, and the
    per-seq table (PTHR37536.out/.extbl/.tbl)."""
    extbl = str(tmp_path / "our.extbl")
    tbl = str(tmp_path / "our.tbl")
    out = _run_splice(f"{TUT}/PTHR37536.bhmm",
                      f"{TUT}/target-PTHR37536.fa", extbl, tbl)
    want = _strip_run_meta(open(f"{TUT}/PTHR37536.out").read())
    got = _strip_run_meta(out)
    assert got == want
    assert _strip_run_meta(open(extbl).read()) == \
        _strip_run_meta(open(f"{TUT}/PTHR37536.extbl").read())
    assert _strip_run_meta(open(tbl).read()) == \
        _strip_run_meta(open(f"{TUT}/PTHR37536.tbl").read())


def test_splice_tmem258_merges_exons():
    """tmem-258: two separate hits must merge into one 2-exon spliced
    hit covering 1..361 with a large score gain."""
    out = _run_splice(f"{TS}/tmem-258.bhmm", f"{TS}/tmem-258.fa")
    lines = [ln for ln in out.splitlines() if "test_splice" in ln]
    hit_lines = [ln for ln in lines if ln.strip().startswith(
        ("1", "2", "3", "4", "5", "6", "7", "8", "9"))]
    assert any(" 2  " in ln or ln.split()[-2] == "2"
               for ln in hit_lines), out
    # the merged hit spans the whole gene and scores > either part
    assert any(float(ln.split()[1]) > 150 for ln in hit_lines), out


def test_splice_end_extension_recovers_small_exon(tmp_path):
    """A 15-amino first exon (too small to be a reported hit on its
    own) is recovered by the seed-extension machinery
    (ref: p7_splice_ExtendPath / AlignExtendUp)."""
    from bath_tpu.codontable import CodonTable
    from bath_tpu.rng import Randomness

    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    ct = CodonTable(gcode)
    r = Randomness(5)
    cons = np.argmax(hmm.mat[1:, :20], axis=1).astype(np.int32)
    ex0 = ct.reverse_translate(r, cons[:15])
    ex1 = ct.reverse_translate(r, cons[15:])
    A, Cc, G, T = 0, 1, 2, 3
    sym = "ACGT"
    intron = np.concatenate([[G, T], r.sample_iid(np.full(4, 0.25), 80),
                             [A, G]])
    flank = lambda n: r.sample_iid(np.full(4, 0.25), n)
    full = np.concatenate([flank(60), ex0, intron, ex1, flank(60)])
    fa = tmp_path / "ext.fa"
    with open(fa, "w") as f:
        f.write(">ext_test\n")
        s = "".join(sym[x] for x in full)
        for i in range(0, len(s), 60):
            f.write(s[i:i + 60] + "\n")
    out = _run_splice(f"{TUT}/AMP_N.bhmm", str(fa))
    hit = [ln for ln in out.splitlines()
           if "ext_test" in ln and ln.strip()[0].isdigit()]
    assert hit, out
    cols = hit[0].split()
    # spliced hit covers both exons (starts at the tiny exon0) with 2 exons
    assert int(cols[4]) == 61 and int(cols[5]) == 546
    assert cols[6] == "2"


def test_splice_revcomp_strand_symmetry(tmp_path):
    """Splicing the reverse-complemented tmem-258 target yields the
    same 2-exon hit with the same score/E-value and mirrored genomic
    coordinates (minus-strand graph, PathSeq revcomp conventions)."""
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    lines = open(f"{TS}/tmem-258.fa").read().splitlines()
    seq = "".join(l for l in lines if not l.startswith(">"))
    rc = "".join(comp.get(c.upper(), "N") for c in reversed(seq))
    fa = tmp_path / "rc.fa"
    with open(fa, "w") as f:
        f.write(">tmem_rc\n")
        for i in range(0, len(rc), 60):
            f.write(rc[i:i + 60] + "\n")
    fwd = _run_splice(f"{TS}/tmem-258.bhmm", f"{TS}/tmem-258.fa")
    rev = _run_splice(f"{TS}/tmem-258.bhmm", str(fa))

    def hitline(out, name):
        for ln in out.splitlines():
            if name in ln and ln.strip() and ln.strip()[0].isdigit():
                return ln.split()
        raise AssertionError(out)

    hf = hitline(fwd, "test_splice")
    hr = hitline(rev, "tmem_rc")
    assert hf[0:3] == hr[0:3]          # E-value, score, bias identical
    L = len(seq)
    assert int(hr[4]) == L - int(hf[4]) + 1
    assert int(hr[5]) == L - int(hf[5]) + 1
    assert hf[6] == hr[6] == "2"


def test_splice_cigar(tmp_path):
    """--cigar with --splice: nt-unit CIGAR with N records for introns;
    M/I consumption per exon must reconcile with the exon table, and
    split codons contribute their partial lengths across the intron."""
    tbl = str(tmp_path / "c.tbl")
    cmd = [sys.executable, "-m", "bath_tpu.cli.bathsearch", "--splice",
           "--cigar", "--tblout", tbl, "-o", "/dev/null",
           f"{TUT}/PTHR37536.bhmm", f"{TUT}/target-PTHR37536.fa"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    row = [ln for ln in open(tbl) if not ln.startswith("#")][0].split()
    cigar = row[-1]
    assert cigar == ("210M3D66M3I94M85N24M86N38M3I60M3D11M153N"
                     "28M6D21M3D129M3I27M")
    # target-nt consumption (M+I, not D/N) per exon segment matches
    # the golden exon spans 373/24/112/208
    import re
    spans = []
    cons = 0
    for n, op in re.findall(r"(\d+)([MIDN])", cigar):
        if op == "N":
            spans.append(cons)
            cons = 0
        elif op in ("M", "I"):
            cons += int(n)
    spans.append(cons)
    assert spans == [373, 24, 112, 208]


def test_splice_two_genes_same_sequence(tmp_path):
    """Two AMP_N gene copies (each 2 exons) far apart on one sequence
    must produce TWO spliced hits — the graph bounds machinery keeps
    their paths from intertwining (ref: p7_splice.c enforce bounds
    after each accepted path)."""
    from bath_tpu.codontable import CodonTable
    from bath_tpu.rng import Randomness

    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    ct = CodonTable(gcode)
    r = Randomness(3)
    cons = np.argmax(hmm.mat[1:, :20], axis=1).astype(np.int32)
    A, G, T = 0, 2, 3
    sym = "ACGT"

    def gene():
        ex1 = ct.reverse_translate(r, cons[:60])
        ex2 = ct.reverse_translate(r, cons[60:])
        intron = np.concatenate(
            [[G, T], r.sample_iid(np.full(4, 0.25), 90), [A, G]])
        return np.concatenate([ex1, intron, ex2])

    flank = lambda n: r.sample_iid(np.full(4, 0.25), n)
    full = np.concatenate([flank(300), gene(), flank(2000), gene(),
                           flank(300)])
    fa = tmp_path / "two.fa"
    with open(fa, "w") as f:
        f.write(">twogenes\n")
        s = "".join(sym[x] for x in full)
        for i in range(0, len(s), 60):
            f.write(s[i:i + 60] + "\n")
    out = _run_splice(f"{TUT}/AMP_N.bhmm", str(fa))
    hits = [ln.split() for ln in out.splitlines()
            if "twogenes" in ln and ln.strip()
            and ln.strip()[0].isdigit()]
    # two reported spliced hits, both 2-exon, non-overlapping
    assert len(hits) == 2, out
    assert all(h[6] == "2" for h in hits), out
    spans = sorted((int(h[4]), int(h[5])) for h in hits)
    assert spans[0][1] < spans[1][0]


def test_native_trace_matches_python_oracle(monkeypatch):
    """The C spliced-Viterbi traceback returns the identical trace
    (st/k/i/c and bit-equal vitsc) as the Python oracle on every
    trace of a real spliced drive."""
    import bath_tpu.splice.splice as sp
    import bath_tpu.splice.viterbi_spliced as vsm
    from bath_tpu import native as nat

    if nat.get_lib() is None:
        pytest.skip("native library unavailable")
    orig_fn = vsm.viterbi_spliced_trace
    checked = [0]

    def compare(dsq, gm, gx, i_start, i_end, k_start, k_end,
                min_intron=30, signal_scores=vsm.SIGNAL_SCORES):
        nat_exc = py_exc = None
        tr_n = tr_p = None
        try:
            tr_n = orig_fn(dsq, gm, gx, i_start, i_end, k_start,
                           k_end, min_intron, signal_scores)
        except RuntimeError as e:
            nat_exc = e
        saved = nat.spliced_vit_trace_native
        nat.spliced_vit_trace_native = lambda *a, **k: None
        try:
            tr_p = orig_fn(dsq, gm, gx, i_start, i_end, k_start,
                           k_end, min_intron, signal_scores)
        except RuntimeError as e:
            py_exc = e
        finally:
            nat.spliced_vit_trace_native = saved
        assert (tr_n is None) == (tr_p is None), (nat_exc, py_exc)
        if tr_p is not None:
            assert tr_n.st == tr_p.st
            assert tr_n.k == tr_p.k
            assert tr_n.i == tr_p.i
            assert tr_n.c == tr_p.c
            assert tr_n.vitsc == tr_p.vitsc
        checked[0] += 1
        if py_exc is not None:
            raise py_exc
        return tr_p

    monkeypatch.setattr(sp, "viterbi_spliced_trace", compare)
    # in-process drive (subprocess would not see the monkeypatch)
    from bath_tpu.cli.bathsearch import main
    monkeypatch.setattr(sys, "argv",
                        ["bathsearch", "--splice", "-o", "/dev/null",
                         f"{TUT}/PTHR37536.bhmm",
                         f"{TUT}/target-PTHR37536.fa"])
    try:
        main()
    except SystemExit:
        pass
    assert checked[0] >= 1


def test_splice_single_internal_intron():
    """A single hit spanning a short intron splits into two exons
    (ref: p7_splice_SpliceSingle / p7_splice_AlignSingle)."""
    import numpy as np

    from bath_tpu import constants as C
    from bath_tpu.bg import Background
    from bath_tpu.codontable import CodonTable
    from bath_tpu.gencode import GeneticCode
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.profile import profile_config_fs
    from bath_tpu.splice.graph import SpliceGraph, SplicePath
    from bath_tpu.splice.splice import (SpliceConfig, get_sub_sequence,
                                        splice_single)

    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    bg = Background()
    gc = GeneticCode.create(1)
    gc.set_initiator_any()
    gm1 = profile_config_fs(hmm, bg, gc, 1, 100, C.P7_LOCAL)
    ct = CodonTable(gc)
    cons = [int(np.argmax(hmm.mat[k])) for k in range(1, hmm.M + 1)]

    def rt(aminos):
        out = []
        for a in aminos:
            out.extend(int(v) for v in ct.codons[a][0])
        return out

    exon1 = rt(cons[0:40])
    exon2 = rt(cons[40:75])
    intron = [2, 3] + [0] * 46 + [0, 2]          # GT ... AG
    dna = np.array([0] * 30 + exon1 + intron + exon2 + [0] * 30,
                   dtype=np.int32)
    L = len(dna)
    path_seq = get_sub_sequence(dna, 1, L, False)
    sp = SplicePath()
    sp.node_id.append(0)
    sp.extension.append(False)
    sp.iali.append(31)
    sp.jali.append(30 + len(exon1) + len(intron) + len(exon2))
    sp.ihmm.append(1)
    sp.jhmm.append(75)
    sp.aliscore.append(0.0)
    splice_single(SpliceGraph(0, False, "t", L), gm1, sp, path_seq,
                  SpliceConfig())
    assert sp.path_len == 2
    assert (sp.iali, sp.jali) == ([31, 201], [150, 305])
    assert (sp.ihmm, sp.jhmm) == ([1, 41], [40, 75])


def test_full_viterbi_score_matches_trace():
    """fb.viterbi's score equals the score implied by its own trace
    (log-space Viterbi used by the decoding-underflow recovery;
    ref: impl_sse/viterbi.c p7_Viterbi/p7_Viterbi_Trace)."""
    from bath_tpu import constants as C
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.ops.reference import fwdback as fb
    from bath_tpu.profile import profile_config

    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    bg = Background(hmm.abc)
    gm = profile_config(hmm, bg, C.P7_LOCAL)
    om = oprofile_convert(gm)
    rng = np.random.default_rng(42)
    for n in (40, 120):
        dsq = rng.integers(0, 20, size=n).astype(np.int32)
        om.reconfig_unihit(n)
        vx, sc = fb.viterbi(dsq, om)
        tr = fb.viterbi_trace(dsq, om, vx)
        with np.errstate(divide="ignore"):     # log(0) -> -inf is fine
            ltfv = np.log(om.tfv.astype(np.float32))
            lrfv = np.log(om.rfv.astype(np.float32))
            lxf = np.log(om.xf.astype(np.float32))
        s = 0.0
        for z in range(1, tr.N):
            st, k, i = tr.st[z], tr.k[z], tr.i[z]
            pst = tr.st[z - 1]
            if st == C.T_M:
                s += float({C.T_B: ltfv[k - 1, C.P_BM],
                            C.T_M: ltfv[k - 1, C.P_MM],
                            C.T_I: ltfv[k - 1, C.P_IM],
                            C.T_D: ltfv[k - 1, C.P_DM]}[pst])
                s += float(lrfv[int(dsq[i - 1])][k])
            elif st == C.T_I:
                s += float(ltfv[k, C.P_MI if pst == C.T_M else C.P_II])
            elif st == C.T_D:
                s += float(ltfv[k - 1,
                                C.P_MD if pst == C.T_M else C.P_DD])
            elif st == C.T_N and pst == C.T_N:
                s += float(lxf[C.X_N, C.LOOP])
            elif st == C.T_C and pst == C.T_C:
                s += float(lxf[C.X_C, C.LOOP])
            elif st == C.T_C and pst == C.T_E:
                s += float(lxf[C.X_E, C.MOVE])
            elif st == C.T_J and pst == C.T_J:
                s += float(lxf[C.X_J, C.LOOP])
            elif st == C.T_J and pst == C.T_E:
                s += float(lxf[C.X_E, C.LOOP])
            elif st == C.T_B:
                s += float(lxf[C.X_N if pst == C.T_N else C.X_J,
                               C.MOVE])
            elif st == C.T_T:
                s += float(lxf[C.X_C, C.MOVE])
        assert abs(sc - s) < 1e-3
        # Viterbi <= Forward (forward envsc is nats over null-prefix)
        oxf, fsc = fb.forward(dsq, om, full=True)
        assert sc <= fsc + 1e-3


def test_decoding_underflow_recovery(tmp_path, monkeypatch):
    """A decoding RangeError inside the spliced alignment triggers
    the Viterbi fallback + fix_decoding_errors + realign, and the
    drive still completes with a reported hit (ref:
    p7_splice_FixDecodingErrors realign loop)."""
    import bath_tpu.ops.reference.fwdback as fb
    from bath_tpu.cli import bathsearch

    real_decoding = fb.decoding
    calls = {"align": 0, "viterbi": 0}

    def flaky_decoding(om, oxf, oxb):
        frame = sys._getframe(1)
        if frame.f_code.co_filename.endswith("splice/align.py"):
            calls["align"] += 1
            if calls["align"] == 1:
                raise fb.RangeError("injected underflow")
        return real_decoding(om, oxf, oxb)

    real_viterbi = fb.viterbi

    def counting_viterbi(dsq, om):
        calls["viterbi"] += 1
        return real_viterbi(dsq, om)

    monkeypatch.setattr(fb, "decoding", flaky_decoding)
    monkeypatch.setattr(fb, "viterbi", counting_viterbi)

    out = str(tmp_path / "underflow.out")
    rc = bathsearch.run(["--splice", "-o", out,
                         f"{TUT}/PTHR37536.bhmm",
                         f"{TUT}/target-PTHR37536.fa"])
    assert rc == 0
    assert calls["viterbi"] >= 1          # fallback exercised
    # PTHR37536's path is [anchor, tmp, tmp, anchor]; cutting at the
    # weakest exon leaves a single-step path, so the reference (and
    # we) kill the path rather than realign — the drive must still
    # complete cleanly with the un-spliced hits reported
    text = open(out).read()
    assert "[ok]" in text
    assert "Scores for complete hits" in text


def test_fix_decoding_errors_branches():
    """Unit-test the path-trimming branches of fix_decoding_errors
    (ref: p7_splice_FixDecodingErrors p7_splice.c:3397)."""
    from types import SimpleNamespace as NS

    from bath_tpu.splice.graph import SplicePath
    from bath_tpu.splice.pipeline import fix_decoding_errors

    def mkgraph(coords, anchor_N):
        hits = [NS(dcl=[NS(iali=a, jali=b, ihmm=c, jhmm=d)])
                for a, b, c, d in coords]
        return NS(hits=hits, anchor_N=anchor_N)

    def mkpath(node_id, iali, jali, ihmm, jhmm):
        n = len(node_id)
        return SplicePath(node_id=list(node_id),
                          extension=[False] * n,
                          iali=list(iali), jali=list(jali),
                          ihmm=list(ihmm), jhmm=list(jhmm),
                          aliscore=[0.0] * n)

    def mkres(scores, exon_cnt=None, iali=0, jali=0, ihmm=0, jhmm=0):
        exons = [NS(score=s) for s in scores]
        return NS(exons=exons, exon_cnt=exon_cnt or len(scores),
                  iali=iali, jali=jali, ihmm=ihmm, jhmm=jhmm)

    # --- weakest-exon branch, cut in the middle: truncate to
    # min_idx, strip trailing tmp nodes, realign -------------------
    g = mkgraph([(100, 200, 1, 20), (300, 400, 30, 50),
                 (500, 600, 60, 80), (700, 800, 85, 99)], anchor_N=4)
    p = mkpath([0, 1, 2, 3], [100, 300, 500, 700],
               [200, 400, 600, 800], [1, 30, 60, 85],
               [20, 50, 80, 99])
    assert fix_decoding_errors(g, p, mkres([50.0, 40.0, 2.0, 30.0]),
                               None) is True
    assert p.node_id == [0, 1]            # cut at exon 2
    assert p.jali[-1] == 400 and p.jhmm[-1] == 50   # from node 1's hit

    # --- weakest exon first: drop the front; NaN counts as the
    # weakest (underflow catch) -------------------------------------
    g2 = mkgraph([(100, 200, 1, 20), (300, 400, 30, 50),
                  (500, 600, 60, 80)], anchor_N=3)
    p2 = mkpath([0, 1, 2], [100, 300, 500], [200, 400, 600],
                [1, 30, 60], [20, 50, 80])
    assert fix_decoding_errors(
        g2, p2, mkres([float("nan"), 40.0, 30.0]), None) is True
    assert p2.node_id == [1, 2]
    assert p2.iali[0] == 300 and p2.ihmm[0] == 30   # from node 1's hit

    # --- weakest exon first but the next node is temporary: the
    # tmp-skip leaves a single step, so the path dies ---------------
    g2b = mkgraph([(100, 200, 1, 20), (300, 400, 30, 50),
                   (500, 600, 60, 80)], anchor_N=2)
    p2b = mkpath([0, 2, 1], [100, 500, 300], [200, 600, 400],
                 [1, 60, 30], [20, 80, 99])
    assert fix_decoding_errors(
        g2b, p2b, mkres([float("nan"), 40.0, 30.0]), None) is False

    # --- alignment dropped trailing exons (path_len > exon_cnt) ---
    g3 = mkgraph([(100, 200, 1, 20), (300, 400, 30, 50),
                  (500, 600, 60, 80)], anchor_N=3)
    p3 = mkpath([0, 1, 2], [100, 300, 500], [200, 400, 600],
                [1, 30, 60], [20, 50, 80])
    res3 = mkres([50.0, 40.0], exon_cnt=2, iali=120, jali=380,
                 ihmm=5, jhmm=45)
    assert fix_decoding_errors(g3, p3, res3, None) is True
    assert p3.node_id == [0, 1]
    assert p3.iali[0] == 100 and p3.jali[-1] == 400   # reset from hits

    # --- dead path: 2 exons, any cut leaves a single step ---------
    g4 = mkgraph([(100, 200, 1, 20), (300, 400, 30, 50)], anchor_N=2)
    p4 = mkpath([0, 1], [100, 300], [200, 400], [1, 30], [20, 50])
    assert fix_decoding_errors(g4, p4, mkres([5.0, 50.0]),
                               None) is False


def _four_exon_fixture(tmp_path):
    """AMP_N consensus split into 4 exons (3 GT..AG introns); each
    exon is a strong independent hit, so the splice graph gets 4
    anchor nodes."""
    from bath_tpu.codontable import CodonTable
    from bath_tpu.rng import Randomness

    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    ct = CodonTable(gcode)
    r = Randomness(3)
    cons = np.argmax(hmm.mat[1:, :20], axis=1).astype(np.int32)
    A, G, T = 0, 2, 3
    sym = "ACGT"
    bounds = [0, 40, 80, 115, len(cons)]
    parts = []
    for i in range(4):
        parts.append(ct.reverse_translate(
            r, cons[bounds[i]:bounds[i + 1]]))
        if i < 3:
            parts.append(np.concatenate(
                [[G, T], r.sample_iid(np.full(4, 0.25), 90), [A, G]]))
    flank = lambda n: r.sample_iid(np.full(4, 0.25), n)
    full = np.concatenate([flank(300)] + parts + [flank(300)])
    fa = tmp_path / "fourexon.fa"
    with open(fa, "w") as f:
        f.write(">fourexon\n")
        s = "".join(sym[x] for x in full)
        for i in range(0, len(s), 60):
            f.write(s[i:i + 60] + "\n")
    return str(fa)


def test_decoding_underflow_realign_succeeds(tmp_path, monkeypatch):
    """With anchors on both sides of the weakest exon, the underflow
    recovery trims the path and the REALIGNED spliced hit is
    reported (the eslEINACCURATE recursion of AlignSplicedPath,
    ref p7_splice.c:2736)."""
    import bath_tpu.ops.reference.fwdback as fb
    from bath_tpu.cli import bathsearch

    fa = _four_exon_fixture(tmp_path)

    # baseline: one 4-exon spliced hit
    out0 = str(tmp_path / "base.out")
    assert bathsearch.run(["--splice", "-o", out0,
                           f"{TUT}/AMP_N.bhmm", fa]) == 0
    hits0 = [ln.split() for ln in open(out0)
             if "fourexon" in ln and ln.strip()
             and ln.strip()[0].isdigit()]
    assert len(hits0) == 1 and hits0[0][6] == "4", hits0

    real_decoding = fb.decoding
    calls = {"align": 0}

    def flaky_decoding(om, oxf, oxb):
        if sys._getframe(1).f_code.co_filename.endswith(
                "splice/align.py"):
            calls["align"] += 1
            if calls["align"] == 1:
                raise fb.RangeError("injected underflow")
        return real_decoding(om, oxf, oxb)

    monkeypatch.setattr(fb, "decoding", flaky_decoding)
    out1 = str(tmp_path / "realign.out")
    assert bathsearch.run(["--splice", "-o", out1,
                           f"{TUT}/AMP_N.bhmm", fa]) == 0
    assert calls["align"] >= 2          # the realign happened
    hits1 = [ln.split() for ln in open(out1)
             if "fourexon" in ln and ln.strip()
             and ln.strip()[0].isdigit()]
    # weakest (last) exon cut: a 3-exon spliced hit plus the dropped
    # exon reported on its own
    exon_counts = sorted(h[6] for h in hits1)
    assert "3" in exon_counts, hits1
    assert len(hits1) == 2, hits1


def test_splice_jax_backend_byte_identical():
    """--splice under the device cascade (--backend jax; cpu
    platform): the seed windows feeding the splice graph come from
    the device capture paths, so the full spliced output must stay
    byte-identical to the numpy backend on the PTHR37536 golden
    drive."""
    import os
    env = dict(os.environ, BATH_JAX_PLATFORM="cpu")
    outs = {}
    for backend in ("numpy", "jax"):
        r = subprocess.run(
            [sys.executable, "-m", "bath_tpu.cli.bathsearch",
             "--splice", "--backend", backend,
             f"{TUT}/PTHR37536.bhmm", f"{TUT}/target-PTHR37536.fa"],
            capture_output=True, text=True, timeout=900,
            cwd="/root/repo", env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        outs[backend] = _strip_run_meta(r.stdout)
    assert outs["jax"] == outs["numpy"]
