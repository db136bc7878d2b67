"""CLI exercises for bathbuild/bathconvert/bathstat/bathfetch —
the reference's option/CLI test tier (SURVEY.md section 4, tier 2)."""

import os

import numpy as np
import pytest

from bath_tpu import constants as C
from bath_tpu.cli import bathbuild, bathconvert, bathfetch, bathstat
from bath_tpu.hmmfile import read_hmm, read_hmms

TS = "/root/reference/testsuite"
TUT = "/root/reference/tutorial"


def test_bathbuild_matches_golden(tmp_path):
    out = tmp_path / "20aa.bhmm"
    rc = bathbuild.main([str(out), f"{TS}/20aa.sto",
                         "-o", str(tmp_path / "log.txt")])
    assert rc == 0
    ours = read_hmm(str(out))
    golden = read_hmm(f"{TS}/20aa.bhmm")
    assert ours.M == golden.M
    assert abs(ours.eff_nseq - golden.eff_nseq) < 0.01
    assert ours.max_length == golden.max_length
    assert np.abs(ours.mat[1:] - golden.mat[1:]).max() < 1e-4
    assert np.abs(ours.t[1:] - golden.t[1:]).max() < 1e-4
    # calibration within simulation precision
    assert abs(ours.evparam[C.EV_MMU] - golden.evparam[C.EV_MMU]) < 0.5
    assert abs(ours.evparam[C.EV_FTAUFS3]
               - golden.evparam[C.EV_FTAUFS3]) < 0.7


def test_bathbuild_three_seqs_matches_golden(tmp_path):
    """Single-sequence builder vs the committed tutorial golden:
    `bathbuild three_seqs.bhmm three_seqs.fa` (tutorial.md practice 4)
    must reproduce tutorial/three_seqs.bhmm — emissions, transitions
    and max_length exactly, calibration within simulation precision,
    for all three single-seq models (ref: seqmodel.c:48
    p7_SingleBuilder)."""
    out = tmp_path / "three_seqs.bhmm"
    rc = bathbuild.main([str(out), f"{TUT}/three_seqs.fa",
                         "-o", str(tmp_path / "log.txt")])
    assert rc == 0
    ours = read_hmms(str(out))
    golden = read_hmms(f"{TUT}/three_seqs.bhmm")
    assert [h.name for h in ours] == [h.name for h in golden]
    for o, g in zip(ours, golden):
        assert o.M == g.M and o.max_length == g.max_length
        assert np.abs(o.mat[1:] - g.mat[1:]).max() < 1e-6
        assert np.abs(o.t[1:] - g.t[1:]).max() < 1e-6
        assert abs(o.evparam[C.EV_MMU] - g.evparam[C.EV_MMU]) < 0.5
        assert abs(o.evparam[C.EV_FTAUFS3]
                   - g.evparam[C.EV_FTAUFS3]) < 0.7


def test_bathbuild_multi_msa(tmp_path):
    out = tmp_path / "minifam.bhmm"
    rc = bathbuild.main([str(out), f"{TS}/minifam",
                         "-o", str(tmp_path / "log.txt")])
    assert rc == 0
    names = [h.name for h in read_hmms(str(out))]
    assert len(names) >= 2 and all(names)


def test_bathconvert_adds_fs_stats(tmp_path, capsys):
    out = tmp_path / "conv.bhmm"
    rc = bathconvert.main([str(out), f"{TS}/20aa.hmm"])
    assert rc == 0
    h = read_hmm(str(out))
    assert h.fs
    assert h.evparam[C.EV_FTAUFS3] != C.EVPARAM_UNSET
    assert h.evparam[C.EV_FTAUFS5] != C.EVPARAM_UNSET
    assert h.max_length > 0


def test_bathstat(capsys):
    rc = bathstat.main([f"{TUT}/AMP_N.bhmm"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "AMP_N" in out and "134" in out


def test_bathfetch_roundtrip(tmp_path, capsys):
    src = tmp_path / "db.bhmm"
    import shutil
    shutil.copy(f"{TUT}/tRNA-proteins.bhmm", src)
    assert bathfetch.main(["--index", str(src)]) == 0
    out = tmp_path / "one.bhmm"
    assert bathfetch.main([str(src), "PTH2",
                           "-o", str(out)]) == 0
    h = read_hmm(str(out))
    assert h.name == "PTH2"


def test_esl_ssi_interop(tmp_path):
    """Easel binary SSI interop: read the reference's shipped .ssi
    files directly, and our --index writes byte-identical indexes
    (hmm: NAME primaries + ACC secondaries; fasta: bpl/rpl +
    fast-subseq flag)."""
    import filecmp
    import shutil

    from bath_tpu.ssi import (fetch_hmm_text, index_fasta_file,
                              read_esl_ssi)

    # fetch through the REFERENCE's own index (no .bsi fallback)
    ref = f"{TUT}/tRNA-proteins.bhmm"
    txt = fetch_hmm_text(ref, "PTH2")
    assert "NAME  PTH2" in txt[:200] and txt.rstrip().endswith("//")
    # accession secondary key resolves too
    ssi = read_esl_ssi(ref + ".ssi")
    acc = next(iter(ssi["secondary"]))
    assert fetch_hmm_text(ref, acc)

    # writer round-trips byte-identically against both shipped files
    # (the index embeds the basename, so keep it)
    cp = tmp_path / "tRNA-proteins.bhmm"
    shutil.copy(ref, cp)
    assert bathfetch.main(["--index", str(cp)]) == 0
    assert filecmp.cmp(f"{cp}.ssi", ref + ".ssi", shallow=False)
    fa = tmp_path / "target-PTHR37536.fa"
    shutil.copy(f"{TUT}/target-PTHR37536.fa", fa)
    index_fasta_file(str(fa))
    assert filecmp.cmp(f"{fa}.ssi",
                       f"{TUT}/target-PTHR37536.fa.ssi",
                       shallow=False)


def test_hmm_format_sweep():
    """Every committed .hmm fixture (HMMER3/e and 3/f, amino and DNA)
    parses (ref: p7_hmmfile.c format autodetect chain)."""
    import glob
    for f in sorted(glob.glob(f"{TS}/*.hmm")):
        h = read_hmm(f)
        assert h.M > 0 and h.name


@pytest.mark.parametrize("name,M", [("M1", 1), ("XYPPX", 5)])
def test_bathconvert_edge_models(tmp_path, name, M):
    """Tiny and single-node models convert + calibrate cleanly."""
    out = tmp_path / f"{name}.bhmm"
    rc = bathconvert.main([str(out), f"{TS}/{name}.hmm"])
    assert rc == 0
    h = read_hmm(str(out))
    assert h.M == M and h.fs
    assert h.evparam[C.EV_FTAUFS3] != C.EVPARAM_UNSET


def test_bathfetch_ct_recalibrates(tmp_path):
    """--ct on fetch re-derives the frameshift taus under the new
    genetic code (ref: bathfetch.c :296-330)."""
    import shutil
    src = tmp_path / "db.bhmm"
    shutil.copy(f"{TUT}/tRNA-proteins.bhmm", src)
    out = tmp_path / "one.bhmm"
    assert bathfetch.main([str(src), "PTH2", "-o", str(out)]) == 0
    h0 = read_hmm(str(out))
    assert bathfetch.main(["--ct", "4", str(src), "PTH2",
                           "-o", str(out)]) == 0
    h1 = read_hmm(str(out))
    assert h0.ct == 1 and h1.ct == 4
    assert h1.evparam[C.EV_FTAUFS3] != h0.evparam[C.EV_FTAUFS3]
    assert h1.evparam[C.EV_FTAUFS5] != C.EVPARAM_UNSET


def test_bathbuild_weighting_and_effn_strategies(tmp_path):
    """--wgsc/--wblosum/--eclust/--eentexp all build valid models
    (ref: bathbuild.c weighting/effn option groups,
    esl_msaweight_GSC/BLOSUM, eweight.c p7_EntropyWeight_exp)."""
    results = {}
    for tag, flags in (("pb", []), ("gsc", ["--wgsc"]),
                       ("blosum", ["--wblosum"]),
                       ("eclust", ["--eclust"]),
                       ("eentexp", ["--eentexp"])):
        out = tmp_path / f"{tag}.bhmm"
        rc = bathbuild.main([str(out), f"{TS}/2OG-FeII_Oxy_3.sto",
                             "-o", str(tmp_path / "log")] + flags)
        assert rc == 0
        h = read_hmm(str(out))
        assert np.all(np.isfinite(h.mat[1:])) and h.eff_nseq > 0
        results[tag] = h
    # 10 diverse sequences -> 10 single-linkage clusters at 62% id
    assert results["eclust"].eff_nseq == 10.0
    # the weighting schemes genuinely differ
    assert abs(results["pb"].eff_nseq
               - results["blosum"].eff_nseq) > 1e-3


def test_gsc_weights_downweight_duplicates():
    """A duplicated sequence splits the weight its copies share
    (GSC and BLOSUM weighting invariants)."""
    from bath_tpu.msa import read_msas
    msa = read_msas(f"{TS}/2OG-FeII_Oxy_3.sto")[0]
    import numpy as _np
    msa.ax = _np.vstack([msa.ax, msa.ax[0]])
    msa.names = msa.names + ["dup"]
    msa.wgt = _np.ones(msa.nseq)
    msa.set_gsc_weights()
    w = msa.wgt
    assert abs(w.mean() - 1.0) < 1e-9
    # the duplicated pair gets the smallest weights
    assert max(w[0], w[-1]) <= w[1:-1].min() + 1e-9
    msa.set_blosum_weights(0.9)
    assert abs(msa.wgt[0] - 0.5 * msa.wgt[1]) < 1e-9


def test_bathbuild_postmsa_roundtrip(tmp_path):
    """-O resaves the trace-implied alignment; rebuilding from it
    with --hand recovers the same architecture
    (ref: p7_builder.c make_post_msa :371, tracealign.c)."""
    from bath_tpu.msa import read_msas
    out = tmp_path / "m.bhmm"
    post = tmp_path / "post.sto"
    rc = bathbuild.main([str(out), f"{TS}/Caudal_act.sto",
                         "-O", str(post), "-o", str(tmp_path / "l1")])
    assert rc == 0
    h1 = read_hmm(str(out))
    msa = read_msas(str(post))[0]
    assert msa.rf.count("x") == h1.M
    out2 = tmp_path / "m2.bhmm"
    rc = bathbuild.main([str(out2), str(post), "--hand",
                         "-o", str(tmp_path / "l2")])
    assert rc == 0
    h2 = read_hmm(str(out2))
    assert h2.M == h1.M
    assert np.abs(h1.mat[1:] - h2.mat[1:]).max() < 0.01


@pytest.mark.parametrize("name", ["Caudal_act", "RRM_1",
                                  "2OG-FeII_Oxy_3"])
def test_bathbuild_golden_models(tmp_path, name):
    """Build from the testsuite MSAs and compare model parameters to
    the reference's committed .bhmm files."""
    out = tmp_path / f"{name}.bhmm"
    rc = bathbuild.main([str(out), f"{TS}/{name}.sto",
                         "-o", str(tmp_path / "log.txt")])
    assert rc == 0
    ours = read_hmm(str(out))
    golden = read_hmm(f"{TS}/{name}.bhmm")
    assert ours.M == golden.M
    assert abs(ours.eff_nseq - golden.eff_nseq) < 1e-3
    assert ours.max_length == golden.max_length
    assert np.abs(ours.mat[1:] - golden.mat[1:]).max() < 1e-4
    assert np.abs(ours.t[1:] - golden.t[1:]).max() < 1e-4


def test_bathbuild_worker_count_invariance(tmp_path):
    """--cpu N multi-MSA build output is identical to serial modulo
    DATE lines (per-model calibration reseeds the RNG, ref:
    evalues.c:94 do_reseeding)."""
    import re
    import subprocess
    import sys
    out1 = tmp_path / "m1.bhmm"
    out4 = tmp_path / "m4.bhmm"
    for out, opts in ((out1, []), (out4, ["--cpu", "3"])):
        r = subprocess.run(
            [sys.executable, "-m", "bath_tpu.cli.bathbuild", *opts,
             str(out), "/root/reference/testsuite/minifam"],
            capture_output=True, text=True, timeout=1200,
            cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]

    def strip(p):
        return re.sub(r"DATE .*", "", p.read_text())

    assert strip(out1) == strip(out4)
