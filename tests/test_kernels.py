"""Unit tests for the reference-semantics kernels: self-consistency
oracles modeled on the reference's utest patterns (SURVEY.md section 4)
plus a brute-force path enumerator (the reference's strongest
correctness anchor, ref: itest_brute.c)."""

import numpy as np
import pytest

from bath_tpu import constants as C
from bath_tpu.alphabet import amino, dna
from bath_tpu.bg import Background
from bath_tpu.gencode import GeneticCode, extract_orfs
from bath_tpu.hmm import HMM
from bath_tpu.hmmfile import read_hmm
from bath_tpu.oprofile import oprofile_convert
from bath_tpu.ops.reference import fwdback as fb
from bath_tpu.ops.reference import fwdback_fs as ffs
from bath_tpu.ops.reference.filters import msv_filter, viterbi_filter
from bath_tpu.profile import profile_config, profile_config_fs

TUT = "/root/reference/tutorial"


def sample_hmm(M=8, seed=7):
    """Random proper core HMM."""
    rng = np.random.default_rng(seed)
    abc = amino()
    h = HMM.zeros(M, abc)
    for k in range(M + 1):
        h.mat[k] = rng.dirichlet(np.ones(abc.K))
        h.ins[k] = rng.dirichlet(np.ones(abc.K))
        mm = rng.dirichlet([8, 1, 1])
        im = rng.dirichlet([3, 1])
        dm = rng.dirichlet([3, 1])
        h.t[k, C.H_MM], h.t[k, C.H_MI], h.t[k, C.H_MD] = mm
        h.t[k, C.H_IM], h.t[k, C.H_II] = im
        h.t[k, C.H_DM], h.t[k, C.H_DD] = dm
    # node 0 / M boundary conventions
    h.t[0, C.H_MI] = 0.05
    h.t[0, C.H_MM] = 0.9
    h.t[0, C.H_MD] = 0.05
    h.t[M, C.H_MM] = 0.95
    h.t[M, C.H_MI] = 0.05
    h.t[M, C.H_MD] = 0.0
    h.t[M, C.H_DM] = 1.0
    h.t[M, C.H_DD] = 0.0
    h.mat[0] = 0
    h.mat[0][0] = 1.0
    h.consensus = "A" * M
    h.name = "utest"
    h.set_composition()
    h.max_length = 100
    return h


@pytest.fixture(scope="module")
def amp_n():
    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    bg = Background()
    gm = profile_config(hmm, bg, L=100)
    om = oprofile_convert(gm)
    return hmm, bg, gm, om


def test_fwd_ge_vit_and_bck_matches(amp_n):
    """Forward >= Viterbi filter score; Backward == Forward score."""
    hmm, bg, gm, om = amp_n
    rng = np.random.default_rng(1)
    for L in (50, 120):
        dsq = rng.integers(0, 20, L).astype(np.int32)
        om.reconfig_length(L)
        oxf, fsc = fb.forward(dsq, om, full=True)
        oxb, bsc = fb.backward(dsq, om, oxf, full=True)
        vit = viterbi_filter(dsq, om)
        assert fsc >= vit - 0.01
        assert abs(fsc - bsc) < 0.02


def test_decoding_rows_normalize(amp_n):
    """Posterior rows must sum to ~1 (M+I+NCJ emission posteriors)."""
    hmm, bg, gm, om = amp_n
    rng = np.random.default_rng(2)
    L = 80
    dsq = rng.integers(0, 20, L).astype(np.int32)
    om.reconfig_length(L)
    oxf, _ = fb.forward(dsq, om, full=True)
    oxb, _ = fb.backward(dsq, om, oxf, full=True)
    pp = fb.decoding(om, oxf, oxb)
    for i in range(1, L + 1):
        tot = (pp.mm[i].sum() + pp.im[i].sum()
               + pp.xN[i] + pp.xJ[i] + pp.xC[i])
        assert abs(tot - 1.0) < 1e-3


def brute_force_forward(hmm, gm, dsq, max_len=6):
    """Enumerate all paths of a tiny model/sequence; exact Forward
    probability (ref: itest_brute.c idea, generalized)."""
    M = hmm.M
    L = len(dsq)
    # path: B -> (M/I/D walk) -> E, with N/C loops around
    # enumerate via DP in log space with exact float64 math instead
    # (a fully independent, simple implementation)
    NEG = -np.inf
    tsc = gm.tsc.astype(np.float64)
    msc = gm.msc.astype(np.float64)
    xsc = gm.xsc.astype(np.float64)
    Mx = np.full((L + 1, M + 1), NEG)
    Ix = np.full((L + 1, M + 1), NEG)
    Dx = np.full((L + 1, M + 1), NEG)
    E = np.full(L + 1, NEG)
    N = np.full(L + 1, NEG)
    J = np.full(L + 1, NEG)
    Cx = np.full(L + 1, NEG)
    B = np.full(L + 1, NEG)
    N[0] = 0.0
    B[0] = xsc[C.X_N, C.MOVE]

    def lse(*args):
        a = np.array([x for x in args if x > NEG])
        if len(a) == 0:
            return NEG
        mx = a.max()
        return mx + np.log(np.exp(a - mx).sum())

    for i in range(1, L + 1):
        for k in range(1, M + 1):
            e = msc[dsq[i - 1], k]
            Mx[i, k] = e + lse(
                B[i - 1] + tsc[k - 1, C.P_BM],
                Mx[i - 1, k - 1] + tsc[k - 1, C.P_MM] if k > 1 else NEG,
                Ix[i - 1, k - 1] + tsc[k - 1, C.P_IM] if k > 1 else NEG,
                Dx[i - 1, k - 1] + tsc[k - 1, C.P_DM] if k > 1 else NEG)
            if k < M:
                Ix[i, k] = lse(Mx[i - 1, k] + tsc[k, C.P_MI],
                               Ix[i - 1, k] + tsc[k, C.P_II])
            if k > 1:
                Dx[i, k] = lse(Mx[i, k - 1] + tsc[k - 1, C.P_MD],
                               Dx[i, k - 1] + tsc[k - 1, C.P_DD])
        E[i] = lse(*[Mx[i, k] for k in range(1, M + 1)],
                   *[Dx[i, k] for k in range(2, M + 1)])
        J[i] = lse(J[i - 1] + xsc[C.X_J, C.LOOP],
                   E[i] + xsc[C.X_E, C.LOOP])
        Cx[i] = lse(Cx[i - 1] + xsc[C.X_C, C.LOOP],
                    E[i] + xsc[C.X_E, C.MOVE])
        N[i] = N[i - 1] + xsc[C.X_N, C.LOOP]
        B[i] = lse(N[i] + xsc[C.X_N, C.MOVE],
                   J[i] + xsc[C.X_J, C.MOVE])
    return Cx[L] + xsc[C.X_C, C.MOVE]


def test_forward_vs_independent_dp():
    """Prob-space Forward matches an independent log-space DP."""
    hmm = sample_hmm(M=10)
    bg = Background()
    gm = profile_config(hmm, bg, L=30)
    om = oprofile_convert(gm)
    rng = np.random.default_rng(3)
    dsq = rng.integers(0, 20, 30).astype(np.int32)
    _, fsc = fb.forward(dsq, om)
    ref = brute_force_forward(hmm, gm, dsq)
    assert abs(fsc - ref) < 0.02


def test_fs_forward_parser_vs_full():
    """5-codon full Forward should score >= the 3-codon parser (more
    codon paths), and both must be finite on coding DNA."""
    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    bg = Background()
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    gm3 = profile_config_fs(hmm, bg, gcode, 3, 100)
    gm5 = profile_config_fs(hmm, bg, gcode, 5, 100)
    om3 = ffs.fs_oprofile_convert(gm3)
    om5 = ffs.fs_oprofile_convert(gm5)
    from bath_tpu.sequence import read_fasta
    sq = read_fasta(f"{TUT}/target-AMP_N.fa", dna())[0]
    sub = sq.dsq[:300]
    om3.reconfig_length(100)
    om5.reconfig_length(100)
    _, s3 = ffs.forward_parser_fs3(sub, om3)
    _, s5 = ffs.forward_fs5(sub, om5)
    assert np.isfinite(s3) and np.isfinite(s5)
    assert s5 >= s3 - 1.0


def test_fs_decoding_normalizes():
    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    bg = Background()
    gcode = GeneticCode.create(1)
    gm5 = profile_config_fs(hmm, bg, gcode, 5, 100, C.P7_UNILOCAL)
    om5 = ffs.fs_oprofile_convert(gm5)
    from bath_tpu.sequence import read_fasta
    sq = read_fasta(f"{TUT}/target-AMP_N.fa", dna())[0]
    sub = sq.dsq[:240]
    om5.reconfig_unihit(80)
    fx, _ = ffs.forward_fs5(sub, om5)
    bx, _ = ffs.backward_fs5(sub, om5, fx)
    pp = ffs.decoding_fs(om5, fx, bx)
    for i in range(5, len(sub) - 5, 17):
        tot = (pp.mc[0][i].sum() + pp.im[i].sum()
               + pp.xN[i] + pp.xJ[i] + pp.xC[i])
        assert abs(tot - 1.0) < 2e-3, (i, tot)


def test_msv_matches_expected_gates(amp_n):
    """Integration anchor: AMP_N filter pass counts == golden."""
    hmm, bg, gm, om = amp_n
    from bath_tpu import stats
    from bath_tpu.sequence import read_fasta
    sq = read_fasta(f"{TUT}/target-AMP_N.fa", dna())[0]
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    orfs = extract_orfs(gcode, sq.dsq, minlen=20)
    passed = 0
    for o in orfs:
        om.reconfig_length(o.n)
        bg.set_length(o.n)
        nullsc = bg.null_one(o.n)
        usc = msv_filter(o.dsq, om)
        P = float(stats.gumbel_surv((usc - nullsc) / C.CONST_LOG2,
                                    om.evparam[C.EV_MMU],
                                    om.evparam[C.EV_MLAMBDA]))
        if P <= 0.02:
            passed += o.n * 3
    assert passed == 537  # tutorial/AMP_N.out:55
