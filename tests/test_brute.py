"""Brute-force path enumeration vs the DP kernels — the reference's
strongest correctness anchor (ref: itest_brute.c :1-32), generalized:
instead of hand-derived path formulas for one M=3 model, we enumerate
every complete state path of the profile state machine explicitly
(written from the Plan7 semantics, not from the kernel code) and
compare the summed path probability against the Forward kernels.

Covers the standard amino profile and the 5-codon frameshift profile
(the frameshift recurrence validated against first principles).
"""

import math

import numpy as np
import pytest

from bath_tpu import constants as C
from bath_tpu.bg import Background
from bath_tpu.gencode import GeneticCode
from bath_tpu.hmm import HMM
from bath_tpu.oprofile import oprofile_convert
from bath_tpu.ops.reference import fwdback as fb
from bath_tpu.ops.reference import fwdback_fs as ffs
from bath_tpu.profile import profile_config, profile_config_fs


def random_hmm(M, rng, zero_pepper=False):
    """Random M-node amino HMM, optionally peppered with zero-prob
    transitions (ref: sample_zeropeppered_probvector)."""
    h = HMM.zeros(M)
    K = 20

    def vec(n):
        v = rng.dirichlet(np.ones(n))
        if zero_pepper and rng.random() < 0.5:
            i = rng.integers(n)
            v[i] = 0.0
            s = v.sum()
            if s == 0:
                v[rng.integers(n)] = 1.0
            else:
                v /= s
        return v

    for k in range(M + 1):
        h.t[k, 0:3] = vec(3)
        h.t[k, 3:5] = vec(2)
        h.t[k, 5:7] = vec(2)
        h.mat[k] = vec(K)
        h.ins[k] = vec(K)
    h.t[M, C.H_MD] = 0.0
    h.t[M, 0:3] /= h.t[M, 0:3].sum()
    h.t[0, C.H_DM], h.t[0, C.H_DD] = 1.0, 0.0
    h.t[M, C.H_DM], h.t[M, C.H_DD] = 1.0, 0.0
    h.mat[0, :] = 0.0
    h.mat[0, 0] = 1.0
    h.name = "brute"
    return h


def enumerate_forward(om, dsq) -> float:
    """Sum of all complete path probabilities (log score in nats),
    written directly from the Plan7-local state machine semantics."""
    L = len(dsq)
    M = om.M
    rfv = om.rfv            # [Kp, M+1] odds
    tfv = om.tfv            # [M, 8]; row j = transitions out of node j
    xf = om.xf
    nloop, nmove = xf[C.X_N, C.LOOP], xf[C.X_N, C.MOVE]
    jloop, jmove = xf[C.X_J, C.LOOP], xf[C.X_J, C.MOVE]
    cloop, cmove = xf[C.X_C, C.LOOP], xf[C.X_C, C.MOVE]
    eloop, emove = xf[C.X_E, C.LOOP], xf[C.X_E, C.MOVE]
    total = 0.0

    def from_B(i, w):
        # B -> Mk consumes residue i+1 (1-based), any k
        nonlocal total
        if i >= L:
            return
        x = int(dsq[i])
        for k in range(1, M + 1):
            entry = tfv[k - 1, C.P_BM]
            if entry > 0 and rfv[x, k] > 0:
                from_M(i + 1, k, w * entry * rfv[x, k])

    def from_M(i, k, w):
        nonlocal total
        if w == 0.0:
            return
        from_E(i, w)                                  # local exit
        if k < M:
            if i < L:
                x = int(dsq[i])
                t = tfv[k, C.P_MM]
                if t > 0 and rfv[x, k + 1] > 0:
                    from_M(i + 1, k + 1, w * t * rfv[x, k + 1])
            t = tfv[k, C.P_MD]
            if t > 0:
                from_D(i, k + 1, w * t)
        if k < M and i < L:
            t = tfv[k, C.P_MI]
            if t > 0:
                from_I(i + 1, k, w * t)

    def from_I(i, k, w):
        if i < L:
            t = tfv[k, C.P_II]
            if t > 0:
                from_I(i + 1, k, w * t)
            tm = tfv[k, C.P_IM]
            x = int(dsq[i])
            if tm > 0 and rfv[x, k + 1] > 0:
                from_M(i + 1, k + 1, w * tm * rfv[x, k + 1])

    def from_D(i, k, w):
        from_E(i, w)                                  # local exit
        if k < M:
            t = tfv[k, C.P_DD]
            if t > 0:
                from_D(i, k + 1, w * t)
            if i < L:
                tm = tfv[k, C.P_DM]
                x = int(dsq[i])
                if tm > 0 and rfv[x, k + 1] > 0:
                    from_M(i + 1, k + 1, w * tm * rfv[x, k + 1])

    def from_E(i, w):
        from_C(i, w * emove)
        if eloop > 0:
            from_J(i, w * eloop)

    def from_J(i, w):
        if i < L:
            from_J(i + 1, w * jloop)
        from_B(i, w * jmove)

    def from_C(i, w):
        nonlocal total
        if i == L:
            total += w * cmove
        else:
            from_C(i + 1, w * cloop)

    # S -> N^a -> B
    w = 1.0
    for i in range(0, L + 1):
        from_B(i, w * nmove)
        w *= nloop
    return math.log(total) if total > 0 else -math.inf


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("pepper", [False, True])
def test_brute_forward_amino(seed, pepper):
    rng = np.random.default_rng(seed)
    hmm = random_hmm(3, rng, pepper)
    bg = Background()
    for L in (1, 2, 3, 4):
        gm = profile_config(hmm, bg, L=L)
        om = oprofile_convert(gm)
        dsq = rng.integers(0, 20, L).astype(np.int32)
        brute = enumerate_forward(om, dsq)
        _, dp = fb.forward(dsq, om)
        assert dp == pytest.approx(brute, abs=2e-4), (L, dp, brute)


# ---------------------------------------------------------------------
# Frameshift (5-codon) brute enumeration
# ---------------------------------------------------------------------
def enumerate_forward_fs5(om, dsq) -> float:
    """All complete paths of the 5-codon frameshift machine: M emits
    codons of 1..5 nt, I emits 3 nt at odds 1, N/C/J loop 3 nt,
    termination logsums C at L, L-1, L-2 (ref: SURVEY.md section 2.2,
    generic_fwdback_frameshift.c recurrence)."""
    L = len(dsq)
    M = om.M
    rsc = om.rfv            # [ncodons+Kp, M+1]
    tfv = om.tfv
    xf = om.xf
    nloop, nmove = xf[C.X_N, C.LOOP], xf[C.X_N, C.MOVE]
    jloop, jmove = xf[C.X_J, C.LOOP], xf[C.X_J, C.MOVE]
    cloop, cmove = xf[C.X_C, C.LOOP], xf[C.X_C, C.MOVE]
    eloop, emove = xf[C.X_E, C.LOOP], xf[C.X_E, C.MOVE]
    total = 0.0

    def codon_idx(i0, c):
        """codon of length c starting at 0-based position i0
        (canonical nts only in this test)."""
        n = [int(dsq[i0 + j]) for j in range(c)]
        if c == 1:
            return C.codon1_fs5(n[0])
        if c == 2:
            return C.codon2_fs5(n[0], n[1])
        if c == 3:
            return C.codon3_fs5(n[0], n[1], n[2])
        if c == 4:
            return C.codon4_fs5(n[0], n[1], n[2], n[3])
        return C.codon5_fs5(n[0], n[1], n[2], n[3], n[4])

    def emit(i, k, c):
        """emission odds for M at node k eating c nts starting at i
        (0-based); None if out of range."""
        if i + c > L:
            return None
        return float(rsc[codon_idx(i, c)][k])

    def from_B(i, w):
        for k in range(1, M + 1):
            entry = tfv[k - 1, C.P_BM]
            if entry <= 0:
                continue
            for c in (1, 2, 3, 4, 5):
                e = emit(i, k, c)
                if e and e > 0:
                    from_M(i + c, k, w * entry * e)

    def from_M(i, k, w):
        nonlocal total
        if w == 0.0:
            return
        from_E(i, w)
        if k < M:
            t = tfv[k, C.P_MM]
            if t > 0:
                for c in (1, 2, 3, 4, 5):
                    e = emit(i, k + 1, c)
                    if e and e > 0:
                        from_M(i + c, k + 1, w * t * e)
            td = tfv[k, C.P_MD]
            if td > 0:
                from_D(i, k + 1, w * td)
            ti = tfv[k, C.P_MI]
            if ti > 0 and i + 3 <= L:
                from_I(i + 3, k, w * ti)

    def from_I(i, k, w):
        ti = tfv[k, C.P_II]
        if ti > 0 and i + 3 <= L:
            from_I(i + 3, k, w * ti)
        tm = tfv[k, C.P_IM]
        if tm > 0 and k < M:
            for c in (1, 2, 3, 4, 5):
                e = emit(i, k + 1, c)
                if e and e > 0:
                    from_M(i + c, k + 1, w * tm * e)

    def from_D(i, k, w):
        from_E(i, w)
        if k < M:
            t = tfv[k, C.P_DD]
            if t > 0:
                from_D(i, k + 1, w * t)
            tm = tfv[k, C.P_DM]
            if tm > 0:
                for c in (1, 2, 3, 4, 5):
                    e = emit(i, k + 1, c)
                    if e and e > 0:
                        from_M(i + c, k + 1, w * tm * e)

    def from_E(i, w):
        from_C(i, w * emove)
        if eloop > 0:
            from_J(i, w * eloop)

    def from_J(i, w):
        if i + 3 <= L:
            from_J(i + 3, w * jloop)
        from_B(i, w * jmove)

    def from_C(i, w):
        nonlocal total
        if i + 3 <= L:
            from_C(i + 3, w * cloop)
        if i >= L - 2:
            # ends at L: factor 1; at L-1/L-2: extra loop factor
            total += w * (1.0 if i == L else cloop) * cmove

    # S -> N -> B: xN(0)=xN(1)=xN(2)=1 (entry after 0..2 stray nts is
    # free), then the N loop eats 3 nt at a time
    for o in (0, 1, 2):
        w = 1.0
        i = o
        while i <= L:
            from_B(i, w * nmove)
            i += 3
            w *= nloop
    return math.log(total) if total > 0 else -math.inf


@pytest.mark.parametrize("seed", [0, 1])
def test_brute_forward_fs5(seed):
    rng = np.random.default_rng(seed)
    hmm = random_hmm(2, rng)
    hmm.fs = True
    hmm.fsprob = 0.01
    hmm.ct = 1
    bg = Background()
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    for L in (5, 7, 9):
        gm = profile_config_fs(hmm, bg, gcode, 5, L // 3 or 1)
        om = ffs.fs_oprofile_convert(gm)
        om.reconfig_length(max(L // 3, 1))
        dsq = rng.integers(0, 4, L).astype(np.int32)
        brute = enumerate_forward_fs5(om, dsq)
        _, dp = ffs.forward_fs5(dsq, om)
        assert dp == pytest.approx(brute, abs=3e-4), (L, dp, brute)


# ---------------------------------------------------------------------
# Emission sanity (ref: emit.c usage in the reference's utests):
# model-emitted sequences must score higher on average than random.
# ---------------------------------------------------------------------
def test_emitted_sequences_score_high():
    from bath_tpu.emit import core_emit
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.rng import Randomness

    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    bg = Background()
    r = Randomness(11)
    gm = profile_config(hmm, bg, L=100)
    om = oprofile_convert(gm)
    emitted, rand = [], []
    rng = np.random.default_rng(0)
    for _ in range(5):
        sq, _tr = core_emit(r, hmm)
        if len(sq) == 0:
            continue
        om.reconfig_length(len(sq))
        _, sc = fb.forward(sq.astype(np.int32), om)
        emitted.append(sc - bg.null_one(len(sq)))
        rs = rng.integers(0, 20, len(sq)).astype(np.int32)
        _, sc2 = fb.forward(rs, om)
        rand.append(sc2 - bg.null_one(len(rs)))
    assert np.mean(emitted) > np.mean(rand) + 5.0
