"""Stochastic-trace ensemble clustering of multidomain regions
(ref: region_trace_ensemble + p7_spensemble; SURVEY.md hard part 3)."""

import numpy as np

from bath_tpu.bg import Background
from bath_tpu.domaindef import DomainDef
from bath_tpu.ensemble import (cluster_segments, region_trace_ensemble,
                               stochastic_trace)
from bath_tpu.hmmfile import read_hmm
from bath_tpu.oprofile import oprofile_convert
from bath_tpu.ops.reference import fwdback as fb
from bath_tpu.profile import profile_config
from bath_tpu.rng import Randomness
from bath_tpu.sequence import Sequence

TUT = "/root/reference/tutorial"


def _setup_tandem():
    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    bg = Background()
    gm = profile_config(hmm, bg, L=268)
    om = oprofile_convert(gm)
    cons = np.argmax(hmm.mat[1:, :20], axis=1).astype(np.int32)
    orf = np.concatenate([cons, cons]).astype(np.int32)
    return om, orf


def test_region_trace_ensemble_splits_tandem():
    om, orf = _setup_tandem()
    orfsq = Sequence(name="t", dsq=orf, start=1, end=804, L=804)
    ddef = DomainDef()
    ddef.n2sc = np.zeros(len(orf) + 1, np.float32)
    om.reconfig_length(len(orf))
    envs = region_trace_ensemble(ddef, om, orfsq, 1, len(orf), len(orf))
    assert envs == [(1, 134), (135, 268)]
    # n2sc was set over the region
    assert np.isfinite(ddef.n2sc[1:len(orf) + 1]).all()


def test_stochastic_trace_samples_domains():
    om, orf = _setup_tandem()
    om.reconfig_multihit(len(orf))
    oxf, _ = fb.forward(orf, om, full=True)
    r = Randomness(42)
    ndoms = []
    for _ in range(10):
        tr = stochastic_trace(r, orf, om, oxf)
        tr.index()
        ndoms.append(tr.ndom)
        # valid paths: every M coordinate within bounds
        for z in range(tr.N):
            if tr.st[z] == 1:      # T_M
                assert 1 <= tr.k[z] <= om.M
                assert 1 <= tr.i[z] <= len(orf)
    assert max(ndoms) >= 2         # tandem domains get sampled


def test_cluster_segments_rules():
    # two tight clusters of segments + one junk singleton
    samples = []
    for t in range(20):
        samples.append((t, 1, 100, 1, 100))
        samples.append((t, 120, 220, 1, 100))
    samples.append((20, 500, 520, 50, 70))
    sigc = cluster_segments(samples, 21, 0.8, True, 4, 0.25, 0.02)
    assert len(sigc) == 2
    assert sigc[0][:2] == (1, 100) and sigc[1][:2] == (120, 220)


def test_fs_stochastic_trace_and_ensemble():
    """Frameshift stochastic trace samples valid codon paths; the fs
    ensemble resolves a tandem DNA region."""
    from bath_tpu.codontable import CodonTable
    from bath_tpu.ensemble import (region_trace_ensemble_fs,
                                   stochastic_trace_fs5)
    from bath_tpu.gencode import GeneticCode
    from bath_tpu.ops.reference import fwdback_fs as ffs
    from bath_tpu.profile import profile_config_fs

    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    bg = Background()
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    gm5 = profile_config_fs(hmm, bg, gcode, 5, 268)
    om5 = ffs.fs_oprofile_convert(gm5)
    cons = np.argmax(hmm.mat[1:, :20], axis=1).astype(np.int32)
    ct = CodonTable(gcode)
    r = Randomness(3)
    dna = np.concatenate([ct.reverse_translate(r, cons),
                          ct.reverse_translate(r, cons)])
    om5.reconfig_multihit(268)
    fx, _ = ffs.forward_fs5(dna, om5, fast=True)
    r2 = Randomness(42)
    tr = stochastic_trace_fs5(r2, dna, om5, fx)
    tr.index()
    assert tr.ndom >= 1
    for z in range(tr.N):
        if tr.st[z] == 1:          # T_M
            assert 1 <= tr.k[z] <= om5.M
            assert 1 <= tr.c[z] <= 5

    winsq = Sequence(name="t", dsq=dna, start=1, end=len(dna),
                     L=len(dna))
    ddef = DomainDef()
    envs = region_trace_ensemble_fs(ddef, om5, winsq, 1, len(dna), 268)
    assert envs is not None and len(envs) == 2
    # two envelopes splitting near the tandem boundary (nt 402)
    assert envs[0][1] < envs[1][0]
    assert abs(envs[0][1] - 402) < 30
