"""TPU-path kernels vs the reference-semantics numpy kernels — the
parity binding between the two implementations (the reference's
SIMD-vs-generic utest pattern, SURVEY.md section 4)."""

import numpy as np
import pytest

from bath_tpu import constants as C
from bath_tpu.alphabet import dna
from bath_tpu.bg import Background
from bath_tpu.gencode import GeneticCode
from bath_tpu.hmmfile import read_hmm
from bath_tpu.oprofile import oprofile_convert
from bath_tpu.ops.jaxk import kernels as jk
from bath_tpu.ops.jaxk.batch import pack_sequences
from bath_tpu.ops.reference import fwdback as fb
from bath_tpu.ops.reference import fwdback_fs as ffs
from bath_tpu.ops.reference.filters import msv_filter
from bath_tpu.profile import profile_config, profile_config_fs
from bath_tpu.sequence import read_fasta

TUT = "/root/reference/tutorial"


@pytest.fixture(scope="module")
def setup():
    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    bg = Background()
    gm = profile_config(hmm, bg, L=100)
    om = oprofile_convert(gm)
    return hmm, bg, om


def test_forward_jax_vs_numpy(setup):
    hmm, bg, om = setup
    rng = np.random.default_rng(0)
    dsqs = [rng.integers(0, 20, L).astype(np.int32) for L in (37, 80, 133)]
    batch, lens = pack_sequences(dsqs, pad_value=28)
    fp = jk.fwd_params(om)
    scores = np.asarray(jk.forward_score_perlen(batch, lens, fp, nj=1.0))
    for d, s in zip(dsqs, scores):
        om.reconfig_length(len(d))
        _, ref = fb.forward(d, om)
        assert abs(s - ref) < 0.02, (len(d), s, ref)


def test_msv_jax_vs_numpy_bitexact(setup):
    hmm, bg, om = setup
    rng = np.random.default_rng(1)
    dsqs = [rng.integers(0, 20, L).astype(np.int32) for L in (40, 90, 150)]
    batch, lens = pack_sequences(dsqs, pad_value=28)
    mp = jk.msv_params(om)
    scores = np.asarray(jk.msv_score_batch(batch, lens, mp))
    for d, s in zip(dsqs, scores):
        om.reconfig_length(len(d))
        ref = msv_filter(d, om)
        assert s == pytest.approx(ref, abs=1e-6), (len(d), s, ref)


def test_fs3_jax_vs_numpy(setup):
    hmm, bg, om = setup
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    gm3 = profile_config_fs(hmm, bg, gcode, 3, 100)
    om3 = ffs.fs_oprofile_convert(gm3)
    sq = read_fasta(f"{TUT}/target-AMP_N.fa", dna())[0]
    # mixed lengths incl. non-multiples of the 12-position scan block
    # and of 3 (exercises the folded DD-closure operator + u-weighted
    # xE across ring-phase boundaries)
    dnas = [sq.dsq[:150].copy(), sq.dsq[100:350].copy(),
            sq.dsq[:411].copy(), sq.dsq[5:42].copy(),
            sq.dsq[20:117].copy()]
    batch, lens = pack_sequences(dnas, pad_value=17)
    p3 = jk.fs3_params(om3)
    scores = np.asarray(jk.fs3_score_batch(batch, lens, p3, nj=1.0))
    for d, s in zip(dnas, scores):
        om3.reconfig_length(len(d) // 3)
        _, ref = ffs.forward_parser_fs3(d, om3)
        assert abs(s - ref) < 0.2, (len(d), s, ref)
    # v3 (block-lazy rescaling, ops/jaxk/fs3_v3.py): same recurrence,
    # different rescale points — must sit within f32 round-off of v1
    from bath_tpu.ops.jaxk.fs3_v3 import (fs3_params_v3,
                                          fs3_score_batch_v3)
    pv3 = fs3_params_v3(om3)
    n = len(dnas)
    s3 = np.asarray(fs3_score_batch_v3(batch, lens, pv3, nj=1.0))[:n]
    assert np.all(np.abs(s3 - scores[:n]) < 0.02), (s3, scores)
    s3p = np.asarray(fs3_score_batch_v3(batch, lens, pv3, nj=1.0,
                                        edot="pos"))[:n]
    assert np.array_equal(s3p, s3)
    # v4 (linear-operator folding, ops/jaxk/fs3_v4.py): M-path
    # shift+scale folded into the closure matmul + pre-multiplied I
    # row — same recurrence, the tMM product now rounds inside the
    # dot, so the tolerance vs the host parser stays the gate-band
    # one
    from bath_tpu.ops.jaxk.fs3_v4 import (fs3_params_v4,
                                          fs3_score_batch_v4)
    pv4 = fs3_params_v4(om3)
    s4 = np.asarray(fs3_score_batch_v4(batch, lens, pv4, nj=1.0))[:n]
    assert np.all(np.abs(s4 - scores[:n]) < 0.05), (s4, scores)


def test_mesh_backend_identical():
    """bathsearch --backend jax --mesh 8 (batches sharded over an
    8-device virtual mesh, device gate path forced) produces output
    byte-identical to the scalar numpy backend."""
    import os
    import re
    import subprocess
    import sys

    def run(extra, env_extra):
        env = dict(os.environ, BATH_JAX_PLATFORM="cpu", **env_extra)
        r = subprocess.run(
            [sys.executable, "-m", "bath_tpu.cli.bathsearch", *extra,
             "/root/reference/tutorial/AMP_N.bhmm",
             "/root/repo/tests/data/mesh_target.fa"],
            capture_output=True, text=True, timeout=900,
            cwd="/root/repo", env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        return re.sub(r"# (CPU time|Mc/sec):.*", "", r.stdout)

    a = run(["--backend", "jax", "--mesh", "8"],
            {"XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "BATH_MIN_DEVICE_ORFS": "50"})
    b = run([], {})
    # strip the command-line header lines (flags differ by design)
    strip = lambda s: "\n".join(l for l in s.split("\n")
                                if not l.startswith("#"))
    assert strip(a) == strip(b)


def test_multichip_dryrun():
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, "/root/repo/__graft_entry__.py", "4"],
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(4): ok" in r.stdout


def test_msv_exact_batch_bitparity(setup):
    """Batched device SSV/MSV (--backend jax) is bit-exact vs the
    scalar reference filter."""
    from bath_tpu.ops.jaxk.msv_exact import MSVExact
    from bath_tpu.ops.reference.filters import msv_filter

    hmm, bg, om = setup
    mx = MSVExact(om)
    rng = np.random.default_rng(5)
    seqs = [rng.integers(0, 20, L).astype(np.int32)
            for L in (20, 33, 64, 150, 280)]
    batch, lens = pack_sequences(seqs, pad_value=28)
    got = mx.scores(batch, lens)
    for s, g in zip(seqs, got):
        om.reconfig_length(len(s))
        ref = msv_filter(s, om)
        assert g == ref or (np.isinf(g) and np.isinf(ref)), (len(s), g, ref)


def test_backend_jax_golden_identical():
    """bathsearch --backend jax output == --backend numpy output."""
    import re
    import subprocess
    import sys

    def run(backend):
        import os
        env = dict(os.environ, BATH_JAX_PLATFORM="cpu")
        r = subprocess.run(
            [sys.executable, "-m", "bath_tpu.cli.bathsearch",
             "--backend", backend,
             "/root/reference/tutorial/AMP_N.bhmm",
             "/root/reference/tutorial/target-AMP_N.fa"],
            capture_output=True, text=True, timeout=900,
            cwd="/root/repo", env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        return re.sub(r"# (CPU time|Mc/sec):.*", "", r.stdout)

    assert run("jax") == run("numpy")


def test_msv_mb_bitparity(setup):
    """[model, batch]-layout SSV/MSV (the production device F1 kernel)
    is bit-exact vs the scalar reference filter, including degenerate
    residues, the shortest legal ORFs, and length-model edges."""
    from bath_tpu.ops.jaxk.filters_mb import MSVExactMB
    from bath_tpu.ops.reference.filters import msv_filter

    hmm, bg, om = setup
    mx = MSVExactMB(om)
    rng = np.random.default_rng(9)
    seqs = [rng.integers(0, 20, L).astype(np.int32)
            for L in (15, 20, 33, 64, 150, 280, 1000)]
    # degenerate / missing residues exercise the Kp tail of the tables
    sdeg = rng.integers(0, 29, 120).astype(np.int32)
    seqs.append(sdeg)
    batch, lens = pack_sequences(seqs, pad_value=28)
    got = mx.scores(batch, lens)
    for s, g in zip(seqs, got):
        om.reconfig_length(len(s))
        ref = msv_filter(s, om)
        assert g == ref or (np.isinf(g) and np.isinf(ref)), (len(s), g, ref)


def test_msv_mb_matches_msv_exact_bulk(setup):
    """Bulk agreement of the [model, batch] kernel with the
    [batch, model] oracle across a large random batch (both are
    integer DPs, so equality is exact)."""
    from bath_tpu.ops.jaxk.filters_mb import MSVExactMB
    from bath_tpu.ops.jaxk.msv_exact import MSVExact

    hmm, bg, om = setup
    a = MSVExact(om)
    b = MSVExactMB(om)
    rng = np.random.default_rng(11)
    B, L = 64, 200
    batch = rng.integers(0, 21, (B, L)).astype(np.int32)
    lens = rng.integers(15, L + 1, B).astype(np.int32)
    sa = a.scores(batch, lens)
    sb = b.scores(batch, lens)
    assert np.array_equal(sa, sb, equal_nan=True), (sa, sb)


def test_fwd_mb_vs_numpy(setup):
    """[model, batch] Forward (the production device F3/F4 gate
    kernel) vs the numpy reference, mixed per-item lengths.  The
    tolerance doubles as the DEVICE_GATE_BAND evidence: band 8 allows
    ~3 bits (~2 nats) of error; the kernel's bf16 emission-table
    rounding accumulates to ~0.1 nats at L=400."""
    hmm, bg, om = setup
    rng = np.random.default_rng(3)
    dsqs = [rng.integers(0, 20, L).astype(np.int32)
            for L in (15, 37, 80, 133, 400)]
    dsqs.append(rng.integers(0, 29, 90).astype(np.int32))  # degens
    batch, lens = pack_sequences(dsqs, pad_value=28)
    fp = jk.fwd_mb_params(om)
    scores = np.asarray(jk.fwd_mb_score_batch(batch, lens, fp, nj=1.0))
    for d, s in zip(dsqs, scores):
        om.reconfig_length(len(d))
        _, ref = fb.forward(d, om)
        assert abs(s - ref) < 0.2, (len(d), s, ref)


@pytest.mark.parametrize("extra", [["--fs"], ["--fsonly"]])
def test_backend_jax_fs_golden_identical(extra):
    """Chunked device cascade with the frameshift branch (device F4
    ORF gate + device fs3 window gate) == numpy backend, byte for
    byte."""
    import re
    import subprocess
    import sys

    def run(backend, env_extra=None):
        import os
        env = dict(os.environ, BATH_JAX_PLATFORM="cpu")
        env.update(env_extra or {})
        r = subprocess.run(
            [sys.executable, "-m", "bath_tpu.cli.bathsearch",
             "--backend", backend, *extra,
             "/root/reference/tutorial/AMP_N.bhmm",
             "/root/reference/tutorial/target-AMP_N.fa"],
            capture_output=True, text=True, timeout=900,
            cwd="/root/repo", env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        return re.sub(r"# (CPU time|Mc/sec):.*", "", r.stdout)

    want = run("numpy")
    assert run("jax") == want
    # chunk-size invariance: force a flush per window
    assert run("jax", {"BATH_CHUNK_ORFS": "1"}) == want


def test_vit_mb_bitparity(setup):
    """[model, batch] ViterbiFilter == the scalar reference filter
    bit for bit, including -inf (no result) and saturation cases."""
    from bath_tpu.ops.jaxk.filters_mb import VitExactMB
    from bath_tpu.ops.reference.filters import viterbi_filter

    hmm, bg, om = setup
    vx = VitExactMB(om)
    rng = np.random.default_rng(21)
    seqs = [rng.integers(0, 20, L).astype(np.int32)
            for L in (15, 20, 64, 150, 280, 700)]
    seqs.append(rng.integers(0, 29, 90).astype(np.int32))
    batch, lens = pack_sequences(seqs, pad_value=28)
    got = vx.scores(batch, lens)
    for s, g in zip(seqs, got):
        om.reconfig_length(len(s))
        ref = viterbi_filter(s, om)
        assert g == ref or (np.isinf(g) and np.isinf(ref)
                            and (g > 0) == (ref > 0)), (len(s), g, ref)


def test_domdec_mb_vs_host(setup):
    """Fused device Forward+Backward+domain-decoding vs the host
    forward/backward parsers + fb.domain_decoding, on multi-domain
    ORFs up to 2 kaa with ragged lengths (incl. n=1)
    (ref: impl_sse/fwdback.c backward_engine + decoding.c
    p7_DomainDecoding)."""
    hmm, bg, om = setup
    p = jk.domdec_params(om)
    rng = np.random.default_rng(7)
    cons = np.argmax(hmm.mat, axis=1).astype(np.int32)
    seqs = []
    for rep in range(5):
        L = int(rng.integers(200, 1800))
        s = rng.integers(0, 20, L).astype(np.int32)
        for _ in range(1 + rep // 2):
            k0 = int(rng.integers(0, L - 130))
            s[k0:k0 + 120] = cons[5:125]
        seqs.append(s)
    seqs.append(rng.integers(0, 20, 1).astype(np.int32))
    lens = np.asarray([len(s) for s in seqs], np.int32)
    dsq = np.full((len(seqs), int(lens.max())), 28, np.int32)
    for b, s in enumerate(seqs):
        dsq[b, :len(s)] = s
    bt, et, mo, ok = (np.asarray(x) for x in
                      jk.domdec_mb_batch(dsq, lens, p, nj=1.0))
    assert ok.all()
    for b, L in enumerate(lens):
        L = int(L)
        om.reconfig_length(L)
        oxf, _ = fb.forward(seqs[b], om, full=False)
        oxb, _ = fb.backward(seqs[b], om, oxf, full=False)
        hbt, het, hmo = fb.domain_decoding(om, oxf, oxb)
        # device error must stay well inside pipeline.DOMDEC_MARGIN
        assert np.abs(bt[b, :L + 1] - hbt).max() < 5e-4
        assert np.abs(et[b, :L + 1] - het).max() < 5e-4
        assert np.abs(mo[b, :L + 1] - hmo).max() < 5e-4


def test_fs3_domdec_mb_vs_host(setup):
    """Fused device fs3 Forward+Backward parser + frameshift domain
    decoding vs the host forward_parser_fs3/backward_parser_fs3 +
    domain_decoding_fs, on multi-domain DNA windows up to ~3 kb with
    ragged lengths incl. non-multiples of 3 and of the scan block
    (ref: impl_sse/fwdback_fs.c :97,:565, decoding_fs.c :242).  The
    error bound pinned here must stay well inside
    pipeline_fs.fs_domdec_margin."""
    from bath_tpu.pipeline_fs import fs_domdec_margin

    hmm, bg, om = setup
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    gm3 = profile_config_fs(hmm, bg, gcode, 3, 100)
    om3 = ffs.fs_oprofile_convert(gm3)
    p = jk.fs3_domdec_params(om3)
    rng = np.random.default_rng(11)
    cons = np.argmax(hmm.mat, axis=1).astype(np.int32)
    aa2codon = {}
    for ci in range(64):
        a = gcode.basic[ci]
        if a < 20 and a not in aa2codon:
            aa2codon[a] = (ci // 16, (ci // 4) % 4, ci % 4)
    seqs = []
    for rep in range(5):
        L = int(rng.integers(300, 3000))
        s = rng.integers(0, 4, L).astype(np.int32)
        for _ in range(1 + rep // 2):
            k0 = int(rng.integers(0, L - 3 * 130))
            pos = k0
            for aa in cons[5:125]:
                c = aa2codon.get(int(aa))
                if c:
                    s[pos:pos + 3] = c
                    pos += 3
        seqs.append(s)
    seqs.append(rng.integers(0, 4, 31).astype(np.int32))
    lens = np.asarray([len(s) for s in seqs], np.int32)
    dsq = np.full((len(seqs), int(lens.max())), 17, np.int32)
    for b, s in enumerate(seqs):
        dsq[b, :len(s)] = s
    # per-item dec_loop = the host decoder profile's N LOOP at the
    # same length model used for the host comparison below
    dec = np.asarray([(L // 3) / ((L // 3) + 3.0) for L in lens],
                     np.float32)
    bt, et, mo, ok = (np.asarray(x) for x in jk.fs3_domdec_mb_batch(
        dsq, lens, p, dec_loop=dec, nj=1.0))
    assert ok.all()
    for b, L in enumerate(lens):
        L = int(L)
        om3.reconfig_length(L // 3)
        d = dsq[b, :L]
        oxf, _ = ffs.forward_parser_fs3(d, om3)
        oxb, _ = ffs.backward_parser_fs3(d, om3, oxf)
        hbt, het, hmo = ffs.domain_decoding_fs(om3, oxf, oxb)
        # raw cumsum drift AND the local trigger quantities must stay
        # well inside the production margin (>=3x headroom)
        bound = fs_domdec_margin(L) / 3.0
        assert np.abs(mo[b, :L + 1] - hmo).max() < bound
        db3 = (bt[b, 3:L + 1] - bt[b, :L - 2]) - (hbt[3:] - hbt[:-3])
        de3 = (et[b, 3:L + 1] - et[b, :L - 2]) - (het[3:] - het[:-3])
        assert np.abs(db3).max() < bound
        assert np.abs(de3).max() < bound


def test_region_scan_margin_fs_matches_loop(setup):
    """The fs margin dry-run detects exactly the comparisons
    by_posterior_heuristics_fs makes: a value placed within eps of
    rt1 trips, one outside does not."""
    from bath_tpu.domaindef import DomainDef, PosteriorMargin
    from bath_tpu.pipeline_fs import region_scan_margin_fs

    ddef = DomainDef()
    n = 60
    btot = np.zeros(n + 1, np.float32)
    etot = np.zeros(n + 1, np.float32)
    mocc = np.zeros(n + 1, np.float32)
    # flat non-trigger profile, one value close to rt1
    mocc[:] = 0.05
    mocc[30] = ddef.rt1 - 5e-4
    with pytest.raises(PosteriorMargin):
        region_scan_margin_fs(btot, etot, mocc, n, ddef, 1e-3)
    # outside eps: no trip
    region_scan_margin_fs(btot, etot, mocc, n, ddef, 1e-4)


def test_region_scan_margin_matches_loop(setup):
    """The side-effect-free margin dry-run detects exactly the
    comparisons by_posterior_heuristics_bath makes: a value placed
    within eps of rt1 trips, one outside does not."""
    from bath_tpu.domaindef import (DomainDef, PosteriorMargin,
                                    region_scan_margin)
    ddef = DomainDef()
    n = 10
    btot = np.zeros(n + 1, np.float32)
    etot = np.zeros(n + 1, np.float32)
    mocc = np.zeros(n + 1, np.float32)
    mocc[5] = ddef.rt1 + 5e-4          # within eps=1e-3 of trigger
    with pytest.raises(PosteriorMargin):
        region_scan_margin(btot, etot, mocc, n, ddef, 1e-3)
    mocc[5] = ddef.rt1 + 0.05          # clear of every threshold
    region_scan_margin(btot, etot, mocc, n, ddef, 1e-3)


def test_jax_backend_golden_hit_target():
    """bathsearch --backend jax on the tutorial AMP_N target (a real
    hit: F3 survivors -> device fused domain decoding) is
    byte-identical to the numpy backend, and its hit/statistics lines
    match the golden AMP_N.out."""
    import os
    import re
    import subprocess
    import sys

    def run(extra, env_extra):
        env = dict(os.environ, BATH_JAX_PLATFORM="cpu", **env_extra)
        r = subprocess.run(
            [sys.executable, "-m", "bath_tpu.cli.bathsearch", *extra,
             f"{TUT}/AMP_N.bhmm", f"{TUT}/target-AMP_N.fa"],
            capture_output=True, text=True, timeout=900,
            cwd="/root/repo", env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        return re.sub(r"# (CPU time|Mc/sec):.*", "", r.stdout)

    a = run(["--backend", "jax"],
            {"XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "BATH_MIN_DEVICE_ORFS": "1"})
    b = run([], {})
    strip = lambda s: "\n".join(l for l in s.split("\n")
                                if not l.startswith("#"))
    assert strip(a) == strip(b)
    golden = open(f"{TUT}/AMP_N.out").read()
    for needle in ("    1.4e-16   47.8   0.0  seq1",
                   "Residues passing Fwd filter:             237"):
        assert needle in golden and needle in a


def test_ssv_bath_capture_device_parity(setup):
    """Device SSV_BATH capture events + host walks == the scalar
    window-capture scan, window-for-window (n, k, length, f32 score)
    on hot ORFs and random aminos; P=1 (--max) overflows the capture
    slots and reports fallback (ref: impl_sse/msvfilter.c :250)."""
    from bath_tpu.gencode import extract_orfs
    from bath_tpu.ops.jaxk.filters_mb import MSVExactMB, SSVBathMB
    from bath_tpu.ops.reference import filters as flt
    from bath_tpu.scoredata import score_data_create
    import bath_tpu.native as nat

    hmm, bg, om = setup
    data = score_data_create(om)
    msv = MSVExactMB(om)
    ssvb = SSVBathMB(om, msv)
    rng = np.random.default_rng(17)
    seq = "".join(l.strip() for l in open(f"{TUT}/target-AMP_N.fa")
                  if not l.startswith(">"))
    mp = {"A": 0, "C": 1, "G": 2, "T": 3}
    hot = np.array([mp[c] for c in seq], np.int32)
    gc = GeneticCode.create(1)
    gc.set_initiator_any()
    cases = [orf.dsq for orf in extract_orfs(gc, hot, minlen=20)]
    cases.append(rng.integers(0, 20, 200).astype(np.int32))
    # batch: pad to one shape
    Lmax = max(len(d) for d in cases)
    B = len(cases)
    batch = np.full((B, Lmax), 28, np.int8)
    lens = np.zeros(B, np.int32)
    thr = np.zeros(B, np.int32)
    nulls = np.zeros(B)
    for r, d in enumerate(cases):
        batch[r, :len(d)] = d
        lens[r] = len(d)
        om.reconfig_length(len(d))
        bg.set_length(len(d))
        nulls[r] = bg.null_one(len(d))
        thr[r] = flt.ssv_thresh_bath(om, nulls[r], 0.02)
    nwin, wi, wk, wsc = (np.asarray(x) for x in
                         ssvb.captures(batch, lens, thr))
    for r, d in enumerate(cases):
        om.reconfig_length(len(d))
        w1: list = []
        orig = nat.ssv_filter_bath_native
        nat.ssv_filter_bath_native = lambda *a: None
        try:
            flt.ssv_filter_bath(d, om, data, nulls[r], 0.02, w1)
        finally:
            nat.ssv_filter_bath_native = orig
        w2: list = []
        nv = int(nwin[r])
        caps = (nv, list(zip(wi[:nv, r], wk[:nv, r], wsc[:nv, r])))
        ok = flt.ssv_windows_from_captures(d, om, data, caps, w2)
        assert ok, r
        a = [(w.n, w.k, w.length, w.score) for w in w1]
        b = [(w.n, w.k, w.length, w.score) for w in w2]
        assert a == b, (r, a, b)
    # P=1: threshold is -2^30, every row captures -> overflow -> the
    # from-captures path must report fallback
    thr1 = np.full(B, -(1 << 30), np.int32)
    nwin1, wi1, wk1, wsc1 = (np.asarray(x) for x in
                             ssvb.captures(batch, lens, thr1))
    r = int(np.argmax(lens))
    assert int(nwin1[r]) > 16
    caps = (int(nwin1[r]), list(zip(wi1[:, r], wk1[:, r], wsc1[:, r])))
    assert not flt.ssv_windows_from_captures(
        cases[r], om, data, caps, [])


def test_vit_bath_capture_device_parity(setup):
    """Device ViterbiFilter_BATH crossing events + host replay ==
    the scalar window-capture scan, window-for-window (n, k, length)
    on hot ORFs and random aminos; skip_until suppression happens in
    the replay, so the windows (not just the events) must agree
    (ref: impl_sse/vitfilter.c :286)."""
    from bath_tpu.gencode import extract_orfs
    from bath_tpu.ops.jaxk.filters_mb import VitBathMB, VitExactMB
    from bath_tpu.ops.reference import filters as flt
    from bath_tpu.scoredata import score_data_create
    import bath_tpu.native as nat

    hmm, bg, om = setup
    data = score_data_create(om)
    vit = VitExactMB(om)
    vitb = VitBathMB(om, vit)
    rng = np.random.default_rng(23)
    seq = "".join(l.strip() for l in open(f"{TUT}/target-AMP_N.fa")
                  if not l.startswith(">"))
    mp = {"A": 0, "C": 1, "G": 2, "T": 3}
    hot = np.array([mp[c] for c in seq], np.int32)
    gc = GeneticCode.create(1)
    gc.set_initiator_any()
    cases = [orf.dsq for orf in extract_orfs(gc, hot, minlen=20)]
    cases.append(rng.integers(0, 20, 200).astype(np.int32))
    P = 0.02
    Lmax = max(len(d) for d in cases)
    B = len(cases)
    batch = np.full((B, Lmax), 28, np.int8)
    lens = np.zeros(B, np.int32)
    thr = np.zeros(B, np.int32)
    exts = np.zeros(B, np.int64)
    nulls = np.zeros(B)
    for r, d in enumerate(cases):
        batch[r, :len(d)] = d
        lens[r] = len(d)
        om.reconfig_length(len(d))
        bg.set_length(len(d))
        nulls[r] = bg.null_one(len(d))
        thr[r], exts[r] = flt.vit_thresh_bath(om, nulls[r], P)
    karr, ovfrow = (np.asarray(x) for x in
                    vitb.captures(batch, lens, thr))
    # the hot full-length ORF saturates int16 mid-scan: the replay
    # must keep exactly the events before the overflow row, as the
    # reference keeps windows appended before its eslERANGE return
    assert (ovfrow > 0).any()
    for r, d in enumerate(cases):
        om.reconfig_length(len(d))
        w1: list = []
        orig = nat.vit_filter_bath_native
        nat.vit_filter_bath_native = lambda *a: None
        try:
            sc1 = flt.viterbi_filter(d, om, data, nulls[r], P, w1)
        finally:
            nat.vit_filter_bath_native = orig
        rows = np.nonzero(karr[:len(d), r])[0]
        if ovfrow[r] > 0:
            assert sc1 == float("inf")
            rows = rows[rows + 1 < ovfrow[r]]
        w2: list = []
        flt.vit_windows_from_captures(
            d, om, data, rows + 1, karr[rows, r], w2, int(exts[r]))
        a = [(w.n, w.k, w.length) for w in w1]
        b = [(w.n, w.k, w.length) for w in w2]
        assert a == b, (r, a, b)
    # P=1: threshold -2^30, every row is an event; replay still
    # reproduces the scalar scan because skip_until suppresses in
    # the same order (no slot limit in the dense event array)
    thr1 = np.full(B, -(1 << 30), np.int32)
    karr1, ovfrow1 = (np.asarray(x) for x in
                      vitb.captures(batch, lens, thr1))
    for r in (int(np.argmax(lens)), len(cases) - 1):
        d = cases[r]
        om.reconfig_length(len(d))
        _, ext1 = flt.vit_thresh_bath(om, nulls[r], 1.0)
        w1 = []
        orig = nat.vit_filter_bath_native
        nat.vit_filter_bath_native = lambda *a: None
        try:
            flt.viterbi_filter(d, om, data, nulls[r], 1.0, w1)
        finally:
            nat.vit_filter_bath_native = orig
        rows = np.nonzero(karr1[:len(d), r])[0]
        if ovfrow1[r] > 0:
            rows = rows[rows + 1 < ovfrow1[r]]
        w2 = []
        flt.vit_windows_from_captures(
            d, om, data, rows + 1, karr1[rows, r], w2, int(ext1))
        assert [(w.n, w.k, w.length) for w in w1] \
            == [(w.n, w.k, w.length) for w in w2], r


def test_msv_stream_packed_bitparity(setup):
    """Stream-packed MSV/SSV (dense [T,S] planes, reset-at-start,
    latch-at-end) == the bucketed MSVExactMB scores bit-for-bit over
    mixed-length random ORFs + hot ORFs, via the production
    msv_scores flat/offs path."""
    from bath_tpu.device_pipeline import DeviceCascade
    from bath_tpu.gencode import extract_orfs

    hmm, bg, om = setup
    cascade = DeviceCascade(om)
    rng = np.random.default_rng(23)
    seq = "".join(l.strip() for l in open(f"{TUT}/target-AMP_N.fa")
                  if not l.startswith(">"))
    mp = {"A": 0, "C": 1, "G": 2, "T": 3}
    hot = np.array([mp[c] for c in seq], np.int32)
    gc = GeneticCode.create(1)
    gc.set_initiator_any()
    cases = [orf.dsq for orf in extract_orfs(gc, hot, minlen=20)]
    for L in (20, 21, 37, 64, 65, 150, 192, 193, 500, 2500):
        cases.append(rng.integers(0, 20, L).astype(np.int32))
    for _ in range(300):   # enough mass for several streams
        cases.append(rng.integers(
            0, 20, int(rng.integers(20, 90))).astype(np.int32))
    lens = np.array([len(c) for c in cases], np.int64)
    flat = np.concatenate(cases).astype(np.int8)
    offs = np.zeros(len(cases), np.int64)
    np.cumsum(lens[:-1], out=offs[1:])

    a = cascade.msv_scores(None, lens, flat=flat, offs=offs)
    import os
    os.environ["BATH_MSV_STREAM"] = "0"
    try:
        b = cascade.msv_scores(None, lens, flat=flat, offs=offs)
    finally:
        del os.environ["BATH_MSV_STREAM"]
    assert np.array_equal(np.asarray(a), np.asarray(b)), \
        (np.nonzero(a != b), a[a != b], b[a != b])
