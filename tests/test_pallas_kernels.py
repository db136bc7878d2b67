"""Pallas TPU kernel vs jnp reference parity (interpreter mode so the
test runs on CPU; the same kernel compiles via Mosaic on TPU —
exercised by bench.py --pallas)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from bath_tpu.bg import Background
from bath_tpu.gencode import GeneticCode
from bath_tpu.hmmfile import read_hmm
from bath_tpu.ops.jaxk import kernels as jk
from bath_tpu.ops.pallas.fs3 import (codon_indices_fs3, fs3_params_pallas,
                                     fs3_score_pallas)
from bath_tpu.ops.reference.fwdback_fs import fs_oprofile_convert
from bath_tpu.profile import profile_config_fs

TUT = "/root/reference/tutorial"


def test_fs3_pallas_vs_jnp_interpret():
    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    bg = Background()
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    om3 = fs_oprofile_convert(profile_config_fs(hmm, bg, gcode, 3, 100))
    rfv, tr, Mp = fs3_params_pallas(om3)
    rng = np.random.default_rng(0)
    B, L = 8, 120
    dsq = rng.integers(0, 4, (B, L)).astype(np.int32)
    lens_np = np.full(B, L, np.int32)
    lens_np[3] = 96
    ci = tuple(jnp.asarray(c) for c in codon_indices_fs3(dsq))
    lens = jnp.asarray(lens_np)
    pmove = jnp.asarray((3.0 / (lens_np // 3 + 3.0)).astype(np.float32))
    out = fs3_score_pallas(ci, lens, pmove, rfv, tr, Mp, nj=1.0,
                           interpret=True, btile=8, lblk=24)
    ref = jk.fs3_score_batch(jnp.asarray(dsq), lens,
                             jk.fs3_params(om3), nj=1.0)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 0.01


def test_fs3_sub_pallas_vs_jnp_interpret():
    """VMEM-resident sublane-layout fs3 kernel vs the jnp kernel:
    mixed lengths including non-multiples of the 24-position block
    and a never-finishing lane (-inf contract), plus batch padding
    (B=6 not a multiple of btile=8 exercises the pad path)."""
    from bath_tpu.ops.pallas.fs3_sub import fs3_params_sub, fs3_score_sub

    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    bg = Background()
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    om3 = fs_oprofile_convert(profile_config_fs(hmm, bg, gcode, 3, 100))
    params = fs3_params_sub(om3)
    rng = np.random.default_rng(7)
    B, L = 6, 48
    dsq = rng.integers(0, 4, (B, L)).astype(np.int32)
    lens_np = np.array([48, 40, 37, 48, 0, 29], np.int32)
    out = np.asarray(fs3_score_sub(
        jnp.asarray(dsq), jnp.asarray(lens_np), params, nj=1.0,
        btile=8, lblk=24, interpret=True))
    ref = np.asarray(jk.fs3_score_batch(
        jnp.asarray(dsq), jnp.asarray(lens_np), jk.fs3_params(om3),
        nj=1.0))
    assert out[4] == -np.inf and ref[4] == -np.inf
    fin = np.isfinite(ref)
    assert np.abs(out[fin] - ref[fin]).max() < 0.02, (out, ref)


def test_fs3_v2_pallas_vs_jnp_interpret():
    """v2 (W3-only MXU closure, write-time ring folding) vs the jnp
    kernel: mixed lengths including non-multiples of the 24-position
    block and a never-finishing lane (-inf contract), plus batch
    padding (B=6 not a multiple of btile=8)."""
    from bath_tpu.ops.pallas.fs3v2 import fs3_params_v2, fs3_score_v2

    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    bg = Background()
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    om3 = fs_oprofile_convert(profile_config_fs(hmm, bg, gcode, 3, 100))
    params = fs3_params_v2(om3)
    rng = np.random.default_rng(7)
    B, L = 6, 48
    dsq = rng.integers(0, 4, (B, L)).astype(np.int32)
    lens_np = np.array([48, 40, 37, 48, 0, 29], np.int32)
    out = np.asarray(fs3_score_v2(
        jnp.asarray(dsq), jnp.asarray(lens_np), params, nj=1.0,
        btile=8, lblk=24, interpret=True))
    ref = np.asarray(jk.fs3_score_batch(
        jnp.asarray(dsq), jnp.asarray(lens_np), jk.fs3_params(om3),
        nj=1.0))
    assert out[4] == -np.inf and ref[4] == -np.inf
    fin = np.isfinite(ref)
    assert np.abs(out[fin] - ref[fin]).max() < 0.02, (out, ref)


def test_ssv_pallas_vs_scalar_interpret():
    """Pallas SSV xEu == the scalar SSV inner-loop running uint8 max,
    bit for bit (ref: ssvfilter.c :875)."""
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.ops.pallas.ssv import ssv_params_pallas, ssv_xe_pallas
    from bath_tpu.profile import profile_config

    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    om = oprofile_convert(profile_config(hmm, Background(), L=100))
    sbv_dev, Mp = ssv_params_pallas(om)
    M = om.M
    sbv = om.sbv.astype(np.int64)     # [Kp, M+1]

    def scalar_xe(s):
        d = np.full(M + 1, -128, np.int64)
        xe = 0
        for x in s:
            row = sbv[x]
            d2 = np.empty_like(d)
            d2[0] = -128
            d2[1:] = np.clip(d[:-1] - row[1:], -128, 127)
            d = d2
            xe = max(xe, int((d[1:] & 0xFF).max(initial=0)))
        return xe

    rng = np.random.default_rng(21)
    B = 8
    seqs = [rng.integers(0, 20, L).astype(np.int32)
            for L in (16, 40, 64, 64, 100, 128, 7, 128)]
    Lmax = max(len(s) for s in seqs)
    batch = np.zeros((Lmax, B), np.int32)
    lens = np.array([len(s) for s in seqs], np.int32)
    for i, s in enumerate(seqs):
        batch[:len(s), i] = s
    got = np.asarray(ssv_xe_pallas(jnp.asarray(batch),
                                   jnp.asarray(lens), sbv_dev, Mp,
                                   interpret=True, btile=8, lblk=32))
    want = np.array([scalar_xe(s) for s in seqs])
    assert np.array_equal(got, want), (got, want)


def test_vit_pallas_vs_jnp_exact_interpret():
    """Pallas ViterbiFilter ints == the bit-exact jnp VitExact path
    (itself validated against the scalar reference)."""
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.ops.jaxk.msv_exact import VitExact
    from bath_tpu.ops.pallas.vit import vit_ints_pallas, vit_params_pallas
    from bath_tpu.profile import profile_config

    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    om = oprofile_convert(profile_config(hmm, Background(), L=100))
    vx = VitExact(om)
    rwv, tr, Mp, base, emove, eloop = vit_params_pallas(om)

    rng = np.random.default_rng(13)
    B = 8
    seqs = [rng.integers(0, 20, L).astype(np.int32)
            for L in (24, 48, 64, 64, 96, 128, 9, 128)]
    Lmax = max(len(s) for s in seqs)
    batch_bl = np.full((B, Lmax), 28, np.int32)   # msv_exact layout
    lens = np.array([len(s) for s in seqs], np.int32)
    for i, s in enumerate(seqs):
        batch_bl[i, :len(s)] = s
    want = vx.scores(batch_bl, lens)

    movew = vx.move_for(lens)
    got_i, got_has, got_ovf = vit_ints_pallas(
        jnp.asarray(batch_bl.T.copy()), jnp.asarray(lens),
        jnp.asarray(movew), rwv, tr, Mp, base, emove, eloop,
        interpret=True, btile=8, lblk=32)
    ints = np.asarray(got_i).astype(np.float64)
    sc = np.float32((ints - float(base)) / vx.scale - 3.0)
    sc = np.where(np.asarray(got_has), sc, np.float32(-np.inf))
    got = np.where(np.asarray(got_ovf), np.float32(np.inf), sc)
    assert np.array_equal(got, want), (got, want)


def test_fwd_pallas_vs_jnp_interpret():
    """Pallas Forward gate vs the batched jnp Forward (per-item
    length models), float-tolerance parity."""
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.ops.pallas.fwd import fwd_params_pallas, fwd_score_pallas
    from bath_tpu.profile import profile_config

    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    om = oprofile_convert(profile_config(hmm, Background(), L=100))
    rfv, tr, U, Mp = fwd_params_pallas(om)
    p = jk.fwd_params(om)
    rng = np.random.default_rng(31)
    B, Lmax = 8, 96
    lens_np = np.array([96, 64, 40, 96, 17, 80, 96, 33], np.int32)
    batch = np.full((B, Lmax), 28, np.int32)
    for i, L in enumerate(lens_np):
        batch[i, :L] = rng.integers(0, 20, L)
    got = np.asarray(fwd_score_pallas(
        jnp.asarray(batch.T.copy()), jnp.asarray(lens_np), rfv, tr,
        U, Mp, nj=1.0, interpret=True, btile=8, lblk=32))
    ref = np.asarray(jk._forward_score_perlen_impl(
        jnp.asarray(batch), jnp.asarray(lens_np), p.rfv, p.tBM,
        p.tMM, p.tIM, p.tDM, p.tMD, p.tDD, p.tMI, p.tII, nj=1.0,
        Mp=p.Mp, U=p.U))
    assert np.abs(got - ref).max() < 0.01, (got, ref)
