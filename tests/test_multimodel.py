"""Lane-packed multi-model kernel parity: packed G-model device calls
must reproduce the per-model single-model calls (the only arithmetic
difference is added exact zeros in the one-hot emission dots and the
batched block-diagonal closure matmuls — see ops/jaxk/multimodel.py).
"""

import numpy as np
import pytest

TUT = "/root/reference/tutorial"
TS = "/root/reference/testsuite"


@pytest.fixture(scope="module")
def models():
    from bath_tpu.bg import Background
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.profile import profile_config
    out = []
    for path in (f"{TUT}/AMP_N.bhmm", f"{TUT}/PTH2.bhmm",
                 f"{TS}/2OG-FeII_Oxy_3.bhmm"):
        hmm = read_hmm(path)
        bg = Background()
        gm = profile_config(hmm, bg, L=100)
        out.append((hmm, bg, oprofile_convert(gm)))
    return out


@pytest.fixture(scope="module")
def fs_models(models):
    from bath_tpu.gencode import GeneticCode
    from bath_tpu.ops.reference.fwdback_fs import fs_oprofile_convert
    from bath_tpu.profile import profile_config_fs
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    return [(hmm, fs_oprofile_convert(
        profile_config_fs(hmm, bg, gcode, 3, 100)))
        for hmm, bg, _ in models]


def _amino_batch(rng, n, L):
    return rng.integers(0, 20, (n, L)).astype(np.int8), \
        rng.integers(L // 2, L + 1, n).astype(np.int32)


def _nt_batch(rng, n, L):
    return rng.integers(0, 4, (n, L)).astype(np.int8), \
        (rng.integers(L // 6, L // 3 + 1, n) * 3).astype(np.int32)


def _mixed(rng, nmodels, per, mk):
    """Interleaved columns: per columns per model, shuffled."""
    slot = np.repeat(np.arange(nmodels, dtype=np.int32), per)
    rng.shuffle(slot)
    return slot


def test_fwd_pack_matches_single(models):
    from bath_tpu.ops.jaxk import kernels as jk
    from bath_tpu.ops.jaxk import multimodel as mm
    rng = np.random.default_rng(3)
    comps = [mm.fwd_components(om) for _, _, om in models]
    G, Mg = 4, 256
    pack = mm.build_fwd_pack(comps, G, Mg)
    n, L = 24, 96
    dsq, lens = _amino_batch(rng, n, L)
    slot = _mixed(rng, len(models), n // len(models), None)
    got = np.asarray(mm.fwd_pack_scores(pack, dsq, lens, slot))
    for g, (_, _, om) in enumerate(models):
        p = jk.fwd_mb_params(om)
        idx = np.nonzero(slot == g)[0]
        want = np.asarray(jk.fwd_mb_score_batch(
            dsq[idx], lens[idx], p, nj=1.0))
        np.testing.assert_allclose(got[idx], want, rtol=0, atol=1e-5)


def test_domdec_pack_matches_single(models):
    from bath_tpu.ops.jaxk import kernels as jk
    from bath_tpu.ops.jaxk import multimodel as mm
    rng = np.random.default_rng(5)
    comps = [mm.domdec_components(om) for _, _, om in models]
    G, Mg = 4, 256
    pack = mm.build_domdec_pack(comps, G, Mg)
    n, L = 12, 64
    dsq, lens = _amino_batch(rng, n, L)
    slot = _mixed(rng, len(models), n // len(models), None)
    bt, et, mo, ok = (np.asarray(a) for a in
                      mm.domdec_pack_batch(pack, dsq, lens, slot))
    for g, (_, _, om) in enumerate(models):
        p = jk.domdec_params(om)
        idx = np.nonzero(slot == g)[0]
        wbt, wet, wmo, wok = (np.asarray(a) for a in
                              jk.domdec_mb_batch(dsq[idx], lens[idx],
                                                 p, nj=1.0))
        assert (ok[idx] == wok).all()
        for a, b in ((bt, wbt), (et, wet), (mo, wmo)):
            np.testing.assert_allclose(a[idx], b, rtol=0, atol=2e-5)


def test_fs3_pack_matches_single(fs_models):
    from bath_tpu.ops.jaxk import kernels as jk
    from bath_tpu.ops.jaxk import multimodel as mm
    rng = np.random.default_rng(7)
    comps = [mm.fs3_components(om) for _, om in fs_models]
    G, Mg = 4, 256
    pack = mm.build_fs3_pack(comps, G, Mg)
    n, L = 12, 240
    dsq, lens = _nt_batch(rng, n, L)
    slot = _mixed(rng, len(fs_models), n // len(fs_models), None)
    got = np.asarray(mm.fs3_pack_scores(pack, dsq, lens, slot))
    for g, (_, om) in enumerate(fs_models):
        p = jk.fs3_params(om)
        idx = np.nonzero(slot == g)[0]
        want = np.asarray(jk.fs3_score_batch(dsq[idx], lens[idx], p,
                                             nj=1.0))
        np.testing.assert_allclose(got[idx], want, rtol=0, atol=1e-5)


def test_fs3_domdec_pack_matches_single(fs_models):
    from bath_tpu.ops.jaxk import kernels as jk
    from bath_tpu.ops.jaxk import multimodel as mm
    rng = np.random.default_rng(11)
    comps = [mm.fs3_domdec_components(om) for _, om in fs_models]
    G, Mg = 4, 256
    pack = mm.build_fs3_domdec_pack(comps, G, Mg)
    n, L = 9, 180
    dsq, lens = _nt_batch(rng, n, L)
    slot = _mixed(rng, len(fs_models), n // len(fs_models), None)
    dec_loop = np.float32(0.97) * np.ones(n, np.float32)
    bt, et, mo, ok = (np.asarray(a) for a in mm.fs3_domdec_pack_batch(
        pack, dsq, lens, slot, dec_loop))
    for g, (_, om) in enumerate(fs_models):
        p = jk.fs3_domdec_params(om)
        idx = np.nonzero(slot == g)[0]
        wbt, wet, wmo, wok = (np.asarray(a) for a in
                              jk.fs3_domdec_mb_batch(
                                  dsq[idx], lens[idx], p,
                                  dec_loop=0.97, nj=1.0))
        assert (ok[idx] == wok).all()
        for a, b in ((bt, wbt), (et, wet), (mo, wmo)):
            np.testing.assert_allclose(a[idx], b, rtol=0, atol=2e-5)


def test_pack_rejects_oversize_model():
    from bath_tpu.ops.jaxk import multimodel as mm
    with pytest.raises(ValueError):
        mm._check_fit([{"M": 256, "Mt": 256}], 256)
