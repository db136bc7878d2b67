"""Calibration: lambda exact vs golden .bhmm; simulated mu/tau within
the reference's stated simulation precision (ref: evalues.c docs,
J1/135: +/- 0.1-0.2 bits standard deviation; we allow 3 sigma)."""

import numpy as np
import pytest

from bath_tpu import constants as C
from bath_tpu.evalues import (CalibrateConfig, calibrate, lambda_param,
                              mean_match_relative_entropy)
from bath_tpu.bg import Background
from bath_tpu.hmmfile import read_hmm
from bath_tpu.rng import Randomness

TUT = "/root/reference/tutorial"


def test_lambda_exact_vs_golden():
    for name in ("AMP_N", "PTH2"):
        h = read_hmm(f"{TUT}/{name}.bhmm")
        lam = lambda_param(h, Background())
        assert lam == pytest.approx(h.evparam[C.EV_MLAMBDA], abs=5e-5), name


def test_calibrate_within_sim_precision():
    h = read_hmm(f"{TUT}/AMP_N.bhmm")
    golden = h.evparam.copy()
    calibrate(h, CalibrateConfig(fs=True))
    assert abs(h.evparam[C.EV_MMU] - golden[C.EV_MMU]) < 0.5
    assert abs(h.evparam[C.EV_VMU] - golden[C.EV_VMU]) < 0.5
    assert abs(h.evparam[C.EV_FTAU] - golden[C.EV_FTAU]) < 0.7
    assert abs(h.evparam[C.EV_FTAUFS3] - golden[C.EV_FTAUFS3]) < 0.7
    assert abs(h.evparam[C.EV_FTAUFS5] - golden[C.EV_FTAUFS5]) < 0.7


@pytest.mark.slow
def test_bathbuild_backend_jax_matches_numpy(tmp_path):
    """bathbuild --backend jax (deferred device-batched calibration):
    identical model except the simulated STATS rows, which agree
    within simulation noise."""
    from bath_tpu.cli.bathbuild import main as build_main

    outs = {}
    for bk in ("numpy", "jax"):
        out = tmp_path / f"b_{bk}.bhmm"
        log = tmp_path / f"b_{bk}.log"
        rc = build_main([str(out), "/root/reference/tutorial/MET.msa",
                         "--backend", bk, "-o", str(log)])
        assert rc == 0 or rc is None
        outs[bk] = [ln for ln in out.read_text().splitlines()
                    if not ln.startswith("DATE")]   # build timestamp
    assert len(outs["numpy"]) == len(outs["jax"])
    for a, b in zip(outs["numpy"], outs["jax"]):
        if a == b:
            continue
        assert a.split()[0] == "STATS", (a, b)
        fa, fb = float(a.split()[-2]), float(b.split()[-2])
        assert abs(fa - fb) < 0.2, (a, b)


def test_rng_mt19937_reference_vector():
    """First outputs of MT19937 seeded 42 (public algorithm test
    vector, cross-checked against numpy's raw MT19937 stream)."""
    r = Randomness(42)
    got = [r.u32() for _ in range(4)]
    rs = np.random.RandomState(42)
    exp = [int(rs.randint(0, 2 ** 32)) for _ in range(4)]
    assert got == exp


@pytest.mark.slow
def test_calibrate_many_device_matches_host():
    """Device-batched calibration (evalues_device.py): MSV/Vit mus
    come from the bit-exact u8/int16 device kernels (identical to
    host), taus from the f32 device gates (well inside the +/-0.1-0.2
    bit simulation noise, J1/135)."""
    from bath_tpu.evalues_device import calibrate_many_device

    names = ("AMP_N", "PTH2")
    dev = [read_hmm(f"{TUT}/{n}.bhmm") for n in names]
    host = [read_hmm(f"{TUT}/{n}.bhmm") for n in names]
    for h in host:
        calibrate(h, CalibrateConfig(fs=True))
    calibrate_many_device(dev, CalibrateConfig(fs=True))
    for d, h in zip(dev, host):
        assert d.evparam[C.EV_MMU] == h.evparam[C.EV_MMU], d.name
        assert d.evparam[C.EV_VMU] == h.evparam[C.EV_VMU], d.name
        assert abs(d.evparam[C.EV_FTAU]
                   - h.evparam[C.EV_FTAU]) < 0.05, d.name
        assert abs(d.evparam[C.EV_FTAUFS3]
                   - h.evparam[C.EV_FTAUFS3]) < 0.05, d.name
        assert abs(d.evparam[C.EV_FTAUFS5]
                   - h.evparam[C.EV_FTAUFS5]) < 0.05, d.name
        assert abs(d.evparam[C.EV_MLAMBDA]
                   - h.evparam[C.EV_MLAMBDA]) < 1e-12


@pytest.mark.slow
def test_bathconvert_backend_jax_matches_numpy(tmp_path):
    """bathconvert --backend jax: fs taus within simulation noise of
    the serial numpy backend, everything else byte-identical."""
    from bath_tpu.cli.bathconvert import main as convert_main

    outs = {}
    for bk in ("numpy", "jax"):
        out = tmp_path / f"conv_{bk}.bhmm"
        rc = convert_main([str(out), f"{TUT}/tRNA-proteins.hmm",
                           "--backend", bk])
        assert rc == 0 or rc is None
        outs[bk] = out.read_text().splitlines()
    assert len(outs["numpy"]) == len(outs["jax"])
    ndiff = 0
    for a, b in zip(outs["numpy"], outs["jax"]):
        if a == b:
            continue
        assert a.split()[0] == "STATS" and b.split()[0] == "STATS"
        # STATS FRAMESHIFT lines: tau within sim noise
        fa, fb = float(a.split()[-2]), float(b.split()[-2])
        assert abs(fa - fb) < 0.2, (a, b)
        ndiff += 1
    assert ndiff <= 2 * 10   # only the two fs STATS rows per model
    r1, r2 = Randomness(7), Randomness(7)
    p = np.array([0.2, 0.3, 0.5])
    a = [r1.f_choose(p) for _ in range(50)]
    b = [r2.f_choose(p) for _ in range(50)]
    assert a == b
    s = r1.sample_iid(p, 2000)
    freq = np.bincount(s, minlength=3) / 2000
    assert np.allclose(freq, p, atol=0.05)
