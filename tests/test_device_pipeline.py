"""DEVICE_GATE_BAND contract: bathsearch --backend jax output bytes
are invariant to device gate-score error within the band.

The chunked device cascade (device_pipeline.py) hard-rejects a
Forward/fs3 candidate only when its device P-value exceeds
threshold * DEVICE_GATE_BAND; every other candidate is re-scored by
the bit-exact host kernel.  The contract (pipeline.py
DEVICE_GATE_BAND): output bytes equal the numpy backend's as long as
the device score error stays below ln(BAND)/lambda bits.  These tests
prove it constructively by injecting worst-case alternating-sign
score error (the BATH_DEVICE_PERTURB hook in device_pipeline.py)
just under the bound and asserting byte-identical output; the real
kernels' measured error is ~0.01 bits (tests/test_jax_kernels.py
test_fwd_mb_vs_numpy), ~200x inside the band.
"""

import math
import os
import re
import subprocess
import sys

import pytest

TUT = "/root/reference/tutorial"
LN2 = math.log(2.0)


def run_search(backend, extra=(), env_extra=None):
    env = dict(os.environ, BATH_JAX_PLATFORM="cpu")
    env.update(env_extra or {})
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch",
         "--backend", backend, *extra,
         f"{TUT}/AMP_N.bhmm", f"{TUT}/target-AMP_N.fa"],
        capture_output=True, text=True, timeout=900,
        cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return re.sub(r"# (CPU time|Mc/sec):.*", "", r.stdout)


def band_bound_nats():
    """Max device score error (nats) that cannot change gate
    decisions: seqsc error of ln(BAND)/lambda bits, converted to
    nats.  lambda from the query's calibrated Forward tail."""
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu import constants as C
    from bath_tpu.pipeline import DEVICE_GATE_BAND
    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    flambda = float(hmm.evparam[C.EV_FLAMBDA])
    return math.log(DEVICE_GATE_BAND) / flambda * LN2


@pytest.mark.parametrize("extra", [[], ["--fs"]])
@pytest.mark.parametrize("sign", [1.0, -1.0])
def test_gate_band_perturbation_byte_invariant(extra, sign):
    """Inject 0.9 * ln(BAND)/lambda bits of device gate-score error
    (alternating-sign, and the uniform-downward worst case that
    inflates every P toward false hard-rejects); bytes must not
    change (std and --fs cascades)."""
    eps = sign * 0.9 * band_bound_nats()
    assert abs(eps) > 1.0     # sanity: the band allows >1 nat of error
    want = run_search("numpy", extra)
    # force device engagement: the adaptive cascade would otherwise
    # finish this tiny fixture on host, making the perturbation a
    # no-op (the overdrive test below proves the hook bites)
    got = run_search("jax", extra,
                     env_extra={"BATH_DEVICE_PERTURB": f"{eps:.6f}",
                                "BATH_DEVICE_MIN_CELLS": "0",
                                "BATH_FS_CAND_FLUSH": "0"})
    assert got == want


def test_gate_band_overdrive_changes_decisions():
    """The perturbation hook is live: pushing the error far beyond
    the band (-60 nats uniform — AMP_N's true hit sits ~30 nats
    above the gate) must hard-reject true hits and change the
    output — i.e. the band test above has teeth."""
    want = run_search("numpy")
    got = run_search("jax",
                     env_extra={"BATH_DEVICE_PERTURB": "-60.0",
                                "BATH_DEVICE_MIN_CELLS": "0"})
    assert got != want


def test_vit_capture_device_byte_identical():
    """--F2 2e-4 forces AMP_N's L=27 ORF through the
    ViterbiFilter_BATH capture branch (bias-P 2.2e-4 > F2 >= vit-P
    1.9e-4, both measured in-pipeline): the device crossing-event scan + host replay must leave
    output bytes identical to the numpy backend, and the vitcap
    device stage must actually have fired (ref: impl_sse/vitfilter.c
    :286)."""
    extra = ["--F2", "2e-4"]
    want = run_search("numpy", extra)
    env = dict(os.environ, BATH_JAX_PLATFORM="cpu",
               BATH_DEVICE_STATS="1")
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch",
         "--backend", "jax", *extra,
         f"{TUT}/AMP_N.bhmm", f"{TUT}/target-AMP_N.fa"],
        capture_output=True, text=True, timeout=900,
        cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    got = re.sub(r"# (CPU time|Mc/sec):.*", "", r.stdout)
    assert got == want
    assert "device-stats vitcap: calls=" in r.stderr, r.stderr[-800:]


def test_msv_hybrid_cascade_byte_identical():
    """The production default (BATH_MSV_DEVICE=auto -> host-native
    MSV gate + device downstream stages) is byte-identical to the
    numpy backend, and the device MSV stages really are bypassed.
    The hybrid split is the measured optimum on this hardware: the
    u8 max-plus MSV DP runs at 54-79 GC/s on the host's AVX-512 vs
    ~35-70 GCUPS-effective on the TPU VPU, while the f32 gates go
    the other way (48 vs 0.69 GCUPS)."""
    want = run_search("numpy")
    env = dict(os.environ, BATH_JAX_PLATFORM="cpu",
               BATH_MSV_DEVICE="0", BATH_VIT_DEVICE="0",
               BATH_DEVICE_STATS="1", BATH_DEVICE_MIN_CELLS="0")
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch",
         "--backend", "jax",
         f"{TUT}/AMP_N.bhmm", f"{TUT}/target-AMP_N.fa"],
        capture_output=True, text=True, timeout=900,
        cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    got = re.sub(r"# (CPU time|Mc/sec):.*", "", r.stdout)
    assert got == want
    assert "device-stats msv" not in r.stderr
    assert "device-stats vit" not in r.stderr
    assert "device-stats fwd: calls=" in r.stderr, r.stderr[-800:]


def test_fs3_v2_kernel_selection_byte_identical():
    """BATH_FS3_KERNEL=v2 routes the fs3 gate through the Pallas v2
    kernel (interpret mode on cpu); output bytes must equal the numpy
    backend's (the banded-gate contract absorbs the kernel's ~4e-4
    nat bf16 drift)."""
    a = run_search("numpy", ["--fs"])
    b = run_search("jax", ["--fs"],
                   env_extra={"BATH_FS3_KERNEL": "v2",
                              "BATH_DEVICE_MIN_CELLS": "0",
                              "BATH_FS_CAND_FLUSH": "0"})
    assert a == b


def test_deferred_axon_registration_noop_paths():
    """ensure_axon_registered: inert without BATH_AXON_DEFER_IPS, and
    inert when PALLAS_AXON_POOL_IPS is already set (sitecustomize
    registered eagerly) — it must never double-register or mutate the
    env in those cases."""
    import os

    from bath_tpu.device_pipeline import ensure_axon_registered

    saved = {k: os.environ.pop(k, None)
             for k in ("BATH_AXON_DEFER_IPS", "PALLAS_AXON_POOL_IPS")}
    try:
        ensure_axon_registered()          # no defer env: no-op
        assert "PALLAS_AXON_POOL_IPS" not in os.environ
        os.environ["PALLAS_AXON_POOL_IPS"] = "10.0.0.1"
        os.environ["BATH_AXON_DEFER_IPS"] = "10.0.0.2"
        ensure_axon_registered()          # already registered: no-op
        assert os.environ["PALLAS_AXON_POOL_IPS"] == "10.0.0.1"
    finally:
        for k in ("BATH_AXON_DEFER_IPS", "PALLAS_AXON_POOL_IPS"):
            os.environ.pop(k, None)
            if saved[k] is not None:
                os.environ[k] = saved[k]

def _run_search_raw(extra, env_extra):
    env = dict(os.environ, BATH_JAX_PLATFORM="cpu",
               BATH_DEVICE_STATS="1")
    env.update(env_extra)
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch",
         "--backend", "jax", *extra,
         f"{TUT}/AMP_N.bhmm", f"{TUT}/target-AMP_N.fa"],
        capture_output=True, text=True, timeout=900,
        cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    return re.sub(r"# (CPU time|Mc/sec):.*", "", r.stdout), r.stderr


@pytest.mark.parametrize("stage,extra,env0", [
    ("fwd", [], {}),
    ("msv", [], {"BATH_MSV_DEVICE": "1"}),
    ("fs3", ["--fs"], {"BATH_FS_CAND_FLUSH": "0"}),
])
def test_watchdog_stall_surrenders_to_host(stage, extra, env0):
    """Mid-drive stall watchdog (VERDICT r4 item 3): mock a hanging
    device call in one stage (BATH_DEVICE_HANG fault injection) with
    a ~1s flush deadline; the cascade must surrender the device,
    complete the drive on the host path with byte-identical output,
    and report a watchdog-surrender accounting row with the blocked
    wall (device_blocked_s)."""
    want = run_search("numpy", extra)
    env = {"BATH_DEVICE_HANG": f"{stage}:3600",
           "BATH_DEVICE_MIN_CELLS": "0", **env0}
    got, err = _run_search_raw(extra, env)
    assert got == want
    assert f"device watchdog: stage {stage}" in err, err[-1500:]
    assert "device-stats watchdog-surrender: calls=1" in err, \
        err[-1500:]


def test_watchdog_inert_on_healthy_drive():
    """With no stall injected, the watchdog changes nothing: the
    device-engaged drive stays byte-identical and reports no
    surrender row."""
    want = run_search("numpy")
    got, err = _run_search_raw([], {"BATH_DEVICE_MIN_CELLS": "0",
                                    "BATH_DEVICE_FLUSH_TIMEOUT": "300"})
    assert got == want
    assert "watchdog-surrender" not in err
