"""Device-batched E-value calibration.

The reference calibrates every model with four/six independent
N~=200-sequence simulations run serially through its SIMD filters
(ref: evalues.c p7_Calibrate :64, p7_MSVMu :298, p7_ViterbiMu :367,
p7_Tau :537, p7_fs_Tau_3codons :608).  Each simulation is an
embarrassingly parallel batch of identical-length random sequences —
exactly one device bucket.  The TPU-native formulation batches them
twice over:

* MSV mu / Viterbi mu: the bit-exact u8/int16 [model, batch] filter
  kernels, vmapped over the model axis with the per-model tables AND
  quantization scalars as batched traced values (the production
  classes make them static jit args, which would compile one
  executable per model) — one dispatch per Mt shape class, and the
  fitted mus are IDENTICAL to the host path;
* Forward tau / fs3 tau: the f32 gate kernels vmapped over the model
  axis (the calibration batch is shared by every model, so vmap
  uploads O(models) parameters where the multi-query lane packs
  would pay O(models^2) packed-table zeros).  Scores agree with the
  host parsers to ~1e-4 nats, far inside the reference's own
  +/-0.1-0.2-bit simulation noise (J1/135);
* fs5 tau: host native (no device fs5 kernel exists — its production
  role is per-envelope rescoring, not bulk batches), overlapped with
  the device stages via a thread pool (the ctypes call releases the
  GIL).

Per-model parameters are built in pure numpy, compressed to the
narrowest exact dtype (u8/i16 filter tables, bf16 odds tables — the
kernels cast to bf16 anyway), and enter the device only as arguments
of the vmapped calls; every result is concatenated on the device and
fetched in ONE device->host round trip.  On a tunneled backend both
transfer directions stall unpredictably (50ms to tens of seconds),
so the design minimizes transfer bytes and round trips rather than
kernel count.

RNG discipline: the reference re-seeds each model's calibration RNG
(evalues.c:94), so every model draws the SAME simulated sequences.
They are sampled once on the host with the MT19937-exact stream
(msv batch, then vit, then fwd, then the fs3/fs5 codon DNA — the
exact draw order of the serial path) and shared across all models.
The serial path resamples a sequence whose fs parser over/underflows
(evalues.c: i--, continue); a model whose shared-batch scores hit
that condition falls back to the serial host fs_tau from a cloned
RNG snapshot, preserving the per-model draw sequence exactly.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np

from . import constants as C
from .bg import Background
from .codontable import CodonTable
from .evalues import CalibrateConfig, lambda_param
from .gencode import GeneticCode
from .oprofile import oprofile_convert
from .profile import profile_config, profile_config_fs
from .rng import Randomness
from .stats import (gumbel_fit_complete, gumbel_fit_fixlambda,
                    gumbel_invsurv)

LOG2 = math.log(2.0)

_NEG = -32768


def _clone_rng(r: Randomness) -> Randomness:
    c = Randomness(r.seed_value or 42)
    c.seed_value = r.seed_value
    c._mt = r._mt.copy()
    c._mti = r._mti
    return c


@dataclass
class _SharedDraws:
    """Simulated sequences shared by every model's calibration (the
    per-model RNG reset makes all models draw identical batches)."""
    msv: np.ndarray          # [EmN, EmL] int8 aminos
    vit: np.ndarray          # [EvN, EvL] int8
    fwd: np.ndarray          # [EfN, EfL] int8
    fs_start: Randomness     # state entering the fs3 sampling
    # per genetic-code table: (dna3 [EfN, 3*EfL] int8,
    #                          fs5_start state, dna5 [EfN, 3*EfL])
    fs: dict


def _sample_batch(r: Randomness, f: np.ndarray, N: int, L: int
                  ) -> np.ndarray:
    return np.stack([r.sample_iid(f, L) for _ in range(N)]) \
        .astype(np.int8)


def _sample_dna_batch(r: Randomness, f: np.ndarray, ct: CodonTable,
                      N: int, L: int) -> np.ndarray:
    from .native import sample_dna_native
    out = np.empty((N, 3 * L), np.int8)
    for i in range(N):
        dna = sample_dna_native(r, f, ct, L)
        if dna is None:
            amino = r.sample_iid(f, L)
            dna = ct.reverse_translate(r, amino)
        out[i] = dna
    return out


def shared_draws(cfg: CalibrateConfig, bg: Background,
                 cts: dict[int, CodonTable] | None = None
                 ) -> _SharedDraws:
    r = Randomness(cfg.seed)
    msv = _sample_batch(r, bg.f, cfg.EmN, cfg.EmL)
    vit = _sample_batch(r, bg.f, cfg.EvN, cfg.EvL)
    fwd = _sample_batch(r, bg.f, cfg.EfN, cfg.EfL)
    fs_start = _clone_rng(r)
    fs = {}
    for ctid, ct in (cts or {}).items():
        rc = _clone_rng(fs_start)
        dna3 = _sample_dna_batch(rc, bg.f, ct, cfg.EfN, cfg.EfL)
        fs5_start = _clone_rng(rc)
        dna5 = _sample_dna_batch(rc, bg.f, ct, cfg.EfN, cfg.EfL)
        fs[ctid] = (dna3, fs5_start, dna5)
    return _SharedDraws(msv=msv, vit=vit, fwd=fwd, fs_start=fs_start,
                        fs=fs)


def _exp_tau(xv: np.ndarray, lam: float, tailp: float) -> float:
    """Gumbel-assisted exponential-tail anchor (ref: evalues.c
    :594-600)."""
    gmu, glam = gumbel_fit_complete(xv)
    return float(gumbel_invsurv(tailp, gmu, glam)
                 + math.log(tailp) / lam)


# ---------------------------------------------------------------------
# Dynamic-scalar MSV/Vit kernels: same traced bodies as the
# filters_mb [model, batch] kernels, but the per-model quantization
# constants (base/bias/...) are ordinary traced arguments so ALL
# models share one executable per Mt class.
# ---------------------------------------------------------------------
_DYN = {}


def _dyn_kernels():
    if not _DYN:
        import jax

        from .ops.jaxk import filters_mb as fmb
        from .ops.jaxk import kernels as jk
        # vmap over the model axis: shared (dsq, lens), stacked
        # per-model tables and quantization scalars; Mt stays static
        # so the whole class runs as ONE executable per model count.
        # (The alternative — the multimodel.py lane packs — pays
        # O(G^2) zeros in the packed emission tables; with the batch
        # shared across models, vmap uploads O(G) parameters.)
        _DYN["msv"] = jax.jit(
            jax.vmap(fmb._ssv_msv_mb_impl.__wrapped__,
                     in_axes=(None, None, 0, 0, 0, None, 0, 0, 0, 0)),
            static_argnums=(5,))
        def _vit_one(dsq, lens, rwvT, tBM, tMM, tIM, tDM, tMD, tDD,
                     tMI, tII, move_w, Mt, base, emove, eloop):
            # transitions ship int16 (upload bytes) but the DP is
            # int32-saturated: upcast before any i16+i16 could wrap
            import jax.numpy as jnp32
            c = (lambda a: a.astype(jnp32.int32))
            return fmb._vit_mb_impl.__wrapped__(
                dsq, lens, rwvT, c(tBM), c(tMM), c(tIM), c(tDM),
                c(tMD), c(tDD), c(tMI), c(tII), c(move_w), Mt, base,
                emove, eloop)

        _DYN["vit"] = jax.jit(
            jax.vmap(_vit_one,
                     in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                              0, None, 0, 0, 0)),
            static_argnums=(12,))

        def _fwd_one(dsq, lens, rfvT, tBM, tMM, tIM, tMI, tII, W3,
                     u, Mt):
            return jk._fwd_mb_impl.__wrapped__(
                dsq, lens, rfvT, tBM, tMM, tIM, tMI, tII, W3, u,
                1.0, Mt)

        _DYN["fwd"] = jax.jit(
            jax.vmap(_fwd_one, in_axes=(None, None) + (0,) * 8
                     + (None,)), static_argnums=(10,))

        def _fs3_one(dsq, lens, T2, T3, T4, tBM, tMM, tIM, tDM,
                     tMDs, tMI, tII, UT, u, Mt):
            return jk._fs3_score_impl.__wrapped__(
                dsq, lens, T2, T3, T4, tBM, tMM, tIM, tDM, tMDs,
                tMI, tII, 1.0, Mt, UT, u)

        _DYN["fs3"] = jax.jit(
            jax.vmap(_fs3_one, in_axes=(None, None) + (0,) * 12
                     + (None,)), static_argnums=(14,))
        # per-model dsq variant (bathconvert: models draw their own
        # DNA from the shared stream)
        _DYN["fs3_pd"] = jax.jit(
            jax.vmap(_fs3_one, in_axes=(0, None) + (0,) * 12
                     + (None,)), static_argnums=(14,))
    return _DYN


def _vmap_group(Mt: int, N: int) -> int:
    """Models per vmapped f32 call: the fs3 scan carry must stay
    VMEM-resident (kernels.fs3_max_lanes), with nm*N equivalent
    lanes."""
    from .ops.jaxk import kernels as jk
    return max(1, min(16, jk.fs3_max_lanes(Mt) // max(N, 1)))


_FWD_FIELDS = ("rfvT", "tBM", "tMM", "tIM", "tMI", "tII", "W3", "u")
_FS3_FIELDS = ("T2", "T3", "T4", "tBM", "tMM", "tIM", "tDM", "tMDs",
               "tMI", "tII", "UT", "u")
# upload compression: fields the kernels immediately cast to bf16
# ship as bf16 (identical math — the cast is idempotent); upload
# bandwidth over the tunnel is the weather-sensitive term
try:
    from ml_dtypes import bfloat16 as _BF16_NP
except Exception:                        # pragma: no cover
    _BF16_NP = None
_FIELD_DTYPE = {"rfvT": "bf16", "T2": "bf16", "T3": "bf16",
                "T4": "bf16"}


def _stack_fields(params, names):
    out = []
    for f in names:
        a = np.stack([np.asarray(getattr(p, f)) for p in params])
        if _FIELD_DTYPE.get(f) == "bf16" and _BF16_NP is not None:
            a = a.astype(_BF16_NP)
        out.append(a)
    return out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _msv_np_params(om, Mt: int):
    """u8 byte costs shipped as uint8 (the kernel's astype(bf16) is
    exact on 0..255 either way; upload bytes are the scarce
    resource)."""
    M, Kp = om.M, om.Kp
    sbvT = np.full((Mt, Kp), 127, np.int8)       # signed byte costs
    sbvT[:M] = om.sbv[:, 1:M + 1].T
    rbvT = np.full((Mt, Kp), 255, np.uint8)
    rbvT[:M] = om.rbv[:, 1:M + 1].T
    return sbvT, rbvT


def _vit_np_params(om, Mt: int):
    """int16 scores shipped as int16 (the kernel carries int32; jax
    promotes i16 operands exactly)."""
    M, Kp = om.M, om.Kp
    rwvT = np.full((Mt, Kp), _NEG, np.int16)
    rwvT[:M] = om.rwv[:, 1:M + 1].astype(np.int16).T
    twv = om.twv.astype(np.int16)

    def pad(v):
        out = np.full(Mt, _NEG, np.int16)
        out[:len(v)] = v
        return out

    return rwvT, (pad(twv[:M, C.P_BM]), pad(twv[:M, C.P_MM]),
                  pad(twv[:M, C.P_IM]), pad(twv[:M, C.P_DM]),
                  pad(twv[1:M, C.P_MD]), pad(twv[1:M, C.P_DD]),
                  pad(twv[1:M + 1, C.P_MI]), pad(twv[1:M + 1, C.P_II]))


class _ModelCal:
    """Per-model state: host-built numpy params, then device outputs
    (fetched in stacked chunks)."""

    __slots__ = ("hmm", "idx", "lam", "om", "om3", "om5", "Mt",
                 "cls", "msv_out", "vit_out", "fwd_xv", "fs3_xv",
                 "fs5_future", "ctid")

    def __init__(self, hmm, idx):
        self.hmm = hmm
        self.idx = idx
        self.om3 = self.om5 = None
        self.fwd_xv = self.fs3_xv = None
        self.fs5_future = None


def _fs5_xv_host(dna5: np.ndarray, om5, nullsc: float, L: int
                 ) -> np.ndarray | None:
    """Score the shared fs5 DNA batch with the host parsers; None if
    any sequence over/underflows (-> serial resampling fallback)."""
    from .native import fs5_forward_score_native
    from .ops.reference.fwdback_fs import RangeError, forward_fs5
    om5.reconfig_length(L)
    xv = np.empty(len(dna5))
    for i, dna in enumerate(dna5):
        try:
            fsc = fs5_forward_score_native(
                np.asarray(dna, np.int32), om5)
            if fsc is None:
                _, fsc = forward_fs5(
                    np.asarray(dna, np.int32), om5, fast=True)
        except RangeError:
            return None
        if not np.isfinite(fsc):
            return None
        xv[i] = (fsc - nullsc) / LOG2
    return xv


def run_guarded(thunk, n_items: int, what: str):
    """Run a device-calibration stage under a stall deadline
    (BATH_DEVICE_FLUSH_TIMEOUT base + 2 s/model; <= 0 disables).

    Unlike the search cascade — whose watchdog surrenders to a
    byte-identical host path — calibration mutates models in place
    as stages complete, so a silent host redo would race the
    abandoned device thread.  A build tool may fail loudly instead:
    on expiry this exits with a clear instruction to re-run on the
    host backend.  (Ref behavior contract: the reference's compute
    tier cannot hang; with a tunneled accelerator, ours must not
    either.)"""
    import os

    from .device_pipeline import _call_with_deadline
    base = float(os.environ.get("BATH_DEVICE_FLUSH_TIMEOUT", 300))
    t = None if base <= 0 else base + 2.0 * max(1, n_items)
    ok, res = _call_with_deadline(thunk, t)
    if not ok:
        raise SystemExit(
            f"{what} stalled past its {t:.0f}s deadline (accelerator "
            "tunnel unresponsive); re-run with --backend numpy")
    return res


def calibrate_many_device(hmms, cfg: CalibrateConfig | None = None,
                          progress=None, chunk: int = 16) -> None:
    """Calibrate <hmms> in place with device-batched simulations (see
    module docstring for the batching structure)."""
    import os
    import time as _time

    import jax.numpy as jnp

    from .device_pipeline import _enable_compile_cache
    from .ops.jaxk import multimodel as mm

    _dbg = os.environ.get("BATH_CAL_DEBUG")
    _t0 = _time.perf_counter()

    def _mark(label):
        if _dbg:
            import sys
            print(f"# cal {label}: "
                  f"{_time.perf_counter() - _t0:.2f}s",
                  file=sys.stderr)

    _enable_compile_cache()
    cfg = cfg or CalibrateConfig()
    bg = Background()
    cts: dict[int, CodonTable] = {}
    gcodes: dict[int, GeneticCode] = {}
    if cfg.fs:
        for h in hmms:
            ctid = h.ct if h.ct else 1
            if ctid not in cts:
                gc = GeneticCode.create(ctid)
                gc.set_initiator_any()
                gcodes[ctid] = gc
                cts[ctid] = CodonTable(gc)
    draws = shared_draws(cfg, bg, cts)
    _mark('draws')

    lens_m = np.full(cfg.EmN, cfg.EmL, np.int32)
    lens_v = np.full(cfg.EvN, cfg.EvL, np.int32)

    # null scores with the host stage ordering: null_one reads the p1
    # set by the latest set_length (evalues.c sets bg length per sim)
    nbg = Background()
    nbg.set_length(cfg.EmL)
    null_m = nbg.null_one(cfg.EmL)
    nbg.set_length(cfg.EvL)
    null_v = nbg.null_one(cfg.EvL)
    nbg.set_length(cfg.EfL)
    null_f = nbg.null_one(cfg.EfL)
    null_fs = nbg.fs_null_one(cfg.EfL) if cfg.fs else 0.0

    dyn = _dyn_kernels()
    pool = ThreadPoolExecutor(max_workers=4)
    fs5pool = ThreadPoolExecutor(max_workers=3)
    try:
        # ---- phase 1: per-model host config (threaded: numpy) ------
        def _config(arg):
            i, hmm = arg
            mc = _ModelCal(hmm, i)
            gm = profile_config(hmm, bg, L=cfg.EvL)
            mc.om = oprofile_convert(gm)
            mc.lam = lambda_param(hmm, bg)
            mc.Mt = _round_up(mc.om.M, 8)
            if cfg.fs:
                from .ops.reference.fwdback_fs import \
                    fs_oprofile_convert
                mc.ctid = hmm.ct if hmm.ct else 1
                gcode = gcodes[mc.ctid]
                gm3 = profile_config_fs(hmm, bg, gcode, 3, cfg.EvL)
                mc.om3 = fs_oprofile_convert(gm3)
                gm5 = profile_config_fs(hmm, bg, gcode, 5, cfg.EvL)
                mc.om5 = fs_oprofile_convert(gm5)
            return mc

        cals = list(pool.map(_config, enumerate(hmms)))
        _mark('config')

        # fs5 host-native scoring starts now, on its own pool so it
        # overlaps the device phase without queueing behind the
        # component builds
        if cfg.fs:
            for mc in cals:
                dna5 = draws.fs[mc.ctid][2]
                mc.fs5_future = fs5pool.submit(
                    _fs5_xv_host, dna5, mc.om5, null_fs, cfg.EfL)

        # ---- phase 2: dispatch device calls ------------------------
        # MSV/Vit: vmapped over the model axis, one dispatch per
        # (Mt class, padded model count)
        from .oprofile import _wordify
        byclass: dict[int, list] = {}
        for mc in cals:
            byclass.setdefault(_round_up(mc.om.M, 128),
                               []).append(mc)
        tjb_raw = np.log(3.0 / (cfg.EmL + 3.0))
        pmove = (np.float32(2.0) + np.float32(1.0)) / (
            np.float32(cfg.EvL) + np.float32(2.0) + np.float32(1.0))
        lpmove = np.log(pmove)
        filt_outs = []               # (mcs, msv_out, vit_out)
        for Mtc, mcs in sorted(byclass.items()):
            nm = _round_up(len(mcs), 32)
            # pad the model axis with copies of model 0: one compiled
            # executable per (class, padded count)
            pick = [mcs[i] if i < len(mcs) else mcs[0]
                    for i in range(nm)]
            Kp = pick[0].om.Kp
            sbvT = np.empty((nm, Mtc, Kp), np.int8)
            rbvT = np.empty((nm, Mtc, Kp), np.uint8)
            rwvT = np.empty((nm, Mtc, Kp), np.int16)
            tvs = [np.empty((nm, Mtc), np.int16) for _ in range(8)]
            tjb = np.empty((nm, cfg.EmN), np.int16)
            move_w = np.empty((nm, cfg.EvN), np.int16)
            sc_b = [np.empty(nm, np.int32) for _ in range(4)]
            sc_w = [np.empty(nm, np.int32) for _ in range(3)]
            for i, mc in enumerate(pick):
                om = mc.om
                sbvT[i], rbvT[i] = _msv_np_params(om, Mtc)
                rw, tv = _vit_np_params(om, Mtc)
                rwvT[i] = rw
                for q in range(8):
                    tvs[q][i] = tv[q]
                tjb[i] = om._unbiased_byteify(tjb_raw)
                move_w[i] = _wordify(float(om.scale_w), lpmove)
                sc_b[0][i], sc_b[1][i] = om.base_b, om.tec_b
                sc_b[2][i], sc_b[3][i] = om.tbm_b, om.bias_b
                sc_w[0][i] = om.base_w
                sc_w[1][i] = om.xw[C.X_E, C.MOVE]
                sc_w[2][i] = om.xw[C.X_E, C.LOOP]
            msv_out = dyn["msv"](draws.msv, lens_m, tjb, sbvT, rbvT,
                                 Mtc, *sc_b)
            vit_out = dyn["vit"](draws.vit, lens_v, rwvT, *tvs,
                                 move_w, Mtc, *sc_w)
            filt_outs.append((mcs, msv_out, vit_out))

        _mark('msv/vit dispatched')
        # Forward / fs3 taus: vmapped over the model axis per Mt
        # class (param builders threaded, pure numpy)
        from .ops.jaxk import kernels as jk
        byMt: dict[int, list] = {}
        for mc in cals:
            byMt.setdefault(_round_up(mc.om.M, 128), []).append(mc)
        allmc = [m for mcs in byMt.values() for m in mcs]
        fwd_par = dict(zip(
            (id(m) for m in allmc),
            pool.map(lambda m: jk.fwd_mb_params(
                m.om, sub_multiple=128, to_dev=False), allmc)))
        if cfg.fs:
            fs3_par = dict(zip(
                (id(m) for m in allmc),
                pool.map(lambda m: jk.fs3_params(
                    m.om3, sub_multiple=128, to_dev=False), allmc)))
        lens_f = np.full(cfg.EfN, cfg.EfL, np.int32)
        lens_d = np.full(cfg.EfN, 3 * cfg.EfL, np.int32)
        dna_by_ct = {ctid: v[0] for ctid, v in draws.fs.items()} \
            if cfg.fs else {}
        fwd_outs, fwd_mcs = [], []
        fs3_outs, fs3_mcs = [], []
        for Mtc, mcs in sorted(byMt.items()):
            gsz = _vmap_group(Mtc, cfg.EfN)
            for g0 in range(0, len(mcs), gsz):
                grp = mcs[g0:g0 + gsz]
                pick = [grp[i] if i < len(grp) else grp[0]
                        for i in range(gsz)]
                fp = _stack_fields(
                    [fwd_par[id(m)] for m in pick], _FWD_FIELDS)
                fwd_outs.append(dyn["fwd"](draws.fwd, lens_f, *fp,
                                           Mtc))
                fwd_mcs.append(grp)
                if cfg.fs:
                    sp = _stack_fields(
                        [fs3_par[id(m)] for m in pick], _FS3_FIELDS)
                    cts_in_grp = {m.ctid for m in grp}
                    if len(cts_in_grp) == 1:
                        dna = dna_by_ct[grp[0].ctid]
                        fs3_outs.append(dyn["fs3"](
                            dna, lens_d, *sp, Mtc))
                    else:
                        dna = np.stack([dna_by_ct[m.ctid]
                                        for m in pick])
                        fs3_outs.append(dyn["fs3_pd"](
                            dna, lens_d, *sp, Mtc))
                    fs3_mcs.append(grp)
        _mark('fwd/fs3 dispatched')

        # ---- phase 3: ONE fetch, then fits -------------------------
        # every result array is flattened to f32 and concatenated on
        # the device so the whole calibration costs a single
        # device->host round trip (fetch latency on a tunneled
        # backend is weather-dependent — 50ms to tens of seconds —
        # so each separate fetch is a stall lottery ticket; i32/bool
        # outputs are exact in f32: |values| <= 32767)
        pieces = []                   # device arrays, flattened f32
        slices = []                   # parallel (kind, target) info

        def _queue(arr, kind, tgt):
            pieces.append(jnp.ravel(arr).astype(jnp.float32))
            slices.append((int(np.prod(arr.shape)), arr.shape, kind,
                           tgt))

        for grp, out in zip(fwd_mcs, fwd_outs):
            _queue(out, "fwd_grp", grp)      # [gsz, N]
        for grp, out in zip(fs3_mcs, fs3_outs):
            _queue(out, "fs3_grp", grp)      # [gsz, N]
        for mcs, mo, vo in filt_outs:
            _queue(mo[0], "m_ints", mcs)
            _queue(mo[1], "m_infs", mcs)
            _queue(vo[0], "v_ints", mcs)
            _queue(vo[1], "v_has", mcs)
            _queue(vo[2], "v_ovf", mcs)

        flat = np.asarray(jnp.concatenate(pieces))
        _mark('single fetch done')
        off = 0
        for n, shape, kind, tgt in slices:
            a = flat[off:off + n].reshape(shape)
            off += n
            if kind == "fwd_grp":
                for gi, mc in enumerate(tgt):
                    mc.fwd_xv = a[gi]
            elif kind == "fs3_grp":
                for gi, mc in enumerate(tgt):
                    mc.fs3_xv = a[gi]
            elif kind == "m_ints":
                for i, mc in enumerate(tgt):
                    mc.msv_out = [a[i], None]
            elif kind == "m_infs":
                for i, mc in enumerate(tgt):
                    mc.msv_out[1] = a[i] != 0.0
            elif kind == "v_ints":
                for i, mc in enumerate(tgt):
                    mc.vit_out = [a[i], None, None]
            elif kind == "v_has":
                for i, mc in enumerate(tgt):
                    mc.vit_out[1] = a[i] != 0.0
            elif kind == "v_ovf":
                for i, mc in enumerate(tgt):
                    mc.vit_out[2] = a[i] != 0.0
        _mark('scatter done')
        for c0 in range(0, len(cals), chunk):
            cc = cals[c0:c0 + chunk]
            for mc in cc:
                hmm, om, lam = mc.hmm, mc.om, mc.lam
                m_ints, m_infs = mc.msv_out
                sc = m_ints.astype(np.float64)
                sc = np.float32((sc - float(om.base_b))
                                / float(om.scale_b) - 3.0)
                maxsc = (255 - om.base_b) / om.scale_b
                sc = np.where(m_infs, np.float32(maxsc), sc)
                mmu = gumbel_fit_fixlambda((sc - null_m) / LOG2, lam)

                v_ints, v_has, v_ovf = mc.vit_out
                sc = v_ints.astype(np.float64)
                sc = np.float32((sc - float(om.base_w))
                                / float(om.scale_w) - 3.0)
                maxsc = (32767.0 - om.base_w) / om.scale_w
                bad = ~v_has | v_ovf
                sc = np.where(bad, np.float32(maxsc), sc)
                vmu = gumbel_fit_fixlambda((sc - null_v) / LOG2, lam)

                fsc = mc.fwd_xv.astype(np.float64)
                tau = _exp_tau((fsc - null_f) / LOG2, lam, cfg.Eft)

                hmm.evparam[C.EV_MLAMBDA] = lam
                hmm.evparam[C.EV_VLAMBDA] = lam
                hmm.evparam[C.EV_FLAMBDA] = lam
                hmm.evparam[C.EV_MMU] = mmu
                hmm.evparam[C.EV_VMU] = vmu
                hmm.evparam[C.EV_FTAU] = tau

                if cfg.fs:
                    f3 = mc.fs3_xv.astype(np.float64)
                    xv5 = mc.fs5_future.result()
                    if np.all(np.isfinite(f3)) and xv5 is not None:
                        hmm.evparam[C.EV_FTAUFS3] = _exp_tau(
                            (f3 - null_fs) / LOG2, lam, cfg.Eft)
                        hmm.evparam[C.EV_FTAUFS5] = _exp_tau(
                            xv5, lam, cfg.Eft)
                    else:
                        _fs_taus_serial(hmm, cfg, bg, draws, lam,
                                        gcodes[mc.ctid],
                                        cts[mc.ctid])
                from .hmm import H_STATS
                hmm.flags |= H_STATS
                if progress is not None:
                    progress(hmm)
        _mark('fits done')
    finally:
        pool.shutdown(wait=False)
        fs5pool.shutdown(wait=False)


def convert_fs_taus_device(items, r: Randomness, bg: Background,
                           EvL: int = 100, L: int = 100, N: int = 200,
                           tailp: float = 0.04) -> None:
    """Device-batched frameshift taus for bathconvert.

    bathconvert shares ONE RNG stream across the converted models (no
    per-model reseed — ref: bathconvert.c main), so unlike
    calibrate_many_device the simulated DNA differs per model: it is
    pre-drawn sequentially in the exact serial order (model 1 fs3
    batch, model 1 fs5 batch, model 2 fs3, ...), then scored with the
    per-model-dsq vmapped fs3 kernel + one pooled host fs5 pass.  A
    model whose shared-batch scores over/underflow falls back to the
    serial fs_tau from a cloned snapshot of its stream position (the
    rare resampling case then consumes extra draws only inside the
    clone; later models keep the pre-drawn stream, which stays
    deterministic run-to-run).

    items: list of (hmm, ct_id) needing fs calibration; taus are
    written into hmm.evparam in place.
    """
    from .device_pipeline import _enable_compile_cache
    from .evalues import fs_tau
    from .ops.jaxk import kernels as jk
    from .ops.reference.fwdback_fs import fs_oprofile_convert

    _enable_compile_cache()
    dyn = _dyn_kernels()
    cts: dict[int, CodonTable] = {}
    gcodes: dict[int, GeneticCode] = {}
    for _h, ctid in items:
        if ctid not in cts:
            gc = GeneticCode.create(ctid)
            gc.set_initiator_any()
            gcodes[ctid] = gc
            cts[ctid] = CodonTable(gc)

    nbg = Background()
    nbg.set_length(L)
    null_fs = nbg.fs_null_one(L)

    pool = ThreadPoolExecutor(max_workers=4)
    try:
        pending = []
        lens_d = np.full(N, 3 * L, np.int32)
        # sample first (the shared-stream order), then dispatch
        # vmapped groups per Mt class
        work = []
        for hmm, ctid in items:
            ct = cts[ctid]
            snap = _clone_rng(r)
            dna3 = _sample_dna_batch(r, bg.f, ct, N, L)
            dna5 = _sample_dna_batch(r, bg.f, ct, N, L)
            lam = float(hmm.evparam[C.EV_FLAMBDA])
            gm3 = profile_config_fs(hmm, bg, gcodes[ctid], 3, EvL)
            om3 = fs_oprofile_convert(gm3)
            p3 = jk.fs3_params(om3, sub_multiple=128, to_dev=False)
            gm5 = profile_config_fs(hmm, bg, gcodes[ctid], 5, EvL)
            om5 = fs_oprofile_convert(gm5)
            fut5 = pool.submit(_fs5_xv_host, dna5, om5, null_fs, L)
            work.append([hmm, ctid, snap, lam, dna3, p3, fut5])
        byMt: dict[int, list] = {}
        for w in work:
            byMt.setdefault(w[5].Mt, []).append(w)
        pending = []
        for Mtc, ws in sorted(byMt.items()):
            gsz = _vmap_group(Mtc, N)
            for g0 in range(0, len(ws), gsz):
                grp = ws[g0:g0 + gsz]
                pick = [grp[i] if i < len(grp) else grp[0]
                        for i in range(gsz)]
                sp = _stack_fields([w[5] for w in pick], _FS3_FIELDS)
                dna = np.stack([w[4] for w in pick])
                out = dyn["fs3_pd"](dna, lens_d, *sp, Mtc)
                pending.append((grp, out))

        for grp, out in pending:
            f3s = np.asarray(out).astype(np.float64)
            for gi, (hmm, ctid, snap, lam, _dna3, _p3, fut5) \
                    in enumerate(grp):
                _finish_convert_model(
                    hmm, ctid, snap, lam, f3s[gi], fut5, null_fs,
                    tailp, bg, gcodes, cts, EvL, L, N)
    finally:
        pool.shutdown(wait=False)


def _finish_convert_model(hmm, ctid, snap, lam, f3, fut5, null_fs,
                          tailp, bg, gcodes, cts, EvL, L, N):
    from .evalues import fs_tau
    from .ops.reference.fwdback_fs import fs_oprofile_convert
    xv5 = fut5.result()
    if np.all(np.isfinite(f3)) and xv5 is not None:
        hmm.evparam[C.EV_FTAUFS3] = _exp_tau(
            (f3 - null_fs) / LOG2, lam, tailp)
        hmm.evparam[C.EV_FTAUFS5] = _exp_tau(xv5, lam, tailp)
    else:
        rc = snap
        gm3 = profile_config_fs(hmm, bg, gcodes[ctid], 3, EvL)
        om3 = fs_oprofile_convert(gm3)
        hmm.evparam[C.EV_FTAUFS3] = fs_tau(
            rc, om3, cts[ctid], bg, L, N, lam, tailp)
        gm5 = profile_config_fs(hmm, bg, gcodes[ctid], 5, EvL)
        om5 = fs_oprofile_convert(gm5)
        hmm.evparam[C.EV_FTAUFS5] = fs_tau(
            rc, om5, cts[ctid], bg, L, N, lam, tailp)


def _fs_taus_serial(hmm, cfg, bg, draws: _SharedDraws, lam, gcode,
                    ct) -> None:
    """Serial-host fallback for a model whose shared-batch fs scores
    over/underflowed: replays the reference's sample->score->resample
    loop from the exact RNG snapshot (evalues.c: i--, continue)."""
    from .evalues import fs_tau
    from .ops.reference.fwdback_fs import fs_oprofile_convert
    r = _clone_rng(draws.fs_start)
    gm3 = profile_config_fs(hmm, bg, gcode, 3, cfg.EvL)
    om3 = fs_oprofile_convert(gm3)
    hmm.evparam[C.EV_FTAUFS3] = fs_tau(
        r, om3, ct, bg, cfg.EfL, cfg.EfN, lam, cfg.Eft)
    gm5 = profile_config_fs(hmm, bg, gcode, 5, cfg.EvL)
    om5 = fs_oprofile_convert(gm5)
    hmm.evparam[C.EV_FTAUFS5] = fs_tau(
        r, om5, ct, bg, cfg.EfL, cfg.EfN, lam, cfg.Eft)
