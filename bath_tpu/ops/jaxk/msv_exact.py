"""Bit-exact batched SSV/MSV filter on device (ref:
impl_sse/ssvfilter.c p7_SSVFilter :875, msvfilter.c p7_MSVFilter :76;
numpy reference semantics in ops/reference/filters.py).

The quantized filter arithmetic is integer, so the batched device
version reproduces the scalar reference exactly: both the SSV
fast path and the full MSV recurrence are computed for every item
(branchless), and the reference's fallback rules are applied as
selects.  This is the F1-gate batch kernel for `--backend jax`.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ... import constants as C
from .batch import round_up

I32 = jnp.int32
F32 = jnp.float32


@functools.partial(jax.jit, static_argnames=("Mp", "base", "tec",
                                             "tbm", "bias"))
def _ssv_msv_impl(dsq, lens, tjb, sbv, rbv, Mp, base, tec, tbm, bias,
                  scale):
    """Returns (score [B] f32, with +inf for overflow; the reference's
    'no result' SSV cases fall through to the MSV result exactly)."""
    B, L = dsq.shape

    # ---------------- SSV (ref: ssvfilter.c :875) -------------------
    def ssv_step(carry, xi):
        d, xEu = carry
        resi, i = xi
        row = sbv[resi]                         # [B, Mp] int32
        dshift = jnp.pad(d, ((0, 0), (1, 0)),
                         constant_values=-128)[:, :-1]
        d2 = jnp.clip(dshift - row, -128, 127)
        active = (i < lens)[:, None]
        d = jnp.where(active, d2, d)
        u = jnp.where(active, d2 & 0xFF, 0)
        xEu = jnp.maximum(xEu, u.max(axis=1))
        return (d, xEu), None

    d0 = jnp.full((B, Mp), -128, I32)
    (_, xEu), _ = jax.lax.scan(
        ssv_step, (d0, jnp.zeros(B, I32)),
        (dsq.T, jnp.arange(L, dtype=I32)))

    # SSV post-processing with uint16 wraparound (ref: filters.py)
    no_ssv = (tjb + tbm + tec + bias) >= 127        # per-item [B]
    xE1 = xEu
    ovf1 = xE1 >= 255 - bias
    none1 = base - tjb - tbm < 128                  # with ovf1 -> None
    xE2 = (xE1 + base - tjb - tbm) & 0xFFFF
    xE2 = (xE2 - 128) & 0xFFFF
    ovf2 = xE2 >= 255 - bias
    xJ = (xE2 - tec) & 0xFFFF
    none2 = xJ > base
    ssv_int = xJ - tjb
    ssv_none = no_ssv | (ovf1 & none1) | none2
    ssv_inf = (~ssv_none) & ((ovf1 & ~none1) | ovf2)

    # ---------------- MSV (ref: msvfilter.c :76) --------------------
    tjbm = (tjb + tbm) & 0xFF

    def msv_step(carry, xi):
        dp, xJm, xBm, overflow = carry
        resi, i = xi
        row = rbv[resi]
        mpv = jnp.pad(dp, ((0, 0), (1, 0)))[:, :-1]
        sv = jnp.maximum(mpv, xBm[:, None])
        sv = jnp.minimum(sv + bias, 255)
        sv = jnp.maximum(sv - row, 0)
        xE = sv.max(axis=1)
        ovf = xE + bias >= 255
        xE = jnp.maximum(0, xE - tec)
        xJ2 = jnp.maximum(xJm, xE)
        xB2 = jnp.maximum(0, jnp.maximum(base, xJ2) - tjbm)
        active = (i < lens)
        dp = jnp.where(active[:, None], sv, dp)
        xJm = jnp.where(active, xJ2, xJm)
        xBm = jnp.where(active, xB2, xBm)
        overflow = jnp.where(active, overflow | ovf, overflow)
        return (dp, xJm, xBm, overflow), None

    carry0 = (jnp.zeros((B, Mp), I32), jnp.zeros(B, I32),
              jnp.maximum(0, base - tjbm), jnp.zeros(B, bool))
    (_, xJm, _, movf), _ = jax.lax.scan(
        msv_step, carry0, (dsq.T, jnp.arange(L, dtype=I32)))
    # the DP is pure-integer and therefore bit-exact on any backend;
    # the float conversion happens on the HOST in f64 (matching the
    # scalar reference's arithmetic exactly, filters.py:77-78)
    out_int = jnp.where(ssv_none, xJm - tjb, ssv_int)
    out_inf = jnp.where(ssv_none, movf, ssv_inf)
    return out_int, out_inf


class MSVExact:
    """Packs an OProfile for the exact batched filter."""

    def __init__(self, om, lane_multiple: int = 128):
        M, Kp = om.M, om.Kp
        Mp = round_up(M, lane_multiple)
        sbv = np.full((Kp, Mp), 127, np.int32)   # dead lanes: max cost
        sbv[:, :M] = om.sbv[:, 1:M + 1].astype(np.int32)
        rbv = np.full((Kp, Mp), 255, np.int32)
        rbv[:, :M] = om.rbv[:, 1:M + 1].astype(np.int32)
        self.Mp = Mp
        self.sbv = jnp.asarray(sbv)
        self.rbv = jnp.asarray(rbv)
        self.base = int(om.base_b)
        self.tec = int(om.tec_b)
        self.tbm = int(om.tbm_b)
        self.bias = int(om.bias_b)
        self.scale = float(om.scale_b)
        self._om = om

    def tjb_for(self, lens: np.ndarray) -> np.ndarray:
        return np.array([self._om._unbiased_byteify(
            np.log(3.0 / (int(L) + 3.0))) for L in lens],
            dtype=np.int32)

    def scores(self, dsq_batch: np.ndarray, lens: np.ndarray
               ) -> np.ndarray:
        """[B, Lmax] padded digital aminos (pad 28=missing) + [B]
        lengths -> [B] MSV scores identical to
        ops.reference.filters.msv_filter per item."""
        tjb = jnp.asarray(self.tjb_for(lens))
        ints, infs = _ssv_msv_impl(
            jnp.asarray(dsq_batch, dtype=jnp.int32),
            jnp.asarray(lens, dtype=jnp.int32), tjb,
            self.sbv, self.rbv, self.Mp, self.base,
            self.tec, self.tbm, self.bias, self.scale)
        ints = np.asarray(ints).astype(np.float64)
        sc = np.float32((ints - float(self.base)) / self.scale - 3.0)
        return np.where(np.asarray(infs), np.float32(np.inf), sc)


@functools.partial(jax.jit, static_argnames=("Mp", "base", "ddbound",
                                             "scale", "emove",
                                             "eloop"))
def _vitfilter_impl(dsq, lens, rwv, tBM, tMM, tIM, tDM, tMD, tDD, tMI,
                    tII, move_w, Mp, base, ddbound, scale, emove,
                    eloop):
    """Batched ViterbiFilter scores, int32 with int16-saturation
    semantics (ref: impl_sse/vitfilter.c :39; numpy port in
    ops/reference/filters.viterbi_filter).  The lazy-F DD closure is
    replaced by an unconditional max-plus scan (identical results; the
    laziness is a CPU shortcut)."""
    B, L = dsq.shape
    NEG = -32768

    def sat(x):
        return jnp.clip(x, -32768, 32767)

    # the -3nat approximation: N/C/J LOOP word scores are 0; the
    # MOVE scores are per-item (length model), E scores static
    nloop = jloop = cloop = 0
    nmove = jmove = cmove = move_w          # [B] int32

    def shift(x):
        return jnp.pad(x, ((0, 0), (1, 0)),
                       constant_values=NEG)[:, :-1]

    def ddscan(part):
        # dd[k] = max(part[k], dd[k-1] + tDD[k]) along lanes
        a = jnp.broadcast_to(jnp.pad(tDD, (1, 0),
                                     constant_values=NEG)[:-1][None, :],
                             part.shape)

        def combine(x, y):
            a1, b1 = x
            a2, b2 = y
            return sat(a1 + a2), jnp.maximum(sat(b1 + a2), b2)

        _, dd = jax.lax.associative_scan(combine, (a, part), axis=1)
        return dd

    def step(carry, xi):
        dm, di, dd, xN, xJ, xC, xB, ovf, score, has = carry
        resi, i = xi
        row = rwv[resi]
        mp, ip, dp = shift(dm), shift(di), shift(dd)
        sv = sat(xB[:, None] + tBM)
        sv = jnp.maximum(sv, sat(mp + tMM))
        sv = jnp.maximum(sv, sat(ip + tIM))
        sv = jnp.maximum(sv, sat(dp + tDM))
        sv = sat(sv + row)
        xE = sv.max(axis=1)
        ovf2 = xE >= 32767
        new_i = jnp.maximum(sat(dm + tMI), sat(di + tII))
        part = sat(shift(sv) + jnp.pad(tMD, (1, 0),
                                       constant_values=NEG)[:-1])
        new_d = ddscan(part)
        xN2 = xN + nloop
        xC2 = jnp.maximum(xC + cloop, xE + emove)
        xJ2 = jnp.maximum(xJ + jloop, xE + eloop)
        xB2 = jnp.maximum(xJ2 + jmove, xN2 + nmove)
        xB2 = sat(xB2)
        active = (i < lens)
        am = active[:, None]
        dm = jnp.where(am, sv, dm)
        di = jnp.where(am, new_i, di)
        dd = jnp.where(am, new_d, dd)
        xN = jnp.where(active, xN2, xN)
        xJ = jnp.where(active, xJ2, xJ)
        xC = jnp.where(active, xC2, xC)
        xB = jnp.where(active, xB2, xB)
        ovf = jnp.where(active, ovf | ovf2, ovf)
        done = (i + 1 == lens)
        # integer final term only; the float conversion happens on
        # the host in f64 (bit-exact on any backend)
        score = jnp.where(done, xC2 + cmove, score)
        has = jnp.where(done, xC2 > NEG, has)
        return (dm, di, dd, xN, xJ, xC, xB, ovf, score, has), None

    neg = jnp.full((B, Mp), NEG, I32)
    carry0 = (neg, neg, neg,
              jnp.full(B, base, I32),
              jnp.full(B, NEG, I32),
              jnp.full(B, NEG, I32),
              base + nmove,
              jnp.zeros(B, bool),
              jnp.zeros(B, I32),
              jnp.zeros(B, bool))
    (_, _, _, _, _, _, _, ovf, score, has), _ = jax.lax.scan(
        step, carry0, (dsq.T, jnp.arange(L, dtype=I32)))
    return score, has, ovf


class VitExact:
    """Packs an OProfile for the exact batched Viterbi filter."""

    def __init__(self, om, lane_multiple: int = 128):
        M, Kp = om.M, om.Kp
        Mp = round_up(M, lane_multiple)
        NEG = -32768
        rwv = np.full((Kp, Mp), NEG, np.int32)
        rwv[:, :M] = om.rwv[:, 1:M + 1].astype(np.int32)
        twv = om.twv.astype(np.int32)

        def pad(v, fill=NEG):
            out = np.full(Mp, fill, np.int32)
            out[:len(v)] = v
            return jnp.asarray(out)

        self.Mp = Mp
        self.rwv = jnp.asarray(rwv)
        self.tBM = pad(twv[:M, C.P_BM])
        self.tMM = pad(twv[:M, C.P_MM])
        self.tIM = pad(twv[:M, C.P_IM])
        self.tDM = pad(twv[:M, C.P_DM])
        # slot j holds the transition into slot j+1 region as in the
        # scalar port: tMD[k]/tDD[k] used at target slot k
        self.tMD = pad(twv[1:M, C.P_MD])
        self.tDD = pad(twv[1:M, C.P_DD])
        self.tMI = pad(twv[1:M + 1, C.P_MI])
        self.tII = pad(twv[1:M + 1, C.P_II])
        self.base = int(om.base_w)
        self.ddbound = int(om.ddbound_w)
        self.scale = float(om.scale_w)
        self.emove = int(om.xw[C.X_E, C.MOVE])
        self.eloop = int(om.xw[C.X_E, C.LOOP])
        self._om = om

    def move_for(self, lens: np.ndarray) -> np.ndarray:
        from ...oprofile import _wordify
        nj = 1.0
        out = np.empty(len(lens), np.int32)
        for i, L in enumerate(lens):
            pmove = (np.float32(2.0) + np.float32(nj)) / (
                np.float32(int(L)) + np.float32(2.0) + np.float32(nj))
            out[i] = _wordify(self.scale, np.log(pmove))
        return out

    def scores(self, dsq_batch, lens) -> np.ndarray:
        move_w = jnp.asarray(self.move_for(np.asarray(lens)))
        ints, has, ovf = _vitfilter_impl(
            jnp.asarray(dsq_batch, dtype=jnp.int32),
            jnp.asarray(lens, dtype=jnp.int32), self.rwv, self.tBM,
            self.tMM, self.tIM, self.tDM, self.tMD, self.tDD,
            self.tMI, self.tII, move_w, self.Mp, self.base,
            self.ddbound, self.scale, self.emove, self.eloop)
        ints = np.asarray(ints).astype(np.float64)
        sc = np.float32((ints - float(self.base)) / self.scale - 3.0)
        sc = np.where(np.asarray(has), sc, np.float32(-np.inf))
        return np.where(np.asarray(ovf), np.float32(np.inf), sc)
