"""Batched SSV/MSV filter in the [model, batch] layout — the
production F1-gate device kernel.

Same integer arithmetic as ops/jaxk/msv_exact._ssv_msv_impl (itself
bit-exact vs the scalar reference, ref: impl_sse/ssvfilter.c :875,
msvfilter.c :76), restructured the way the fs3 Forward kernel is:
model positions on sublanes (padded to a multiple of 8 — state size
tracks the true M instead of a 128-padded one), batch on the 128-lane
minor dim, 12-position unrolled blocks inside `lax.scan`, and the
per-position emission-row gather as one bf16 one-hot matmul per block
on the MXU (byte costs <= 255 are exact in bf16's 8-bit significand).

The [batch, model] variant gathers `rbv[resi]` per scan step, which
XLA lowers to a scalar-core dynamic gather (~200x slower than this
formulation on v5e).  msv_exact.MSVExact stays as the parity oracle;
MSVExactMB below is a drop-in replacement with the same .scores
contract and host-side f64 conversion.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .batch import round_up

I32 = jnp.int32
F32 = jnp.float32
BF16 = jnp.bfloat16

_MSV_BL = 12   # positions per unrolled scan block


def _shift_down_i(x, fill):
    """k-1 access in [model, batch]: sublane k reads k-1; row 0 gets
    <fill> (mirrors msv_exact's pad-shift on the model dim)."""
    return jnp.pad(x[:-1], ((1, 0), (0, 0)), constant_values=fill)


@partial(jax.jit, static_argnames=("Mt", "base", "tec", "tbm", "bias"))
def _ssv_msv_mb_impl(dsq, lens, tjb, sbvT, rbvT, Mt, base, tec, tbm,
                     bias):
    """Returns (out_int [B] i32, out_inf [B] bool) with exactly the
    semantics of msv_exact._ssv_msv_impl (same select logic; the f64
    score conversion happens on the host)."""
    B, L = dsq.shape
    dsq = dsq.astype(jnp.int32)   # device-side upcast (int8 transfers)
    BL = _MSV_BL
    Lpad = ((L + BL - 1) // BL) * BL
    if Lpad != L:
        # pad residue = the missing-data row already present in sbv/rbv
        Kp = sbvT.shape[1]
        dsq = jnp.pad(dsq, ((0, 0), (0, Lpad - L)),
                      constant_values=Kp - 1)
    # [nblk, BL*B] block residue streams (column index = j*B + b)
    cb = dsq.T.reshape(Lpad // BL, BL * B)
    Kp = sbvT.shape[1]
    sT = sbvT.astype(BF16)
    rT = rbvT.astype(BF16)
    tjbm = (tjb + tbm) & 0xFF                       # [B]

    def block(carry, cblk):
        (d, xEu, dp, xJm, xBm, movf, base_i) = carry
        oh = (cblk[None, :] == jnp.arange(Kp)[:, None]).astype(BF16)
        # one MXU dot per table for the whole block; bf16 is exact for
        # integer byte costs <= 255
        sE = jnp.dot(sT, oh, preferred_element_type=F32)
        rE = jnp.dot(rT, oh, preferred_element_type=F32)
        for j in range(BL):
            i = base_i + j
            off = j * B
            srow = jax.lax.slice(sE, (0, off), (Mt, off + B)) \
                .astype(I32)
            rrow = jax.lax.slice(rE, (0, off), (Mt, off + B)) \
                .astype(I32)
            active = (i < lens)                     # [B]
            am = active[None, :]
            # ---- SSV (ref: ssvfilter.c :875) ----
            dshift = _shift_down_i(d, -128)
            d2 = jnp.clip(dshift - srow, -128, 127)
            d = jnp.where(am, d2, d)
            u = jnp.where(am, d2 & 0xFF, 0)
            xEu = jnp.maximum(xEu, u.max(axis=0))
            # ---- MSV (ref: msvfilter.c :76) ----
            mpv = _shift_down_i(dp, 0)
            sv = jnp.maximum(mpv, xBm[None, :])
            sv = jnp.minimum(sv + bias, 255)
            sv = jnp.maximum(sv - rrow, 0)
            xE = sv.max(axis=0)
            ovf = xE + bias >= 255
            xE = jnp.maximum(0, xE - tec)
            xJ2 = jnp.maximum(xJm, xE)
            xB2 = jnp.maximum(0, jnp.maximum(base, xJ2) - tjbm)
            dp = jnp.where(am, sv, dp)
            xJm = jnp.where(active, xJ2, xJm)
            xBm = jnp.where(active, xB2, xBm)
            movf = jnp.where(active, movf | ovf, movf)
        return (d, xEu, dp, xJm, xBm, movf, base_i + BL), None

    carry0 = (jnp.full((Mt, B), -128, I32), jnp.zeros(B, I32),
              jnp.zeros((Mt, B), I32), jnp.zeros(B, I32),
              jnp.maximum(0, base - tjbm), jnp.zeros(B, bool),
              jnp.int32(0))
    (_, xEu, _, xJm, _, movf, _), _ = jax.lax.scan(block, carry0, cb)

    # SSV post-processing with uint16 wraparound + fallback selects
    # (identical to msv_exact._ssv_msv_impl; ref: filters.py)
    no_ssv = (tjb + tbm + tec + bias) >= 127        # per-item [B]
    xE1 = xEu
    ovf1 = xE1 >= 255 - bias
    none1 = base - tjb - tbm < 128
    xE2 = (xE1 + base - tjb - tbm) & 0xFFFF
    xE2 = (xE2 - 128) & 0xFFFF
    ovf2 = xE2 >= 255 - bias
    xJ = (xE2 - tec) & 0xFFFF
    none2 = xJ > base
    ssv_int = xJ - tjb
    ssv_none = no_ssv | (ovf1 & none1) | none2
    ssv_inf = (~ssv_none) & ((ovf1 & ~none1) | ovf2)
    out_int = jnp.where(ssv_none, xJm - tjb, ssv_int)
    out_inf = jnp.where(ssv_none, movf, ssv_inf)
    return out_int, out_inf


@partial(jax.jit, static_argnames=("Mt", "base", "emove", "eloop"))
def _vit_mb_impl(dsq, lens, rwvT, tBM, tMM, tIM, tDM, tMD, tDD, tMI,
                 tII, move_w, Mt, base, emove, eloop):
    """Batched ViterbiFilter ints in [model, batch] layout
    (bit-exact semantics of msv_exact._vitfilter_impl; ref:
    impl_sse/vitfilter.c :39).  int16-saturated max-plus carried in
    int32; the DD correction is a log-depth (max, +) scan over the
    model sublanes."""
    B, L = dsq.shape
    dsq = dsq.astype(jnp.int32)   # device-side upcast (int8 transfers)
    BL = _MSV_BL
    Kp = rwvT.shape[1]
    NEG = -32768
    Lpad = ((L + BL - 1) // BL) * BL
    if Lpad != L:
        dsq = jnp.pad(dsq, ((0, 0), (0, Lpad - L)),
                      constant_values=Kp - 1)
    cb = dsq.T.reshape(Lpad // BL, BL * B)

    def sat(x):
        return jnp.clip(x, -32768, 32767)

    def shift(x):
        return jnp.pad(x[:-1], ((1, 0), (0, 0)), constant_values=NEG)

    nloop = jloop = cloop = 0
    nmove = jmove = cmove = move_w          # [B] int32

    cvec = lambda v: v[:, None]
    tBMc, tMMc, tIMc, tDMc = map(cvec, (tBM, tMM, tIM, tDM))
    tMIc, tIIc = cvec(tMI), cvec(tII)
    tMD_s = cvec(jnp.pad(tMD[:-1], (1, 0), constant_values=NEG))
    add = jnp.broadcast_to(
        cvec(jnp.pad(tDD[:-1], (1, 0), constant_values=NEG)),
        (Mt, B))

    def ddscan(part):
        # dd[k] = max(part[k], dd[k-1] + tDD[k]) over sublanes
        def combine(x, y):
            a1, b1 = x
            a2, b2 = y
            return sat(a1 + a2), jnp.maximum(sat(b1 + a2), b2)

        _, dd = jax.lax.associative_scan(combine, (add, part), axis=0)
        return dd

    oneT = rwvT.astype(F32)

    def block(carry, cblk):
        dm, di, dd, xN, xJ, xC, xB, ovf, score, has, base_i = carry
        oh = (cblk[None, :] == jnp.arange(Kp)[:, None]).astype(F32)
        # int16-range values exceed bf16's significand: force full
        # f32 matmul precision for the emission selection
        rE = jax.lax.dot_general(
            oneT, oh, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=F32)
        for j in range(BL):
            i = base_i + j
            off = j * B
            row = jax.lax.slice(rE, (0, off), (Mt, off + B)) \
                .astype(I32)
            mp, ip, dp = shift(dm), shift(di), shift(dd)
            sv = sat(xB[None, :] + tBMc)
            sv = jnp.maximum(sv, sat(mp + tMMc))
            sv = jnp.maximum(sv, sat(ip + tIMc))
            sv = jnp.maximum(sv, sat(dp + tDMc))
            sv = sat(sv + row)
            xE = sv.max(axis=0)
            ovf2 = xE >= 32767
            new_i = jnp.maximum(sat(dm + tMIc), sat(di + tIIc))
            part = sat(shift(sv) + tMD_s)
            new_d = ddscan(part)
            xN2 = xN + nloop
            xC2 = jnp.maximum(xC + cloop, xE + emove)
            xJ2 = jnp.maximum(xJ + jloop, xE + eloop)
            xB2 = sat(jnp.maximum(xJ2 + jmove, xN2 + nmove))
            active = (i < lens)
            am = active[None, :]
            dm = jnp.where(am, sv, dm)
            di = jnp.where(am, new_i, di)
            dd = jnp.where(am, new_d, dd)
            xN = jnp.where(active, xN2, xN)
            xJ = jnp.where(active, xJ2, xJ)
            xC = jnp.where(active, xC2, xC)
            xB = jnp.where(active, xB2, xB)
            ovf = jnp.where(active, ovf | ovf2, ovf)
            done = (i + 1 == lens)
            score = jnp.where(done, xC2 + cmove, score)
            has = jnp.where(done, xC2 > NEG, has)
        return (dm, di, dd, xN, xJ, xC, xB, ovf, score, has,
                base_i + BL), None

    neg = jnp.full((Mt, B), NEG, I32)
    carry0 = (neg, neg, neg,
              jnp.full(B, base, I32), jnp.full(B, NEG, I32),
              jnp.full(B, NEG, I32), base + nmove,
              jnp.zeros(B, bool), jnp.zeros(B, I32),
              jnp.zeros(B, bool), jnp.int32(0))
    (_, _, _, _, _, _, _, ovf, score, has, _), _ = jax.lax.scan(
        block, carry0, cb)
    return score, has, ovf


class VitExactMB:
    """[model, batch] drop-in for msv_exact.VitExact: same .scores
    contract (int16-exact ViterbiFilter, f64 conversion on host)."""

    def __init__(self, om, sub_multiple: int = 8):
        from ... import constants as C
        M, Kp = om.M, om.Kp
        Mt = round_up(M, sub_multiple)
        NEG = -32768
        rwvT = np.full((Mt, Kp), NEG, np.float32)
        rwvT[:M] = om.rwv[:, 1:M + 1].astype(np.float32).T
        twv = om.twv.astype(np.int32)

        def pad(v, fill=NEG):
            out = np.full(Mt, fill, np.int32)
            out[:len(v)] = v
            return jnp.asarray(out)

        self.Mt = Mt
        self.rwvT = jnp.asarray(rwvT)
        self.tBM = pad(twv[:M, C.P_BM])
        self.tMM = pad(twv[:M, C.P_MM])
        self.tIM = pad(twv[:M, C.P_IM])
        self.tDM = pad(twv[:M, C.P_DM])
        self.tMD = pad(twv[1:M, C.P_MD])
        self.tDD = pad(twv[1:M, C.P_DD])
        self.tMI = pad(twv[1:M + 1, C.P_MI])
        self.tII = pad(twv[1:M + 1, C.P_II])
        self.base = int(om.base_w)
        self.scale = float(om.scale_w)
        self.emove = int(om.xw[C.X_E, C.MOVE])
        self.eloop = int(om.xw[C.X_E, C.LOOP])
        self._om = om
        self._move_cache: dict[int, int] = {}

    def move_for(self, lens: np.ndarray) -> np.ndarray:
        from ...oprofile import _wordify
        nj = 1.0
        out = np.empty(len(lens), np.int32)
        cache = self._move_cache
        for i, L in enumerate(np.asarray(lens)):
            L = int(L)
            v = cache.get(L)
            if v is None:
                pmove = (np.float32(2.0) + np.float32(nj)) / (
                    np.float32(L) + np.float32(2.0) + np.float32(nj))
                v = _wordify(self.scale, np.log(pmove))
                cache[L] = v
            out[i] = v
        return out

    def ints(self, dsq_batch, lens):
        # host arrays straight into the jitted call: per-array
        # jnp.asarray costs a synchronous ~110ms device_put each on
        # tunneled backends (see SSVBathMB.captures)
        return _vit_mb_impl(
            dsq_batch, np.asarray(lens, np.int32), self.rwvT,
            self.tBM, self.tMM, self.tIM, self.tDM, self.tMD,
            self.tDD, self.tMI, self.tII, self.move_for(lens),
            self.Mt, self.base, self.emove, self.eloop)

    def scores(self, dsq_batch, lens) -> np.ndarray:
        ints, has, ovf = self.ints(dsq_batch, lens)
        ints = np.asarray(ints).astype(np.float64)
        sc = np.float32((ints - float(self.base)) / self.scale - 3.0)
        sc = np.where(np.asarray(has), sc, np.float32(-np.inf))
        return np.where(np.asarray(ovf), np.float32(np.inf), sc)


@partial(jax.jit, static_argnames=("Mt", "M", "base", "emove",
                                   "eloop"))
def _vit_bath_mb_impl(dsq, lens, thresh, rwvT, tBM, tMM, tIM, tDM,
                      tMD, tDD, tMI, tII, move_w, Mt, M, base, emove,
                      eloop):
    """Batched p7_ViterbiFilter_BATH capture scan (ref:
    impl_sse/vitfilter.c :286).  Same int16 DP as _vit_mb_impl; per
    row additionally emits k_start — the first model position in the
    reference's striped scan order whose M cell equals xE — whenever
    the lane's xE crosses its sc_thresh.  The skip_until suppression
    and the O(window) forward diagonal extension are host replay work
    on static tables (ops.reference.filters.vit_windows_from_
    captures): the DP itself is never reset by a capture, so the
    event stream is computable without host feedback.

    Returns (karr [Lpad, B] i16 — k_start per crossing row, 0
    otherwise; ovfrow [B] i32 — first row (1-based) whose xE
    saturates int16, 0 if none.  The reference returns eslERANGE at
    that row BEFORE its capture check, so the host replay keeps
    exactly the events at rows < ovfrow)."""
    B, L = dsq.shape
    dsq = dsq.astype(jnp.int32)
    BL = _MSV_BL
    Kp = rwvT.shape[1]
    NEG = -32768
    Lpad = ((L + BL - 1) // BL) * BL
    if Lpad != L:
        dsq = jnp.pad(dsq, ((0, 0), (0, Lpad - L)),
                      constant_values=Kp - 1)
    cb = dsq.T.reshape(Lpad // BL, BL * B)

    def sat(x):
        return jnp.clip(x, -32768, 32767)

    def shift(x):
        return jnp.pad(x[:-1], ((1, 0), (0, 0)), constant_values=NEG)

    nloop = jloop = cloop = 0
    nmove = jmove = move_w

    cvec = lambda v: v[:, None]
    tBMc, tMMc, tIMc, tDMc = map(cvec, (tBM, tMM, tIM, tDM))
    tMIc, tIIc = cvec(tMI), cvec(tII)
    tMD_s = cvec(jnp.pad(tMD[:-1], (1, 0), constant_values=NEG))
    add = jnp.broadcast_to(
        cvec(jnp.pad(tDD[:-1], (1, 0), constant_values=NEG)),
        (Mt, B))

    def ddscan(part):
        def combine(x, y):
            a1, b1 = x
            a2, b2 = y
            return sat(a1 + a2), jnp.maximum(sat(b1 + a2), b2)

        _, dd = jax.lax.associative_scan(combine, (add, part), axis=0)
        return dd

    # striped traversal order of the reference's k_start loop
    # (q-major over Qw stripes of 8 int16 lanes): order(k) =
    # ((k-1) % Qw)*8 + (k-1)//Qw; first match in this order wins
    Qw = max(2, (M + 7) // 8)
    BIGORD = 8 * Qw + 1
    korder = np.full(Mt, BIGORD, np.int32)
    for k in range(1, M + 1):
        korder[k - 1] = ((k - 1) % Qw) * 8 + (k - 1) // Qw
    korder = jnp.asarray(korder)[:, None]            # [Mt, 1]
    kidx = jnp.asarray(np.arange(1, Mt + 1, dtype=np.int32))[:, None]
    live = jnp.asarray(np.arange(Mt) < M)[:, None]

    oneT = rwvT.astype(F32)

    def block(carry, cblk):
        dm, di, dd, xN, xJ, xC, xB, ovfrow, base_i = carry
        oh = (cblk[None, :] == jnp.arange(Kp)[:, None]).astype(F32)
        rE = jax.lax.dot_general(
            oneT, oh, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=F32)
        krows = []
        for j in range(BL):
            i = base_i + j
            off = j * B
            row = jax.lax.slice(rE, (0, off), (Mt, off + B)) \
                .astype(I32)
            mp, ip, dp = shift(dm), shift(di), shift(dd)
            sv = sat(xB[None, :] + tBMc)
            sv = jnp.maximum(sv, sat(mp + tMMc))
            sv = jnp.maximum(sv, sat(ip + tIMc))
            sv = jnp.maximum(sv, sat(dp + tDMc))
            sv = sat(sv + row)
            xE = sv.max(axis=0)
            ovf2 = xE >= 32767
            new_i = jnp.maximum(sat(dm + tMIc), sat(di + tIIc))
            part = sat(shift(sv) + tMD_s)
            new_d = ddscan(part)
            xN2 = xN + nloop
            xC2 = jnp.maximum(xC + cloop, xE + emove)
            xJ2 = jnp.maximum(xJ + jloop, xE + eloop)
            xB2 = sat(jnp.maximum(xJ2 + jmove, xN2 + nmove))
            active = (i < lens)
            # capture event: first M cell == xE in striped order
            match = live & (sv == xE[None, :])
            mord = jnp.min(jnp.where(match, korder, BIGORD), axis=0)
            ksel = jnp.max(
                jnp.where(match & (korder == mord[None, :]), kidx, 0),
                axis=0)
            crossed = active & (xE >= thresh) & ~ovf2
            krows.append(jnp.where(crossed, ksel, 0)
                         .astype(jnp.int16))
            am = active[None, :]
            dm = jnp.where(am, sv, dm)
            di = jnp.where(am, new_i, di)
            dd = jnp.where(am, new_d, dd)
            xN = jnp.where(active, xN2, xN)
            xJ = jnp.where(active, xJ2, xJ)
            xC = jnp.where(active, xC2, xC)
            xB = jnp.where(active, xB2, xB)
            ovfrow = jnp.where(active & ovf2 & (ovfrow == 0),
                               i + 1, ovfrow)
        return (dm, di, dd, xN, xJ, xC, xB, ovfrow, base_i + BL), \
            jnp.stack(krows)

    neg = jnp.full((Mt, B), NEG, I32)
    carry0 = (neg, neg, neg,
              jnp.full(B, base, I32), jnp.full(B, NEG, I32),
              jnp.full(B, NEG, I32), base + nmove,
              jnp.zeros(B, I32), jnp.int32(0))
    (_, _, _, _, _, _, _, ovfrow, _), karr = jax.lax.scan(
        block, carry0, cb)
    return karr.reshape(Lpad, B), ovfrow


class VitBathMB:
    """Batched device capture events for p7_ViterbiFilter_BATH: the
    crossing-row scan runs on device over F2 survivors; the host
    replays events in order (skip_until suppression + O(window)
    diagonal extensions; ref: impl_sse/vitfilter.c :286)."""

    def __init__(self, om, vit: "VitExactMB"):
        self.om = om
        self.v = vit

    def captures(self, dsq_batch, lens, thresh):
        """[B, Lmax] aminos + [B] lens + [B] int sc_thresh ->
        (karr [Lpad, B] i16, ovfrow [B] i32) device arrays; events
        at rows >= ovfrow (when ovfrow > 0) must be discarded."""
        # host arrays go straight into the jitted call (see
        # SSVBathMB.captures: per-array jnp.asarray = one ~110ms
        # synchronous device_put each on tunneled backends)
        v = self.v
        return _vit_bath_mb_impl(
            dsq_batch, np.asarray(lens, np.int32),
            np.asarray(thresh, np.int32), v.rwvT, v.tBM,
            v.tMM, v.tIM, v.tDM, v.tMD, v.tDD, v.tMI, v.tII,
            v.move_for(lens), v.Mt, self.om.M, v.base, v.emove,
            v.eloop)


STREAM_SLOTS = 64   # max ORFs per packed stream (T // minlen bound)


@partial(jax.jit, static_argnames=("Mt", "base", "tec", "tbm",
                                   "bias"))
def _ssv_msv_stream_impl(dsq, tjbm8, flags, sbvT, rbvT, Mt, base,
                         tec, tbm, bias):
    """Stream-packed SSV+MSV: ORFs laid back-to-back in [T, S] dense
    planes (dsq residues, per-position tjb+tbm byte, start/end flag
    bits), state reset at ORF starts and results latched into
    [STREAM_SLOTS, S] slot arrays at ORF ends.  One executable launch
    scores S*T/avg_len ORFs — the padding-free answer to the
    per-call tunnel overhead that dominates the bucketed MSV stage
    (~500 launches per 100MB, measured round 3).

    Same integer dynamics as _ssv_msv_mb_impl per ORF (a reset
    reproduces that kernel's carry0 exactly, with the new ORF's tjbm
    byte).  Returns (nse [S] i32 slot counts, exEu, exJm, emovf
    [STREAM_SLOTS, S] i32)."""
    T, S = dsq.shape
    dsq = dsq.astype(jnp.int32)
    BL = _MSV_BL
    Kp = sbvT.shape[1]
    cb = dsq.reshape(T // BL, BL * S)
    tj = tjbm8.astype(jnp.int32).reshape(T // BL, BL * S)
    fl = flags.astype(jnp.int32).reshape(T // BL, BL * S)
    sT = sbvT.astype(BF16)
    rT = rbvT.astype(BF16)
    slot_iota = jnp.arange(STREAM_SLOTS, dtype=jnp.int32)[:, None]

    def block(carry, xs):
        (d, dp, xEu, xJm, xBm, movf, cur, nse, exEu, exJm, emovf) \
            = carry
        cblk, tjblk, flblk = xs
        oh = (cblk[None, :] == jnp.arange(Kp)[:, None]).astype(BF16)
        sE = jnp.dot(sT, oh, preferred_element_type=F32)
        rE = jnp.dot(rT, oh, preferred_element_type=F32)
        for j in range(BL):
            off = j * S
            srow = jax.lax.slice(sE, (0, off), (Mt, off + S)) \
                .astype(I32)
            rrow = jax.lax.slice(rE, (0, off), (Mt, off + S)) \
                .astype(I32)
            tjbm = jax.lax.slice(tjblk, (off,), (off + S,))
            f = jax.lax.slice(flblk, (off,), (off + S,))
            is_start = (f & 1) != 0
            is_end = (f & 2) != 0
            # ORF-start reset == _ssv_msv_mb_impl's carry0 (with the
            # incoming ORF's length-dependent tjbm byte).  Stream-tail
            # padding needs no masking: results latch at is_end, so
            # post-ORF evolution is never observed.
            d = jnp.where(is_start[None, :], -128, d)
            dp = jnp.where(is_start[None, :], 0, dp)
            xEu = jnp.where(is_start, 0, xEu)
            xJm = jnp.where(is_start, 0, xJm)
            xBm = jnp.where(is_start,
                            jnp.maximum(0, base - tjbm), xBm)
            movf = jnp.where(is_start, False, movf)
            # ---- SSV (ref: ssvfilter.c :875) ----
            dshift = _shift_down_i(d, -128)
            d = jnp.clip(dshift - srow, -128, 127)
            xEu = jnp.maximum(xEu, (d & 0xFF).max(axis=0))
            # ---- MSV (ref: msvfilter.c :76) ----
            mpv = _shift_down_i(dp, 0)
            sv = jnp.maximum(mpv, xBm[None, :])
            sv = jnp.minimum(sv + bias, 255)
            dp = jnp.maximum(sv - rrow, 0)
            xE = dp.max(axis=0)
            ovf = xE + bias >= 255
            xE = jnp.maximum(0, xE - tec)
            xJm = jnp.maximum(xJm, xE)
            xBm = jnp.maximum(0, jnp.maximum(base, xJm) - tjbm)
            movf = movf | ovf
            # ---- latch at ORF end ----
            rec = (slot_iota == cur[None, :]) & is_end[None, :]
            exEu = jnp.where(rec, xEu[None, :], exEu)
            exJm = jnp.where(rec, xJm[None, :], exJm)
            emovf = jnp.where(rec, movf[None, :].astype(I32), emovf)
            cur = cur + is_end.astype(I32)
            nse = nse + is_end.astype(I32)
        return (d, dp, xEu, xJm, xBm, movf, cur, nse, exEu, exJm,
                emovf), None

    z_s = jnp.zeros(S, I32)
    z_e = jnp.zeros((STREAM_SLOTS, S), I32)
    carry0 = (jnp.full((Mt, S), -128, I32), jnp.zeros((Mt, S), I32),
              z_s, z_s, z_s, jnp.zeros(S, bool), z_s, z_s,
              z_e, z_e, z_e)
    carry, _ = jax.lax.scan(block, carry0, (cb, tj, fl))
    (_, _, _, _, _, _, _, nse, exEu, exJm, emovf) = carry
    return nse, exEu, exJm, emovf


STREAM_T = 768       # positions per stream (multiple of _MSV_BL)
STREAM_TQ = 576      # quota per stream; reserve = T - TQ bounds the
STREAM_CUTOFF = STREAM_T - STREAM_TQ   # longest packable ORF


def pack_orf_streams(flat, offs, lens, tjbm):
    """Vectorized dense packing of ORFs into [T, S] planes for
    _ssv_msv_stream_impl.  <flat> int8 residue stream, <offs>/<lens>
    per-ORF, <tjbm> per-ORF (tjb+tbm)&0xFF byte.  All ORFs must have
    len <= STREAM_CUTOFF (caller filters).  Returns (dsq_plane,
    tjbm_plane, flags_plane, stream_of, slot_of) with planes
    [T, S] uint8 and per-ORF (stream, slot) output coordinates, or
    None when a stream would exceed STREAM_SLOTS ORFs."""
    lens = np.asarray(lens, np.int64)
    offs = np.asarray(offs, np.int64)
    n = len(lens)
    cum = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=cum[1:])
    s_of = cum[:-1] // STREAM_TQ
    pos = cum[:-1] % STREAM_TQ
    S = int(s_of[-1]) + 1 if n else 1
    S = max(128, -(-S // 128) * 128)
    # slot = rank within stream (packing order == end order)
    first = np.r_[True, s_of[1:] != s_of[:-1]]
    start_rank = np.maximum.accumulate(np.where(first, np.arange(n),
                                                0))
    slot = np.arange(n) - start_rank
    if n and slot.max() >= STREAM_SLOTS:
        return None
    dsq = np.full((STREAM_T, S), 28, np.uint8)
    tjp = np.zeros((STREAM_T, S), np.uint8)
    flg = np.zeros((STREAM_T, S), np.uint8)
    if n:
        rep_id = np.repeat(np.arange(n), lens)
        k = np.arange(cum[-1]) - np.repeat(cum[:-1], lens)
        tgt = (np.repeat(pos, lens) + k) * S + np.repeat(s_of, lens)
        src = np.repeat(offs, lens) + k
        dsq.ravel()[tgt] = np.asarray(flat, np.uint8)[src]
        tjp.ravel()[tgt] = np.asarray(tjbm, np.uint8)[rep_id]
        cell_s = pos * S + s_of
        cell_e = (pos + lens - 1) * S + s_of
        np.bitwise_or.at(flg.ravel(), cell_s, 1)
        np.bitwise_or.at(flg.ravel(), cell_e, 2)
    return dsq, tjp, flg, s_of.astype(np.int64), slot.astype(np.int64)


def ssv_msv_post_np(xEu, xJm, movf, base, tjb, tbm, tec, bias):
    """The per-ORF uint16-wraparound SSV post-processing (identical
    to _ssv_msv_mb_impl's tail, numpy over latched stream outputs).
    Returns (out_int, out_inf)."""
    no_ssv = (tjb + tbm + tec + bias) >= 127
    ovf1 = xEu >= 255 - bias
    none1 = base - tjb - tbm < 128
    xE2 = (xEu + base - tjb - tbm) & 0xFFFF
    xE2 = (xE2 - 128) & 0xFFFF
    ovf2 = xE2 >= 255 - bias
    xJ = (xE2 - tec) & 0xFFFF
    none2 = xJ > base
    ssv_int = xJ - tjb
    ssv_none = no_ssv | (ovf1 & none1) | none2
    ssv_inf = (~ssv_none) & ((ovf1 & ~none1) | ovf2)
    out_int = np.where(ssv_none, xJm - tjb, ssv_int)
    out_inf = np.where(ssv_none, movf != 0, ssv_inf)
    return out_int, out_inf


SSVB_NCAP = 16   # capture slots per lane; overflow -> host fallback


@partial(jax.jit, static_argnames=("Mt", "M", "base", "tbm", "bias"))
def _ssv_bath_mb_impl(dsq, lens, tjb, thresh, rbvT, Mt, M, base, tbm,
                      bias):
    """Batched p7_SSVFilter_BATH capture scan (ref:
    impl_sse/msvfilter.c :250).  Per lane: the single-row SSV DP with
    constant xB; whenever any cell crosses the lane's sc_thresh,
    record (row i, striped-order argmax k, score) and reset the DP —
    exactly the reference's capture events.  The backward diagonal
    walk and forward extension are O(window) host work on static
    tables (ops.reference.filters._ssv_walk).

    Returns (nwin [B] i32 incl. overflow count, wi/wk/wsc
    [SSVB_NCAP, B] i32)."""
    B, L = dsq.shape
    dsq = dsq.astype(jnp.int32)
    BL = _MSV_BL
    Lpad = ((L + BL - 1) // BL) * BL
    Kp = rbvT.shape[1]
    if Lpad != L:
        dsq = jnp.pad(dsq, ((0, 0), (0, Lpad - L)),
                      constant_values=Kp - 1)
    cb = dsq.T.reshape(Lpad // BL, BL * B)
    rT = rbvT.astype(BF16)
    xB = jnp.maximum(0, base - (tjb + tbm))          # [B], constant
    # striped traversal order of the reference's argmax loop
    # (q-major over Qb stripes of 16): order(k) = ((k-1) % Qb)*16
    # + (k-1)//Qb; ties keep the first in this order
    Qb = max(2, (M + 15) // 16)
    # pack (score, order) into one int key: factor = pow2 above the
    # largest order so score stays the primary sort key; dead rows
    # get the max order (lowest priority at equal score 0)
    FACT = 1 << int(np.ceil(np.log2(16 * Qb + 2)))
    korder = np.full(Mt, FACT - 1, np.int32)
    for k in range(1, M + 1):
        korder[k - 1] = ((k - 1) % Qb) * 16 + (k - 1) // Qb
    korder = jnp.asarray(korder)[:, None]            # [Mt, 1]
    kidx = jnp.asarray(np.arange(1, Mt + 1, dtype=np.int32))[:, None]
    capslot = jnp.asarray(
        np.arange(SSVB_NCAP, dtype=np.int32))[:, None]  # [NCAP, 1]
    live = jnp.asarray(
        (np.arange(Mt) < M).astype(np.int32))[:, None]

    def block(carry, cblk):
        dp, nwin, wi, wk, wsc, base_i = carry
        oh = (cblk[None, :] == jnp.arange(Kp)[:, None]).astype(BF16)
        rE = jnp.dot(rT, oh, preferred_element_type=F32)
        for j in range(BL):
            i = base_i + j
            off = j * B
            rrow = jax.lax.slice(rE, (0, off), (Mt, off + B)) \
                .astype(I32)
            active = (i < lens)
            mpv = _shift_down_i(dp, 0)
            sv = jnp.maximum(mpv, xB[None, :])
            sv = jnp.minimum(sv + bias, 255)
            sv = jnp.maximum(sv - rrow, 0)
            sv = sv * live                    # dead model rows = 0
            # capture event: any cell >= the lane threshold
            # key packs (score DESC, striped order ASC) so the max
            # reproduces the reference's first-max-in-striped-order
            key = sv * FACT + (FACT - 1 - korder)
            mkey = key.max(axis=0)                       # [B]
            msc = mkey // FACT
            crossed = active & (msc >= thresh)
            ksel = jnp.max(jnp.where(key == mkey[None, :], kidx, 0),
                           axis=0)
            # record into slot nwin (lanes past NCAP only count)
            rec = crossed[None, :] & (capslot == nwin[None, :])
            wi = jnp.where(rec, i + 1, wi)
            wk = jnp.where(rec, ksel[None, :], wk)
            wsc = jnp.where(rec, msc[None, :], wsc)
            nwin = nwin + crossed.astype(I32)
            # reference resets the whole DP row after a capture
            dp = jnp.where(active[None, :],
                           jnp.where(crossed[None, :], 0, sv), dp)
        return (dp, nwin, wi, wk, wsc, base_i + BL), None

    z = jnp.zeros((SSVB_NCAP, B), I32)
    carry0 = (jnp.zeros((Mt, B), I32), jnp.zeros(B, I32), z, z, z,
              jnp.int32(0))
    (dp, nwin, wi, wk, wsc, _), _ = jax.lax.scan(block, carry0, cb)
    return nwin, wi, wk, wsc


class SSVBathMB:
    """Batched device window-capture for p7_SSVFilter_BATH: the
    capture-event scan runs on device over bias survivors; the host
    finishes each event with the O(window) diagonal walks (ref:
    impl_sse/msvfilter.c :250)."""

    def __init__(self, om, msv: "MSVExactMB"):
        self.om = om
        self.m = msv

    def captures(self, dsq_batch, lens, thresh):
        """[B, Lmax] aminos + [B] lens + [B] int thresholds ->
        (nwin, wi, wk, wsc) device arrays.  Host arrays go straight
        into the jitted call: one batched transfer per dispatch —
        explicit per-array jnp.asarray costs a ~110ms synchronous
        device_put EACH on tunneled backends (profiled: 10.7s of a
        20s drive)."""
        return _ssv_bath_mb_impl(
            dsq_batch, np.asarray(lens, np.int32),
            self.m.tjb_for(lens), np.asarray(thresh, np.int32),
            self.m.rbvT, self.m.Mt, self.om.M, self.m.base,
            self.m.tbm, self.m.bias)


class MSVExactMB:
    """[model, batch] drop-in for msv_exact.MSVExact: same .scores
    contract (bit-identical to ops.reference.filters.msv_filter per
    item), ~2 orders of magnitude faster on TPU."""

    def __init__(self, om, sub_multiple: int = 8):
        M, Kp = om.M, om.Kp
        Mt = round_up(M, sub_multiple)
        # dead model rows: max cost (same dynamics as MSVExact's dead
        # lanes, which the parity tests pin down)
        sbvT = np.full((Mt, Kp), 127, np.float32)
        sbvT[:M] = om.sbv[:, 1:M + 1].astype(np.float32).T
        rbvT = np.full((Mt, Kp), 255, np.float32)
        rbvT[:M] = om.rbv[:, 1:M + 1].astype(np.float32).T
        self.Mt = Mt
        self.sbvT = jnp.asarray(sbvT)
        self.rbvT = jnp.asarray(rbvT)
        self.base = int(om.base_b)
        self.tec = int(om.tec_b)
        self.tbm = int(om.tbm_b)
        self.bias = int(om.bias_b)
        self.scale = float(om.scale_b)
        self._om = om
        self._tjb_cache: dict[int, int] = {}

    def tjb_for(self, lens: np.ndarray) -> np.ndarray:
        out = np.empty(len(lens), np.int32)
        cache = self._tjb_cache
        bf = self._om._unbiased_byteify
        for i, L in enumerate(np.asarray(lens)):
            L = int(L)
            v = cache.get(L)
            if v is None:
                v = bf(np.log(3.0 / (L + 3.0)))
                cache[L] = v
            out[i] = v
        return out

    def ints(self, dsq_batch, lens):
        """Device part only: returns (out_int, out_inf) jnp arrays.
        Host arrays go straight into the jitted call (per-array
        jnp.asarray = one synchronous ~110ms device_put each on
        tunneled backends, see SSVBathMB.captures)."""
        return _ssv_msv_mb_impl(
            dsq_batch, np.asarray(lens, np.int32),
            self.tjb_for(lens), self.sbvT, self.rbvT, self.Mt,
            self.base, self.tec, self.tbm, self.bias)

    def scores(self, dsq_batch: np.ndarray, lens: np.ndarray
               ) -> np.ndarray:
        """[B, Lmax] padded digital aminos (pad 28=missing) + [B]
        lengths -> [B] MSV scores identical to
        ops.reference.filters.msv_filter per item."""
        ints, infs = self.ints(dsq_batch, lens)
        ints = np.asarray(ints).astype(np.float64)
        sc = np.float32((ints - float(self.base)) / self.scale - 3.0)
        return np.where(np.asarray(infs), np.float32(np.inf), sc)
