"""fs3-Forward gate, v4: linear-operator folding on top of v3.

v3 (fs3_v3.py, 63.7 GCUPS measured r4) reduced the per-position
elementwise op count to ~16 [Mt, B] VPU ops via block-lazy rescaling.
v4 attacks the remaining per-position ops with two algebraic folds
(VERDICT r4 item 5's named levers):

1. **M-path shift+scale folded into the closure matmul.**  The sv
   recurrence reads shift_down(M_lag)*tMM + D_lag where D_lag is
   already a matmul output (dot(W3s, msv)).  Both terms are linear in
   the SAME msv, so one operator computes their sum:

       W3c = W3s + S.diag(shift_up(tMM)),   dm = dot(W3c, msv)

   (S = down-shift permutation; row k of the correction is
   tMM[k] * msv[k-1], exactly shift_down(msv)*tMM).  Removes one
   sublane roll, one multiply, and one add per position at zero MXU
   cost (same [Mt, Mt] dot, different constants).

2. **I row stored pre-multiplied by tIM.**  I enters sv only as
   shift_down(I)*tIM; storing iw = I*tIM rewrites the recurrence as
   iw' = msv*(tMI*tIM) + iw*tII with A = tMI*tIM precomputed, and sv
   reads shift_down(iw) with no multiply.  Removes one multiply per
   position.

Net: ~16 -> ~12 surviving [Mt, B] ops per position (1 roll, 6 mul,
5 add) + the same 5 MXU dots; the VPU-roofline model that predicted
v3's ceiling (docs/architecture.md) predicts ~63.7 * 16/12 ~= 85
GCUPS if the dots stay off the critical path.  Scores differ from
v3 only in f32 rounding order (the tMM multiply now rounds inside
the dot's accumulation); the production gate band absorbs ~1e-2 nats,
and the parity test pins the same tolerance as v3.

Ref: generic_fwdback_frameshift.c:210-232 (the IVX recurrence);
impl_sse/fwdback_fs.c (the reference's per-row sparse rescaling that
block-lazy rescaling replaces).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ... import constants as C
from . import kernels as jk

F32 = jnp.float32


@dataclass
class FS3ParamsV4:
    base: jk.FS3Params       # v1 params (tables, transitions, u)
    W3c: jnp.ndarray         # [Mt, Mt] closure + D-shift + M-path fold
    A: jnp.ndarray           # [Mt, 1] tMI * tIM (iw recurrence input)


def fs3_params_v4(om_fs, sub_multiple: int = 8) -> FS3ParamsV4:
    base = jk.fs3_params(om_fs, sub_multiple=sub_multiple)
    W3 = np.asarray(base.UT)
    W3c = np.zeros_like(W3)
    W3c[1:] = W3[:-1]                    # D-ring k-1 read shift (v3)
    tMM = np.asarray(base.tMM)
    # + S.diag(shift_up(tMM)): row k adds tMM[k] * msv[k-1]
    idx = np.arange(1, W3.shape[0])
    W3c[idx, idx - 1] += tMM[idx]
    A = (np.asarray(base.tMI) * np.asarray(base.tIM))[:, None]
    return FS3ParamsV4(base=base, W3c=jnp.asarray(W3c),
                       A=jnp.asarray(A.astype(np.float32)))


@partial(jax.jit, static_argnames=("Mt", "nj", "BL", "ring_bf16"))
def _fs3_v4_impl(dsq, lens, T2, T3, T4, tBM, tII, A, nj, Mt, W3c, u,
                 BL=24, ring_bf16=False):
    B, L = dsq.shape
    dsq = dsq.astype(jnp.int32)
    Lpad = ((L + BL - 1) // BL) * BL
    if Lpad != L:
        dsq = jnp.pad(dsq, ((0, 0), (0, Lpad - L)), constant_values=17)
    Lf = (lens // 3).astype(F32)
    pmove = (2.0 + nj) / (Lf + 2.0 + nj)
    ploop = 1.0 - pmove
    emove = 0.5 if nj > 0 else 1.0
    eloop = 0.5 if nj > 0 else 0.0

    # compact per-channel codon digits (identical to v1/v3)
    xd = jnp.minimum(dsq, C.MAXNUC).astype(jnp.int32)
    xm1 = jnp.pad(xd, ((0, 0), (1, 0)), constant_values=C.MAXNUC)[:, :-1]
    xm2 = jnp.pad(xd, ((0, 0), (2, 0)), constant_values=C.MAXNUC)[:, :-2]
    xm3 = jnp.pad(xd, ((0, 0), (3, 0)), constant_values=C.MAXNUC)[:, :-3]
    dg2 = (xd > 3) | (xm1 > 3)
    dg3 = dg2 | (xm2 > 3)
    dg4 = dg3 | (xm3 > 3)
    c2 = jnp.where(dg2, 16, xd * 4 + xm1)
    c3 = jnp.where(dg3, 64, xd * 16 + xm1 * 4 + xm2)
    c4 = jnp.where(dg4, 256, xd * 64 + xm1 * 16 + xm2 * 4 + xm3)
    c2b = c2.T.reshape(Lpad // BL, BL * B)
    c3b = c3.T.reshape(Lpad // BL, BL * B)
    c4b = c4.T.reshape(Lpad // BL, BL * B)

    tBMc = tBM[:, None]
    tIIc = tII[:, None]
    BF16 = jnp.bfloat16
    T2b, T3b, T4b = T2.astype(BF16), T3.astype(BF16), T4.astype(BF16)
    uc = u[None, :]

    def emis(tab, cblk):
        n = tab.shape[1]
        oh = (cblk[None, :] == jnp.arange(n)[:, None]).astype(BF16)
        return jnp.dot(tab, oh, preferred_element_type=F32)

    # ring_bf16: store the [Mt, B] ring rows bf16 (halves the VMEM
    # ring traffic that binds the kernel at saturating B — the v4
    # measurement showed -25% ops bought only +3.5%); reads upcast,
    # f32 accumulation everywhere else.  ~0.4% per-op rounding on
    # ring values, absorbed by the gate band (parity-tested).
    RD = BF16 if ring_bf16 else F32
    dn = (lambda x: x.astype(RD)) if ring_bf16 else (lambda x: x)
    up = (lambda x: x.astype(F32)) if ring_bf16 else (lambda x: x)

    def block(carry, blk, first=False):
        c2_blk, c3_blk, c4_blk = blk
        (mr, iwr, dmr, ivx, xNb, xBb, xJb, xCb, logacc, lcomp, score,
         base) = carry
        mr, iwr, dmr, ivx = list(mr), list(iwr), list(dmr), list(ivx)
        xNb, xBb, xJb, xCb = list(xNb), list(xBb), list(xJb), list(xCb)

        xemax = jnp.zeros(B, F32)
        for j in range(BL):
            i = base + j
            pos = i + 1
            pos_m4 = (j + 1) % 4
            p2_m4 = (j - 1) % 4
            p3_m4 = (j - 2) % 4
            s2 = (j + 1) % 3
            s3 = j % 3
            s4 = (j - 1) % 3
            off = j * B
            E2 = emis(T2b, jax.lax.slice(c2_blk, (off,), (off + B,)))
            E3 = emis(T3b, jax.lax.slice(c3_blk, (off,), (off + B,)))
            E4 = emis(T4b, jax.lax.slice(c4_blk, (off,), (off + B,)))

            # dm carries shift(D) + shift(M)*tMM in one ring (W3c);
            # iw carries I*tIM pre-multiplied
            iwp = up(jk._shift_down(iwr[p2_m4]))
            sv = xBb[p2_m4][None, :] * tBMc + (iwp + up(dmr[p2_m4]))
            msv = sv * E2
            t3 = up(ivx[s3]) * E3
            t4 = up(ivx[s4]) * E4
            new_iw = up(mr[p3_m4]) * A + up(iwr[p3_m4]) * tIIc
            if first:
                t3 = jnp.where(pos >= 3, t3, 0.0)
                t4 = jnp.where(pos >= 4, t4, 0.0)
                new_iw = jnp.where(pos >= 3, new_iw, 0.0)
            msv = msv + t3 + t4
            new_dm = jnp.dot(W3c, msv, preferred_element_type=F32)
            xE = jnp.dot(uc, msv, preferred_element_type=F32)[0]
            xN2 = xNb[p3_m4] * ploop
            xJ2 = xJb[p3_m4] * ploop + xE * eloop
            xC2 = xCb[p3_m4] * ploop + xE * emove
            if first:
                ge3 = pos >= 3
                xN2 = jnp.where(ge3, xN2, 1.0)
                xJ2 = jnp.where(ge3, xJ2, xE * eloop)
                xC2 = jnp.where(ge3, xC2, xE * emove)
            xB2 = xN2 * pmove + xJ2 * pmove

            mr[pos_m4], iwr[pos_m4], dmr[pos_m4] = \
                dn(msv), dn(new_iw), dn(new_dm)
            ivx[s2] = dn(sv)
            xNb[pos_m4], xJb[pos_m4] = xN2, xJ2
            xCb[pos_m4], xBb[pos_m4] = xC2, xB2

            active = (i < lens)
            xemax = jnp.where(active, jnp.maximum(xemax, xE), xemax)
            done = (i + 1 == lens)
            cl = xC2 + (xCb[j % 4] + xCb[(j - 1) % 4]) * ploop
            score = jnp.where(done, logacc + jnp.log(cl * pmove),
                              score)

        # ---- block-boundary rescale (v3's slot set; dm==dr, iw==ir)
        sc = jnp.maximum(xemax, 1.0)
        sinv = (1.0 / sc)[None, :]
        for r in (0, 2, 3):
            mr[r] = dn(up(mr[r]) * sinv)
            iwr[r] = dn(up(iwr[r]) * sinv)
        for r in (0, 3):
            dmr[r] = dn(up(dmr[r]) * sinv)
        for s in (0, 2):
            ivx[s] = dn(up(ivx[s]) * sinv)
        sb = sinv[0]
        for r in range(4):
            xNb[r] = xNb[r] * sb
            xBb[r] = xBb[r] * sb
            xJb[r] = xJb[r] * sb
            xCb[r] = xCb[r] * sb
        lsc = jnp.log(sc)
        ky = lsc - lcomp
        kt = logacc + ky
        lcomp = (kt - logacc) - ky
        logacc = kt
        return (tuple(mr), tuple(iwr), tuple(dmr), tuple(ivx),
                tuple(xNb), tuple(xBb), tuple(xJb), tuple(xCb),
                logacc, lcomp, score, base + BL), None

    zrow = jnp.zeros((Mt, B), RD)
    zb = jnp.zeros(B, F32)
    ones = jnp.ones(B, F32)
    xNb0 = (ones, ones, zb, zb)
    xBb0 = (pmove.astype(F32), pmove.astype(F32), zb, zb)
    carry0 = ((zrow,) * 4, (zrow,) * 4, (zrow,) * 4, (zrow,) * 3,
              xNb0, xBb0, (zb,) * 4, (zb,) * 4, jnp.zeros(B, F32),
              jnp.zeros(B, F32), jnp.full(B, -jnp.inf, F32),
              jnp.int32(0))
    carry, _ = block(carry0, (c2b[0], c3b[0], c4b[0]), first=True)
    carry, _ = jax.lax.scan(block, carry, (c2b[1:], c3b[1:], c4b[1:]))
    return carry[10]


def fs3_score_batch_v4(dsq, lens, params: FS3ParamsV4,
                       nj: float = 1.0, BL: int = 24,
                       ring_bf16: bool = False) -> jnp.ndarray:
    """Frameshift 3-codon Forward scores (nats), v1 call contract
    (lane-chunked past the VMEM carry cap like fs3_score_batch)."""
    p = params.base
    dsq = jnp.asarray(dsq)
    lens = jnp.asarray(lens)
    B = dsq.shape[0]
    cap = jk.fs3_max_lanes(p.Mt)

    def one(d, ln):
        return _fs3_v4_impl(d, ln, p.T2, p.T3, p.T4, p.tBM, p.tII,
                            params.A, float(nj), p.Mt, params.W3c,
                            p.u, BL=BL, ring_bf16=ring_bf16)

    if B <= cap:
        return one(dsq, lens)
    outs = [one(dsq[c:c + cap], lens[c:c + cap])
            for c in range(0, B - B % cap, cap)]
    if B % cap:
        pad = cap - B % cap
        outs.append(one(jnp.pad(dsq[B - B % cap:], ((0, pad), (0, 0)),
                                constant_values=17),
                        jnp.pad(lens[B - B % cap:], (0, pad)))[:B % cap])
    return jnp.concatenate(outs)
