"""fs3-Forward gate, v3: block-lazy rescaling.

The round-3 roofline analysis (docs/architecture.md) pinned both the
jnp and Pallas fs3 kernels at ~46-48 GCUPS on a VPU-issue wall: ~24
surviving [Mt, B] elementwise ops per DP position.  v3 is the
algorithmic attempt VERDICT r3 item 5 asked for — cut the ops per
cell, not the tiles:

1. **Block-lazy rescaling.**  The v1 kernel tracks a pending-scale
   scalar per ring slot and folds it at every read (~4 [Mt, B]
   multiplies per position: the sv *sc2, the two ivx *pivx, the
   new_i *pend).  v3 rescales once per BL-position block instead:
   within a block every row shares the block-base scale, so reads
   need NO folding at all; at the block boundary one [B] scale
   (max xE over the block, clamped >= 1 like v1's per-position
   max(xE, 1)) is divided into the ring slots that survive into the
   next block (9 row multiplies + 2 ivx per block ~= 0.5/pos at
   BL=24).  f32 headroom makes this safe: 24 positions of unrescaled
   growth is bounded by ~(max odds ratio)^24 against f32's 3.4e38;
   the shrink direction is identical to v1 (which also never
   upscales).

2. **f32 emission dots.**  v1 stores the one-hot emission products
   bf16 and converts each position's slice to f32 (3 converts/pos).
   The MXU accumulates in f32 regardless, and a one-hot row selects a
   single bf16-rounded table entry — so asking the dot for f32 output
   returns the SAME values with zero VPU work.

3. **D-ring shift folded into the closure operand.**  The stored D
   row is only ever read as shift_down(dr) (the k-1 access); since
   new_d is produced by a matmul, the shift is a free row permutation
   of the closure operator (W3s below), removing one sublane roll per
   position.

Net: ~24 -> ~15-16 [Mt, B] ops/position.  Measured on one v5e chip
(M=134, B=4096, L=8184, best-of-3): **60.1 GCUPS** at the default
(edot="pos", BL=24) vs v1's 47.8 — the per-position f32 emission
dots must stay SSA values (edot="block" materializes [Mt, BL*B] f32
in HBM and REGRESSES to 43; BL=36 regresses to 53; a fused
block-diagonal [3Mt,339] emission dot + [Mt+8,Mt] closure/xE
operator — one MXU call per position instead of five — measured 33:
three small-contraction dots beat one big one).

Scores are within f32 round-off of v1 (same recurrence, same
emission values, different rescale points); the production gate band
(DEVICE_GATE_BAND, 0.05 nats at the pipeline tier) dwarfs the drift,
and the parity test pins it against the host parser at the same
tolerance as v1.

Ref: generic_fwdback_frameshift.c:210-232 (the IVX recurrence);
impl_sse/fwdback_fs.c (the reference's per-row sparse rescaling this
replaces).
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
BL = 12                      # lcm of the 4-slot MDI and 3-slot IVX rings


@dataclass
class FS3ParamsV3:
    base: jk.FS3Params       # v1 params (tables, transitions, u)
    W3s: jnp.ndarray         # [Mt, Mt] closure with the D-ring k-1
    #                          read shift pre-folded (rows shifted)


def fs3_params_v3(om_fs, sub_multiple: int = 8) -> FS3ParamsV3:
    base = jk.fs3_params(om_fs, sub_multiple=sub_multiple)
    W3 = np.asarray(base.UT)
    W3s = np.zeros_like(W3)
    W3s[1:] = W3[:-1]        # dr row k now holds old row k-1
    return FS3ParamsV3(base=base, W3s=jnp.asarray(W3s))


@partial(jax.jit, static_argnames=("Mt", "nj", "edot", "BL"))
def _fs3_v3_impl(dsq, lens, T2, T3, T4, tBM, tMM, tIM, tMI, tII,
                 nj, Mt, W3s, u, edot="pos", BL=24):
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

    # compact per-channel codon digits (identical to v1)
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

    tBMc, tMMc, tIMc = (t[:, None] for t in (tBM, tMM, tIM))
    tMIc, tIIc = tMI[:, None], tII[:, None]
    BF16 = jnp.bfloat16
    T2b, T3b, T4b = T2.astype(BF16), T3.astype(BF16), T4.astype(BF16)
    uc = u[None, :]

    def emis(tab, cblk):
        # bf16 one-hot, f32 accumulate: same selected values as v1's
        # bf16 output (a one-hot row picks one bf16-rounded entry),
        # zero convert ops downstream
        n = tab.shape[1]
        oh = (cblk[None, :] == jnp.arange(n)[:, None]).astype(BF16)
        return jnp.dot(tab, oh, preferred_element_type=F32)

    def block(carry, blk, first=False):
        c2_blk, c3_blk, c4_blk = blk
        (mr, ir, dr, ivx, xNb, xBb, xJb, xCb, logacc, lcomp, score,
         base) = carry
        mr, ir, dr, ivx = list(mr), list(ir), list(dr), list(ivx)
        xNb, xBb, xJb, xCb = list(xNb), list(xBb), list(xJb), list(xCb)

        if edot == "block":
            # one stacked dot per channel per block; f32 output lives
            # in HBM at [Mt, BL*B] (36 position-slices read back)
            E2a = emis(T2b, c2_blk)          # [Mt, BL*B] f32
            E3a = emis(T3b, c3_blk)
            E4a = emis(T4b, c4_blk)
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
            if edot == "block":
                E2 = jax.lax.slice(E2a, (0, off), (Mt, off + B))
                E3 = jax.lax.slice(E3a, (0, off), (Mt, off + B))
                E4 = jax.lax.slice(E4a, (0, off), (Mt, off + B))
            else:
                # per-position dots stay SSA values (VMEM-resident);
                # MXU has headroom (24% busy, architecture.md)
                E2 = emis(T2b, jax.lax.slice(c2_blk, (off,),
                                             (off + B,)))
                E3 = emis(T3b, jax.lax.slice(c3_blk, (off,),
                                             (off + B,)))
                E4 = emis(T4b, jax.lax.slice(c4_blk, (off,),
                                             (off + B,)))

            mp = jk._shift_down(mr[p2_m4])
            ip = jk._shift_down(ir[p2_m4])
            # dr rows are stored pre-shifted (W3s), read direct
            sv = xBb[p2_m4][None, :] * tBMc \
                + (mp * tMMc + ip * tIMc + dr[p2_m4])
            msv = sv * E2
            t3 = ivx[s3] * E3
            t4 = ivx[s4] * E4
            new_i = mr[p3_m4] * tMIc + ir[p3_m4] * tIIc
            if first:
                t3 = jnp.where(pos >= 3, t3, 0.0)
                t4 = jnp.where(pos >= 4, t4, 0.0)
                new_i = jnp.where(pos >= 3, new_i, 0.0)
            msv = msv + t3 + t4
            new_d = jnp.dot(W3s, msv, preferred_element_type=F32)
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

            mr[pos_m4], ir[pos_m4], dr[pos_m4] = msv, new_i, new_d
            ivx[s2] = sv
            xNb[pos_m4], xJb[pos_m4] = xN2, xJ2
            xCb[pos_m4], xBb[pos_m4] = xC2, xB2

            active = (i < lens)
            xemax = jnp.where(active, jnp.maximum(xemax, xE), xemax)
            done = (i + 1 == lens)
            # final xC over the last-3-codon tail; everything is at
            # the block-base scale, so no folds (see module doc)
            cl = xC2 + (xCb[j % 4] + xCb[(j - 1) % 4]) * ploop
            score = jnp.where(done, logacc + jnp.log(cl * pmove),
                              score)

        # ---- block-boundary rescale ---------------------------------
        sc = jnp.maximum(xemax, 1.0)
        sinv = (1.0 / sc)[None, :]
        # only the slots the next block reads before overwriting:
        # mr/ir at p2/p3 -> {0, 2, 3}; dr at p2 -> {0, 3};
        # ivx at s3/s4 -> {0, 2}  (BL=12 keeps ring phases aligned)
        for r in (0, 2, 3):
            mr[r] = mr[r] * sinv
            ir[r] = ir[r] * sinv
        for r in (0, 3):
            dr[r] = dr[r] * sinv
        for s in (0, 2):
            ivx[s] = ivx[s] * sinv
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
        return (tuple(mr), tuple(ir), tuple(dr), tuple(ivx),
                tuple(xNb), tuple(xBb), tuple(xJb), tuple(xCb),
                logacc, lcomp, score, base + BL), None

    zrow = jnp.zeros((Mt, B), F32)
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


def fs3_score_batch_v3(dsq, lens, params: FS3ParamsV3,
                       nj: float = 1.0, edot: str = "pos",
                       BL: int = 24) -> jnp.ndarray:
    """Frameshift 3-codon Forward scores (nats), v1 call contract
    (lane-chunked past the VMEM carry cap like fs3_score_batch)."""
    p = params.base
    dsq = jnp.asarray(dsq)
    lens = jnp.asarray(lens)
    B = dsq.shape[0]
    cap = jk.fs3_max_lanes(p.Mt)

    def one(d, ln):
        return _fs3_v3_impl(d, ln, p.T2, p.T3, p.T4, p.tBM, p.tMM,
                            p.tIM, p.tMI, p.tII, float(nj), p.Mt,
                            params.W3s, p.u, edot=edot, BL=BL)

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
