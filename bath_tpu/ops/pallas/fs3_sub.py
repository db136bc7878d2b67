"""Pallas TPU kernel: frameshift 3-codon Forward gate in the
[model-on-sublanes, batch-on-lanes] layout (the jaxk layout), with
the whole DP ring state VMEM-resident across the position scan.

Motivation (measured on v5e, see docs/architecture.md): the XLA jaxk
kernel is VPU/HBM bound — its scan carry (15 [Mt,B] ring rows) makes
an HBM round trip every 12-position block.  Keeping the rings in
VMEM scratch for the entire sequence removes that traffic.  The
batch tile is bounded by VMEM: 15 ring rows x [Mt, Bt] f32 must fit
~16 MB, so Bt <= 1024 for M ~ 134.

Same recurrence and pending-scale folding as
ops/jaxk/kernels._fs3_score_impl (ref: impl_sse/fwdback_fs.c
p7_ForwardParser_Frameshift_3Codons); parity vs the scalar parser is
tested in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
NEG = -1e30

# sp_scr rows (per-item scalars, [1, Bt] each)
R_XN, R_XJ, R_XC, R_XB = 0, 4, 8, 12      # 4-slot rings
R_PEND = 16                                # 4-slot pending scales
R_PIVX = 20                                # 3-slot IVX pending scales
R_ACC, R_SCORE = 23, 24
SP_ROWS = 32


def _shift_down_sub(x, masked):
    """sublane k reads k-1; row 0 gets 0 (model k-1 access).  When
    M < Mt (the usual case) every ring row >= M is identically zero
    (all transition columns into the padding are zero), so the
    cyclic roll already brings a zero into row 0 and the mask is
    skipped."""
    rolled = pltpu.roll(x, shift=1, axis=0)
    if not masked:
        return rolled
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row == 0, 0.0, rolled)


def _fs3sub_kernel(c2_ref, c3_ref, c4_ref, lens_ref, pmove_ref,
                   T2_ref, T3_ref, T4_ref, tr_ref, W_ref,
                   out_ref, m_scr, i_scr, d_scr, ivx_scr, sp_scr,
                   *, Mt, Lblk, nj, mask_roll):
    """One (batch tile, L block) grid step.  c{2,3,4}_ref: [Lblk, Bt]
    compact per-channel codon indices; T*_ref: [Mt, 17/65/257];
    tr_ref: [Mt, 8] cols BM,MM,IM,DM,MI,II; W_ref: [Mt+8, Mt] rows
    0..Mt-1 = folded closure, row Mt = xE weights (one MXU dot gives
    new_d and xE together); out_ref: [1, Bt].  Scratch persists
    across the L grid dim."""
    Bt = out_ref.shape[1]
    lb = pl.program_id(1)

    tBM = tr_ref[:, 0:1]                      # [Mt, 1]
    tMM = tr_ref[:, 1:2]
    tIM = tr_ref[:, 2:3]
    tMI = tr_ref[:, 4:5]
    tII = tr_ref[:, 5:6]

    pmove = pmove_ref[0:1, :]                 # [1, Bt]
    ploop = 1.0 - pmove
    emove = 0.5 if nj > 0 else 1.0
    eloop = 0.5 if nj > 0 else 0.0
    lens = lens_ref[0:1, :]

    @pl.when(lb == 0)
    def _init():
        z = jnp.zeros((Mt, Bt), F32)
        for r in range(4):
            m_scr[r], i_scr[r], d_scr[r] = z, z, z
        for r in range(3):
            ivx_scr[r] = z
        zb = jnp.zeros((1, Bt), F32)
        ob = jnp.ones((1, Bt), F32)
        for r in range(SP_ROWS):
            sp_scr[r] = zb
        # ref parser init: xN slots {0,1} = 1, xB slots {0,1} = pmove
        sp_scr[R_XN], sp_scr[R_XN + 1] = ob, ob
        sp_scr[R_XB], sp_scr[R_XB + 1] = pmove, pmove
        for r in range(4):
            sp_scr[R_PEND + r] = ob
        for r in range(3):
            sp_scr[R_PIVX + r] = ob
        sp_scr[R_SCORE] = jnp.full((1, Bt), NEG, F32)

    def onehot_dot(T_ref, idx, scale=None):
        """E = T[:, idx] per lane via a one-hot matmul; a per-item
        scale rides the one-hot for free (folds the IVX pending
        scale into the MXU instead of a [Mt,Bt] VPU multiply)."""
        n = T_ref.shape[1]
        row = jax.lax.broadcasted_iota(jnp.int32, (n, Bt), 0)
        hit = idx == row
        oh = jnp.where(hit, scale, 0.0) if scale is not None \
            else hit.astype(F32)
        return jnp.dot(T_ref[:, :], oh, preferred_element_type=F32)

    nblocks = Lblk // 12

    def block(bi, _):
        base = bi * 12
        for j in range(12):
            gi = lb * Lblk + base + j
            pos = gi + 1
            pos_m4 = (j + 1) % 4
            p2_m4 = (j - 1) % 4
            p3_m4 = (j - 2) % 4
            s2 = (j + 1) % 3
            s3 = j % 3
            s4 = (j - 1) % 3

            idx2 = c2_ref[pl.ds(base + j, 1), :]
            idx3 = c3_ref[pl.ds(base + j, 1), :]
            idx4 = c4_ref[pl.ds(base + j, 1), :]
            E2 = onehot_dot(T2_ref, idx2)
            E3 = onehot_dot(T3_ref, idx3, sp_scr[R_PIVX + s3])
            E4 = onehot_dot(T4_ref, idx4, sp_scr[R_PIVX + s4])

            sc2 = sp_scr[R_PEND + p2_m4]      # [1, Bt]
            mp = _shift_down_sub(m_scr[p2_m4], mask_roll)
            ip = _shift_down_sub(i_scr[p2_m4], mask_roll)
            dp = _shift_down_sub(d_scr[p2_m4], mask_roll)
            sv = (sp_scr[R_XB + p2_m4] * sc2) * tBM + \
                 (mp * tMM + ip * tIM + dp) * sc2
            msv = sv * E2
            t3 = ivx_scr[s3] * E3             # pivx rode the one-hot
            t4 = ivx_scr[s4] * E4
            new_i = (m_scr[p3_m4] * tMI + i_scr[p3_m4] * tII) \
                * sp_scr[R_PEND + p3_m4]
            if j < 3:
                # dynamic warm-up guards; pos >= 3/4 is always true
                # past the first block so the selects resolve cheaply
                t3 = jnp.where(pos >= 3, t3, 0.0)
                t4 = jnp.where(pos >= 4, t4, 0.0)
                new_i = jnp.where(pos >= 3, new_i, 0.0)
            msv = msv + t3 + t4
            # one dot: rows 0..Mt-1 = folded closure (new_d), row Mt
            # = xE weights
            wu = jnp.dot(W_ref[:, :], msv,
                         preferred_element_type=F32)
            new_d = wu[:Mt, :]
            xE = wu[Mt:Mt + 1, :]

            xN2 = sp_scr[R_XN + p3_m4] * sp_scr[R_PEND + p3_m4] * ploop
            xJ2 = sp_scr[R_XJ + p3_m4] * sp_scr[R_PEND + p3_m4] \
                * ploop + xE * eloop
            xC2 = sp_scr[R_XC + p3_m4] * sp_scr[R_PEND + p3_m4] \
                * ploop + xE * emove
            if j < 3:
                ge3 = pos >= 3
                xN2 = jnp.where(ge3, xN2, 1.0)
                xJ2 = jnp.where(ge3, xJ2, xE * eloop)
                xC2 = jnp.where(ge3, xC2, xE * emove)
            xB2 = (xN2 + xJ2) * pmove

            sc = jnp.maximum(xE, 1.0)
            sinv = 1.0 / sc
            active = gi < lens

            m_scr[pos_m4], i_scr[pos_m4] = msv, new_i
            d_scr[pos_m4] = new_d
            ivx_scr[s2] = sv
            sp_scr[R_XN + pos_m4] = xN2
            sp_scr[R_XJ + pos_m4] = xJ2
            sp_scr[R_XC + pos_m4] = xC2
            sp_scr[R_XB + pos_m4] = xB2
            for r in range(4):
                upd = sinv if r == pos_m4 else sp_scr[R_PEND + r] * sinv
                sp_scr[R_PEND + r] = jnp.where(active, upd,
                                               sp_scr[R_PEND + r])
            for s in range(3):
                upd = sinv if s == s2 else sp_scr[R_PIVX + s] * sinv
                sp_scr[R_PIVX + s] = jnp.where(active, upd,
                                               sp_scr[R_PIVX + s])
            logacc = jnp.where(active, sp_scr[R_ACC] + jnp.log(sc),
                               sp_scr[R_ACC])
            sp_scr[R_ACC] = logacc
            done = (gi + 1 == lens)
            cl = xC2 * sinv + (
                sp_scr[R_XC + (j % 4)] * sp_scr[R_PEND + (j % 4)]
                + sp_scr[R_XC + ((j - 1) % 4)]
                * sp_scr[R_PEND + ((j - 1) % 4)]) * ploop
            sp_scr[R_SCORE] = jnp.where(
                done, logacc + jnp.log(cl * pmove), sp_scr[R_SCORE])
        return 0

    jax.lax.fori_loop(0, nblocks, block, 0)
    out_ref[0:1, :] = sp_scr[R_SCORE]


def fs3_params_sub(om_fs):
    """Pack an FSOProfile for the sublane-layout kernel from the jaxk
    pack: returns (T2, T3, T4, tr [8,Mt], W [Mt,Mt], u [8,Mt], Mt)."""
    from ..jaxk.kernels import fs3_params
    p = fs3_params(om_fs)
    Mt = p.Mt
    tr = np.zeros((Mt, 8), np.float32)
    for r, v in enumerate((p.tBM, p.tMM, p.tIM, p.tDM, p.tMI, p.tII)):
        tr[:, r] = np.asarray(v)
    # W rows 0..Mt-1: folded closure; row Mt: xE weights (8-padded)
    W = np.zeros((Mt + 8, Mt), np.float32)
    W[:Mt] = np.asarray(p.UT)
    W[Mt] = np.asarray(p.u)
    return (p.T2, p.T3, p.T4, jnp.asarray(tr), jnp.asarray(W), Mt,
            p.M)


def codon_indices_compact(dsq):
    """[B, L] padded DNA batch -> three [L, B] compact per-channel
    codon-index streams (the jaxk _fs3_score_impl index spaces:
    2-nt 0..16, 3-nt 0..64, 4-nt 0..256 with the degenerate last)."""
    xd = jnp.minimum(dsq, 4).astype(jnp.int32)
    xm1 = jnp.pad(xd, ((0, 0), (1, 0)), constant_values=4)[:, :-1]
    xm2 = jnp.pad(xd, ((0, 0), (2, 0)), constant_values=4)[:, :-2]
    xm3 = jnp.pad(xd, ((0, 0), (3, 0)), constant_values=4)[:, :-3]
    dg2 = (xd > 3) | (xm1 > 3)
    dg3 = dg2 | (xm2 > 3)
    dg4 = dg3 | (xm3 > 3)
    c2 = jnp.where(dg2, 16, xd * 4 + xm1)
    c3 = jnp.where(dg3, 64, xd * 16 + xm1 * 4 + xm2)
    c4 = jnp.where(dg4, 256, xd * 64 + xm1 * 16 + xm2 * 4 + xm3)
    return c2.T, c3.T, c4.T


@functools.partial(jax.jit,
                   static_argnames=("Mt", "nj", "btile", "lblk",
                                    "interpret", "mask_roll"))
def _fs3sub_jit(ci, lens, pmove, T2, T3, T4, tr, W, Mt, nj,
                btile, lblk, interpret=False, mask_roll=True):
    c2, c3, c4 = ci
    L, B = c2.shape
    Bt = min(btile, B)
    Lblk = min(lblk, L)
    assert B % Bt == 0 and L % Lblk == 0 and Lblk % 24 == 0
    kernel = functools.partial(_fs3sub_kernel, Mt=Mt, Lblk=Lblk,
                               nj=nj, mask_roll=mask_roll)
    cspec = pl.BlockSpec((Lblk, Bt), lambda b, l: (l, b),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, Bt), lambda b, l: (0, b),
                         memory_space=pltpu.VMEM)
    fullspec = lambda shape: pl.BlockSpec(shape, lambda b, l: (0, 0),
                                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B // Bt, L // Lblk),
        in_specs=[
            cspec, cspec, cspec, bspec, bspec,
            fullspec(T2.shape), fullspec(T3.shape),
            fullspec(T4.shape), fullspec((Mt, 8)),
            fullspec((Mt + 8, Mt)),
        ],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((1, B), F32),
        scratch_shapes=[
            pltpu.VMEM((4, Mt, Bt), F32),
            pltpu.VMEM((4, Mt, Bt), F32),
            pltpu.VMEM((4, Mt, Bt), F32),
            pltpu.VMEM((3, Mt, Bt), F32),
            pltpu.VMEM((SP_ROWS, 1, Bt), F32),
        ],
        interpret=interpret,
    )(c2, c3, c4, lens.reshape(1, B), pmove.reshape(1, B),
      T2, T3, T4, tr, W)
    return out[0]


def fs3_score_sub(dsq, lens, params, nj=1.0, btile=512, lblk=96,
                  interpret=False):
    """Frameshift 3-codon Forward scores via the sublane-layout
    Pallas kernel.  dsq [B, L] padded DNA; params from
    fs3_params_sub."""
    T2, T3, T4, tr, W, Mt, M = params
    dsq = jnp.asarray(dsq)
    B, L = dsq.shape
    # L block: multiple of 24 (12-step ring phase x 8-sublane tiling)
    lblk = max(24, (lblk // 24) * 24)
    lblk = min(lblk, ((L + 23) // 24) * 24)
    Lpad = ((L + lblk - 1) // lblk) * lblk
    if Lpad != L:
        dsq = jnp.pad(dsq, ((0, 0), (0, Lpad - L)), constant_values=17)
    ci = codon_indices_compact(dsq)
    lensj = jnp.asarray(lens)
    Lf = (lensj // 3).astype(F32)
    pmove = ((2.0 + nj) / (Lf + 2.0 + nj)).astype(F32)
    return _fs3sub_jit(ci, lensj, pmove, T2, T3, T4, tr, W,
                       Mt, float(nj), btile, lblk, interpret,
                       mask_roll=(M == Mt))
