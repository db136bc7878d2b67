"""Pallas TPU kernel: frameshift 3-codon Forward gate (the pipeline's
north-star kernel, ref: impl_sse/fwdback_fs.c
p7_ForwardParser_Frameshift_3Codons :97; jnp reference:
ops/jaxk/kernels._fs3_score_impl).

TPU-first design (see /opt/skills/guides/pallas_guide.md):
  * model positions on lanes (Mp = multiple of 128), batch tile on
    sublanes — the whole DP state (4 MDI rows x 3 arrays + 3 IVX
    rows + per-item specials) lives in VMEM scratch for the entire
    sequence, so HBM traffic is only the codon-index stream and the
    final scores;
  * codon emissions are fetched with a one-hot matmul on the MXU
    (otherwise idle), 3 codon-length channels per position in one
    [3*Bt, R] x [R, Mp] product;
  * the DD closure is one MXU matmul against a precomputed closure
    operator (dc = part @ U) instead of the reference's striped
    4-pass serialization (impl_sse/fwdback.c:340);
  * positions are processed in blocks of 12 (lcm of the 4-row MDI
    and 3-slot IVX circularities) so every circular index is static.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import constants as C

F32 = jnp.float32
NEG = -1e30

# per-item scalar slots in the [Bt, 128] scalars scratch
SLOT_XN, SLOT_XJ, SLOT_XC, SLOT_XB = 0, 4, 8, 12   # 4 circular each
SLOT_ACC, SLOT_SCORE = 16, 17


def _shift_right_lanes(x):
    """lane j reads lane j-1; lane 0 gets 0 (model k-1 access)."""
    rolled = pltpu.roll(x, shift=1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == 0, 0.0, rolled)


def _dd_closure(part, tdd_row):
    """y[k] = part[k] + tdd[k]*y[k-1] via log-depth scan along lanes.
    tdd_row: [1, Mp] with slot j = tDD into slot j."""
    a = jnp.broadcast_to(tdd_row, part.shape)
    b = part
    n = part.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, part.shape, 1)
    steps = int(math.ceil(math.log2(n)))
    for s in range(steps):
        sh = 1 << s
        mask = lane >= sh
        a_r = pltpu.roll(a, shift=sh, axis=1)
        b_r = pltpu.roll(b, shift=sh, axis=1)
        b = jnp.where(mask, b_r * a + b, b)
        a = jnp.where(mask, a_r * a, a)
    return b


def _fs3_kernel(ci2_ref, ci3_ref, ci4_ref, lens_ref, pmove_ref,
                rfv_ref, tr_ref, out_ref,
                m_scr, i_scr, d_scr, ivx_scr, sp_scr, *, Mp, Lblk, R,
                nj):
    """One (batch tile, L block) grid step.  ci{2,3,4}_ref: [Lblk, Bt]
    int32 codon-index streams for the 2/3/4-nt channels; rfv_ref:
    [R, Mp]; tr_ref: [8, Mp] (P_* order, MD/DD pre-shifted); out_ref:
    [Bt, 1].  Scratch persists across the L grid dimension: m/i/d
    [4, Bt, Mp]; ivx [3, Bt, Mp]; sp [Bt, 128]."""
    Bt = out_ref.shape[0]
    tMM = tr_ref[C.P_MM:C.P_MM + 1, :]
    tIM = tr_ref[C.P_IM:C.P_IM + 1, :]
    tDM = tr_ref[C.P_DM:C.P_DM + 1, :]
    tBM = tr_ref[C.P_BM:C.P_BM + 1, :]
    tMI = tr_ref[C.P_MI:C.P_MI + 1, :]
    tII = tr_ref[C.P_II:C.P_II + 1, :]
    tMD_s = tr_ref[C.P_MD:C.P_MD + 1, :]
    tDD_s = tr_ref[C.P_DD:C.P_DD + 1, :]

    pmove = pmove_ref[:, :]                   # [Bt, 1]
    ploop = 1.0 - pmove
    emove = 0.5 if nj > 0 else 1.0
    eloop = 0.5 if nj > 0 else 0.0
    lens = lens_ref[:, :]                     # [Bt, 1]
    lb = pl.program_id(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, 128), 1)

    @pl.when(lb == 0)
    def _init():
        for r in range(4):
            m_scr[r] = jnp.zeros((Bt, Mp), F32)
            i_scr[r] = jnp.zeros((Bt, Mp), F32)
            d_scr[r] = jnp.zeros((Bt, Mp), F32)
        for r in range(3):
            ivx_scr[r] = jnp.zeros((Bt, Mp), F32)
        sp = jnp.zeros((Bt, 128), F32)
        sp = jnp.where((col == SLOT_XN) | (col == SLOT_XN + 1), 1.0,
                       sp)
        sp = jnp.where((col == SLOT_XB) | (col == SLOT_XB + 1),
                       jnp.broadcast_to(pmove, (Bt, 128)), sp)
        sp = jnp.where(col == SLOT_SCORE, NEG, sp)
        sp_scr[:, :] = sp

    nblocks = Lblk // 12
    # emission-gather chunking: one one-hot matmul covers EBLK
    # positions x 3 channels (launch overhead was the wall at one
    # matmul per position: ~2.7us/step); cap the [3*EBLK*Bt, R]
    # one-hot by VMEM
    EBLK = 12
    while EBLK > 1 and 3 * EBLK * Bt > 1536:
        EBLK //= 2
    iota_re = jax.lax.broadcasted_iota(jnp.int32,
                                       (3 * EBLK * Bt, R), 1)
    col128 = col

    def block(bi, _):
        base = bi * 12
        E = None
        for j in range(12):
            i = base + j              # local within this L block
            gi = lb * Lblk + i        # global position (0-based)
            pos_m4 = (j + 1) % 4
            p2_m4 = (j - 1) % 4
            p3_m4 = (j - 2) % 4
            s2 = (j + 1) % 3
            s3 = j % 3
            s4 = (j - 1) % 3

            sp = sp_scr[:, :]
            if j % EBLK == 0:
                # one one-hot matmul covers the next EBLK positions
                # x 3 channels; only this chunk stays live in VMEM
                idx = jnp.concatenate(
                    [ci2_ref[base + j + jj].reshape(Bt, 1)
                     for jj in range(EBLK)]
                    + [ci3_ref[base + j + jj].reshape(Bt, 1)
                       for jj in range(EBLK)]
                    + [ci4_ref[base + j + jj].reshape(Bt, 1)
                       for jj in range(EBLK)], axis=0)
                oh = (idx == iota_re).astype(F32)
                E = jnp.dot(oh, rfv_ref[:, :],
                            preferred_element_type=F32)
            jo = j % EBLK
            E2 = E[jo * Bt:(jo + 1) * Bt]
            E3 = E[(EBLK + jo) * Bt:(EBLK + jo + 1) * Bt]
            E4 = E[(2 * EBLK + jo) * Bt:(2 * EBLK + jo + 1) * Bt]

            mp = _shift_right_lanes(m_scr[p2_m4])
            ip = _shift_right_lanes(i_scr[p2_m4])
            dp = _shift_right_lanes(d_scr[p2_m4])
            xB_p2 = sp[:, SLOT_XB + p2_m4:SLOT_XB + p2_m4 + 1]
            sv = xB_p2 * tBM + mp * tMM + ip * tIM + dp * tDM
            ivx_scr[s2] = sv
            pos = gi + 1
            msv = sv * E2
            if j >= 2:
                msv = msv + ivx_scr[s3] * E3 + ivx_scr[s4] * E4
                new_i = (m_scr[p3_m4] * tMI + i_scr[p3_m4] * tII)
            else:
                msv = msv + jnp.where(pos >= 3, ivx_scr[s3] * E3, 0.0)
                msv = msv + jnp.where(pos >= 4, ivx_scr[s4] * E4, 0.0)
                new_i = jnp.where(
                    pos >= 3,
                    m_scr[p3_m4] * tMI + i_scr[p3_m4] * tII, 0.0)
            part = _shift_right_lanes(msv) * tMD_s
            new_d = jnp.dot(part, tr_ref[8:8 + Mp, :],
                            preferred_element_type=F32)
            xE = (msv.sum(axis=1, keepdims=True)
                  + new_d.sum(axis=1, keepdims=True))   # [Bt, 1]
            xN_p3 = sp[:, SLOT_XN + p3_m4:SLOT_XN + p3_m4 + 1]
            xJ_p3 = sp[:, SLOT_XJ + p3_m4:SLOT_XJ + p3_m4 + 1]
            xC_p3 = sp[:, SLOT_XC + p3_m4:SLOT_XC + p3_m4 + 1]
            if j < 2:
                ge3 = pos >= 3
                xN2 = jnp.where(ge3, xN_p3 * ploop, 1.0)
                xJ2 = jnp.where(ge3, xJ_p3 * ploop, 0.0) + xE * eloop
                xC2 = jnp.where(ge3, xC_p3 * ploop, 0.0) + xE * emove
            else:
                xN2 = xN_p3 * ploop
                xJ2 = xJ_p3 * ploop + xE * eloop
                xC2 = xC_p3 * ploop + xE * emove
            xB2 = (xN2 + xJ2) * pmove

            sc = jnp.maximum(xE, 1.0)                # [Bt, 1]
            sinv = 1.0 / sc
            # no per-lane freezing: lanes whose item has ended keep
            # evolving harmlessly (their score latched at `done`; sc
            # clamps at >=1 so no overflow cascade) — dropping the
            # `active` masks removes 16 [Bt, Mp] select ops/position
            for r in range(4):
                m_scr[r] = (msv if r == pos_m4 else m_scr[r]) * sinv
                i_scr[r] = (new_i if r == pos_m4 else i_scr[r]) * sinv
                d_scr[r] = (new_d if r == pos_m4 else d_scr[r]) * sinv
            for r in range(3):
                ivx_scr[r] = ivx_scr[r] * sinv

            # per-item scalars: specials rescaled, acc/score not
            newsp = jnp.where(col128 < 16, sp * sinv, sp)
            for bank, newv in ((SLOT_XN, xN2), (SLOT_XJ, xJ2),
                               (SLOT_XC, xC2), (SLOT_XB, xB2)):
                newsp = jnp.where(col128 == bank + pos_m4,
                                  jnp.broadcast_to(newv * sinv,
                                                   (Bt, 128)), newsp)
            logacc = sp[:, SLOT_ACC:SLOT_ACC + 1] + jnp.log(sc)
            newsp = jnp.where(col128 == SLOT_ACC,
                              jnp.broadcast_to(logacc, (Bt, 128)),
                              newsp)
            # final score at the item's last position (done => active)
            done = (gi + 1 == lens)
            cl = (newsp[:, SLOT_XC + pos_m4:SLOT_XC + pos_m4 + 1]
                  + (newsp[:, SLOT_XC + (j % 4):SLOT_XC + (j % 4) + 1]
                     + newsp[:, SLOT_XC + ((j - 1) % 4):
                             SLOT_XC + ((j - 1) % 4) + 1]) * ploop)
            final = logacc + jnp.log(cl * pmove)
            score = jnp.where(done, final,
                              sp[:, SLOT_SCORE:SLOT_SCORE + 1])
            newsp = jnp.where(col128 == SLOT_SCORE,
                              jnp.broadcast_to(score, (Bt, 128)), newsp)
            sp_scr[:, :] = newsp
        return 0

    jax.lax.fori_loop(0, nblocks, block, 0)
    out_ref[:, :] = sp_scr[:, SLOT_SCORE:SLOT_SCORE + 1]


def fs3_score_pallas(ci, lens, pmove, rfv, tr, Mp, nj=1.0,
                     interpret=False, btile=128, lblk=504):
    """ci: tuple of three [L, B] int32 codon-index streams; lens [B];
    pmove [B] per-item length-model move prob; rfv [R, Mp] emission
    odds; tr [8, Mp].  Returns [B] scores.  Pads L up to a multiple
    of the L-block (padding rows are inactive for every item)."""
    L = ci[0].shape[0]
    # L block must be a multiple of 24 (12-step circularity x the
    # 8-sublane tiling constraint)
    lblk = max(24, (lblk // 24) * 24)
    lblk = min(lblk, ((L + 23) // 24) * 24)
    Lpad = ((L + lblk - 1) // lblk) * lblk
    if Lpad != L:
        ci = tuple(jnp.pad(c, ((0, Lpad - L), (0, 0))) for c in ci)
    return _fs3_score_pallas_jit(ci, lens, pmove, rfv, tr, Mp, nj,
                                 interpret, btile, lblk)


@functools.partial(jax.jit, static_argnames=("Mp", "nj", "interpret",
                                             "btile", "lblk"))
def _fs3_score_pallas_jit(ci, lens, pmove, rfv, tr, Mp, nj=1.0,
                          interpret=False, btile=128, lblk=504):
    ci2, ci3, ci4 = ci
    L, B = ci2.shape
    R = rfv.shape[0]
    Bt = min(btile, B)
    Lblk = min(lblk, L)
    assert B % Bt == 0 and L % 12 == 0 and Lblk % 12 == 0
    assert L % Lblk == 0
    kernel = functools.partial(_fs3_kernel, Mp=Mp, Lblk=Lblk, R=R,
                               nj=nj)
    cspec = pl.BlockSpec((Lblk, Bt), lambda b, l: (l, b),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((Bt, 1), lambda b, l: (b, 0),
                         memory_space=pltpu.VMEM)
    fullspec = lambda shape: pl.BlockSpec(shape,
                                          lambda b, l: (0, 0),
                                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B // Bt, L // Lblk),
        in_specs=[
            cspec, cspec, cspec, bspec, bspec,
            fullspec((R, Mp)), fullspec((8 + Mp, Mp)),
        ],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((B, 1), F32),
        scratch_shapes=[
            pltpu.VMEM((4, Bt, Mp), F32),
            pltpu.VMEM((4, Bt, Mp), F32),
            pltpu.VMEM((4, Bt, Mp), F32),
            pltpu.VMEM((3, Bt, Mp), F32),
            pltpu.VMEM((Bt, 128), F32),
        ],
        interpret=interpret,
    )(ci2, ci3, ci4, lens.reshape(B, 1), pmove.reshape(B, 1), rfv, tr)
    return out[:, 0]


def fs3_params_pallas(om_fs, lane_multiple: int = 128):
    """Pack an FSOProfile for the Pallas kernel: returns (rfv [R,Mp],
    tr [8+Mp,Mp], Mp) with tMD/tDD pre-shifted to into-slot order;
    rows 8.. hold the DD-closure operator U (dc = part @ U turns the
    32-op log-depth lane scan into one MXU matmul)."""
    from ..jaxk.batch import round_up
    M = om_fs.M
    Mp = round_up(M, lane_multiple)
    nrows = om_fs.rfv.shape[0]
    rfv = np.zeros((nrows, Mp), np.float32)
    rfv[:, :M] = om_fs.rfv[:, 1:M + 1]
    tfv = om_fs.tfv
    tr = np.zeros((8, Mp), np.float32)
    tr[C.P_BM, :M] = tfv[:M, C.P_BM]
    tr[C.P_MM, :M] = tfv[:M, C.P_MM]
    tr[C.P_IM, :M] = tfv[:M, C.P_IM]
    tr[C.P_DM, :M] = tfv[:M, C.P_DM]
    tr[C.P_MI, :M] = tfv[1:M + 1, C.P_MI]
    tr[C.P_II, :M] = tfv[1:M + 1, C.P_II]
    # shifted: slot j holds the transition into slot j (from j-1)
    tr[C.P_MD, 1:M] = tfv[1:M, C.P_MD]
    tr[C.P_DD, 1:M] = tfv[1:M, C.P_DD]
    # DD-closure operator from the pre-shifted row: U[j, k] =
    # prod_{r=j+1..k} tDD_into[r] (ref: jaxk.kernels
    # dd_closure_matrix)
    a = tr[C.P_DD].astype(np.float64)
    with np.errstate(divide="ignore"):
        la = np.maximum(np.log(a, where=a > 0,
                               out=np.full(Mp, -np.inf)), -745.0)
    cum = np.concatenate([[0.0], np.cumsum(la)])
    U = np.zeros((Mp, Mp), np.float64)
    for j in range(Mp):
        with np.errstate(over="ignore", invalid="ignore"):
            U[j, j:] = np.exp(np.minimum(cum[j + 1:Mp + 1]
                                         - cum[j + 1], 0.0))
        U[j, j:] = np.where(np.isfinite(U[j, j:]), U[j, j:], 0.0)
    tr_ext = np.concatenate([tr, U.astype(np.float32)], axis=0)
    return jnp.asarray(rfv), jnp.asarray(tr_ext), Mp


def codon_indices_fs3(dsq: np.ndarray):
    """[B, L] padded DNA batch -> three [L, B] codon-index streams
    for the 2/3/4-nt codon channels, matching
    jaxk.kernels._fs3_score_impl's index computation."""
    PLACE = C.MAXCODONS3
    x = np.where(dsq < C.MAXNUC, dsq, PLACE).astype(np.int64)
    xm1 = np.pad(x, ((0, 0), (1, 0)), constant_values=PLACE)[:, :-1]
    xm2 = np.pad(x, ((0, 0), (2, 0)), constant_values=PLACE)[:, :-2]
    xm3 = np.pad(x, ((0, 0), (3, 0)), constant_values=PLACE)[:, :-3]
    ci2 = np.minimum(x * C.NUC1_FS3 + xm1 * C.NUC2_FS3, C.DEGEN3_QC1)
    ci3 = np.minimum(x * C.NUC1_FS3 + xm1 * C.NUC2_FS3
                     + xm2 * C.NUC3_FS3 + C.C2, C.DEGEN3_C)
    ci4 = np.minimum(x * C.NUC1_FS3 + xm1 * C.NUC2_FS3
                     + xm2 * C.NUC3_FS3 + xm3 + C.C3, C.DEGEN3_QC1)
    return (np.ascontiguousarray(ci2.T.astype(np.int32)),
            np.ascontiguousarray(ci3.T.astype(np.int32)),
            np.ascontiguousarray(ci4.T.astype(np.int32)))
