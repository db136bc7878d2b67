"""Pallas TPU kernel: amino Forward parser, score-only (the F3 gate;
ref: impl_sse/fwdback.c p7_ForwardParser; jnp reference:
ops/jaxk/kernels._forward_score_perlen_impl).

Prob-space with branchless per-step rescaling, model positions on
lanes, the three DP rows + per-item specials VMEM-resident across the
whole sequence; residue emissions via one-hot MXU gather; the
sequential DD closure becomes a log-depth multiply-add roll scan
along lanes (the fs3 kernel's closure)."""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import constants as C
from .fs3 import _dd_closure, _shift_right_lanes

F32 = jnp.float32
NEGF = -1e30

# specials slots in the [Bt, 128] scratch
S_XN, S_XJ, S_XC, S_XB, S_ACC, S_SCORE = range(6)


def _fwd_kernel(dsq_ref, lens_ref, pmove_ref, rfv_ref, tr_ref, U_ref,
                out_ref, m_scr, i_scr, d_scr, sp_scr, *, Mp, Lblk, Kp,
                nj):
    Bt = out_ref.shape[0]
    lens = lens_ref[:, :]
    pmove = pmove_ref[:, :]
    ploop = 1.0 - pmove
    emove = 0.5 if nj > 0 else 1.0
    eloop = 0.5 if nj > 0 else 0.0
    lb = pl.program_id(1)
    nlb = pl.num_programs(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, 128), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (Bt, Kp), 1)
    tBM = tr_ref[C.P_BM:C.P_BM + 1, :]
    tMM = tr_ref[C.P_MM:C.P_MM + 1, :]
    tIM = tr_ref[C.P_IM:C.P_IM + 1, :]
    tDM = tr_ref[C.P_DM:C.P_DM + 1, :]
    tMI = tr_ref[C.P_MI:C.P_MI + 1, :]
    tII = tr_ref[C.P_II:C.P_II + 1, :]
    tMD_s = tr_ref[C.P_MD:C.P_MD + 1, :]
    tDD_s = tr_ref[C.P_DD:C.P_DD + 1, :]

    @pl.when(lb == 0)
    def _init():
        m_scr[:, :] = jnp.zeros((Bt, Mp), F32)
        i_scr[:, :] = jnp.zeros((Bt, Mp), F32)
        d_scr[:, :] = jnp.zeros((Bt, Mp), F32)
        sp = jnp.zeros((Bt, 128), F32)
        sp = jnp.where(col == S_XN, 1.0, sp)
        sp = jnp.where(col == S_XB,
                       jnp.broadcast_to(pmove, (Bt, 128)), sp)
        sp = jnp.where(col == S_SCORE, NEGF, sp)
        sp_scr[:, :] = sp

    def step(j, _):
        gi = lb * Lblk + j
        sp = sp_scr[:, :]
        res = dsq_ref[j].reshape(Bt, 1)
        oh = (res == iota_k).astype(F32)
        row = jnp.dot(oh, rfv_ref[:, :], preferred_element_type=F32)
        mc, ic, dc = m_scr[:, :], i_scr[:, :], d_scr[:, :]
        mp = _shift_right_lanes(mc)
        ip = _shift_right_lanes(ic)
        dp = _shift_right_lanes(dc)
        xB = sp[:, S_XB:S_XB + 1]
        sv = (xB * tBM + mp * tMM + ip * tIM + dp * tDM) * row
        new_i = mc * tMI + ic * tII
        part = _shift_right_lanes(sv) * tMD_s
        # log-depth roll-scan closure: faster than a per-step
        # [Bt,Mp]x[Mp,Mp] closure matmul, which is latency-bound at
        # these sizes (measured 1.3 vs 0.4 GCUPS on a v5e chip);
        # U_ref is kept as an operand for the matmul variant
        new_d = _dd_closure(part, tDD_s)
        xE = (sv.sum(axis=1, keepdims=True)
              + new_d.sum(axis=1, keepdims=True))
        xN2 = sp[:, S_XN:S_XN + 1] * ploop
        xC2 = sp[:, S_XC:S_XC + 1] * ploop + xE * emove
        xJ2 = sp[:, S_XJ:S_XJ + 1] * ploop + xE * eloop
        xB2 = xJ2 * pmove + xN2 * pmove
        s = jnp.maximum(xE, 1.0)
        sinv = 1.0 / s
        active = gi < lens
        m_scr[:, :] = jnp.where(active, sv * sinv, mc)
        i_scr[:, :] = jnp.where(active, new_i * sinv, ic)
        d_scr[:, :] = jnp.where(active, new_d * sinv, dc)
        logacc = sp[:, S_ACC:S_ACC + 1] + jnp.log(s)
        newsp = sp
        for slot, v in ((S_XN, xN2 * sinv), (S_XJ, xJ2 * sinv),
                        (S_XC, xC2 * sinv), (S_XB, xB2 * sinv)):
            newsp = jnp.where(col == slot,
                              jnp.broadcast_to(v, (Bt, 128)), newsp)
        newsp = jnp.where(col == S_ACC,
                          jnp.broadcast_to(logacc, (Bt, 128)), newsp)
        done = (gi + 1 == lens)
        final = logacc + jnp.log(xC2 * sinv * pmove)
        score = jnp.where(done, final, sp[:, S_SCORE:S_SCORE + 1])
        newsp = jnp.where(col == S_SCORE,
                          jnp.broadcast_to(score, (Bt, 128)), newsp)
        sp_scr[:, :] = jnp.where(active, newsp, sp)
        return 0

    jax.lax.fori_loop(0, Lblk, step, 0)

    @pl.when(lb == nlb - 1)
    def _fin():
        out_ref[:, :] = sp_scr[:, S_SCORE:S_SCORE + 1]


def fwd_score_pallas(dsq, lens, rfv, tr, U, Mp, nj=1.0,
                     interpret=False, btile=256, lblk=512):
    """dsq [L, B] int32 amino residues; lens [B]; rfv [Kp, Mp] odds;
    tr [8, Mp] (P_* rows, tMD/tDD pre-shifted).  Returns [B] Forward
    scores in nats (per-item length models, nj multihit)."""
    L = dsq.shape[0]
    lblk = max(8, (lblk // 8) * 8)
    Lpad = ((L + lblk - 1) // lblk) * lblk
    if Lpad != L:
        dsq = jnp.pad(dsq, ((0, Lpad - L), (0, 0)))
    return _fwd_jit(dsq, lens, rfv, tr, U, Mp, float(nj), interpret,
                    btile, lblk)


@functools.partial(jax.jit, static_argnames=("Mp", "nj", "interpret",
                                             "btile", "lblk"))
def _fwd_jit(dsq, lens, rfv, tr, U, Mp, nj, interpret, btile, lblk):
    L, B = dsq.shape
    Kp = rfv.shape[0]
    Bt = min(btile, B)
    Lblk = min(lblk, L)
    assert B % Bt == 0 and L % Lblk == 0
    pmove = ((2.0 + nj) / (lens.astype(F32) + 2.0 + nj)).astype(F32)
    kernel = functools.partial(_fwd_kernel, Mp=Mp, Lblk=Lblk, Kp=Kp,
                               nj=nj)
    dspec = pl.BlockSpec((Lblk, Bt), lambda b, l: (l, b),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((Bt, 1), lambda b, l: (b, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B // Bt, L // Lblk),
        in_specs=[
            dspec, bspec, bspec,
            pl.BlockSpec((Kp, Mp), lambda b, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Mp), lambda b, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, Mp), lambda b, l: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((B, 1), F32),
        scratch_shapes=[
            pltpu.VMEM((Bt, Mp), F32),
            pltpu.VMEM((Bt, Mp), F32),
            pltpu.VMEM((Bt, Mp), F32),
            pltpu.VMEM((Bt, 128), F32),
        ],
        interpret=interpret,
    )(dsq, lens.reshape(B, 1), pmove.reshape(B, 1), rfv, tr, U)
    return out[:, 0]


def fwd_params_pallas(om, lane_multiple: int = 128):
    """Pack an OProfile's prob-space score set: returns (rfv [Kp, Mp],
    tr [8, Mp], Mp), dead lanes zero."""
    from ..jaxk.batch import round_up
    M = om.M
    Mp = round_up(M, lane_multiple)
    rfv = np.zeros((om.Kp, Mp), np.float32)
    rfv[:, :M] = om.rfv[:, 1:M + 1]
    tfv = om.tfv
    tr = np.zeros((8, Mp), np.float32)
    tr[C.P_BM, :M] = tfv[:M, C.P_BM]
    tr[C.P_MM, :M] = tfv[:M, C.P_MM]
    tr[C.P_IM, :M] = tfv[:M, C.P_IM]
    tr[C.P_DM, :M] = tfv[:M, C.P_DM]
    tr[C.P_MI, :M] = tfv[1:M + 1, C.P_MI]
    tr[C.P_II, :M] = tfv[1:M + 1, C.P_II]
    # into-slot order with lane 0 empty (shifted right)
    tr[C.P_MD, 1:M] = tfv[1:M, C.P_MD]
    tr[C.P_DD, 1:M] = tfv[1:M, C.P_DD]
    from ..jaxk.kernels import dd_closure_matrix
    U = dd_closure_matrix(tfv[1:M, C.P_DD], Mp)
    return jnp.asarray(rfv), jnp.asarray(tr), jnp.asarray(U), Mp
