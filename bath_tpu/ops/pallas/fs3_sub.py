"""Pallas TPU kernel: frameshift 3-codon Forward gate in the
[model-on-sublanes, batch-on-lanes] layout (the jaxk layout), with
the whole DP ring state VMEM-resident across the position scan.

Motivation (measured on v5e, see docs/architecture.md): the XLA jaxk
kernel is VPU/HBM bound — its scan carry (15 [Mt,B] ring rows) makes
an HBM round trip every 12-position block.  This kernel removes that
traffic (rings live in VMEM scratch for the whole sequence) and
restructures the recurrence so the MXU and VPU overlap:

- every per-position diagonal transition multiply plus the k-1
  sublane shift folds into one combined bf16 MXU operator
  Y = G @ [msv; new_i] producing the next ENT (shared "entry" term)
  and INS rows — its output is first read two positions later, so it
  runs off the critical path;
- xE rides its own tiny dot (it feeds the scalar rescale chain, the
  true serial recurrence);
- emission one-hot dots for position j+1 are issued *before* the
  VPU chain of position j (software pipelining by construction, into
  2-slot VMEM buffers), so the MXU works while the VPU catches up;
- every ring slot is its own scratch ref, so Mosaic's dependence
  analysis can prove the dots independent of the in-flight VPU work.

Status (measured, v5e, M=134): parity holds (~0.03 nats, bf16
tables), but at 19-43 GCUPS this variant does NOT yet beat the jnp
kernel (48 GCUPS): ablations show ~2.3us/pos in the emission path
and ~4.4us/pos in the VPU/scalar chain at Bt=1024 — Mosaic is not
overlapping the prefetched dots with the VPU chain as intended.
Kept as the working base for the VMEM-resident optimization work;
`python bench.py --sub` selects it (wired in bench.py main()).

Same recurrence and pending-scale folding as
ops/jaxk/kernels._fs3_score_impl (ref: impl_sse/fwdback_fs.c
p7_ForwardParser_Frameshift_3Codons); parity vs the jnp kernel is
tested in tests/test_pallas_kernels.py (interpret mode, mixed
lengths incl. non-block-multiples and a lens=0 lane).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BF16 = jnp.bfloat16
NEG = -1e30
_ABLATE = os.environ.get("BATH_FS3SUB_ABLATE", "full")

# sp_scr rows ([32, Bt] f32 block of per-item scalars)
R_XN, R_XJ, R_XC, R_XB = 0, 4, 8, 12      # 4-slot rings
R_PEND = 16                                # rows 16..19: pending scales
R_PIVX = 20                                # rows 20..22: IVX pending
R_SPARE = 23                               # row 23: scaled with 16..22
R_ACC, R_SCORE = 24, 25
SP_ROWS = 32


def _fs3sub_kernel(c2_ref, c3_ref, c4_ref, lens_ref, pmove_ref,
                   T2_ref, T3_ref, T4_ref, tBM_ref, G_ref, U_ref,
                   out_ref, *scratch, Mt, Lblk, nj):
    """One (batch tile, L block) grid step.  c{2,3,4}_ref: [Lblk, Bt]
    compact per-channel codon indices; T*_ref: [Mt, 17/65/257] bf16;
    tBM_ref: [Mt, 8] f32 (col 0 = B->M); G_ref: [2Mt, 2Mt] bf16
    combined ENT/INS operator; U_ref: [8, Mt] f32 xE weights (row 0);
    out_ref: [1, Bt].  Scratch persists across the L grid dim
    (innermost)."""
    ent = list(scratch[0:4])
    ins = list(scratch[4:8])
    ivx = list(scratch[8:11])
    e2s = list(scratch[11:13])
    e3s = list(scratch[13:15])
    e4s = list(scratch[15:17])
    xin = list(scratch[17:19])
    sp_scr = scratch[19]

    Bt = out_ref.shape[1]
    lb = pl.program_id(1)

    tBM = tBM_ref[:, 0:1]                     # [Mt, 1]
    pmove = pmove_ref[0:1, :]                 # [1, Bt]
    ploop = 1.0 - pmove
    emove = 0.5 if nj > 0 else 1.0
    eloop = 0.5 if nj > 0 else 0.0
    lens = lens_ref[0:1, :]

    @pl.when(lb == 0)
    def _init():
        z = jnp.zeros((Mt, Bt), F32)
        for r in range(4):
            ent[r][:, :], ins[r][:, :] = z, z
        for r in range(3):
            ivx[r][:, :] = z
        sp_scr[:, :] = jnp.zeros((SP_ROWS, Bt), F32)
        ob = jnp.ones((1, Bt), F32)
        # ref parser init: xN slots {0,1} = 1, xB slots {0,1} = pmove
        sp_scr[R_XN:R_XN + 1], sp_scr[R_XN + 1:R_XN + 2] = ob, ob
        sp_scr[R_XB:R_XB + 1] = pmove
        sp_scr[R_XB + 1:R_XB + 2] = pmove
        sp_scr[R_PEND:R_PIVX + 3] = jnp.ones((7, Bt), F32)
        sp_scr[R_SCORE:R_SCORE + 1] = jnp.full((1, Bt), NEG, F32)

    def onehot(idx, n):
        """[n, Bt] bf16 one-hot of idx [1, Bt].  (A [1,Bt] scale
        riding the one-hot would save a post-dot multiply, but Mosaic
        cannot relayout the i1 mask into a bf16 select with a
        sublane-broadcast operand — scales are applied post-dot.)"""
        row = jax.lax.broadcasted_iota(jnp.int32, (n, Bt), 0)
        return (idx == row).astype(BF16)

    def emit(p, slot):
        """Issue the three emission one-hot dots for block-local
        position p into prefetch slot <slot>.  Unscaled, bf16 (the
        dot output is exact bf16 table entries, so the downcast is
        lossless); scales are applied when consumed."""
        if _ABLATE == "noemis":
            one = jnp.ones((Mt, Bt), BF16)
            e2s[slot][:, :] = one
            e3s[slot][:, :] = one
            e4s[slot][:, :] = one
            return
        idx2 = c2_ref[pl.ds(p, 1), :]
        idx3 = c3_ref[pl.ds(p, 1), :]
        idx4 = c4_ref[pl.ds(p, 1), :]
        # Mosaic requires a 32-bit matmul accumulator; the downcast to
        # the bf16 slot is lossless (outputs are exact table entries)
        e2s[slot][:, :] = jnp.dot(
            T2_ref[:, :], onehot(idx2, 17),
            preferred_element_type=F32).astype(BF16)
        e3s[slot][:, :] = jnp.dot(
            T3_ref[:, :], onehot(idx3, 65),
            preferred_element_type=F32).astype(BF16)
        e4s[slot][:, :] = jnp.dot(
            T4_ref[:, :], onehot(idx4, 257),
            preferred_element_type=F32).astype(BF16)

    def sp(r):
        return sp_scr[r:r + 1, :]

    def position(j, gi, static_pos=None):
        """One DP position.  j: intra-block index (static, drives the
        ring phases and the emission slot); gi: global 0-based
        position (traced unless the caller peels the first block,
        then static_pos = gi+1)."""
        pos_m4 = (j + 1) % 4
        p2_m4 = (j - 1) % 4
        p3_m4 = (j - 2) % 4
        s2 = (j + 1) % 3
        s3 = j % 3
        s4 = (j - 1) % 3
        es = j % 2

        # pending scales applied on consumption: sc2 (p2 pending) on
        # E2, the IVX pendings on E3/E4
        E2v = e2s[es][:, :] * sp(R_PEND + p2_m4)
        E3v = e3s[es][:, :] * sp(R_PIVX + s3)
        E4v = e4s[es][:, :] * sp(R_PIVX + s4)

        # sv_u = ENT_shifted[p2] + xB[p2]*tBM  (unscaled by sc2 — the
        # scale is folded into E2v, and ivx's copy moves into pivx at
        # write time)
        sv_u = ent[p2_m4][:, :] + sp(R_XB + p2_m4) * tBM
        msv = sv_u * E2v
        t3 = ivx[s3][:, :] * E3v
        t4 = ivx[s4][:, :] * E4v
        new_i = ins[p3_m4][:, :] * sp(R_PEND + p3_m4)
        if static_pos is not None:
            # statically-peeled warm-up (ref parser: 3/4-nt codon and
            # I/N/J/C terms start at positions 3/4)
            if static_pos < 3:
                t3 = jnp.zeros_like(t3)
                new_i = jnp.zeros_like(new_i)
            if static_pos < 4:
                t4 = jnp.zeros_like(t4)
        msv = msv + t3 + t4

        # xE on its own tiny dot — it feeds the scalar rescale chain
        # (the true serial recurrence); the big ENT/INS dot below has
        # 2 positions of slack before its output is read
        xE = jnp.dot(U_ref[:, :], msv,
                     preferred_element_type=F32)[0:1, :]
        if _ABLATE == "nog":
            Y = jnp.concatenate([msv, new_i], axis=0)
        else:
            xb = xin[j % 2]
            xb[0:Mt] = msv.astype(BF16)
            xb[Mt:2 * Mt] = new_i.astype(BF16)
            Y = jnp.dot(G_ref[:, :], xb[:, :],
                        preferred_element_type=F32)

        xN2 = sp(R_XN + p3_m4) * sp(R_PEND + p3_m4) * ploop
        xJ2 = sp(R_XJ + p3_m4) * sp(R_PEND + p3_m4) * ploop + xE * eloop
        xC2 = sp(R_XC + p3_m4) * sp(R_PEND + p3_m4) * ploop + xE * emove
        if static_pos is not None and static_pos < 3:
            xN2 = jnp.ones_like(xN2)
            xJ2 = xE * eloop
            xC2 = xE * emove
        xB2 = (xN2 + xJ2) * pmove

        sc = jnp.maximum(xE, 1.0)
        sinv = 1.0 / sc
        active = gi < lens

        ent[pos_m4][:, :] = Y[:Mt, :]
        ins[pos_m4][:, :] = Y[Mt:2 * Mt, :]
        ivx[s2][:, :] = sv_u
        sp_scr[R_XN + pos_m4:R_XN + pos_m4 + 1] = xN2
        sp_scr[R_XJ + pos_m4:R_XJ + pos_m4 + 1] = xJ2
        sp_scr[R_XC + pos_m4:R_XC + pos_m4 + 1] = xC2
        sp_scr[R_XB + pos_m4:R_XB + pos_m4 + 1] = xB2
        # pending scales: slot just written resets (ivx's to sc2 — the
        # stored sv_u is missing its sc2 factor), then the whole
        # 8-row block multiplies by sinv where active — one fused op
        # instead of seven masked [1,Bt] updates
        sp_scr[R_PEND + pos_m4:R_PEND + pos_m4 + 1] = \
            jnp.ones((1, Bt), F32)
        sp_scr[R_PIVX + s2:R_PIVX + s2 + 1] = sp(R_PEND + p2_m4)
        blk = sp_scr[R_PEND:R_PEND + 8, :]
        sp_scr[R_PEND:R_PEND + 8] = jnp.where(active, blk * sinv, blk)

        logacc = jnp.where(active, sp(R_ACC) + jnp.log(sc), sp(R_ACC))
        sp_scr[R_ACC:R_ACC + 1] = logacc
        done = gi + 1 == lens
        cl = xC2 * sinv + (
            sp(R_XC + (j % 4)) * sp(R_PEND + (j % 4))
            + sp(R_XC + ((j - 1) % 4))
            * sp(R_PEND + ((j - 1) % 4))) * ploop
        sp_scr[R_SCORE:R_SCORE + 1] = jnp.where(
            done, logacc + jnp.log(cl * pmove), sp(R_SCORE))

    nblocks = Lblk // 12

    @pl.when(lb == 0)
    def _first_block():
        # statically peeled: positions 1..12 with exact warm-up masks
        emit(0, 0)
        for j in range(12):
            if j < 11:
                emit(j + 1, (j + 1) % 2)
            position(j, jnp.int32(j), static_pos=j + 1)

    def block(bi, _):
        base = bi * 12
        emit(base, 0)
        for j in range(12):
            if j < 11:
                # prefetch: position j+1's emission dots issue before
                # position j's VPU chain, so the MXU runs ahead
                emit(base + j + 1, (j + 1) % 2)
            position(j, lb * Lblk + base + j)
        return 0

    start = jnp.where(lb == 0, 1, 0)
    jax.lax.fori_loop(start, nblocks, block, 0)
    out_ref[0:1, :] = sp(R_SCORE)


def fs3_params_sub(om_fs):
    """Pack an FSOProfile for the sublane-layout kernel from the jaxk
    pack.  Returns the 8-tuple (T2 [Mt,17] bf16, T3 [Mt,65] bf16,
    T4 [Mt,257] bf16, tBM [Mt,8] f32 (col 0), G [2Mt,2Mt] bf16,
    U [8,Mt] f32 (row 0 = xE weights), Mt, M) — G rows 0..Mt-1 =
    row-shifted ENT operator (shift(diag(tMM_dest)+W3) |
    shift(diag(tIM_dest))), rows Mt..2Mt-1 = INS operator
    (diag(tMI) | diag(tII))."""
    from ..jaxk.kernels import fs3_params
    p = fs3_params(om_fs)
    Mt = p.Mt
    tBM = np.zeros((Mt, 8), np.float32)
    tBM[:, 0] = np.asarray(p.tBM)
    tMM = np.asarray(p.tMM)
    tIM = np.asarray(p.tIM)
    tMI = np.asarray(p.tMI)
    tII = np.asarray(p.tII)
    W3 = np.asarray(p.UT)                 # tMD/tDM_next-folded closure
    u = np.asarray(p.u)

    G = np.zeros((2 * Mt, 2 * Mt), np.float32)
    # ENT rows, pre-shifted: stored row r = tMM[r]*msv[r-1] +
    # tIM[r]*new_i[r-1] + (W3 @ msv)[r-1]  (transition multipliers are
    # destination-indexed, the closure row is source-shifted)
    r = np.arange(1, Mt)
    G[1:Mt, :Mt] = W3[:Mt - 1]
    G[r, r - 1] += tMM[1:Mt]
    G[r, Mt + r - 1] = tIM[1:Mt]
    # INS rows (source-indexed diagonals)
    G[Mt:2 * Mt, :Mt] = np.diag(tMI)
    G[Mt:2 * Mt, Mt:] = np.diag(tII)
    # xE weights on their own small operator (critical-path dot)
    U = np.zeros((8, Mt), np.float32)
    U[0] = u
    return (p.T2.astype(BF16), p.T3.astype(BF16), p.T4.astype(BF16),
            jnp.asarray(tBM), jnp.asarray(G).astype(BF16),
            jnp.asarray(U), Mt, p.M)


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
                                    "interpret"))
def _fs3sub_jit(ci, lens, pmove, T2, T3, T4, tBM, G, U, Mt, nj,
                btile, lblk, interpret=False):
    c2, c3, c4 = ci
    L, B = c2.shape
    Bt = min(btile, B)
    Lblk = min(lblk, L)
    if B % Bt or L % Lblk or Lblk % 24:
        raise ValueError(
            f"fs3_sub tiling: B={B} must be a multiple of Bt={Bt} and "
            f"L={L} of Lblk={Lblk} (Lblk a multiple of 24); "
            "fs3_score_sub pads both before calling this")
    kernel = functools.partial(_fs3sub_kernel, Mt=Mt, Lblk=Lblk, nj=nj)
    cspec = pl.BlockSpec((Lblk, Bt), lambda b, l: (l, b),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, Bt), lambda b, l: (0, b),
                         memory_space=pltpu.VMEM)
    fullspec = lambda shape: pl.BlockSpec(shape, lambda b, l: (0, 0),
                                          memory_space=pltpu.VMEM)
    scratch = (
        [pltpu.VMEM((Mt, Bt), F32) for _ in range(4)]      # ENT ring
        + [pltpu.VMEM((Mt, Bt), F32) for _ in range(4)]    # INS ring
        + [pltpu.VMEM((Mt, Bt), F32) for _ in range(3)]    # IVX ring
        + [pltpu.VMEM((Mt, Bt), BF16) for _ in range(6)]   # E prefetch
        + [pltpu.VMEM((2 * Mt, Bt), BF16) for _ in range(2)]  # G input
        + [pltpu.VMEM((SP_ROWS, Bt), F32)]                 # scalars
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // Bt, L // Lblk),
        in_specs=[
            cspec, cspec, cspec, bspec, bspec,
            fullspec(T2.shape), fullspec(T3.shape),
            fullspec(T4.shape), fullspec((Mt, 8)),
            fullspec((2 * Mt, 2 * Mt)), fullspec((8, Mt)),
        ],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((1, B), F32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(c2, c3, c4, lens.reshape(1, B), pmove.reshape(1, B),
      T2, T3, T4, tBM, G, U)
    return out[0]


def fs3_score_sub(dsq, lens, params, nj=1.0, btile=1024, lblk=96,
                  interpret=False):
    """Frameshift 3-codon Forward scores via the sublane-layout
    Pallas kernel.  dsq [B, L] padded DNA; params from
    fs3_params_sub.  Matches fs3_score_batch's contract: lanes whose
    sequence never finishes (lens == 0 or lens > L) score -inf."""
    T2, T3, T4, tBM, G, U, Mt, M = params
    dsq = jnp.asarray(dsq)
    B, L = dsq.shape
    # L block: multiple of 24 (12-step ring phase x 8-sublane tiling)
    lblk = max(24, (lblk // 24) * 24)
    lblk = min(lblk, ((L + 23) // 24) * 24)
    Lpad = ((L + lblk - 1) // lblk) * lblk
    if Lpad != L:
        dsq = jnp.pad(dsq, ((0, 0), (0, Lpad - L)), constant_values=17)
    Bt = min(btile, B)
    Bpad = ((B + Bt - 1) // Bt) * Bt
    if Bpad != B:
        dsq = jnp.pad(dsq, ((0, Bpad - B), (0, 0)), constant_values=17)
    ci = codon_indices_compact(dsq)
    lensj = jnp.asarray(lens)
    if Bpad != B:
        lensj = jnp.pad(lensj, (0, Bpad - B))
    Lf = (lensj // 3).astype(F32)
    pmove = ((2.0 + nj) / (Lf + 2.0 + nj)).astype(F32)
    out = _fs3sub_jit(ci, lensj, pmove, T2, T3, T4, tBM, G, U,
                      Mt, float(nj), Bt, lblk, interpret)[:B]
    # never-finished lanes hold the NEG sentinel -> -inf (jaxk contract)
    return jnp.where(out > NEG * 0.5, out, -jnp.inf)
