"""Pallas TPU kernel v2: frameshift 3-codon Forward gate.

Redesign of fs3_sub driven by round-3 measurements.  The round-2
kernel was VMEM-bandwidth bound, not ALU bound: every [Mt, Bt]
intermediate spills to VMEM (a [136,1024] f32 value is 136 vector
registers — far over the register file), so per-position cost ~=
(VMEM accesses) / (VMEM ports), and its combined [2Mt,2Mt] MXU
operator wasted 4x MXU FLOPs on zeros (two diagonals + a dense
closure embedded in a 2Mt operator).  v2 attacks both:

- MXU does ONLY the dense work: the [Mt,Mt] DD-closure operator W3
  (exactly ops.jaxk.kernels.fs3_params.UT — tMD, the k-1 shift and
  the next D->M read multiplier pre-folded) plus the three one-hot
  emission dots and the xE reduction;
- diagonal transitions fold at WRITE time: the ENT ring stores
  msv*tMM_src + new_i*tIM_src + new_d, so the per-position read side
  is ONE ring load + one sublane roll instead of three loads + three
  shifted multiplies.  Ring VMEM traffic drops from ~11 to ~9 big
  accesses/position (ENT[3] + mr[4] + ir[4] + ivx[3] arrays);
- no emission prefetch buffers: dot results are SSA values consumed
  directly (a prefetch slot costs a VMEM store+load per channel per
  position — pure overhead under a VMEM-bound roofline);
- Bt is tunable down to 128 lanes: smaller tiles let Mosaic keep
  whole sub-chains in registers (fewer spills), at the cost of more
  grid steps.

Same recurrence and pending-scale discipline as
ops.jaxk.kernels._fs3_score_impl (ref: impl_sse/fwdback_fs.c
p7_ForwardParser_Frameshift_3Codons); parity vs the jnp kernel is
tested in tests/test_pallas_kernels.py (interpret mode, mixed
lengths incl. non-block-multiples and a lens=0 lane).
`python bench.py --v2` selects it on the chip.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BF16 = jnp.bfloat16
NEG = -1e30

# sp_scr rows ([32, Bt] f32 block of per-item scalars)
R_XN, R_XJ, R_XC, R_XB = 0, 4, 8, 12      # 4-slot rings
R_PEND = 16                                # rows 16..19: pending scales
R_PIVX = 20                                # rows 20..22: IVX pending
R_SPARE = 23                               # row 23: scaled with 16..22
R_ACC, R_SCORE = 24, 25
SP_ROWS = 32


def _fs3v2_kernel(c2_ref, c3_ref, c4_ref, lens_ref, pmove_ref,
                  T2_ref, T3_ref, T4_ref, tBM_ref, W3_ref, U_ref,
                  out_ref, ent0, ent1, ent2, mr0, mr1, mr2, mr3,
                  ir0, ir1, ir2, ir3, ivx0, ivx1, ivx2, sp_scr,
                  *, Mt, Lblk, nj):
    """One (batch tile, L block) grid step.  c{2,3,4}_ref: [Lblk, Bt]
    compact per-channel codon indices; T*_ref: [Mt, 17/65/257] bf16;
    tBM_ref: [Mt, 8] f32 (col 0 = B->M, col 1 = tMM_src, col 2 =
    tIM_src, col 3 = tMI_src, col 4 = tII_src); W3_ref: [Mt, Mt]
    bf16 fused closure; U_ref: [8, Mt] f32 (row 0 = xE weights);
    out_ref: [1, Bt].  Scratch persists across the L grid dim
    (innermost)."""
    ent = [ent0, ent1, ent2]
    mr = [mr0, mr1, mr2, mr3]
    ir = [ir0, ir1, ir2, ir3]
    ivx = [ivx0, ivx1, ivx2]

    Bt = out_ref.shape[1]
    lb = pl.program_id(1)

    tBM = tBM_ref[:, 0:1]                     # [Mt, 1]
    # col 1 (tMM_src) is consumed via the W3 diagonal fold
    tIMs = tBM_ref[:, 2:3]
    tMIs = tBM_ref[:, 3:4]
    tIIs = tBM_ref[:, 4:5]
    pmove = pmove_ref[0:1, :]                 # [1, Bt]
    ploop = 1.0 - pmove
    emove = 0.5 if nj > 0 else 1.0
    eloop = 0.5 if nj > 0 else 0.0
    lens = lens_ref[0:1, :]

    @pl.when(lb == 0)
    def _init():
        z = jnp.zeros((Mt, Bt), F32)
        for r in ent + mr + ir + ivx:
            r[:, :] = z
        sp_scr[:, :] = jnp.zeros((SP_ROWS, Bt), F32)
        ob = jnp.ones((1, Bt), F32)
        # ref parser init: xN slots {0,1} = 1, xB slots {0,1} = pmove
        sp_scr[R_XN:R_XN + 1], sp_scr[R_XN + 1:R_XN + 2] = ob, ob
        sp_scr[R_XB:R_XB + 1] = pmove
        sp_scr[R_XB + 1:R_XB + 2] = pmove
        sp_scr[R_PEND:R_PIVX + 3] = jnp.ones((7, Bt), F32)
        sp_scr[R_SCORE:R_SCORE + 1] = jnp.full((1, Bt), NEG, F32)

    row2 = jax.lax.broadcasted_iota(jnp.int32, (17, Bt), 0)
    row3 = jax.lax.broadcasted_iota(jnp.int32, (65, Bt), 0)
    row4 = jax.lax.broadcasted_iota(jnp.int32, (257, Bt), 0)

    def sp(r):
        return sp_scr[r:r + 1, :]

    def position(j, p, gi, static_pos=None):
        """One DP position.  j: static phase index (0..11, drives the
        ring slots); p: block-local position for the codon-index
        reads (traced); gi: global 0-based position (traced unless
        the caller peels the first block, then static_pos = gi+1)."""
        w4 = (j + 1) % 4          # mr/ir write slot
        r2 = (j - 1) % 4          # -2 read slot (mr/ir via ENT)
        r3 = (j - 2) % 4          # -3 read slot (raw mr/ir)
        e2 = (j - 1) % 3          # ENT -2 read slot (depth-3 ring)
        e0 = (j + 1) % 3          # ENT write slot
        s2 = (j + 1) % 3          # ivx write slot
        s3 = j % 3                # ivx -1 read (3-nt codon)
        s4 = (j - 1) % 3          # ivx -2 read (4-nt codon)

        # emission one-hot dots -> f32 SSA values (no prefetch slots:
        # VMEM-bound roofline makes a store+load per channel pure
        # overhead; Mosaic schedules the dots ahead of the chain)
        idx2 = c2_ref[pl.ds(p, 1), :]
        idx3 = c3_ref[pl.ds(p, 1), :]
        idx4 = c4_ref[pl.ds(p, 1), :]
        E2 = jnp.dot(T2_ref[:, :], (idx2 == row2).astype(BF16),
                     preferred_element_type=F32)
        E3 = jnp.dot(T3_ref[:, :], (idx3 == row3).astype(BF16),
                     preferred_element_type=F32)
        E4 = jnp.dot(T4_ref[:, :], (idx4 == row4).astype(BF16),
                     preferred_element_type=F32)

        sc2 = sp(R_PEND + r2)
        # svu = roll(ENT[-2], 1) + xB[-2]*tBM  (unscaled by sc2; the
        # scale rides E2/pivx on consumption)
        svu = pltpu.roll(ent[e2][:, :], 1, 0) + sp(R_XB + r2) * tBM
        msv = svu * (E2 * sc2)
        t3 = ivx[s3][:, :] * (E3 * sp(R_PIVX + s3))
        t4 = ivx[s4][:, :] * (E4 * sp(R_PIVX + s4))
        new_i = (mr[r3][:, :] * tMIs + ir[r3][:, :] * tIIs) \
            * sp(R_PEND + r3)
        if static_pos is not None:
            # statically-peeled warm-up (ref parser: 3/4-nt codon and
            # I/N/J/C terms start at positions 3/4)
            if static_pos < 3:
                t3 = jnp.zeros_like(t3)
                new_i = jnp.zeros_like(new_i)
            if static_pos < 4:
                t4 = jnp.zeros_like(t4)
        msv = msv + t3 + t4

        new_d = jnp.dot(W3_ref[:, :], msv.astype(BF16),
                        preferred_element_type=F32)
        xE = jnp.dot(U_ref[:, :], msv,
                     preferred_element_type=F32)[0:1, :]

        xN2 = sp(R_XN + r3) * sp(R_PEND + r3) * ploop
        xJ2 = sp(R_XJ + r3) * sp(R_PEND + r3) * ploop + xE * eloop
        xC2 = sp(R_XC + r3) * sp(R_PEND + r3) * ploop + xE * emove
        if static_pos is not None and static_pos < 3:
            xN2 = jnp.ones_like(xN2)
            xJ2 = xE * eloop
            xC2 = xE * emove
        xB2 = (xN2 + xJ2) * pmove

        sc = jnp.maximum(xE, 1.0)
        sinv = 1.0 / sc
        active = gi < lens

        # ring writes; ENT folds the next read's diagonal transitions
        # and the D contribution at write time (one load + one roll on
        # the read side instead of three loads + three shifts)
        # the M->M diagonal rides inside new_d (folded into W3's
        # structurally-zero diagonal, see fs3_params_v2): one fma
        # instead of dot + two big VPU ops per position
        ent[e0][:, :] = new_i * tIMs + new_d
        mr[w4][:, :] = msv
        ir[w4][:, :] = new_i
        ivx[s2][:, :] = svu
        sp_scr[R_XN + w4:R_XN + w4 + 1] = xN2
        sp_scr[R_XJ + w4:R_XJ + w4 + 1] = xJ2
        sp_scr[R_XC + w4:R_XC + w4 + 1] = xC2
        sp_scr[R_XB + w4:R_XB + w4 + 1] = xB2
        # pending scales: slot just written resets; ivx's new slot
        # inherits sc2 (the stored svu is missing its sc2 factor);
        # then the whole 8-row block multiplies by sinv where active
        sp_scr[R_PEND + w4:R_PEND + w4 + 1] = jnp.ones((1, Bt), F32)
        sp_scr[R_PIVX + s2:R_PIVX + s2 + 1] = sc2
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
        # statically peeled: positions 1..12 with exact warm-up
        # masks.  p stays a python int: Mosaic cannot lower a
        # dynamic-start ref load inside a cond branch (pytree
        # mismatch in _load_lowering_rule), and these positions are
        # static anyway.
        for j in range(12):
            position(j, j, jnp.int32(j), static_pos=j + 1)

    def block(bi, _):
        base = bi * 12
        for j in range(12):
            position(j, base + j, lb * Lblk + base + j)
        return 0

    start = jnp.where(lb == 0, 1, 0)
    jax.lax.fori_loop(start, nblocks, block, 0)
    out_ref[0:1, :] = sp(R_SCORE)


def fs3_params_v2(om_fs):
    """Pack an FSOProfile for the v2 kernel from the jaxk pack.
    Returns (T2 [Mt,17] bf16, T3 [Mt,65] bf16, T4 [Mt,257] bf16,
    tv [Mt,8] f32 (cols: tBM, tMM_src, tIM_src, tMI, tII),
    W3 [Mt,Mt] bf16 (the jaxk UT fused closure), U [8,Mt] f32
    (row 0 = xE weights), Mt, M)."""
    from ..jaxk.kernels import fs3_params
    p = fs3_params(om_fs)
    Mt = p.Mt
    tv = np.zeros((Mt, 8), np.float32)
    tv[:, 0] = np.asarray(p.tBM)
    # source-indexed shifts of the dest-indexed jaxk vectors: the ENT
    # ring folds transition multipliers at write time, the read side
    # only rolls
    tv[:-1, 1] = np.asarray(p.tMM)[1:]
    tv[:-1, 2] = np.asarray(p.tIM)[1:]
    tv[:, 3] = np.asarray(p.tMI)
    tv[:, 4] = np.asarray(p.tII)
    U = np.zeros((8, Mt), np.float32)
    U[0] = np.asarray(p.u)
    # fold the M->M diagonal into the closure operator: UT's diagonal
    # is structurally zero (D moves strictly right), so the ENT write
    # becomes ONE MXU dot + one fma instead of dot + 2 VPU ops/pos.
    # Cost: the dominant M->M path now rides the bf16-cast msv
    # (measured drift at L=8184 stays far inside the ln(8) gate band)
    W3 = np.asarray(p.UT, np.float32) + np.diag(tv[:, 1])
    return (p.T2.astype(BF16), p.T3.astype(BF16), p.T4.astype(BF16),
            jnp.asarray(tv), jnp.asarray(W3).astype(BF16),
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
def _fs3v2_jit(ci, lens, pmove, T2, T3, T4, tv, W3, U, Mt, nj,
               btile, lblk, interpret=False):
    c2, c3, c4 = ci
    L, B = c2.shape
    Bt = min(btile, B)
    Lblk = min(lblk, L)
    if B % Bt or L % Lblk or Lblk % 24:
        raise ValueError(
            f"fs3v2 tiling: B={B} must be a multiple of Bt={Bt} and "
            f"L={L} of Lblk={Lblk} (Lblk a multiple of 24); "
            "fs3_score_v2 pads both before calling this")
    kernel = functools.partial(_fs3v2_kernel, Mt=Mt, Lblk=Lblk, nj=nj)
    cspec = pl.BlockSpec((Lblk, Bt), lambda b, l: (l, b),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, Bt), lambda b, l: (0, b),
                         memory_space=pltpu.VMEM)
    fullspec = lambda shape: pl.BlockSpec(shape, lambda b, l: (0, 0),
                                          memory_space=pltpu.VMEM)
    scratch = (
        [pltpu.VMEM((Mt, Bt), F32) for _ in range(3)]      # ENT ring
        + [pltpu.VMEM((Mt, Bt), F32) for _ in range(4)]    # mr ring
        + [pltpu.VMEM((Mt, Bt), F32) for _ in range(4)]    # ir ring
        + [pltpu.VMEM((Mt, Bt), F32) for _ in range(3)]    # IVX ring
        + [pltpu.VMEM((SP_ROWS, Bt), F32)]                 # scalars
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // Bt, L // Lblk),
        in_specs=[
            cspec, cspec, cspec, bspec, bspec,
            fullspec(T2.shape), fullspec(T3.shape),
            fullspec(T4.shape), fullspec((Mt, 8)),
            fullspec((Mt, Mt)), fullspec((8, Mt)),
        ],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((1, B), F32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(c2, c3, c4, lens.reshape(1, B), pmove.reshape(1, B),
      T2, T3, T4, tv, W3, U)
    return out[0]


def fs3_score_v2(dsq, lens, params, nj=1.0, btile=512, lblk=96,
                 interpret=False):
    """Frameshift 3-codon Forward scores via the v2 Pallas kernel.
    dsq [B, L] padded DNA; params from fs3_params_v2.  Matches
    fs3_score_batch's contract: lanes whose sequence never finishes
    (lens == 0 or lens > L) score -inf."""
    T2, T3, T4, tv, W3, U, Mt, M = params
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
    out = _fs3v2_jit(ci, lensj, pmove, T2, T3, T4, tv, W3, U,
                     Mt, float(nj), Bt, lblk, interpret)[:B]
    # never-finished lanes hold the NEG sentinel -> -inf (jaxk contract)
    return jnp.where(out > NEG * 0.5, out, -jnp.inf)
