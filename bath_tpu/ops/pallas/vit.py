"""Pallas TPU kernel: ViterbiFilter (ref: impl_sse/vitfilter.c
p7_ViterbiFilter :39; bit-exact batched jnp version in
ops/jaxk/msv_exact._vitfilter_impl).

int16-saturated max-plus DP carried in int32, model positions on
lanes, the three DP rows + per-item specials VMEM-resident across the
whole sequence.  The striped lazy-F DD correction of the reference
becomes a log-depth (max, +) scan along lanes.  Returns the integer
final term, has-result and overflow flags; the float conversion
happens on the host in f64 exactly as in msv_exact.VitExact.
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

I32 = jnp.int32
F32 = jnp.float32
NEG = -32768

# tr pack rows
R_BM, R_MM, R_IM, R_DM, R_MDS, R_DDS, R_MI, R_II = range(8)
# specials slots in the [Bt, 128] scratch
S_XN, S_XJ, S_XC, S_XB, S_SCORE, S_HAS, S_OVF = range(7)


def _sat(x):
    return jnp.clip(x, -32768, 32767)


def _shift_lanes_neg(x):
    rolled = pltpu.roll(x, shift=1, axis=1)
    lane = jax.lax.broadcasted_iota(I32, x.shape, 1)
    return jnp.where(lane == 0, NEG, rolled)


def _maxplus_scan(part, a0):
    """dd[k] = max(part[k], dd[k-1] + a[k]) along lanes, int16-sat —
    log-depth scan in the (max, +) semiring."""
    a = jnp.broadcast_to(a0, part.shape)
    b = part
    n = part.shape[1]
    lane = jax.lax.broadcasted_iota(I32, part.shape, 1)
    for s in range(int(math.ceil(math.log2(n)))):
        sh = 1 << s
        mask = lane >= sh
        a_r = pltpu.roll(a, shift=sh, axis=1)
        b_r = pltpu.roll(b, shift=sh, axis=1)
        b = jnp.where(mask, jnp.maximum(_sat(b_r + a), b), b)
        a = jnp.where(mask, _sat(a_r + a), a)
    return b


def _vit_kernel(dsq_ref, lens_ref, movew_ref, rwv_ref, tr_ref, out_ref,
                dm_scr, di_scr, dd_scr, sp_scr, *, Mp, Lblk, Kp, base,
                emove, eloop):
    Bt = out_ref.shape[0]
    lens = lens_ref[:, :]                     # [Bt, 1]
    movew = movew_ref[:, :]                   # [Bt, 1]
    lb = pl.program_id(1)
    nlb = pl.num_programs(1)
    col = jax.lax.broadcasted_iota(I32, (Bt, 128), 1)
    iota_k = jax.lax.broadcasted_iota(I32, (Bt, Kp), 1)
    tBM = tr_ref[R_BM:R_BM + 1, :]
    tMM = tr_ref[R_MM:R_MM + 1, :]
    tIM = tr_ref[R_IM:R_IM + 1, :]
    tDM = tr_ref[R_DM:R_DM + 1, :]
    tMDs = tr_ref[R_MDS:R_MDS + 1, :]
    tDDs = tr_ref[R_DDS:R_DDS + 1, :]
    tMI = tr_ref[R_MI:R_MI + 1, :]
    tII = tr_ref[R_II:R_II + 1, :]

    @pl.when(lb == 0)
    def _init():
        dm_scr[:, :] = jnp.full((Bt, Mp), NEG, I32)
        di_scr[:, :] = jnp.full((Bt, Mp), NEG, I32)
        dd_scr[:, :] = jnp.full((Bt, Mp), NEG, I32)
        sp = jnp.full((Bt, 128), 0, I32)
        sp = jnp.where(col == S_XN, base, sp)
        sp = jnp.where(col == S_XJ, NEG, sp)
        sp = jnp.where(col == S_XC, NEG, sp)
        sp = jnp.where(col == S_XB,
                       jnp.broadcast_to(base + movew, (Bt, 128)), sp)
        sp_scr[:, :] = sp

    def step(j, _):
        gi = lb * Lblk + j
        sp = sp_scr[:, :]
        res = dsq_ref[j].reshape(Bt, 1)
        oh = (res == iota_k).astype(F32)
        # HIGHEST precision: the default TPU f32 matmul runs bf16
        # passes, which round 15-bit word scores — the gather must be
        # exact for bit parity
        row = jnp.dot(oh, rwv_ref[:, :],
                      preferred_element_type=F32,
                      precision=jax.lax.Precision.HIGHEST).astype(I32)
        dm, di, dd = dm_scr[:, :], di_scr[:, :], dd_scr[:, :]
        mp = _shift_lanes_neg(dm)
        ip = _shift_lanes_neg(di)
        dp = _shift_lanes_neg(dd)
        xB = sp[:, S_XB:S_XB + 1]
        sv = _sat(xB + tBM)
        sv = jnp.maximum(sv, _sat(mp + tMM))
        sv = jnp.maximum(sv, _sat(ip + tIM))
        sv = jnp.maximum(sv, _sat(dp + tDM))
        sv = _sat(sv + row)
        xE = sv.max(axis=1, keepdims=True)          # [Bt, 1]
        ovf2 = (xE >= 32767).astype(I32)
        new_i = jnp.maximum(_sat(dm + tMI), _sat(di + tII))
        part = _sat(_shift_lanes_neg(sv) + tMDs)
        new_d = _maxplus_scan(part, tDDs)
        xN2 = sp[:, S_XN:S_XN + 1]
        xC2 = jnp.maximum(sp[:, S_XC:S_XC + 1], xE + emove)
        xJ2 = jnp.maximum(sp[:, S_XJ:S_XJ + 1], xE + eloop)
        xB2 = _sat(jnp.maximum(xJ2 + movew, xN2 + movew))

        active = gi < lens                          # [Bt, 1]
        dm_scr[:, :] = jnp.where(active, sv, dm)
        di_scr[:, :] = jnp.where(active, new_i, di)
        dd_scr[:, :] = jnp.where(active, new_d, dd)

        done = (gi + 1 == lens)
        newsp = sp
        for slot, v in ((S_XN, xN2), (S_XJ, xJ2), (S_XC, xC2),
                        (S_XB, xB2)):
            newsp = jnp.where(col == slot,
                              jnp.broadcast_to(v, (Bt, 128)), newsp)
        newsp = jnp.where(col == S_OVF,
                          jnp.broadcast_to(
                              sp[:, S_OVF:S_OVF + 1] | ovf2,
                              (Bt, 128)), newsp)
        score = jnp.where(done, xC2 + movew,
                          sp[:, S_SCORE:S_SCORE + 1])
        has = jnp.where(done, (xC2 > NEG).astype(I32),
                        sp[:, S_HAS:S_HAS + 1])
        newsp = jnp.where(col == S_SCORE,
                          jnp.broadcast_to(score, (Bt, 128)), newsp)
        newsp = jnp.where(col == S_HAS,
                          jnp.broadcast_to(has, (Bt, 128)), newsp)
        sp_scr[:, :] = jnp.where(active, newsp, sp)
        return 0

    jax.lax.fori_loop(0, Lblk, step, 0)

    @pl.when(lb == nlb - 1)
    def _fin():
        out_ref[:, :] = sp_scr[:, :]


def vit_ints_pallas(dsq, lens, movew, rwv, tr, Mp, base, emove, eloop,
                    interpret=False, btile=256, lblk=512):
    """dsq [L, B] int32; lens/movew [B]; rwv [Kp, Mp] f32 word
    scores (dead lanes -32768); tr [8, Mp] i32.  Returns
    (score_int [B], has [B] bool, ovf [B] bool)."""
    L = dsq.shape[0]
    lblk = max(8, (lblk // 8) * 8)
    Lpad = ((L + lblk - 1) // lblk) * lblk
    if Lpad != L:
        dsq = jnp.pad(dsq, ((0, Lpad - L), (0, 0)))
    out = _vit_jit(dsq, lens, movew, rwv, tr, Mp, base, emove, eloop,
                   interpret, btile, lblk)
    return (out[:, S_SCORE], out[:, S_HAS].astype(bool),
            out[:, S_OVF].astype(bool))


@functools.partial(jax.jit, static_argnames=(
    "Mp", "base", "emove", "eloop", "interpret", "btile", "lblk"))
def _vit_jit(dsq, lens, movew, rwv, tr, Mp, base, emove, eloop,
             interpret, btile, lblk):
    L, B = dsq.shape
    Kp = rwv.shape[0]
    Bt = min(btile, B)
    Lblk = min(lblk, L)
    assert B % Bt == 0 and L % Lblk == 0
    kernel = functools.partial(_vit_kernel, Mp=Mp, Lblk=Lblk, Kp=Kp,
                               base=base, emove=emove, eloop=eloop)
    dspec = pl.BlockSpec((Lblk, Bt), lambda b, l: (l, b),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((Bt, 1), lambda b, l: (b, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((Bt, 128), lambda b, l: (b, 0),
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
        ],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, 128), I32),
        scratch_shapes=[
            pltpu.VMEM((Bt, Mp), I32),
            pltpu.VMEM((Bt, Mp), I32),
            pltpu.VMEM((Bt, Mp), I32),
            pltpu.VMEM((Bt, 128), I32),
        ],
        interpret=interpret,
    )(dsq, lens.reshape(B, 1), movew.reshape(B, 1), rwv, tr)
    return out


def vit_params_pallas(om, lane_multiple: int = 128):
    """Pack an OProfile's word scores for the kernel: returns
    (rwv [Kp, Mp] f32, tr [8, Mp] i32, Mp, base, emove, eloop),
    matching msv_exact.VitExact's layout (tMD/tDD pre-shifted with
    NEG at lane 0)."""
    from ..jaxk.batch import round_up
    M = om.M
    Mp = round_up(M, lane_multiple)
    rwv = np.full((om.Kp, Mp), NEG, np.float32)
    rwv[:, :M] = om.rwv[:, 1:M + 1].astype(np.float32)
    twv = om.twv.astype(np.int32)

    def pad(v, fill=NEG):
        out = np.full(Mp, fill, np.int32)
        out[:len(v)] = v
        return out

    def shifted(v):
        out = np.full(Mp, NEG, np.int32)
        out[1:len(v) + 1] = v[:Mp - 1] if len(v) >= Mp else v
        return out

    tr = np.full((8, Mp), NEG, np.int32)
    tr[R_BM] = pad(twv[:M, C.P_BM])
    tr[R_MM] = pad(twv[:M, C.P_MM])
    tr[R_IM] = pad(twv[:M, C.P_IM])
    tr[R_DM] = pad(twv[:M, C.P_DM])
    tr[R_MDS] = shifted(pad(twv[1:M, C.P_MD]))
    tr[R_DDS] = shifted(pad(twv[1:M, C.P_DD]))
    tr[R_MI] = pad(twv[1:M + 1, C.P_MI])
    tr[R_II] = pad(twv[1:M + 1, C.P_II])
    return (jnp.asarray(rwv), jnp.asarray(tr), Mp, int(om.base_w),
            int(om.xw[C.X_E, C.MOVE]), int(om.xw[C.X_E, C.LOOP]))
