"""Pallas TPU kernel: SSV filter inner DP (ref: impl_sse/ssvfilter.c
p7_SSVFilter :875; bit-exact batched jnp version in
ops/jaxk/msv_exact._ssv_msv_impl).

The SSV recurrence is pure int8 saturating arithmetic, so the device
result is bit-identical to the scalar reference.  Layout mirrors the
fs3 kernel: model positions on lanes, batch tile on sublanes, the
single diagonal state row lives in VMEM scratch across the whole
sequence; residue emissions are fetched with a one-hot matmul on the
MXU.  The kernel returns the raw uint8 running max xEu per item; the
(branchy, scalar) wraparound post-processing and the SSV-to-MSV
fallback stay on the host exactly as in msv_exact.MSVExact.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
F32 = jnp.float32


def _ssv_kernel(dsq_ref, lens_ref, sbv_ref, out_ref, d_scr, acc_scr,
                *, Mp, Lblk, Kp):
    """One (batch tile, L block) grid step.  dsq_ref: [Lblk, Bt] int32
    residues; sbv_ref: [Kp, Mp] f32 byte costs; out_ref: [Bt, 1]
    int32 xEu.  Scratch persists across the L grid dimension:
    d [Bt, Mp] i32 diagonal state, acc [Bt, Mp] i32 running u-max."""
    Bt = out_ref.shape[0]
    lens = lens_ref[:, :]                       # [Bt, 1]
    lb = pl.program_id(1)
    nlb = pl.num_programs(1)
    lane = jax.lax.broadcasted_iota(I32, (Bt, Mp), 1)
    iota_k = jax.lax.broadcasted_iota(I32, (Bt, Kp), 1)

    @pl.when(lb == 0)
    def _init():
        d_scr[:, :] = jnp.full((Bt, Mp), -128, I32)
        acc_scr[:, :] = jnp.zeros((Bt, Mp), I32)

    def step(j, _):
        gi = lb * Lblk + j
        res = dsq_ref[j].reshape(Bt, 1)         # [Bt, 1]
        oh = (res == iota_k).astype(F32)
        # default TPU matmul precision (bf16 passes) is exact here:
        # SSV byte costs fit in bf16's 8-bit mantissa (|v| <= 128)
        row = jnp.dot(oh, sbv_ref[:, :],
                      preferred_element_type=F32).astype(I32)
        d = d_scr[:, :]
        dshift = pltpu.roll(d, shift=1, axis=1)
        dshift = jnp.where(lane == 0, -128, dshift)
        d2 = jnp.clip(dshift - row, -128, 127)
        active = gi < lens                      # [Bt, 1]
        d_scr[:, :] = jnp.where(active, d2, d)
        u = d2 & 0xFF
        acc_scr[:, :] = jnp.where(active,
                                  jnp.maximum(acc_scr[:, :], u),
                                  acc_scr[:, :])
        return 0

    jax.lax.fori_loop(0, Lblk, step, 0)

    @pl.when(lb == nlb - 1)
    def _fin():
        xe = acc_scr[:, :].max(axis=1, keepdims=True)
        out_ref[:, :] = xe


def ssv_xe_pallas(dsq, lens, sbv, Mp, interpret=False, btile=256,
                  lblk=512):
    """dsq: [L, B] int32 residue stream (pad value = any index whose
    sbv row is the 127 dead cost); lens [B]; sbv [Kp, Mp] float32
    byte costs (dead lanes 127).  Returns [B] int32 xEu, identical to
    the scalar SSV inner loop's running uint8 max."""
    L = dsq.shape[0]
    lblk = max(8, (lblk // 8) * 8)
    Lpad = ((L + lblk - 1) // lblk) * lblk
    if Lpad != L:
        dsq = jnp.pad(dsq, ((0, Lpad - L), (0, 0)))
    return _ssv_xe_jit(dsq, lens, sbv, Mp, interpret, btile, lblk)


@functools.partial(jax.jit, static_argnames=("Mp", "interpret",
                                             "btile", "lblk"))
def _ssv_xe_jit(dsq, lens, sbv, Mp, interpret, btile, lblk):
    L, B = dsq.shape
    Kp = sbv.shape[0]
    Bt = min(btile, B)
    Lblk = min(lblk, L)
    assert B % Bt == 0 and L % Lblk == 0
    kernel = functools.partial(_ssv_kernel, Mp=Mp, Lblk=Lblk, Kp=Kp)
    dspec = pl.BlockSpec((Lblk, Bt), lambda b, l: (l, b),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((Bt, 1), lambda b, l: (b, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((Kp, Mp), lambda b, l: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B // Bt, L // Lblk),
        in_specs=[dspec, bspec, sspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct((B, 1), I32),
        scratch_shapes=[
            pltpu.VMEM((Bt, Mp), I32),
            pltpu.VMEM((Bt, Mp), I32),
        ],
        interpret=interpret,
    )(dsq, lens.reshape(B, 1), sbv)
    return out[:, 0]


def ssv_params_pallas(om, lane_multiple: int = 128):
    """Pack an OProfile's SSV bytes for the kernel: returns
    (sbv [Kp, Mp] f32 with dead lanes at cost 127, Mp)."""
    from ..jaxk.batch import round_up
    M = om.M
    Mp = round_up(M, lane_multiple)
    sbv = np.full((om.Kp, Mp), 127, np.float32)
    sbv[:, :M] = om.sbv[:, 1:M + 1].astype(np.float32)
    return jnp.asarray(sbv), Mp
