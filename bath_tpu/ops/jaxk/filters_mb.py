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

from dataclasses import dataclass
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
        """Device part only: returns (out_int, out_inf) jnp arrays."""
        tjb = jnp.asarray(self.tjb_for(lens))
        return _ssv_msv_mb_impl(
            jnp.asarray(dsq_batch, dtype=jnp.int32),
            jnp.asarray(lens, dtype=jnp.int32), tjb,
            self.sbvT, self.rbvT, self.Mt, self.base,
            self.tec, self.tbm, self.bias)

    def scores(self, dsq_batch: np.ndarray, lens: np.ndarray
               ) -> np.ndarray:
        """[B, Lmax] padded digital aminos (pad 28=missing) + [B]
        lengths -> [B] MSV scores identical to
        ops.reference.filters.msv_filter per item."""
        ints, infs = self.ints(dsq_batch, lens)
        ints = np.asarray(ints).astype(np.float64)
        sc = np.float32((ints - float(self.base)) / self.scale - 3.0)
        return np.where(np.asarray(infs), np.float32(np.inf), sc)
