"""TPU compute path: batched filter-cascade kernels in JAX.

Design (SURVEY.md section 7, stage 5): one algorithm codebase where
these jitted kernels play the role of the reference's impl_{sse,avx,
neon} — batched over ORFs/windows, model positions on VPU lanes,
`lax.scan` over sequence positions, DD closures as associative
prefix scans (log-depth instead of the reference's striped 4-pass
serialization, ref: impl_sse/fwdback.c:340-390).

All kernels are score-only (the envelope-level full matrices stay on
the numpy reference path for now): they compute exactly what the
acceleration gates F1-F4 need, which is where nearly all DP cells are
spent (ref: p7_pipeline.c filter cascade).

Scaling: prob-space with branchless per-step renormalization (divide
by max(xE, 1) and accumulate log) — scores are identical to the
reference's sparse-rescaled scores up to float arithmetic order.

Padding conventions: model dim padded to a lane multiple with
zero-probability transitions/emissions (dead lanes); sequences padded
with the missing-data residue (zero emission odds), with per-item
lengths driving masked final-score extraction.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ... import constants as C
from ...oprofile import OProfile
from .batch import round_up

F32 = jnp.float32


# ---------------------------------------------------------------------
# Parameter containers (host-side prep, device arrays)
# ---------------------------------------------------------------------
@dataclass
class FwdParams:
    """Prob-space Forward parameters, k-padded (ref: fb_conversion)."""
    Mp: int
    M: int
    rfv: jnp.ndarray     # [Kp, Mp]  match odds, slot j = model pos j+1
    tBM: jnp.ndarray     # [Mp]  B -> M_{j+1}
    tMM: jnp.ndarray     # [Mp]  M_j -> M_{j+1}
    tIM: jnp.ndarray
    tDM: jnp.ndarray
    tMD: jnp.ndarray     # [Mp]  M_{j+1} -> D_{j+2}
    tDD: jnp.ndarray     # [Mp]  D_{j+1} -> D_{j+2}
    tMI: jnp.ndarray     # [Mp]  M_{j+1} -> I_{j+1}
    tII: jnp.ndarray
    U: jnp.ndarray = None      # [Mp, Mp] DD closure operator


def fwd_params(om: OProfile, lane_multiple: int = 128) -> FwdParams:
    M = om.M
    Mp = round_up(M, lane_multiple)
    Kp = om.Kp

    def pad(v):
        out = np.zeros(Mp, np.float32)
        out[:len(v)] = v
        return jnp.asarray(out)

    rfv = np.zeros((Kp, Mp), np.float32)
    rfv[:, :M] = om.rfv[:, 1:M + 1]
    tfv = om.tfv  # [M+1, 8]; slot k = transitions out of node k
    return FwdParams(
        Mp=Mp, M=M,
        rfv=jnp.asarray(rfv),
        tBM=pad(tfv[:M, C.P_BM]),
        tMM=pad(tfv[:M, C.P_MM]),
        tIM=pad(tfv[:M, C.P_IM]),
        tDM=pad(tfv[:M, C.P_DM]),
        tMD=pad(tfv[1:M, C.P_MD]),    # slot j = M_{j+1}->D_{j+2}
        tDD=pad(tfv[1:M, C.P_DD]),
        tMI=pad(tfv[1:M + 1, C.P_MI]),
        tII=pad(tfv[1:M + 1, C.P_II]),
        U=jnp.asarray(dd_closure_matrix(tfv[1:M, C.P_DD], Mp)),
    )


def _shift_right(x):
    """k-1 access: lane j reads lane j-1; lane 0 gets 0."""
    return jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]


def _dd_closure_sum(part, tdd):
    """dc[j] = part[j] + tdd[j-1]*dc[j-1] via associative scan.
    part: [B, Mp]; tdd with slot j = D_{j+1}->D_{j+2}."""
    a = jnp.broadcast_to(jnp.pad(tdd, (1, 0))[:-1][None, :], part.shape)
    # first-order linear recurrence y[j] = a[j]*y[j-1] + part[j]

    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 * a2, b1 * a2 + b2

    _, dc = jax.lax.associative_scan(combine, (a, part), axis=1)
    return dc


def _dd_closure_max(part, tdd_log):
    """Max-plus closure for Viterbi: dc[j] = max(part[j],
    dc[j-1] + tdd_log[j-1])."""
    a = jnp.pad(tdd_log, (1, 0), constant_values=-jnp.inf)[:-1]
    a = jnp.broadcast_to(a[None, :], part.shape)

    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 + a2, jnp.maximum(b1 + a2, b2)

    _, dc = jax.lax.associative_scan(combine, (a, part), axis=1)
    return dc


def dd_closure_matrix(tdd: np.ndarray, Mp: int) -> np.ndarray:
    """Upper-triangular DD-closure operator U (f32): dc = part @ U with
    U[j,k] = prod_{r=j+1}^{k} a[r], a[r] = tDD into slot r.  Turns the
    sequential DD serialization (ref: impl_sse/fwdback.c:340) into one
    MXU matmul."""
    a = np.zeros(Mp, np.float64)
    a[:len(tdd)] = tdd
    a = np.concatenate([[0.0], a])[:-1]     # a[j] = tdd[j-1]
    # cumulative log products; use log to avoid over/underflow in the
    # prefix division
    with np.errstate(divide="ignore"):
        la = np.maximum(np.log(a), -745.0)   # clamp -inf so diffs stay finite
    cum = np.concatenate([[0.0], np.cumsum(la)])   # cum[j] = sum_{r<=j-1}
    U = np.zeros((Mp, Mp), np.float64)
    for j in range(Mp):
        # U[j, k] = exp(cum[k+1] - cum[j+1]) for k >= j
        with np.errstate(over="ignore"):
            U[j, j:] = np.exp(np.minimum(cum[j + 1:Mp + 1] - cum[j + 1],
                                         0.0))
        U[j, j:] = np.where(np.isfinite(U[j, j:]), U[j, j:], 0.0)
    return U.astype(np.float32)


def _onehot_rows(idx, table):
    """Emission rows via one-hot matmul on the MXU instead of a
    dynamic gather: idx [B] int32, table [R, Mp] -> [B, Mp]."""
    R = table.shape[0]
    oh = (idx[:, None] == jnp.arange(R, dtype=idx.dtype)[None, :]
          ).astype(table.dtype)
    return jnp.dot(oh, table, preferred_element_type=jnp.float32)


def _gdot(W, x, ng: int):
    """Closure-operator product, optionally grouped for lane-packed
    multi-model batches (ops/jaxk/multimodel.py): ng == 1 applies the
    dense [Mt, Mt] operator; ng > 1 treats the lane axis as ng
    per-model blocks of Mt/ng lanes and applies W [ng, Mg, Mg] as a
    batched matmul — block-diagonal semantics at linear (not
    quadratic) cost in the packed lane count."""
    if ng == 1:
        if W.ndim == 3:          # single-model pack: [1, Mg, Mg]
            W = W[0]
        return jnp.dot(W, x, preferred_element_type=F32)
    GM, B = x.shape
    Mg = GM // ng
    xr = x.reshape(ng, Mg, B)
    out = jax.lax.dot_general(W, xr, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=F32)
    return out.reshape(GM, B)


# ---------------------------------------------------------------------
# Batched Forward score (the F3 gate; ref: fwdback.c forward_engine)
# ---------------------------------------------------------------------
@partial(jax.jit, static_argnames=("Mp",))
def _forward_score_impl(dsq, lens, rfv, tBM, tMM, tIM, tDM, tMD, tDD,
                        tMI, tII, xf, Mp):
    B, L = dsq.shape
    dsq = dsq.astype(jnp.int32)   # device-side upcast (int8 transfers)
    nloop, nmove = xf[C.X_N, C.LOOP], xf[C.X_N, C.MOVE]
    jloop, jmove = xf[C.X_J, C.LOOP], xf[C.X_J, C.MOVE]
    cloop, cmove = xf[C.X_C, C.LOOP], xf[C.X_C, C.MOVE]
    eloop, emove = xf[C.X_E, C.LOOP], xf[C.X_E, C.MOVE]

    def step(carry, xi):
        mc, ic, dc, xN, xJ, xC, xB, logacc, score = carry
        resi, i = xi
        row = rfv[resi]                       # [B, Mp]
        mp = _shift_right(mc)
        ip = _shift_right(ic)
        dp = _shift_right(dc)
        sv = (xB[:, None] * tBM + mp * tMM + ip * tIM + dp * tDM) * row
        new_i = mc * tMI + ic * tII
        part = _shift_right(sv) * jnp.pad(tMD, (1, 0))[:-1]
        new_d = _dd_closure_sum(part, tDD)
        xE = sv.sum(axis=1) + new_d.sum(axis=1)
        xN2 = xN * nloop
        xC2 = xC * cloop + xE * emove
        xJ2 = xJ * jloop + xE * eloop
        xB2 = xJ2 * jmove + xN2 * nmove
        s = jnp.maximum(xE, 1.0)
        inv = (1.0 / s)[:, None]
        active = (i < lens)
        mc = jnp.where(active[:, None], sv * inv, mc)
        ic = jnp.where(active[:, None], new_i * inv, ic)
        dc = jnp.where(active[:, None], new_d * inv, dc)
        sinv = 1.0 / s
        xN = jnp.where(active, xN2 * sinv, xN)
        xJ = jnp.where(active, xJ2 * sinv, xJ)
        xC = jnp.where(active, xC2 * sinv, xC)
        xB = jnp.where(active, xB2 * sinv, xB)
        logacc = jnp.where(active, logacc + jnp.log(s), logacc)
        done = (i + 1 == lens)
        final = logacc + jnp.log(xC * cmove)
        score = jnp.where(done, final, score)
        return (mc, ic, dc, xN, xJ, xC, xB, logacc, score), None

    z = jnp.zeros((B, Mp), F32)
    carry0 = (z, z, z,
              jnp.ones(B, F32),
              jnp.zeros(B, F32),
              jnp.zeros(B, F32),
              jnp.full(B, nmove, F32),
              jnp.zeros(B, F32),
              jnp.full(B, -jnp.inf, F32))
    xs = (dsq.T, jnp.arange(L, dtype=jnp.int32))
    carry, _ = jax.lax.scan(step, carry0, xs)
    return carry[-1]


def forward_score_batch(dsq, lens, params: FwdParams, xf) -> jnp.ndarray:
    """Forward scores (nats) for a padded batch.  <xf> is the [4,2]
    pspace special-transition matrix (length-configured per batch; use
    per-item reconfig via forward_score_batch_L when lengths vary)."""
    return _forward_score_impl(jnp.asarray(dsq), jnp.asarray(lens),
                               params.rfv, params.tBM, params.tMM,
                               params.tIM, params.tDM, params.tMD,
                               params.tDD, params.tMI, params.tII,
                               jnp.asarray(xf), params.Mp)


@partial(jax.jit, static_argnames=("Mp", "nj"))
def _forward_score_perlen_impl(dsq, lens, rfv, tBM, tMM, tIM, tDM, tMD,
                               tDD, tMI, tII, nj, Mp, U=None):
    """Forward with per-item length model: each item's N/C/J loop
    probabilities use its own length (ref: p7_oprofile_ReconfigLength
    called per ORF in the pipeline)."""
    B, L = dsq.shape
    dsq = dsq.astype(jnp.int32)   # device-side upcast (int8 transfers)
    Lf = lens.astype(F32)
    pmove = (2.0 + nj) / (Lf + 2.0 + nj)
    ploop = 1.0 - pmove
    emove = jnp.full(B, 0.5 if nj > 0 else 1.0, F32)
    eloop = jnp.full(B, 0.5 if nj > 0 else 0.0, F32)

    tMD_s = jnp.pad(tMD, (1, 0))[:-1]

    def step(carry, xi):
        mc, ic, dc, xN, xJ, xC, xB, logacc, score = carry
        resi, i = xi
        row = _onehot_rows(resi, rfv)
        mp = _shift_right(mc)
        ip = _shift_right(ic)
        dp = _shift_right(dc)
        sv = (xB[:, None] * tBM + mp * tMM + ip * tIM + dp * tDM) * row
        new_i = mc * tMI + ic * tII
        part = _shift_right(sv) * tMD_s
        if U is not None:
            new_d = jnp.dot(part, U, preferred_element_type=jnp.float32)
        else:
            new_d = _dd_closure_sum(part, tDD)
        xE = sv.sum(axis=1) + new_d.sum(axis=1)
        xN2 = xN * ploop
        xC2 = xC * ploop + xE * emove
        xJ2 = xJ * ploop + xE * eloop
        xB2 = xJ2 * pmove + xN2 * pmove
        s = jnp.maximum(xE, 1.0)
        sinv = 1.0 / s
        active = (i < lens)
        am = active[:, None]
        mc = jnp.where(am, sv * sinv[:, None], mc)
        ic = jnp.where(am, new_i * sinv[:, None], ic)
        dc = jnp.where(am, new_d * sinv[:, None], dc)
        xN = jnp.where(active, xN2 * sinv, xN)
        xJ = jnp.where(active, xJ2 * sinv, xJ)
        xC = jnp.where(active, xC2 * sinv, xC)
        xB = jnp.where(active, xB2 * sinv, xB)
        logacc = jnp.where(active, logacc + jnp.log(s), logacc)
        done = (i + 1 == lens)
        score = jnp.where(done, logacc + jnp.log(xC * pmove), score)
        return (mc, ic, dc, xN, xJ, xC, xB, logacc, score), None

    z = jnp.zeros((B, Mp), F32)
    carry0 = (z, z, z, jnp.ones(B, F32), jnp.zeros(B, F32),
              jnp.zeros(B, F32), pmove.astype(F32), jnp.zeros(B, F32),
              jnp.full(B, -jnp.inf, F32))
    xs = (dsq.T, jnp.arange(L, dtype=jnp.int32))
    carry, _ = jax.lax.scan(step, carry0, xs, unroll=4)
    return carry[-1]


def forward_score_perlen(dsq, lens, params: FwdParams,
                         nj: float = 1.0) -> jnp.ndarray:
    return _forward_score_perlen_impl(
        jnp.asarray(dsq), jnp.asarray(lens), params.rfv, params.tBM,
        params.tMM, params.tIM, params.tDM, params.tMD, params.tDD,
        params.tMI, params.tII, float(nj), params.Mp, params.U)


# ---------------------------------------------------------------------
# Batched Forward score, [model, batch] layout — the production F3/F4
# gate kernel (ref: impl_sse/fwdback.c p7_ForwardParser).  Same
# structure as the fs3 kernel below with the codon channels collapsed
# to one: model on sublanes, batch on lanes, block one-hot emission
# dots on the MXU, the DD closure folded into one matmul operator,
# and lazy pending-scale rescaling.  The [batch, model] variant above
# (_forward_score_perlen_impl) gathers rfv[resi] per scan step, which
# lowers to a scalar-core dynamic gather on TPU (~100x slower).
# ---------------------------------------------------------------------
@dataclass
class FwdMBParams:
    Mt: int
    M: int
    rfvT: jnp.ndarray    # [Mt, Kp] bf16 match odds (row k = pos k+1)
    tBM: jnp.ndarray     # [Mt]
    tMM: jnp.ndarray
    tIM: jnp.ndarray
    tMI: jnp.ndarray
    tII: jnp.ndarray
    W3: jnp.ndarray      # [Mt, Mt] closure with tMD, shift, and the
                         # next slot's D->M read multiplier pre-folded
    u: jnp.ndarray       # [Mt] xE weights (1 + colsum of unfolded W)


def fwd_mb_params(om: OProfile, sub_multiple: int = 8,
                  to_dev: bool = True) -> FwdMBParams:
    """to_dev=False leaves the arrays numpy (bulk component builders
    — e.g. multi-model packing — avoid per-array device_puts, whose
    dispatch is pathologically slow under a default_device override
    on plugin backends)."""
    M = om.M
    Mt = round_up(M, sub_multiple)
    Kp = om.Kp
    rfvT = np.zeros((Mt, Kp), np.float32)
    rfvT[:M] = om.rfv[:, 1:M + 1].T
    tfv = om.tfv
    conv = jnp.asarray if to_dev else (lambda x: x)

    def pad(v):
        out = np.zeros(Mt, np.float32)
        out[:len(v)] = v
        return conv(out)

    tMD = np.zeros(Mt, np.float32)
    tMD[1:M] = tfv[1:M, C.P_MD]          # slot k = M_k -> D_{k+1}
    UTm = dd_closure_matrix(tfv[1:M, C.P_DD], Mt).T
    W = np.zeros_like(UTm)
    W[:, :-1] = UTm[:, 1:] * tMD[None, 1:]
    u = 1.0 + W.sum(axis=0, dtype=np.float32)
    # pre-fold BOTH the next row's D->M read multiplier AND the k-1
    # read shift into the operator: row t of W3 produces the D-path
    # term lane t adds directly (D_lane[t-1] * tDM into M_{t+1}), so
    # the scan body needs no _shift_down on the stored d3 (the fs3
    # kernel instead stores unshifted and shifts at read)
    tDMv = np.zeros(Mt, np.float32)
    tDMv[:M] = tfv[:M, C.P_DM]           # slot t = D_t -> M_{t+1}
    W3 = np.zeros_like(W)
    W3[1:] = tDMv[1:, None] * W[:-1]
    return FwdMBParams(
        Mt=Mt, M=M, rfvT=conv(rfvT.astype(np.float32)),
        tBM=pad(tfv[:M, C.P_BM]), tMM=pad(tfv[:M, C.P_MM]),
        tIM=pad(tfv[:M, C.P_IM]),
        tMI=pad(tfv[1:M + 1, C.P_MI]), tII=pad(tfv[1:M + 1, C.P_II]),
        W3=conv(W3), u=conv(u))


_FWD_BL = 12


@partial(jax.jit, static_argnames=("Mt", "nj", "ng"))
def _fwd_mb_impl(dsq, lens, rfvT, tBM, tMM, tIM, tMI, tII, W3, u,
                 nj, Mt, ng=1):
    """Forward scores with per-item length models, [model, batch].
    Rows are stored unscaled; a single pending scalar [B] (last
    step's 1/s) is folded in on read (ref rescaling discipline:
    impl_sse/fwdback.c sparse rescale)."""
    B, L = dsq.shape
    dsq = dsq.astype(jnp.int32)   # device-side upcast (int8 transfers)
    BL = _FWD_BL
    Kp = rfvT.shape[1]
    Lpad = ((L + BL - 1) // BL) * BL
    if Lpad != L:
        dsq = jnp.pad(dsq, ((0, 0), (0, Lpad - L)),
                      constant_values=Kp - 1)
    cb = dsq.T.reshape(Lpad // BL, BL * B)
    Lf = lens.astype(F32)
    pmove = (2.0 + nj) / (Lf + 2.0 + nj)
    ploop = 1.0 - pmove
    emove = 0.5 if nj > 0 else 1.0
    eloop = 0.5 if nj > 0 else 0.0
    BF16 = jnp.bfloat16
    rT = rfvT.astype(BF16)
    tBMc, tMMc, tIMc = tBM[:, None], tMM[:, None], tIM[:, None]
    tMIc, tIIc = tMI[:, None], tII[:, None]
    uc = u[None, :]

    def block(carry, cblk):
        m, i_row, d3, pend, xN, xJ, xC, xB, logacc, score, base = carry
        oh = (cblk[None, :] == jnp.arange(Kp)[:, None]).astype(BF16)
        Ea = jnp.dot(rT, oh, preferred_element_type=BF16)
        for j in range(BL):
            i = base + j
            off = j * B
            E = jax.lax.slice(Ea, (0, off), (Mt, off + B)).astype(F32)
            mp = _shift_down(m)
            ip = _shift_down(i_row)
            # d3 is stored pre-shifted with the D->M read multiplier
            sv = (xB[None, :] * tBMc
                  + (mp * tMMc + ip * tIMc + d3) * pend[None, :]) * E
            new_i = (m * tMIc + i_row * tIIc) * pend[None, :]
            new_d3 = _gdot(W3, sv, ng)
            xE = jnp.dot(uc, sv, preferred_element_type=F32)[0]
            xN2 = xN * ploop
            xC2 = xC * ploop + xE * emove
            xJ2 = xJ * ploop + xE * eloop
            xB2 = (xJ2 + xN2) * pmove
            s = jnp.maximum(xE, 1.0)
            sinv = 1.0 / s
            active = (i < lens)
            # rows evolve unmasked (dead lanes are harmless: their
            # score is already latched); scalars are cheap to scale
            m, i_row, d3 = sv, new_i, new_d3
            pend = jnp.where(active, sinv, pend)
            xN = xN2 * sinv
            xJ = xJ2 * sinv
            xC = xC2 * sinv
            xB = xB2 * sinv
            logacc = jnp.where(active, logacc + jnp.log(s), logacc)
            done = (i + 1 == lens)
            score = jnp.where(done, logacc + jnp.log(xC2 * sinv * pmove),
                              score)
        return (m, i_row, d3, pend, xN, xJ, xC, xB, logacc, score,
                base + BL), None

    z = jnp.zeros((Mt, B), F32)
    ones = jnp.ones(B, F32)
    carry0 = (z, z, z, ones, ones, jnp.zeros(B, F32),
              jnp.zeros(B, F32), pmove.astype(F32), jnp.zeros(B, F32),
              jnp.full(B, -jnp.inf, F32), jnp.int32(0))
    carry, _ = jax.lax.scan(block, carry0, cb)
    return carry[-2]


def fwd_mb_score_batch(dsq, lens, params: FwdMBParams,
                       nj: float = 1.0) -> jnp.ndarray:
    """Forward scores (nats) for a padded amino batch (pad 28) with
    per-item length models (ref: p7_oprofile_ReconfigLength per ORF +
    p7_ForwardParser, the F3 gate)."""
    return _fwd_mb_impl(jnp.asarray(dsq), jnp.asarray(lens),
                        params.rfvT, params.tBM, params.tMM,
                        params.tIM, params.tMI, params.tII, params.W3,
                        params.u, float(nj), params.Mt)


# ---------------------------------------------------------------------
# Batched MSV score (the F1 gate; ref: impl_sse/msvfilter.c)
# ---------------------------------------------------------------------
@dataclass
class MSVParams:
    Mp: int
    M: int
    rbv: jnp.ndarray     # [Kp, Mp] int32 byte costs (255 = -inf)
    bias: int
    base: int
    tbm: int
    tec: int
    scale: float


def msv_params(om: OProfile, lane_multiple: int = 128) -> MSVParams:
    M, Kp = om.M, om.Kp
    Mp = round_up(M, lane_multiple)
    rbv = np.full((Kp, Mp), 255, np.int32)
    rbv[:, :M] = om.rbv[:, 1:M + 1].astype(np.int32)
    return MSVParams(Mp=Mp, M=M, rbv=jnp.asarray(rbv), bias=om.bias_b,
                     base=om.base_b, tbm=om.tbm_b, tec=om.tec_b,
                     scale=om.scale_b)


@partial(jax.jit, static_argnames=("Mp", "bias", "base", "tbm", "tec"))
def _msv_score_impl(dsq, lens, rbv, Mp, bias, base, tbm, tec, scale,
                    tjb_per):
    B, L = dsq.shape
    dsq = dsq.astype(jnp.int32)   # device-side upcast (int8 transfers)

    def step(carry, xi):
        dp, xJ, xB, overflow, score = carry
        resi, i = xi
        row = rbv[resi]
        mp = jnp.pad(dp, ((0, 0), (1, 0)))[:, :-1]
        sv = jnp.maximum(mp, xB[:, None])
        sv = jnp.minimum(sv + bias, 255)
        sv = jnp.maximum(sv - row, 0)
        xE = sv.max(axis=1)
        ovf = xE + bias >= 255
        xE = jnp.maximum(0, xE - tec)
        xJ2 = jnp.maximum(xJ, xE)
        xB2 = jnp.maximum(0, jnp.maximum(base, xJ2) - tjb_per - tbm)
        active = (i < lens)
        dp = jnp.where(active[:, None], sv, dp)
        xJ = jnp.where(active, xJ2, xJ)
        xB = jnp.where(active, xB2, xB)
        overflow = jnp.where(active, overflow | ovf, overflow)
        done = (i + 1 == lens)
        fin = ((xJ - tjb_per).astype(F32) - base) / scale - 3.0
        fin = jnp.where(overflow, jnp.inf, fin)
        score = jnp.where(done, fin, score)
        return (dp, xJ, xB, overflow, score), None

    carry0 = (jnp.zeros((B, Mp), jnp.int32),
              jnp.zeros(B, jnp.int32),
              jnp.maximum(0, base - tjb_per - tbm),
              jnp.zeros(B, bool),
              jnp.full(B, -jnp.inf, F32))
    xs = (dsq.T, jnp.arange(L, dtype=jnp.int32))
    carry, _ = jax.lax.scan(step, carry0, xs)
    return carry[-1]


def _unbiased_byteify_np(scale_b, sc):
    cost = -np.round(np.float32(scale_b) * np.float32(sc))
    return np.where(cost > 255.0, 255, cost).astype(np.int32)


def msv_score_batch(dsq, lens, params: MSVParams) -> jnp.ndarray:
    """MSV scores with per-item tjb (length-dependent byte cost,
    ref: p7_oprofile_ReconfigMSVLength)."""
    lens = np.asarray(lens)
    tjb = _unbiased_byteify_np(params.scale,
                               np.log(3.0 / (lens + 3.0)))
    return _msv_score_impl(jnp.asarray(dsq), jnp.asarray(lens),
                           params.rbv, params.Mp, params.bias,
                           params.base, params.tbm, params.tec,
                           params.scale, jnp.asarray(tjb))


# ---------------------------------------------------------------------
# Batched frameshift Forward score (the F4/arbitration gate;
# ref: impl_sse/fwdback_fs.c p7_ForwardParser_Frameshift_3Codons)
# ---------------------------------------------------------------------
@dataclass
class FS3Params:
    """Frameshift 3-codon Forward parameters in [model, batch] layout
    (model positions on sublanes, batch on lanes).  The packed
    338-entry codon index space (ref: hmmer.h:292-303) is split into
    one compact emission table per codon length so each channel's
    one-hot gather matmul contracts over 17/65/257 rows instead of
    the full space."""
    Mt: int                  # M rounded up to the sublane multiple (8)
    M: int
    T2: jnp.ndarray          # [Mt, 17]  2-nt quasicodons + degen
    T3: jnp.ndarray          # [Mt, 65]  3-nt codons + degen
    T4: jnp.ndarray          # [Mt, 257] 4-nt quasicodons + degen
    tBM: jnp.ndarray         # [Mt]
    tMM: jnp.ndarray
    tIM: jnp.ndarray
    tDM: jnp.ndarray
    tMDs: jnp.ndarray        # [Mt], slot k = M_k -> D_{k+1} (pre-shifted)
    tMI: jnp.ndarray
    tII: jnp.ndarray
    UT: jnp.ndarray = None   # [Mt, Mt] transposed DD-closure operator
                             # with tMD, the k-1 shift, and the next
                             # slot's D->M read multiplier pre-folded
    u: jnp.ndarray = None    # [Mt] xE weights: 1 + colsum of the
                             # unfolded closure (xE = u . msv)


def fs3_params(om_fs, sub_multiple: int = 8,
               to_dev: bool = True) -> FS3Params:
    """From an FSOProfile (codon_lengths == 3).  to_dev=False leaves
    arrays numpy (see fwd_mb_params)."""
    M = om_fs.M
    Mt = round_up(M, sub_multiple)
    rfvT = om_fs.rfv[:, 1:M + 1].T.astype(np.float32)   # [M, nrows]
    tfv = om_fs.tfv
    conv = jnp.asarray if to_dev else (lambda x: x)

    def table(origs):
        t = np.zeros((Mt, len(origs)), np.float32)
        t[:M] = rfvT[:, origs]
        return conv(t)

    dig = range(C.MAXNUC)
    orig2 = [C.codon2_fs3(b, a) for a in dig for b in dig] \
        + [C.DEGEN3_QC1]
    orig3 = [C.codon3_fs3(c, b, a) for a in dig for b in dig
             for c in dig] + [C.DEGEN3_C]
    orig4 = [C.codon4_fs3(d, c, b, a) for a in dig for b in dig
             for c in dig for d in dig] + [C.DEGEN3_QC1]

    def pad(v):
        out = np.zeros(Mt, np.float32)
        out[:len(v)] = v
        return conv(out)

    tMD = np.zeros(Mt, np.float32)
    tMD[1:M] = tfv[1:M, C.P_MD]          # slot k = M_k -> D_{k+1}
    # fold the M->D transition AND the k-1 shift into the transposed
    # closure operator: new_d = UT @ (shift_down(msv) * tMD) becomes
    # one matmul W @ msv with W[r, j] = UT[r, j+1] * tMD[j+1]
    # (saves 2 VPU ops per position on the full [Mt, B] state)
    UTm = dd_closure_matrix(tfv[1:M, C.P_DD], Mt).T
    W = np.zeros_like(UTm)
    W[:, :-1] = UTm[:, 1:] * tMD[None, 1:]
    # xE = msv.sum + new_d.sum collapses to one weighted reduction
    # u . msv with u = 1 + colsum(W)
    u = 1.0 + W.sum(axis=0, dtype=np.float32)
    # the stored D ring row is only ever read shifted and multiplied
    # by the D->M transition, so pre-fold that too: row r of the
    # stored new_d carries tDM[r+1]
    tDMv = np.zeros(Mt, np.float32)
    tDMv[:M] = tfv[:M, C.P_DM]
    tDM_next = np.concatenate([tDMv[1:], [0.0]]).astype(np.float32)
    W3 = tDM_next[:, None] * W
    return FS3Params(
        Mt=Mt, M=M, T2=table(orig2), T3=table(orig3), T4=table(orig4),
        tBM=pad(tfv[:M, C.P_BM]), tMM=pad(tfv[:M, C.P_MM]),
        tIM=pad(tfv[:M, C.P_IM]), tDM=pad(tfv[:M, C.P_DM]),
        tMDs=conv(tMD),
        tMI=pad(tfv[1:M + 1, C.P_MI]), tII=pad(tfv[1:M + 1, C.P_II]),
        UT=conv(W3), u=conv(u))


def _shift_down(x):
    """k-1 access in [model, batch] layout: sublane k reads k-1."""
    return jnp.pad(x[:-1], ((1, 0), (0, 0)))


# fs3 scan block length: must be a multiple of 12 (lcm of the 4-row
# MDI ring and 3-slot IVX ring) so ring phases align across blocks;
# larger blocks amortize the scan-carry HBM round trip over more
# positions at the cost of a bigger unrolled body.
_FS3_BL = 12
_ABLATE = "full"


@partial(jax.jit, static_argnames=("Mt", "nj", "emit", "ng"))
def _fs3_score_impl(dsq, lens, T2, T3, T4, tBM, tMM, tIM, tDM, tMDs,
                    tMI, tII, nj, Mt, UT=None, u=None, emit=False,
                    ng=1, goff=None):
    """Frameshift 3-codon Forward parser, batched.

    TPU structure (all DP state in [model, batch] layout — model
    positions on sublanes padded to a multiple of 8, batch on the
    128-lane minor dim, so state size tracks the true M instead of a
    128-padded one):

    - codon emission-table indices for the whole batch are computed up
      front (vectorized);
    - a scan over blocks of 12 positions (lcm of the 4-row MDI and
      3-slot IVX circular buffers) keeps every ring index static, so
      the rings are plain rotated Python variables — no dynamic-slice
      updates;
    - each block does one bf16 one-hot matmul per codon-length
      channel on the MXU to materialize the block's emission rows,
      consumed via static column slices.  The per-channel compact
      tables contract over 17/65/257 rows instead of the packed
      338-entry index space (3.3x fewer MXU FLOPs), and E is stored
      bf16 (bit-identical: a one-hot row selects a single
      bf16-rounded table entry, which is what the MXU produces for
      f32 operands at default precision anyway; the gate tolerance
      is ~0.05 nats);
    - per-position DD closure is one [Mt,Mt]x[Mt,B] matmul
      (dd_closure_matrix);
    - the reference's per-row sparse rescaling
      (impl_sse/fwdback_fs.c) is NOT applied to stored rows; instead
      each ring slot carries a pending-scale scalar [B] that
      accumulates the rescales issued since the slot was written and
      is folded in when the slot is read.  Rescales touch O(B)
      scalars instead of the full [Mt,B] DP state, which removes the
      dominant HBM traffic of the naive formulation (3.5x measured).
    """
    B, L = dsq.shape
    dsq = dsq.astype(jnp.int32)   # device-side upcast (int8 transfers)
    BL = _FS3_BL
    Lpad = ((L + BL - 1) // BL) * BL
    PLACE = C.MAXCODONS3
    if Lpad != L:
        dsq = jnp.pad(dsq, ((0, 0), (0, Lpad - L)), constant_values=17)
    Lf = (lens // 3).astype(F32)
    pmove = (2.0 + nj) / (Lf + 2.0 + nj)
    ploop = 1.0 - pmove
    emove = 0.5 if nj > 0 else 1.0
    eloop = 0.5 if nj > 0 else 0.0

    # --- compact per-channel codon digits, vectorized -------------
    xd = jnp.minimum(dsq, C.MAXNUC).astype(jnp.int32)   # 4 = degenerate
    xm1 = jnp.pad(xd, ((0, 0), (1, 0)), constant_values=C.MAXNUC)[:, :-1]
    xm2 = jnp.pad(xd, ((0, 0), (2, 0)), constant_values=C.MAXNUC)[:, :-2]
    xm3 = jnp.pad(xd, ((0, 0), (3, 0)), constant_values=C.MAXNUC)[:, :-3]
    dg2 = (xd > 3) | (xm1 > 3)
    dg3 = dg2 | (xm2 > 3)
    dg4 = dg3 | (xm3 > 3)
    c2 = jnp.where(dg2, 16, xd * 4 + xm1)
    c3 = jnp.where(dg3, 64, xd * 16 + xm1 * 4 + xm2)
    c4 = jnp.where(dg4, 256, xd * 64 + xm1 * 16 + xm2 * 4 + xm3)
    if goff is not None:
        # lane-packed multi-model batch: each column's codon indices
        # land in its own model's table block (multimodel.py)
        g = goff.astype(jnp.int32)[:, None]
        c2 = c2 + g * 17
        c3 = c3 + g * 65
        c4 = c4 + g * 257
    # block rows: column index = j*B + b
    c2b = c2.T.reshape(Lpad // BL, BL * B)
    c3b = c3.T.reshape(Lpad // BL, BL * B)
    c4b = c4.T.reshape(Lpad // BL, BL * B)

    tBMc, tMMc, tIMc, tDMc = (t[:, None] for t in (tBM, tMM, tIM, tDM))
    tMDc = tMDs[:, None]
    uc = u[:, None] if u is not None else None
    tMIc, tIIc = tMI[:, None], tII[:, None]
    BF16 = jnp.bfloat16
    if emit:
        # specials are consumed by threshold logic downstream
        # (domain decoding): keep emissions f32-exact
        T2b, T3b, T4b = T2, T3, T4
    else:
        T2b, T3b, T4b = T2.astype(BF16), T3.astype(BF16), T4.astype(BF16)

    def block(carry, blk, first=False):
        # `first` statically specializes the initial block; steady-state
        # blocks (pos > 12) drop the warm-up masks entirely
        c2_blk, c3_blk, c4_blk = blk
        (mr, ir, dr, pend, ivx, pivx, xNb, xBb, xJb, xCb, logacc,
         lcomp, score, base) = carry
        mr, ir, dr, ivx = list(mr), list(ir), list(dr), list(ivx)
        pend, pivx = list(pend), list(pivx)
        xNb, xBb, xJb, xCb = list(xNb), list(xBb), list(xJb), list(xCb)

        def emis(tab, cblk):
            n = tab.shape[1]
            if emit:
                oh = (cblk[None, :] == jnp.arange(n)[:, None]) \
                    .astype(F32)
                return jnp.dot(tab, oh,
                               precision=jax.lax.Precision.HIGHEST)
            oh = (cblk[None, :] == jnp.arange(n)[:, None]).astype(BF16)
            return jnp.dot(tab, oh, preferred_element_type=BF16)

        if _ABLATE == "noemis":
            E2a = E3a = E4a = jnp.ones((Mt, c2_blk.shape[0]), BF16)
        else:
            E2a = emis(T2b, c2_blk)          # [Mt, BL*B] bf16
            E3a = emis(T3b, c3_blk)
            E4a = emis(T4b, c4_blk)
        ys = []
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
            E2 = jax.lax.slice(E2a, (0, off), (Mt, off + B)).astype(F32)
            E3 = jax.lax.slice(E3a, (0, off), (Mt, off + B)).astype(F32)
            E4 = jax.lax.slice(E4a, (0, off), (Mt, off + B)).astype(F32)

            sc2 = pend[p2_m4]
            mp = _shift_down(mr[p2_m4])
            ip = _shift_down(ir[p2_m4])
            dp = _shift_down(dr[p2_m4])
            if _ABLATE == "nodd":
                dp = dp * tDMc
            # dp's D->M multiplier is pre-folded into the stored ring
            sv = (xBb[p2_m4] * sc2)[None, :] * tBMc + \
                 (mp * tMMc + ip * tIMc + dp) * sc2[None, :]
            msv = sv * E2
            t3 = (ivx[s3] * pivx[s3][None, :]) * E3
            t4 = (ivx[s4] * pivx[s4][None, :]) * E4
            new_i = (mr[p3_m4] * tMIc + ir[p3_m4] * tIIc) \
                * pend[p3_m4][None, :]
            if first:
                t3 = jnp.where(pos >= 3, t3, 0.0)
                t4 = jnp.where(pos >= 4, t4, 0.0)
                new_i = jnp.where(pos >= 3, new_i, 0.0)
            msv = msv + t3 + t4
            if _ABLATE == "nodd":
                new_d = _shift_down(msv) * tMDc
                xE = msv.sum(axis=0) + new_d.sum(axis=0)
            else:
                # W = closure^T with tMD, the k-1 shift, and the
                # next slot's D->M read multiplier pre-folded
                new_d = _gdot(UT, msv, ng)
                # xE = msv.sum + (unfolded new_d).sum as one weighted
                # reduction, on the MXU (VPU is the bottleneck)
                xE = jnp.dot(uc[:, 0][None, :], msv,
                             preferred_element_type=F32)[0]
            xN2 = xNb[p3_m4] * pend[p3_m4] * ploop
            xJ2 = xJb[p3_m4] * pend[p3_m4] * ploop + xE * eloop
            xC2 = xCb[p3_m4] * pend[p3_m4] * ploop + xE * emove
            if first:
                ge3 = pos >= 3
                xN2 = jnp.where(ge3, xN2, 1.0)
                xJ2 = jnp.where(ge3, xJ2, xE * eloop)
                xC2 = jnp.where(ge3, xC2, xE * emove)
            xB2 = xN2 * pmove + xJ2 * pmove
            if emit:
                ys.append((xB2, xN2, xJ2, xC2, xE, logacc))

            sc = jnp.maximum(xE, 1.0)
            sinv = 1.0 / sc
            active = (i < lens)

            # ring writes are plain variable assignments (static slots);
            # lanes whose sequence has ended keep evolving harmlessly —
            # their score is already latched below and rows are never
            # read across lanes.
            mr[pos_m4], ir[pos_m4], dr[pos_m4] = msv, new_i, new_d
            ivx[s2] = sv
            xNb[pos_m4], xJb[pos_m4] = xN2, xJ2
            xCb[pos_m4], xBb[pos_m4] = xC2, xB2
            for r in range(4):
                upd = sinv if r == pos_m4 else pend[r] * sinv
                pend[r] = jnp.where(active, upd, pend[r])
            for s in range(3):
                upd = sinv if s == s2 else pivx[s] * sinv
                pivx[s] = jnp.where(active, upd, pivx[s])
            # Kahan-compensated accumulation: the emitted per-row
            # log-scale feeds the domain-decoding combine, where raw
            # f32 drift over multi-kb windows is the dominant
            # device-vs-host error term (host cumsums scales in f64)
            ky = jnp.log(sc) - lcomp
            kt = logacc + ky
            lcomp = jnp.where(active, (kt - logacc) - ky, lcomp)
            logacc = jnp.where(active, kt, logacc)
            done = (i + 1 == lens)
            # xC ring: pos_m4 just written (scale sinv); j%4 one step
            # old, (j-1)%4 two steps old — pend folds their scales
            cl = xC2 * sinv + (xCb[j % 4] * pend[j % 4]
                               + xCb[(j - 1) % 4] * pend[(j - 1) % 4]) \
                * ploop
            score = jnp.where(done, logacc + jnp.log(cl * pmove), score)
        out = tuple(jnp.stack([y[q] for y in ys])
                    for q in range(6)) if emit else None
        return (tuple(mr), tuple(ir), tuple(dr), tuple(pend),
                tuple(ivx), tuple(pivx), tuple(xNb), tuple(xBb),
                tuple(xJb), tuple(xCb), logacc, lcomp, score,
                base + BL), out

    zrow = jnp.zeros((Mt, B), F32)
    zb = jnp.zeros(B, F32)
    ones = jnp.ones(B, F32)
    # init (ref: fwdback_fs.c parser init): xN slots {0,1} = 1,
    # xB slots {0,1} = pmove; all pending scales 1
    xNb0 = (ones, ones, zb, zb)
    xBb0 = (pmove.astype(F32), pmove.astype(F32), zb, zb)
    carry0 = ((zrow,) * 4, (zrow,) * 4, (zrow,) * 4, (ones,) * 4,
              (zrow,) * 3, (ones,) * 3, xNb0, xBb0, (zb,) * 4,
              (zb,) * 4, jnp.zeros(B, F32), jnp.zeros(B, F32),
              jnp.full(B, -jnp.inf, F32), jnp.int32(0))
    carry, ys0 = block(carry0, (c2b[0], c3b[0], c4b[0]), first=True)
    carry, ysr = jax.lax.scan(block, carry,
                              (c2b[1:], c3b[1:], c4b[1:]))
    if not emit:
        return carry[12]
    # per-row specials in host row order: rows (pos) 1..Lpad, channel
    # order (xB, xN, xJ, xC, xE, LSf-before-row); score = log Z
    rows = tuple(jnp.concatenate([a[None], b]).reshape(Lpad, B)
                 for a, b in zip(ys0, (y for y in ysr)))
    return carry[12], rows, carry[10]


def fs3_max_lanes(Mt: int) -> int:
    """Largest batch-lane count whose scan carry (15 [Mt, B] f32 ring
    rows) stays VMEM-resident.  Beyond it XLA spills the carry to HBM
    every block and throughput collapses ~2.4x (measured at B=8192,
    Mt=136, round 2)."""
    cap = (4096 * 136) // max(Mt, 8)
    return max(512, (cap // 512) * 512)


def fs3_score_batch(dsq, lens, params: FS3Params,
                    nj: float = 1.0) -> jnp.ndarray:
    """Frameshift 3-codon Forward scores (nats) for a padded batch of
    DNA windows, with per-item amino-unit length models.  Batches
    wider than the VMEM-resident lane cap are scored in sequential
    lane chunks (same executable per chunk shape), so throughput is
    flat in B instead of collapsing past the carry-spill cliff."""
    dsq = jnp.asarray(dsq)
    lens = jnp.asarray(lens)
    B = dsq.shape[0]
    cap = fs3_max_lanes(params.Mt)

    def one(d, ln):
        return _fs3_score_impl(d, ln, params.T2, params.T3, params.T4,
                               params.tBM, params.tMM, params.tIM,
                               params.tDM, params.tMDs, params.tMI,
                               params.tII, float(nj), params.Mt,
                               params.UT, params.u)

    if B <= cap:
        return one(dsq, lens)
    outs = [one(dsq[c:c + cap], lens[c:c + cap])
            for c in range(0, B - B % cap, cap)]
    if B % cap:
        # ragged tail padded up to the cap so at most two executables
        # exist per L bucket (full-cap and padded-tail share one)
        pad = cap - B % cap
        outs.append(one(jnp.pad(dsq[B - B % cap:], ((0, pad), (0, 0)),
                                constant_values=17),
                        jnp.pad(lens[B - B % cap:], (0, pad)))[:B % cap])
    return jnp.concatenate(outs)


# ---------------------------------------------------------------------
# Fused Forward + Backward parser + domain decoding, [model, batch].
#
# What domain definition actually consumes from the two parser passes
# is three [L+1] arrays per ORF — btot/etot/mocc (ref: p7_domaindef.c
# p7_domaindef_ByPosteriorHeuristics_BATH :499 reads only the
# p7_DomainDecoding output; the per-envelope rescore re-runs its own
# full DP).  So the device equivalent of the reference's
# p7_BackwardParser (impl_sse/fwdback.c backward_engine) +
# p7_DomainDecoding (decoding.c) is one fused kernel: a forward scan
# that stores per-row specials, a backward scan over the reversed
# batch that combines them into posterior increments on the fly, and
# a cumsum.  Scale discipline is log-accumulator based (each pass
# rescales rows by its own per-row factor and carries a cumulative
# log), so the combine is exp(logw - logZ)-weighted and immune to
# the reference's borrowed-scale underflow bookkeeping.
# ---------------------------------------------------------------------
@dataclass
class DomDecParams:
    fwd: FwdMBParams
    # backward-only vectors, [Mt], lane t = model position k = t+1
    tIM_next: jnp.ndarray    # tfv[k, P_IM]   (I_k -> M_{k+1})
    tMM_next: jnp.ndarray    # tfv[k, P_MM]
    tDM_next: jnp.ndarray    # tfv[k, P_DM]
    vMD: jnp.ndarray         # tfv[t, P_MD] on the SOURCE lane of the
                             # shift-up (new_m[k] += new_d[k+1]*tMD[k+1])
    UB: jnp.ndarray          # [Mt, Mt] suffix DD closure (upper tri)
    mask: jnp.ndarray        # [Mt] 1.0 for real model lanes


def domdec_params(om: OProfile, sub_multiple: int = 8) -> DomDecParams:
    fwd = fwd_mb_params(om, sub_multiple)
    M, Mt = fwd.M, fwd.Mt
    tfv = om.tfv

    def padv(v, lo):
        out = np.zeros(Mt, np.float32)
        out[lo:lo + len(v)] = v
        return jnp.asarray(out)

    mask = np.zeros(Mt, np.float32)
    mask[:M] = 1.0
    # suffix closure: D(k) = pre(k) + tDD[k+1]*D(k+1) has matrix
    # UB[t, s] = prod_{r=t+1..s} tfv[r, P_DD] (s >= t), which is the
    # same matrix dd_closure_matrix builds for the forward direction —
    # applied from the left instead of the right.
    UB = dd_closure_matrix(tfv[1:M, C.P_DD], Mt)
    return DomDecParams(
        fwd=fwd,
        tIM_next=padv(tfv[1:M, C.P_IM], 0),
        tMM_next=padv(tfv[1:M, C.P_MM], 0),
        tDM_next=padv(tfv[1:M, C.P_DM], 0),
        vMD=padv(tfv[1:M, C.P_MD], 1),
        UB=jnp.asarray(UB), mask=jnp.asarray(mask))


_DD_BL = 8
# device forward logZ - log(total fwd scale) below this bound means
# the host backward (borrowed-scale stored values, f32) is at or near
# its xN underflow RangeError (pipeline skips the ORF); send the item
# to the host path so that contract is decided by the host kernel
_DD_UNDERFLOW_LOG = -85.0


@partial(jax.jit, static_argnames=("Mt", "nj", "ng"))
def _domdec_mb_impl(dsq, lens, rfvT, tBM, tMM, tIM, tMI, tII, W3, u,
                    tIM_n, tMM_n, tDM_n, vMD, UB, mask, nj, Mt, ng=1):
    """Returns (btot, etot, mocc, ok): [B, Lpad+1] x3 posteriors in
    the p7_DomainDecoding convention and a per-item validity flag
    (False -> caller must use the host kernels)."""
    B, L = dsq.shape
    dsq = dsq.astype(jnp.int32)   # device-side upcast (int8 transfers)
    BL = _DD_BL
    Kp = rfvT.shape[1]
    Lpad = ((L + BL - 1) // BL) * BL
    if Lpad != L:
        dsq = jnp.pad(dsq, ((0, 0), (0, Lpad - L)),
                      constant_values=Kp - 1)
    Lf = lens.astype(F32)
    pmove = (2.0 + nj) / (Lf + 2.0 + nj)
    ploop = 1.0 - pmove
    emove = 0.5 if nj > 0 else 1.0
    eloop = 0.5 if nj > 0 else 0.0
    # f32-exact one-hot emission dots: HIGHEST keeps the selected
    # table entry at full f32 precision (posterior comparisons feed
    # threshold logic; bf16's 8 mantissa bits are too coarse here)
    HI = jax.lax.Precision.HIGHEST
    tBMc, tMMc, tIMc = tBM[:, None], tMM[:, None], tIM[:, None]
    tMIc, tIIc = tMI[:, None], tII[:, None]
    uc = u[None, :]
    tIMnc, tMMnc, tDMnc = tIM_n[:, None], tMM_n[:, None], tDM_n[:, None]
    vMDc, maskc = vMD[:, None], mask[:, None]
    tBMr = tBM[None, :]

    cb = dsq.T.reshape(Lpad // BL, BL * B)

    # ---- forward scan: store per-row specials --------------------
    def fstep(carry, cblk):
        m, i_row, d3, xN, xJ, xC, xB, lsf, score, base = carry
        oh = (cblk[None, :] == jnp.arange(Kp)[:, None]).astype(F32)
        Ea = jnp.dot(rfvT, oh, precision=HI)
        ys = []
        for j in range(BL):
            i = base + j
            off = j * B
            E = jax.lax.slice(Ea, (0, off), (Mt, off + B))
            mp = _shift_down(m)
            ip = _shift_down(i_row)
            sv = (xB[None, :] * tBMc + (mp * tMMc + ip * tIMc + d3)) * E
            new_i = m * tMIc + i_row * tIIc
            new_d3 = _gdot(W3, sv, ng)
            xE = jnp.dot(uc, sv, preferred_element_type=F32)[0]
            xN2 = xN * ploop
            xC2 = xC * ploop + xE * emove
            xJ2 = xJ * ploop + xE * eloop
            xB2 = (xJ2 + xN2) * pmove
            active = (i < lens)
            # sparse rescale, same cadence as the host kernel
            # (fwdback.py forward: only when xE > 1e4) — multiplying
            # by an exact 1.0 between rescales adds no rounding, so
            # the device/host value streams stay within ~1e-6
            s = jnp.where(active & (xE > 1.0e4), xE, 1.0)
            sinv = 1.0 / s
            m, i_row, d3 = sv * sinv, new_i * sinv, new_d3 * sinv
            xN, xJ, xC, xB = (xN2 * sinv, xJ2 * sinv, xC2 * sinv,
                              xB2 * sinv)
            xEs = xE * sinv
            lsf = lsf + jnp.log(s)
            done = (i + 1 == lens)
            score = jnp.where(done, lsf + jnp.log(xC * pmove), score)
            ys.append((xB, xN, xJ, xC, xEs, lsf))
        out = tuple(jnp.stack([y[q] for y in ys]) for q in range(6))
        return (m, i_row, d3, xN, xJ, xC, xB, lsf, score,
                base + BL), out

    z = jnp.zeros((Mt, B), F32)
    zb = jnp.zeros(B, F32)
    ones = jnp.ones(B, F32)
    carry0 = (z, z, z, ones, zb, zb, pmove.astype(F32), zb,
              jnp.full(B, -jnp.inf, F32), jnp.int32(0))
    fcarry, fys = jax.lax.scan(fstep, carry0, cb)
    logZ = fcarry[-2]
    # [Lpad+1, B] per special, row 0 = init (xB=pmove, xN=1, rest 0)
    row0 = (pmove.astype(F32), ones, zb, zb, zb, zb)
    fr = tuple(jnp.concatenate([r0[None, :], y.reshape(Lpad, B)])
               for r0, y in zip(row0, fys))
    fxB, fxN, fxJ, fxC, fxE, fLS = fr
    lsf_total = jnp.take_along_axis(fLS, lens[None, :], axis=0)[0]

    # ---- reverse the batch and gather f-specials per bwd step ----
    ar = jnp.arange(Lpad, dtype=jnp.int32)
    # residue consumed at bwd step q (0-based) is dsq[lens-1-q]
    ridx = jnp.clip(lens[None, :] - 1 - ar[:, None], 0, Lpad - 1)
    rdsq = jnp.take_along_axis(dsq.T, ridx, axis=0)      # [Lpad, B]
    idx_j = jnp.clip(lens[None, :] - ar[:, None], 0, Lpad)
    idx_jm1 = jnp.clip(lens[None, :] - 1 - ar[:, None], 0, Lpad)
    gj = tuple(jnp.take_along_axis(a, idx_j, axis=0) for a in fr)
    gm1 = tuple(jnp.take_along_axis(a, idx_jm1, axis=0) for a in fr)
    rcb = rdsq.reshape(Lpad // BL, BL, B)
    gjb = tuple(a.reshape(Lpad // BL, BL, B) for a in gj)
    gmb = tuple(a.reshape(Lpad // BL, BL, B) for a in gm1)

    # ---- backward scan with fused decoding combine ----------------
    def bstep(carry, xs):
        mc, ic, dc, xNb, xJb, xCb, xEb, lsb, base = carry
        rblk, gjx, gmx = xs
        oh = (rblk.reshape(BL * B)[None, :]
              == jnp.arange(Kp)[:, None]).astype(F32)
        Ea = jnp.dot(rfvT, oh, precision=HI)
        ys = []
        for j in range(BL):
            q = base + j                     # row being computed: lens-1-q
            off = j * B
            E = jax.lax.slice(Ea, (0, off), (Mt, off + B))
            GJ = tuple(g[j] for g in gjx)    # f at row lens-q
            GM = tuple(g[j] for g in gmx)    # f at row lens-q-1
            active = (q < lens)
            mstar = mc * E
            xBn = jnp.dot(tBMr, mstar, preferred_element_type=F32)[0]
            # decoding emissions for output row jrow = lens - q, using
            # the carry (backward row jrow) and this step's new xB
            # (backward row jrow-1):
            term_e = GJ[4] * xEb
            logw_e = GJ[5] + lsb
            njcp = (GM[1] * xNb + GM[2] * xJb + GM[3] * xCb) * ploop
            logw_m = GM[5] + lsb
            term_b = GM[0] * xBn
            logw_b = GM[5] + lsb
            ms1 = jnp.pad(mstar[1:], ((0, 1), (0, 0)))
            new_i = ic * tIIc + ms1 * tIMnc
            nm = ic * tMIc + ms1 * tMMnc
            xCn = xCb * ploop
            xJn = xBn * pmove + xJb * ploop
            xNn = xBn * pmove + xNb * ploop
            xEn = xCn * emove + xJn * eloop
            nd_pre = (ms1 * tDMnc + xEn[None, :]) * maskc
            new_d = _gdot(UB, nd_pre, ng)
            new_m = (nm + xEn[None, :]) * maskc \
                + jnp.pad((new_d * vMDc)[1:], ((0, 1), (0, 0)))
            # sparse rescale: guard overflow AND suffix underflow
            sb = jnp.where(active & (xBn > 0)
                           & ((xBn > 1.0e4) | (xBn < 1.0e-4)),
                           xBn, 1.0)
            sbi = 1.0 / sb
            mc, ic, dc = new_m * sbi, new_i * sbi, new_d * sbi
            xNb, xJb, xCb, xEb = (xNn * sbi, xJn * sbi, xCn * sbi,
                                  xEn * sbi)
            lsb = lsb + jnp.log(sb)
            ys.append((term_e, term_b, njcp, logw_e, logw_b, logw_m))
        out = tuple(jnp.stack([y[q] for y in ys]) for q in range(6))
        return (mc, ic, dc, xNb, xJb, xCb, xEb, lsb, base + BL), out

    # init row L (ref backward_engine init): xC = pmove, xE = xC*emove,
    # mc = dc = xE then suffix DD closure + M->D read
    xC_L = pmove.astype(F32)
    xE_L = xC_L * emove
    d0 = _gdot(UB, jnp.broadcast_to(xE_L[None, :], (Mt, B)) * maskc,
               ng)
    m0 = jnp.broadcast_to(xE_L[None, :], (Mt, B)) * maskc \
        + jnp.pad((d0 * vMDc)[1:], ((0, 1), (0, 0)))
    bcarry0 = (m0, jnp.zeros((Mt, B), F32), d0, zb, zb, xC_L, xE_L,
               zb, jnp.int32(0))
    _, bys = jax.lax.scan(bstep, bcarry0, (rcb, gjb, gmb))
    term_e, term_b, njcp, logw_e, logw_b, logw_m = (
        y.reshape(Lpad, B) for y in bys)

    # ---- q-order -> row-order remap + normalized combine ----------
    # output row jrow (1..Lpad) was emitted at step q = lens - jrow
    jrow = ar[:, None] + 1                                 # [Lpad, B]
    qidx = jnp.clip(lens[None, :] - jrow, 0, Lpad - 1)
    valid = (jrow <= lens[None, :]).astype(F32)

    def at_row(a, lw):
        v = jnp.take_along_axis(a, qidx, axis=0)
        w = jnp.take_along_axis(lw, qidx, axis=0)
        return v * jnp.exp(w - logZ[None, :]) * valid

    inc_e = at_row(term_e, logw_e)
    inc_b = at_row(term_b, logw_b)
    njr = at_row(njcp, logw_m)
    z1 = jnp.zeros((1, B), F32)
    btot = jnp.concatenate([z1, jnp.cumsum(inc_b, axis=0)]).T
    etot = jnp.concatenate([z1, jnp.cumsum(inc_e, axis=0)]).T
    mocc = jnp.concatenate([z1, (1.0 - njr) * valid]).T
    ok = (jnp.isfinite(logZ)
          & (logZ - lsf_total > _DD_UNDERFLOW_LOG)
          & jnp.isfinite(btot).all(axis=1)
          & jnp.isfinite(etot).all(axis=1)
          & jnp.isfinite(mocc).all(axis=1))
    return btot, etot, mocc, ok


def domdec_mb_batch(dsq, lens, params: DomDecParams, nj: float = 1.0):
    """Batched device (btot, etot, mocc, ok) for F3-surviving ORFs —
    the fused equivalent of p7_BackwardParser + p7_DomainDecoding
    (ref: impl_sse/fwdback.c backward_engine, decoding.c
    p7_DomainDecoding)."""
    f = params.fwd
    return _domdec_mb_impl(
        jnp.asarray(dsq), jnp.asarray(lens), f.rfvT, f.tBM, f.tMM,
        f.tIM, f.tMI, f.tII, f.W3, f.u, params.tIM_next,
        params.tMM_next, params.tDM_next, params.vMD, params.UB,
        params.mask, float(nj), f.Mt)


# ---------------------------------------------------------------------
# Fused fs3 Forward + Backward parser + frameshift domain decoding.
#
# The --fs branch's domain definition consumes only the
# p7_DomainDecoding_Frameshift posteriors (ref: p7_domaindef.c
# ByPosteriorHeuristics_Frameshift_BATH :300 3-frame triggers;
# decoding_fs.c :242), so as with the standard pipeline the device
# equivalent of p7_BackwardParser_Frameshift_3Codons
# (ref: impl_sse/fwdback_fs.c :565) is a fused kernel: the fs3 gate
# scan re-run with per-row specials emission, a reversed backward
# scan with 4-slot rings and per-slot pending scales, and the
# stride-3 log-accumulator combine.
# ---------------------------------------------------------------------
@dataclass
class FS3DomDecParams:
    fs3: FS3Params
    tIM_next: jnp.ndarray    # [Mt] tfv[k, P_IM] on lane k-1
    tMM_next: jnp.ndarray
    tDM_next: jnp.ndarray
    vMD: jnp.ndarray         # tfv[t, P_MD] on the shift-up source lane
    UB: jnp.ndarray          # [Mt, Mt] suffix DD closure
    mask: jnp.ndarray


def fs3_domdec_params(om_fs, sub_multiple: int = 8) -> FS3DomDecParams:
    fs3 = fs3_params(om_fs, sub_multiple)
    M, Mt = fs3.M, fs3.Mt
    tfv = om_fs.tfv

    def padv(v, lo):
        out = np.zeros(Mt, np.float32)
        out[lo:lo + len(v)] = v
        return jnp.asarray(out)

    mask = np.zeros(Mt, np.float32)
    mask[:M] = 1.0
    UB = dd_closure_matrix(tfv[1:M, C.P_DD], Mt)
    return FS3DomDecParams(
        fs3=fs3,
        tIM_next=padv(tfv[1:M, C.P_IM], 0),
        tMM_next=padv(tfv[1:M, C.P_MM], 0),
        tDM_next=padv(tfv[1:M, C.P_DM], 0),
        vMD=padv(tfv[1:M, C.P_MD], 1),
        UB=jnp.asarray(UB), mask=jnp.asarray(mask))


@partial(jax.jit, static_argnames=("Mt", "nj", "ng"))
def _fs3_domdec_impl(dsq, lens, T2, T3, T4, tBM, tMM, tIM, tDM, tMDs,
                     tMI, tII, UT, u, tIM_n, tMM_n, tDM_n, vMD, UB,
                     mask, dec_loop, nj, Mt, ng=1, goff=None):
    """Returns (btot, etot, mocc, ok): [B, Lpad+1] posteriors in the
    p7_DomainDecoding_Frameshift convention + per-item validity.

    <dec_loop>: the N/J/C LOOP probability of the profile the host
    passes to p7_DomainDecoding_Frameshift (in production the fs5
    model pinned at multihit(100), NOT the fs3 parser's per-window
    length model) — used only in the njcp/mocc combine."""
    B, L = dsq.shape
    dsq = dsq.astype(jnp.int32)   # device-side upcast (int8 transfers)
    BL = _FS3_BL
    # one extra block so the backward scan covers row 0 (the host
    # parser's termination rows; xJ/xC are zeroed there post-hoc)
    Lpad = ((L + 1 + BL - 1) // BL) * BL
    dsq = jnp.pad(dsq, ((0, 0), (0, Lpad - L)), constant_values=17)
    HI = jax.lax.Precision.HIGHEST
    Lf = (lens // 3).astype(F32)
    pmove = (2.0 + nj) / (Lf + 2.0 + nj)
    ploop = 1.0 - pmove
    emove = 0.5 if nj > 0 else 1.0
    eloop = 0.5 if nj > 0 else 0.0

    # ---- forward pass: the gate scan with specials emission -------
    logZ, frows, lsf_fin = _fs3_score_impl(
        dsq, lens, T2, T3, T4, tBM, tMM, tIM, tDM, tMDs, tMI, tII,
        nj, Mt, UT, u, emit=True, ng=ng, goff=goff)
    # [Lpad+1, B] per channel, row index = host row (0..Lpad)
    row0 = (pmove.astype(F32), jnp.ones(B, F32), jnp.zeros(B, F32),
            jnp.zeros(B, F32), jnp.zeros(B, F32), jnp.zeros(B, F32))
    fr = tuple(jnp.concatenate([r0[None, :], y])
               for r0, y in zip(row0, frows))
    fxB, fxN, fxJ, fxC, fxE, fLS = fr

    # ---- reversed codon-channel indices ----------------------------
    xd = jnp.minimum(dsq, C.MAXNUC).astype(jnp.int32)
    xm1 = jnp.pad(xd, ((0, 0), (1, 0)), constant_values=C.MAXNUC)[:, :-1]
    xm2 = jnp.pad(xd, ((0, 0), (2, 0)), constant_values=C.MAXNUC)[:, :-2]
    xm3 = jnp.pad(xd, ((0, 0), (3, 0)), constant_values=C.MAXNUC)[:, :-3]
    dg2 = (xd > 3) | (xm1 > 3)
    dg3 = dg2 | (xm2 > 3)
    dg4 = dg3 | (xm3 > 3)
    c2 = jnp.where(dg2, 16, xd * 4 + xm1).T              # [Lpad, B]
    c3 = jnp.where(dg3, 64, xd * 16 + xm1 * 4 + xm2).T
    c4 = jnp.where(dg4, 256, xd * 64 + xm1 * 16 + xm2 * 4 + xm3).T
    if goff is not None:
        g = goff.astype(jnp.int32)[None, :]
        c2 = c2 + g * 17
        c3 = c3 + g * 65
        c4 = c4 + g * 257
    ar = jnp.arange(Lpad, dtype=jnp.int32)
    # backward step q (0-based) computes row i = lens - q; the codon
    # of length c contributing to ivxb(i) ends at j = i + c, i.e.
    # column j-1 = lens - q + c - 1 of the c-channel index array
    def rev_c(carr, c):
        idx = jnp.clip(lens[None, :] - ar[:, None] + (c - 1),
                       0, Lpad - 1)
        return jnp.take_along_axis(carr, idx, axis=0)
    rc2 = rev_c(c2, 2).reshape(Lpad // BL, BL, B)
    rc3 = rev_c(c3, 3).reshape(Lpad // BL, BL, B)
    rc4 = rev_c(c4, 4).reshape(Lpad // BL, BL, B)

    tBMr = tBM[None, :]
    tMIc, tIIc = tMI[:, None], tII[:, None]
    tIMnc, tMMnc, tDMnc = tIM_n[:, None], tMM_n[:, None], tDM_n[:, None]
    vMDc, maskc = vMD[:, None], mask[:, None]
    cmove = pmove.astype(F32)

    # ---- backward scan ---------------------------------------------
    # rings of 4: M rows and I rows for i+1..i+4 (M read at i+2..i+4,
    # I and specials read at i+3); per-slot pending scales
    def bstep(carry, xs):
        (mr, irr, pend, xNb, xJb, xCb, spend, lsb, bcomp,
         base) = carry
        rb2, rb3, rb4 = xs
        mr, irr, pend = list(mr), list(irr), list(pend)
        xNb, xJb, xCb, spend = (list(xNb), list(xJb), list(xCb),
                                list(spend))

        def emis(tab, cb):
            n = tab.shape[1]
            oh = (cb[None, :] == jnp.arange(n)[:, None]).astype(F32)
            return jnp.dot(tab, oh, precision=HI)

        E2a = emis(T2, rb2.reshape(BL * B))
        E3a = emis(T3, rb3.reshape(BL * B))
        E4a = emis(T4, rb4.reshape(BL * B))
        ys = []
        for j in range(BL):
            q = base + j           # row computed: i = lens - q + 1
            off = j * B
            E2 = jax.lax.slice(E2a, (0, off), (Mt, off + B))
            E3 = jax.lax.slice(E3a, (0, off), (Mt, off + B))
            E4 = jax.lax.slice(E4a, (0, off), (Mt, off + B))
            # row i+c was written at step q-c, which lives in slot
            # (q-c-1) % 4 = (j-c) % 4 (base = 1 mod 4, slot = j % 4)
            m_i2 = mr[(j - 2) % 4] * pend[(j - 2) % 4][None, :]
            m_i3 = mr[(j - 3) % 4] * pend[(j - 3) % 4][None, :]
            m_i4 = mr[j % 4] * pend[j % 4][None, :]
            ivxb = m_i2 * E2 + m_i3 * E3 + m_i4 * E4
            xBn = jnp.dot(tBMr, ivxb, preferred_element_type=F32)[0]
            i3 = (j - 3) % 4
            sp3 = spend[i3]
            xCn = jnp.where(q == 1, cmove,
                            jnp.where(q <= 3, ploop * cmove,
                                      ploop * (xCb[i3] * sp3)))
            xJn = xBn * pmove + ploop * (xJb[i3] * sp3)
            xNn = xBn * pmove + ploop * (xNb[i3] * sp3)
            xEn = xCn * emove + xJn * eloop
            iv1 = jnp.pad(ivxb[1:], ((0, 1), (0, 0)))
            bI3 = irr[i3] * pend[i3][None, :]
            new_i = tIMnc * iv1 + tIIc * bI3
            nm = tMMnc * iv1 + tMIc * bI3
            pre_d = (tDMnc * iv1 + xEn[None, :]) * maskc
            new_d = _gdot(UB, pre_d, ng)
            new_m = (nm + xEn[None, :]) * maskc \
                + jnp.pad((new_d * vMDc)[1:], ((0, 1), (0, 0)))
            # q = lens + 1 is the host parser's i = 0
            # termination row (xB/xN only; xJ/xC zeroed in the
            # combine, where backward rows < 3 are never read)
            active = (q <= lens + 1)
            ys.append((xBn, xNn, xJn, xCn, xEn, lsb))
            # sparse own rescale
            sb = jnp.where(active & (xBn > 0)
                           & ((xBn > 1.0e4) | (xBn < 1.0e-4)),
                           xBn, 1.0)
            sbi = 1.0 / sb
            slot = j % 4
            mr[slot] = new_m
            irr[slot] = new_i
            for r in range(4):
                upd = sbi if r == slot else pend[r] * sbi
                pend[r] = jnp.where(active, upd, pend[r])
            xNb[slot], xJb[slot], xCb[slot] = xNn, xJn, xCn
            for r in range(4):
                upd = sbi if r == slot else spend[r] * sbi
                spend[r] = jnp.where(active, upd, spend[r])
            # Kahan-compensated (see the forward scan)
            ky = jnp.log(sb) - bcomp
            kt = lsb + ky
            bcomp = jnp.where(active, (kt - lsb) - ky, bcomp)
            lsb = jnp.where(active, kt, lsb)
        out = tuple(jnp.stack([y[t] for y in ys]) for t in range(6))
        return (tuple(mr), tuple(irr), tuple(pend), tuple(xNb),
                tuple(xJb), tuple(xCb), tuple(spend), lsb, bcomp,
                base + BL), out

    zrow = jnp.zeros((Mt, B), F32)
    zb = jnp.zeros(B, F32)
    ones = jnp.ones(B, F32)
    bcarry0 = ((zrow,) * 4, (zrow,) * 4, (ones,) * 4, (zb,) * 4,
               (zb,) * 4, (zb,) * 4, (ones,) * 4, zb, zb,
               jnp.int32(1))
    _, bys = jax.lax.scan(bstep, bcarry0, (rc2, rc3, rc4))
    bxB, bxN, bxJ, bxC, bxE, bLS = (y.reshape(Lpad, B) for y in bys)

    # ---- q-order -> row-order remap --------------------------------
    # row jrow (0..Lpad) was emitted at step q = lens - jrow + 1,
    # i.e. 0-based scan index lens - jrow
    jrow = jnp.arange(Lpad + 1, dtype=jnp.int32)[:, None]
    qidx = jnp.clip(lens[None, :] - jrow, 0, Lpad - 1)
    valid = (jrow <= lens[None, :]).astype(F32)

    def at_row(a):
        return jnp.take_along_axis(a, qidx, axis=0) * valid

    BxB, BxN, BxJ, BxC, BxE, BLS = (at_row(a) for a in
                                    (bxB, bxN, bxJ, bxC, bxE, bLS))
    # host leaves xJ/xC at the termination rows 0..2 zero
    r3 = (jrow >= 3).astype(F32)
    BxJ = BxJ * r3
    BxC = BxC * r3

    # ---- stride-3 combine (ref: decoding_fs.c formulas) ------------
    lz = logZ[None, :]

    def w(lsf_at, lsb_at):
        return jnp.exp(lsf_at + lsb_at - lz)

    # increments at row i (i >= 3)
    sh3 = lambda a: jnp.concatenate([jnp.zeros((3, B), a.dtype),
                                     a[:-3]])  # value at i-3 for i>=3
    fxB3, fxN3, fxJ3, fxC3, fLS3 = (sh3(a) for a in
                                    (fxB, fxN, fxJ, fxC, fLS))
    BxB3, BxN3, BxJ3, BxC3, BLS3 = (sh3(a) for a in
                                    (BxB, BxN, BxJ, BxC, BLS))
    inc_b = fxB3 * BxB3 * w(fLS3, BLS3)
    inc_e = fxE * BxE * w(fLS, BLS)
    # njcp over frames (i-3,i), (i-2,i+1), (i-1,i+2); hi > L dropped
    njcp = jnp.zeros((Lpad + 1, B), F32)
    for d in range(3):
        sh = 3 - d

        def shl(a, s=sh):
            return jnp.concatenate([jnp.zeros((s, B), a.dtype),
                                    a[:Lpad + 1 - s]])

        def shr(a, s=d):
            if s == 0:
                return a
            return jnp.concatenate([a[s:],
                                    jnp.zeros((s, B), a.dtype)])
        hi_ok = ((jrow + d) <= lens[None, :]).astype(F32)
        ww = w(shl(fLS), shr(BLS)) * hi_ok
        njcp = njcp + (shl(fxN) * shr(BxN)
                       + shl(fxJ) * shr(BxJ)
                       + shl(fxC) * shr(BxC)) * dec_loop[None, :] * ww
    def cum3(inc):
        # btot[i] = btot[i-3] + inc[i]: three interleaved cumsums
        n3 = -((Lpad + 1) // -3) * 3
        a = jnp.concatenate([inc, jnp.zeros((n3 - (Lpad + 1), B),
                                            F32)])
        a = a.reshape(n3 // 3, 3, B)
        return jnp.cumsum(a, axis=0).reshape(n3, B)[:Lpad + 1]

    mask3 = (jrow >= 3).astype(F32) * valid
    btot = cum3(inc_b * mask3).T
    etot = cum3(inc_e * mask3).T
    mocc = ((1.0 - njcp) * mask3).T
    ok = (jnp.isfinite(logZ)
          & (logZ - lsf_fin > _DD_UNDERFLOW_LOG)
          & jnp.isfinite(btot).all(axis=1)
          & jnp.isfinite(etot).all(axis=1)
          & jnp.isfinite(mocc).all(axis=1))
    return btot, etot, mocc, ok


def fs3_domdec_mb_batch(dsq, lens, params: FS3DomDecParams,
                        dec_loop: float, nj: float = 1.0):
    """Batched device (btot, etot, mocc, ok) for fs-branch DNA
    windows — the fused equivalent of
    p7_BackwardParser_Frameshift_3Codons + p7_DomainDecoding_Frameshift
    (ref: impl_sse/fwdback_fs.c :565, decoding_fs.c :242).
    <dec_loop>: xf[N, LOOP] of the profile the host decoder uses."""
    f = params.fs3
    return _fs3_domdec_impl(
        jnp.asarray(dsq), jnp.asarray(lens), f.T2, f.T3, f.T4, f.tBM,
        f.tMM, f.tIM, f.tDM, f.tMDs, f.tMI, f.tII, f.UT, f.u,
        params.tIM_next, params.tMM_next, params.tDM_next, params.vMD,
        params.UB, params.mask,
        jnp.broadcast_to(jnp.asarray(dec_loop, jnp.float32),
                         jnp.asarray(lens).shape), float(nj), f.Mt)
