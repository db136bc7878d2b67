"""Microbenchmarks for the fs3 Pallas kernel redesign (round 3).

Measures, on the real chip, the primitives the frameshift-Forward
kernel is built from, so the kernel design is driven by measured
numbers instead of datasheet guesses:

  1. elementwise f32 chain throughput on [Mt, Bt] tiles (VPU
     reg-ops/cycle),
  2. one-hot build + MXU dot cost per emission channel,
  3. whether Mosaic overlaps an independent MXU dot with a VPU chain,
  4. the cost of [1, Bt] scalar-row ops (ring bookkeeping).

All patterns are data-dependent and non-affine (v*v+c style, fresh
indices per iteration) so Mosaic/XLA cannot constant-fold or hoist
the work — the first cut of this file used affine chains and cyclic
indices and produced impossible numbers (measured "both" < "chain
alone"; one-hot dot below its own MXU lower bound).

Usage: python scripts/ubench_vpu.py [case ...]
Cases: chain onehot overlap scalars all
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

F32 = jnp.float32
BF16 = jnp.bfloat16
Mt, Bt = 136, 1024
REPS = 512                      # inner loop per kernel call
REGS = -(-Mt // 8) * (Bt // 128)


def _time(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def bench_chain(nops):
    """nops non-foldable elementwise f32 ops (v = v*v + c) on one
    [Mt,Bt] tile, REPS times.  v in (0,phi) stays bounded."""
    def kernel(x_ref, o_ref, acc):
        def body(i, _):
            v = acc[:, :]
            for _ in range(nops):
                v = v * v + 0.25
            acc[:, :] = v * 0.5
            return 0
        acc[:, :] = x_ref[:, :]
        jax.lax.fori_loop(0, REPS, body, 0)
        o_ref[:, :] = acc[:, :]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Mt, Bt), F32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((Mt, Bt), F32)],
        )(x)

    x = jnp.full((Mt, Bt), 0.3, F32)
    dt = _time(run, x)
    per_op = dt / (REPS * (nops + 1))
    print(f"chain nops={nops}: {per_op*1e9:.1f} ns/[Mt,Bt]-op "
          f"({REGS/(per_op*0.94e9):.2f} regs/cycle @0.94GHz)")


def bench_onehot(n):
    """One-hot [n,Bt] build (iota cmp + cast) + [Mt,n]@[n,Bt] bf16
    dot; fresh index row per iteration (no hoisting possible)."""
    def kernel(t_ref, idx_ref, o_ref, acc):
        row = jax.lax.broadcasted_iota(jnp.int32, (n, Bt), 0)

        def body(i, _):
            idx = idx_ref[pl.ds(i, 1), :]
            oh = (idx == row).astype(BF16)
            e = jnp.dot(t_ref[:, :], oh, preferred_element_type=F32)
            acc[:, :] = acc[:, :] + e
            return 0
        acc[:, :] = jnp.zeros((Mt, Bt), F32)
        jax.lax.fori_loop(0, REPS, body, 0)
        o_ref[:, :] = acc[:, :]

    @jax.jit
    def run(t, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Mt, Bt), F32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((Mt, Bt), F32)],
        )(t, idx)

    t = jnp.ones((Mt, n), BF16)
    idx = jnp.asarray(np.random.randint(0, n, (REPS, Bt)), jnp.int32)
    dt = _time(run, t, idx)
    mxu = 2 * n * Mt * Bt / 197e12
    print(f"onehot+dot n={n}: {dt/REPS*1e9:.0f} ns/pos "
          f"(MXU-only lower bound {mxu*1e9:.0f} ns)")


def bench_overlap():
    """A non-foldable VPU chain plus an INDEPENDENT [2Mt,2Mt]@[2Mt,Bt]
    bf16 dot per iteration (dot input evolves nonlinearly): compare
    t(chain), t(dot), t(both).  Mosaic overlap = both ~= max."""
    NOPS = 12

    def mk(with_chain, with_dot):
        def kernel(g_ref, x_ref, o_ref, acc, yacc):
            def body(i, _):
                if with_dot:
                    y = jnp.dot(g_ref[:, :], yacc[:, :],
                                preferred_element_type=F32)
                    y = y * 1e-3
                    yacc[:, :] = (y * y + 0.25).astype(BF16)
                if with_chain:
                    v = acc[:, :]
                    for _ in range(NOPS):
                        v = v * v + 0.25
                    acc[:, :] = v * 0.5
                return 0
            acc[:, :] = x_ref[:, :]
            yacc[:, :] = jnp.full((2 * Mt, Bt), 0.3, BF16)
            jax.lax.fori_loop(0, REPS, body, 0)
            o_ref[:, :] = acc[:, :] + yacc[:Mt, :].astype(F32)

        @jax.jit
        def run(g, x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((Mt, Bt), F32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((Mt, Bt), F32),
                                pltpu.VMEM((2 * Mt, Bt), BF16)],
            )(g, x)
        return run

    g = jnp.full((2 * Mt, 2 * Mt), 0.001, BF16)
    x = jnp.full((Mt, Bt), 0.3, F32)
    tc = _time(mk(True, False), g, x) / REPS
    td = _time(mk(False, True), g, x) / REPS
    tb = _time(mk(True, True), g, x) / REPS
    print(f"overlap: chain={tc*1e9:.0f}ns dot={td*1e9:.0f}ns "
          f"both={tb*1e9:.0f}ns (ideal={max(tc,td)*1e9:.0f}, "
          f"serial={(tc+td)*1e9:.0f})")


def bench_scalars():
    """[1,Bt] and [8,Bt] row ops (the sp_scr bookkeeping pattern),
    non-foldable."""
    def kernel(x_ref, o_ref, sp):
        def body(i, _):
            for r in range(8):
                v = sp[r:r + 1, :]
                sp[r:r + 1, :] = v * v + 0.25
            blk = sp[8:16, :]
            sp[8:16, :] = blk * blk + 0.25
            return 0
        sp[:, :] = jnp.full((32, Bt), 0.3, F32)
        jax.lax.fori_loop(0, REPS, body, 0)
        o_ref[:, :] = sp[0:1, :]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, Bt), F32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((32, Bt), F32)],
        )(x)

    x = jnp.full((1, Bt), 0.3, F32)
    dt = _time(run, x)
    print(f"scalars: 8x[1,Bt] + 1x[8,Bt] ops = {dt/REPS*1e9:.0f} "
          f"ns/iter")


def main():
    cases = sys.argv[1:] or ["all"]
    do = lambda c: c in cases or "all" in cases
    if do("chain"):
        bench_chain(4)
        bench_chain(16)
    if do("onehot"):
        bench_onehot(17)
        bench_onehot(65)
        bench_onehot(257)
    if do("overlap"):
        bench_overlap()
    if do("scalars"):
        bench_scalars()


if __name__ == "__main__":
    main()
