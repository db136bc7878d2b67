"""Resident single-process kernel benchmark: init jax once, then run
every fs3 measurement back-to-back, appending one JSON line to
--out after each (so a tunnel flap mid-run loses only the current
step).  Used by the round-3 chip queue; results feed BENCH/BASELINE.

Steps: jnp fs3 gate (B=4096), fs3v2 at btile {512, 1024, 256},
then the (M, B) sweep if --sweep.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    out_path = "/tmp/bench_resident.jsonl"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    def emit(rec):
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from bath_tpu.bg import Background
    from bath_tpu.gencode import GeneticCode
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.ops.jaxk import kernels as jk
    from bath_tpu.ops.reference.fwdback_fs import fs_oprofile_convert
    from bath_tpu.profile import profile_config_fs

    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    bg = Background()
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    om3 = fs_oprofile_convert(profile_config_fs(hmm, bg, gcode, 3,
                                                100))
    p3 = jk.fs3_params(om3)
    rng = np.random.default_rng(0)
    n_iter = 4

    def timed(runner, bats):
        np.asarray(runner(bats[0]))
        t0 = time.perf_counter()
        o = None
        for d in bats:
            o = runner(d)
        np.asarray(o)
        return (time.perf_counter() - t0) / len(bats)

    # 1. jnp baseline
    B, L = 4096, 8184
    bats = [jnp.asarray(rng.integers(0, 4, (B, L)).astype(np.int8))
            for _ in range(n_iter)]
    lens = jnp.asarray(np.full(B, L, np.int32))
    t0 = time.perf_counter()
    dt = timed(lambda d: jk.fs3_score_batch(d, lens, p3, nj=1.0),
               bats)
    emit({"step": "jnp", "B": B, "L": L,
          "GCUPS": round(B * L * hmm.M / dt / 1e9, 2),
          "compile_s": round(time.perf_counter() - t0 - dt * n_iter,
                             1)})
    del bats

    # 2. v2 at three batch tiles
    from bath_tpu.ops.pallas.fs3v2 import fs3_params_v2, fs3_score_v2
    ps2 = fs3_params_v2(om3)
    B2, L2 = 1024, 8184
    bats2 = [jnp.asarray(rng.integers(0, 4, (B2, L2)).astype(np.int8))
             for _ in range(n_iter)]
    lens2 = jnp.asarray(np.full(B2, L2, np.int32))
    for bt in (512, 1024, 256, 128):
        try:
            t0 = time.perf_counter()
            dt = timed(lambda d: fs3_score_v2(d, lens2, ps2, nj=1.0,
                                              btile=bt, lblk=96),
                       bats2)
            emit({"step": f"v2-bt{bt}", "B": B2, "L": L2,
                  "GCUPS": round(B2 * L2 * hmm.M / dt / 1e9, 2),
                  "compile_s": round(
                      time.perf_counter() - t0 - dt * n_iter, 1)})
        except Exception as e:
            emit({"step": f"v2-bt{bt}", "error": repr(e)[:300]})

    if "--sweep" not in sys.argv:
        return
    del bats2
    # 3. (M, B) sweep via bench.py helpers
    import bench
    bench._sweep()


if __name__ == "__main__":
    main()
