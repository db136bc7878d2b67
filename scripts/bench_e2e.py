"""Reproducible end-to-end bathsearch benchmarks (host pipeline).

Generates seeded synthetic DNA targets, times the CLI, and prints one
JSON line per drive.  Complements bench.py (which measures the TPU
gate kernel in isolation); these numbers back the README's e2e
claims.

Usage: python scripts/bench_e2e.py [--quick]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TUT = "/root/reference/tutorial"


def _write_random(path, nseq, seqlen, seed, embed=None, every=0):
    import numpy as np
    rng = np.random.default_rng(seed)
    nts = np.array(list("ACGT"))
    with open(path, "w") as f:
        for s in range(nseq):
            if embed and every:
                parts = []
                step = seqlen // every
                for i in range(every):
                    parts.append("".join(rng.choice(nts, step)))
                    parts.append(embed)
                seq = "".join(parts)
            else:
                seq = "".join(rng.choice(nts, seqlen))
            f.write(f">s{s}\n{seq}\n")


def _drive(name, args, fa, nres_factor=2, hmm=None):
    # the numpy backend never touches jax; drop the axon pool env so
    # sitecustomize doesn't spend ~1.9s registering the TPU plugin in
    # every subprocess (a sandbox artifact, not a framework cost)
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch", *args,
         "-o", "/dev/null", hmm or f"{TUT}/AMP_N.bhmm", fa],
        capture_output=True, text=True, timeout=3600, cwd=ROOT,
        env=env)
    dt = time.perf_counter() - t0
    assert r.returncode == 0, r.stderr[-2000:]
    nres = os.path.getsize(fa) * nres_factor  # ~both strands
    mcsec = nres * 134 / dt / 1e6
    print(json.dumps({"drive": name, "wall_s": round(dt, 2),
                      "Mc_per_sec": round(mcsec, 1)}))


def main():
    quick = "--quick" in sys.argv
    import numpy as np  # noqa: F401  (fail early if missing)
    tgt = "".join(l.strip() for l in open(f"{TUT}/target-AMP_N.fa")
                  if not l.startswith(">"))
    big = "/tmp/bench_e2e_big.fa"
    mix = "/tmp/bench_e2e_mix.fa"
    _write_random(big, 8, 125_000 if quick else 500_000, 42)
    _write_random(mix, 10 if quick else 40, 400_000, 7,
                  embed=tgt, every=5)
    _drive("standard-random", [], big)
    _drive("fs-random", ["--fs"], big)
    _drive("fs-hit-rich", ["--fs"], mix)
    _drive("fs-hit-rich-cpu4", ["--fs", "--cpu", "4"], mix)
    # multi-exon gene drive: the testsuite's tmem-258 splice fixture
    # repeated across a synthetic genomic background
    ts = "/root/reference/testsuite"
    gene = "".join(l.strip() for l in open(f"{ts}/tmem-258.fa")
                   if not l.startswith(">"))
    spl = "/tmp/bench_e2e_splice.fa"
    _write_random(spl, 4 if quick else 12, 100_000, 13,
                  embed=gene, every=2)
    _drive("splice-multigene", ["--splice"], spl,
           hmm=f"{ts}/tmem-258.bhmm")


if __name__ == "__main__":
    main()
