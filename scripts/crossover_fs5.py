"""fs5 envelope-stack crossover measurement (VERDICT r2 ask 5).

The fs5 envelope stack (full Forward/Backward/decoding/optacc per
domain; ref: impl_sse/fwdback_fs.c:1055,2054,2634, decoding_fs.c:55,
optacc_fs.c:53) runs host-side at O(domains).  This driver measures
its share of end-to-end wall as hit density rises, against the
device-gate share — the committed evidence for whether a batched
device envelope stack is worth building.

Method: synthetic targets embedding a frameshifted AMP_N coding
sequence every <spacing> nt, swept over spacings; each run records
BATH_PHASE_STATS (envelope-std / envelope-fs5 cumulative wall) and
total wall for both backends.

Usage: python scripts/crossover_fs5.py [--backend numpy|jax]
"""

import json
import os
import re
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TUT = "/root/reference/tutorial"


def make_target(path, mb, spacing, seed=5):
    rng = np.random.default_rng(seed)
    nts = np.array(list("ACGT"))
    gene = "".join(l.strip() for l in open(f"{TUT}/target-AMP_N.fa")
                   if not l.startswith(">"))
    # frameshifted variant: drop one nt mid-gene (exercises the fs
    # branch + fs5 envelope rescoring)
    gene_fs = gene[:200] + gene[201:]
    n = int(mb * 1e6)
    with open(path, "w") as f:
        pos = 0
        f.write(">t0\n")
        out = []
        while pos < n:
            step = min(spacing, n - pos)
            out.append("".join(rng.choice(nts, step)))
            out.append(gene_fs)
            pos += step + len(gene_fs)
        f.write("".join(out) + "\n")
    return path


def run(backend, fa):
    env = dict(os.environ, BATH_PHASE_STATS="1", BATH_DEVICE_STATS="1")
    if backend == "numpy":
        env.pop("PALLAS_AXON_POOL_IPS", None)
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch",
         "--backend", backend, "--fs", "-o", "/dev/null",
         f"{TUT}/AMP_N.bhmm", fa],
        capture_output=True, text=True, timeout=7200, cwd=ROOT,
        env=env)
    dt = time.perf_counter() - t0
    assert r.returncode == 0, r.stderr[-2000:]
    parsed = {}
    for k, calls, wall in re.findall(
            r"# phase-stats (\S+): calls=(\d+) wall_s=([0-9.]+)",
            r.stderr):
        parsed[k] = {"calls": int(calls), "wall_s": float(wall)}
    dev = sum(float(x) for x in re.findall(r"wall_s=([0-9.]+)",
                                           " ".join(re.findall(
                                               r"# device-stats.*",
                                               r.stderr))))
    return dt, parsed, dev


def main():
    backend = "numpy"
    if "--backend" in sys.argv:
        backend = sys.argv[sys.argv.index("--backend") + 1]
    for spacing in (200_000, 50_000, 12_000, 4_000):
        fa = f"/tmp/xover_{spacing}.fa"
        if not os.path.exists(fa):
            make_target(fa, 4.0, spacing)
        dt, phases, dev = run(backend, fa)
        env_s = sum(p["wall_s"] for k, p in phases.items()
                    if k.startswith("envelope"))
        env_calls = sum(p["calls"] for k, p in phases.items()
                        if k.startswith("envelope"))
        print(json.dumps({
            "backend": backend, "spacing_nt": spacing,
            "wall_s": round(dt, 1),
            "envelope_wall_s": round(env_s, 2),
            "envelope_share": round(env_s / dt, 3),
            "envelope_calls": env_calls,
            "device_blocked_s": round(dev, 1),
            "detail": phases}), flush=True)


if __name__ == "__main__":
    main()
