"""Multi-host scaling efficiency of `bathsearch --hosts N`.

Runs the same drive at N=1 and N=2..max on this machine (one process
per rank over jax.distributed on localhost, numpy backend so the
measurement is host-CPU scaling, not tunnel weather) and reports
efficiency = T1 / (N * TN).  The design re-reads the target on every
rank (parallel/hosts.py: global bookkeeping stays identical
everywhere), so measured efficiency also prices that choice: the
read is sequential I/O at page-cache speed, while the skipped DP is
the dominant term.  SURVEY.md's north star is >= 85%.

MUST run with the machine otherwise idle (4 cores): any concurrent
load inflates TN and understates efficiency.

Usage: python scripts/bench_hosts.py [--fa PATH] [--hmm PATH] [--max N]
Emits one JSON line per host count.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TUT = "/root/reference/tutorial"


def _mix_target(path="/tmp/bench_hosts_mix.fa", mb=48):
    import numpy as np
    if os.path.exists(path) and os.path.getsize(path) > 0:
        return path
    rng = np.random.default_rng(7)
    nts = np.array(list("ACGT"))
    tgt = "".join(l.strip() for l in open(f"{TUT}/target-AMP_N.fa")
                  if not l.startswith(">"))
    with open(path, "w") as f:
        for s in range(mb * 2):
            parts = []
            for _ in range(5):
                parts.append("".join(rng.choice(nts, 100_000)))
                parts.append(tgt)
            f.write(f">s{s}\n{''.join(parts)}\n")
    return path


def run_hosts(n, hmm, fa, port):
    """One drive at N ranks; returns (wall_s, stdout of rank 0)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    t0 = time.perf_counter()
    if n == 1:
        r = subprocess.run(
            [sys.executable, "-m", "bath_tpu.cli.bathsearch",
             "--backend", "numpy", hmm, fa],
            capture_output=True, text=True, timeout=3600, cwd=ROOT,
            env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        return time.perf_counter() - t0, r.stdout
    procs = []
    for rank in range(n):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "bath_tpu.cli.bathsearch",
             "--backend", "numpy", "--hosts", str(n),
             "--host-id", str(rank),
             "--coordinator", f"127.0.0.1:{port}", hmm, fa],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=ROOT, env=env))
    outs = [p.communicate(timeout=3600) for p in procs]
    dt = time.perf_counter() - t0
    for p, (_, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]
    return dt, outs[0][0]


def main():
    argv = sys.argv[1:]
    fa = _mix_target()
    hmm = f"{TUT}/AMP_N.bhmm"
    nmax = 2
    if "--fa" in argv:
        fa = argv[argv.index("--fa") + 1]
    if "--hmm" in argv:
        hmm = argv[argv.index("--hmm") + 1]
    if "--max" in argv:
        nmax = int(argv[argv.index("--max") + 1])
    import re
    # '#' lines include the echoed command line (which legitimately
    # differs: --hosts/--host-id) and timing footers; the hit/stat
    # body is the byte-invariance contract
    strip = lambda s: "\n".join(
        ln for ln in s.splitlines()
        if not ln.startswith("[Gloo]")      # jax.distributed banner
        and not (ln.startswith("#") and ("command" in ln
                                         or "CPU time" in ln
                                         or "Mc/sec" in ln
                                         or "hosts" in ln)))
    t1, out1 = run_hosts(1, hmm, fa, 0)
    print(json.dumps({"hosts": 1, "wall_s": round(t1, 2)}),
          flush=True)
    for n in range(2, nmax + 1):
        tn, outn = run_hosts(n, hmm, fa, 29700 + n)
        eff = t1 / (n * tn)
        ident = strip(out1) == strip(outn)
        print(json.dumps({
            "hosts": n, "wall_s": round(tn, 2),
            "efficiency": round(eff, 3),
            "bytes_identical": ident}), flush=True)


if __name__ == "__main__":
    main()
