"""Reproducible end-to-end bathsearch benchmarks.

Generates seeded synthetic DNA targets, times the CLI, and prints one
JSON line per drive.  Complements bench.py (which measures the TPU
gate kernel in isolation); these numbers back the README's and
BASELINE.md's e2e claims.

Backends:
  --backend numpy   host pipeline (byte-identical to the reference's
                    semantics, proven by the golden tests)
  --backend jax     chunked device cascade on the visible TPU chip
  --backend both    both, same targets (the comparison table)

Usage: python scripts/bench_e2e.py [--quick] [--backend numpy|jax|both]
       [--big-mb N]

The jax drives report wall_s both cold (first process: persistent-
compile-cache loads) and steady (executables already deserialized
would need a warm process; we instead report the device-blocked
seconds from BATH_DEVICE_STATS so the one-time load is visible).
"""

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TUT = "/root/reference/tutorial"


def _write_random(path, nseq, seqlen, seed, embed=None, every=0):
    import numpy as np
    if os.path.exists(path) and os.path.getsize(path) > 0:
        return
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


def _tpu_alive(timeout_s=120.0):
    """The axon tunnel can stall with jax blocked at ~0% CPU; probe
    out-of-process before committing a long drive to it (same pattern
    as bench.py)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); import jax.numpy as jnp; "
             "float(jnp.ones(8).sum())"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _drive(name, args, fa, nres_factor=2, hmm=None, backend="numpy",
           expect_s=1200, runs=1):
    """--runs N (jax): repeat the drive N times and report every
    wall plus the best — ambient tunnel throughput swings +-35%
    across minutes (round-3 measured), so a single wall confounds
    the pipeline with tunnel weather."""
    env = dict(os.environ)
    if backend == "numpy":
        # the numpy backend never touches jax; drop the axon pool env
        # so sitecustomize doesn't spend ~1.9s registering the TPU
        # plugin (a sandbox artifact, not a framework cost)
        env.pop("PALLAS_AXON_POOL_IPS", None)
    else:
        # deferred registration: the adaptive cascade pays the jax
        # import + plugin registration only when a stage actually
        # engages the device (device_pipeline.ensure_axon_registered)
        ips = env.pop("PALLAS_AXON_POOL_IPS", None)
        if ips:
            env["BATH_AXON_DEFER_IPS"] = ips
    env["BATH_DEVICE_STATS"] = "1"
    cmd = [sys.executable, "-m", "bath_tpu.cli.bathsearch",
           "--backend", backend, *args,
           "-o", "/dev/null", hmm or f"{TUT}/AMP_N.bhmm", fa]
    walls, dev_ss = [], []
    for run_i in range(max(1, runs)):
        for attempt in range(3):
            if backend == "jax":
                while not _tpu_alive():
                    print(f"# {name}: TPU tunnel unresponsive, "
                          "waiting", file=sys.stderr, flush=True)
                    time.sleep(30)
            t0 = time.perf_counter()
            try:
                r = subprocess.run(cmd, capture_output=True,
                                   text=True, timeout=expect_s,
                                   cwd=ROOT, env=env)
            except subprocess.TimeoutExpired:
                # stalled tunnel, not slow work: a healthy drive
                # shows steady CPU; retry on a fresh process
                print(f"# {name} ({backend}): timed out at "
                      f"{expect_s}s (attempt {attempt + 1}), "
                      "retrying", file=sys.stderr, flush=True)
                continue
            break
        else:
            print(json.dumps({"drive": name, "backend": backend,
                              "error": f"timeout x3 ({expect_s}s)"}),
                  flush=True)
            return
        walls.append(time.perf_counter() - t0)
        assert r.returncode == 0, r.stderr[-2000:]
        dev_ss.append(sum(float(m) for m in re.findall(
            r"wall_s=([0-9.]+)", r.stderr)))
    best = min(range(len(walls)), key=lambda i: walls[i])
    dt, dev_s = walls[best], dev_ss[best]
    nres = os.path.getsize(fa) * nres_factor  # ~both strands
    mb = os.path.getsize(fa) / 1e6
    M = next(int(ln.split()[1]) for ln in
             open(hmm or f"{TUT}/AMP_N.bhmm") if ln.startswith("LENG"))
    rec = {"drive": name, "backend": backend, "M": M,
           "target_MB": round(mb, 1), "wall_s": round(dt, 2),
           "Mb_per_s": round(mb / dt, 3),
           "Mc_per_sec": round(nres * M / dt / 1e6, 1)}
    if backend == "jax":
        rec["device_blocked_s"] = round(dev_s, 1)
    if len(walls) > 1:
        rec["walls_s"] = [round(w, 2) for w in walls]
    print(json.dumps(rec), flush=True)


def main():
    quick = "--quick" in sys.argv
    backend = "numpy"
    if "--backend" in sys.argv:
        backend = sys.argv[sys.argv.index("--backend") + 1]
    big_mb = 4.0
    if "--big-mb" in sys.argv:
        big_mb = float(sys.argv[sys.argv.index("--big-mb") + 1])
    backends = ["numpy", "jax"] if backend == "both" else [backend]
    import numpy as np  # noqa: F401  (fail early if missing)
    tgt = "".join(l.strip() for l in open(f"{TUT}/target-AMP_N.fa")
                  if not l.startswith(">"))
    big = f"/tmp/bench_e2e_big_{big_mb}.fa"
    mix = "/tmp/bench_e2e_mix.fa"
    nseq = max(1, int(big_mb * 2))
    _write_random(big, nseq, int(big_mb * 1e6 / nseq) if not quick
                  else 125_000, 42)
    _write_random(mix, 10 if quick else 40, 400_000, 7,
                  embed=tgt, every=5)
    # M=409 single-model file (first model of tutorial MET.bhmm):
    # Pfam-realistic model size — host DP cost scales with M, the
    # device gate's call count does not
    met1 = "/tmp/bench_e2e_MET1.bhmm"
    if not os.path.exists(met1):
        txt = open(f"{TUT}/MET.bhmm").read()
        end = txt.index("//\n") + 3
        with open(met1, "w") as f:
            f.write(txt[:end])
    runs = 1
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    for b in backends:
        rr = runs if b == "jax" else 1
        _drive("standard-random", [], big, backend=b, runs=rr)
        _drive("fs-random", ["--fs"], big, backend=b, runs=rr)
        _drive("fs-hit-rich", ["--fs"], mix, backend=b, runs=rr)
        _drive("standard-M409", [], big, backend=b, hmm=met1,
               expect_s=2400, runs=rr)
        _drive("fs-M409", ["--fs"], big, backend=b, hmm=met1,
               expect_s=3600, runs=rr)
    if "jax" in backends:
        # hybrid: forked host workers + device cascade sharing the
        # window stream (the answer to numpy --cpu 4 on hit-dense
        # drives — the one e2e row the plain cascade lost in r4)
        _drive("fs-hit-rich-jaxcpu4", ["--fs", "--cpu", "4"], mix,
               backend="jax", runs=runs)
    if "numpy" in backends:
        _drive("fs-hit-rich-cpu4", ["--fs", "--cpu", "4"], mix)
        # multi-exon gene drive: the testsuite's tmem-258 splice
        # fixture repeated across a synthetic genomic background
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
