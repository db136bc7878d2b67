"""Pfam-scale benchmarks (BASELINE.json configs 4-5): a few hundred
profile HMMs vs a bacterial-genome-scale DNA target, and a
multi-genome corpus.

The environment has no Pfam flatfile and no network, so the model set
is generated deterministically from the reference's bundled families:
for each tutorial/testsuite base model, sequences are sampled from its
match-emission distributions (seeded), assembled into gap-free MSAs
(optionally sliced to vary M), and built+calibrated with the
production bathbuild.  The genome is seeded random DNA with coding
embeds reverse-translated from model consensi (some reverse-strand,
some frameshifted) so the filter cascade sees a realistic hit
density.

The reference binary cannot be built here (its Easel submodule is
absent from the mount), so the comparison row is our own numpy host
backend — which is byte-identical to the reference pipeline on every
golden output (tests/test_golden_outputs.py), i.e. the same work per
cell.

Metrics per drive (printed as JSON lines):
  * wall_s, Mb_per_s (DNA megabases through the full pipeline / s),
  * Mc_per_s = sum_q(nres_q x M_q) / wall — the reference's Mc/sec
    discipline (ref: /root/reference/src/p7_pipeline.c:1875-1879).

Usage:
  python scripts/bench_pfam.py build   [--models N]   # one-time
  python scripts/bench_pfam.py genome  [--mb N]       # one-time
  python scripts/bench_pfam.py run     [--backend jax|numpy] [--fs]
  python scripts/bench_pfam.py corpus  [--backend jax|numpy]
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
WORK = os.environ.get("BATH_PFAM_DIR", "/tmp/bath_pfam")
TUT = "/root/reference/tutorial"
TS = "/root/reference/testsuite"

BASES = [f"{TUT}/AMP_N.bhmm", f"{TUT}/PTH2.bhmm",
         f"{TUT}/PTHR37536.bhmm", f"{TS}/2OG-FeII_Oxy_3.bhmm",
         f"{TS}/Caudal_act.bhmm"]

AA = "ACDEFGHIKLMNPQRSTVWY"


def _load_bases():
    from bath_tpu.hmmfile import read_hmm
    return [read_hmm(p) for p in BASES]


def _sample_msa(hmm, rng, nseq=6, lo=None, hi=None):
    """Gap-free MSA sampled from the model's match emissions over
    positions [lo, hi)."""
    lo = 1 if lo is None else lo
    hi = hmm.M + 1 if hi is None else hi
    cols = []
    for k in range(lo, hi):
        p = np.asarray(hmm.mat[k][:20], np.float64)
        p = p / p.sum()
        cols.append(rng.choice(20, size=nseq, p=p))
    idx = np.stack(cols, axis=1)            # [nseq, M']
    return ["".join(AA[j] for j in row) for row in idx]


def build_modelset(n_models, seed=7):
    """n_models variant MSAs -> one combined multi-HMM .bhmm."""
    os.makedirs(WORK, exist_ok=True)
    combined = os.path.join(WORK, f"models_{n_models}.bhmm")
    if os.path.exists(combined):
        return combined
    rng = np.random.default_rng(seed)
    bases = _load_bases()
    parts = []
    t0 = time.perf_counter()
    for v in range(n_models):
        hmm = bases[v % len(bases)]
        # vary M: full model or a slice of >= 60 positions
        if v % 3 == 0 or hmm.M < 90:
            lo, hi = None, None
        else:
            span = int(rng.integers(60, hmm.M))
            lo = int(rng.integers(1, hmm.M - span + 1))
            hi = lo + span
        seqs = _sample_msa(hmm, rng, lo=lo, hi=hi)
        name = f"V{v:04d}_{hmm.name}"
        sto = os.path.join(WORK, "msa.sto")
        with open(sto, "w") as f:
            f.write("# STOCKHOLM 1.0\n")
            f.write(f"#=GF ID {name}\n")
            for i, s in enumerate(seqs):
                f.write(f"seq{i}  {s}\n")
            f.write("//\n")
        out = os.path.join(WORK, "one.bhmm")
        r = subprocess.run(
            [sys.executable, "-m", "bath_tpu.cli.bathbuild",
             "-n", name, out, sto],
            capture_output=True, text=True, cwd=ROOT, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        parts.append(open(out).read())
        if (v + 1) % 25 == 0:
            print(f"# built {v+1}/{n_models} models "
                  f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr)
    with open(combined, "w") as f:
        f.writelines(parts)
    return combined


_CODONS = {}


def _rev_translate(aaseq, gcode, rng):
    """aa string -> random compatible codon DNA (nt string)."""
    if not _CODONS:
        nts = "ACGT"
        for a in range(4):
            for b in range(4):
                for c in range(4):
                    aa = gcode.translate_codon(a, b, c)
                    _CODONS.setdefault(aa, []).append(
                        nts[a] + nts[b] + nts[c])
    out = []
    for ch in aaseq:
        opts = _CODONS.get(AA.index(ch) if ch in AA else None)
        out.append(opts[rng.integers(len(opts))] if opts else "")
    return "".join(out)


def _consensus(hmm, rng):
    return "".join(AA[int(np.argmax(np.asarray(hmm.mat[k][:20])))]
                   for k in range(1, hmm.M + 1))


def build_genome(mb, seed=13, name="genome", nseq=4, fs_frac=0.3):
    """~mb Mb of random DNA with ~1 coding embed per 100 kb (half
    reverse-strand; fs_frac of embeds get a 1-nt indel to exercise
    the frameshift pipeline)."""
    os.makedirs(WORK, exist_ok=True)
    path = os.path.join(WORK, f"{name}_{mb}mb.fa")
    if os.path.exists(path):
        return path
    from bath_tpu.gencode import GeneticCode
    gcode = GeneticCode.create(1)
    rng = np.random.default_rng(seed)
    bases = _load_bases()
    nts = np.array(list("ACGT"))
    per = int(mb * 1e6 / nseq)
    comp = str.maketrans("ACGT", "TGCA")
    with open(path, "w") as f:
        for s in range(nseq):
            seq = list(rng.choice(nts, per))
            for off in range(50_000, per - 2000, 100_000):
                hmm = bases[int(rng.integers(len(bases)))]
                dna = _rev_translate(_consensus(hmm, rng), gcode, rng)
                if rng.random() < fs_frac:       # frameshift embed
                    cut = int(rng.integers(10, max(11, len(dna) - 10)))
                    dna = dna[:cut] + dna[cut + 1:]
                if rng.random() < 0.5:           # reverse strand
                    dna = dna.translate(comp)[::-1]
                jitter = int(rng.integers(0, 40_000))
                p = off + jitter
                seq[p:p + len(dna)] = list(dna)
            f.write(f">{name}_s{s}\n")
            f.write("".join(seq[:per]) + "\n")
    return path


def drive(models, genome, backend, fs=False, label="", hosts=0,
          cpu=0):
    Ms = []
    with open(models) as f:
        for line in f:
            if line.startswith("LENG"):
                Ms.append(int(line.split()[1]))
    nres = 2 * os.path.getsize(genome)   # both strands, ~1 hdr line
    env = dict(os.environ)
    if backend == "numpy":
        env.pop("PALLAS_AXON_POOL_IPS", None)
    else:
        # deferred axon registration (see bench_e2e._drive)
        ips = env.pop("PALLAS_AXON_POOL_IPS", None)
        if ips:
            env["BATH_AXON_DEFER_IPS"] = ips
    args = [sys.executable, "-m", "bath_tpu.cli.bathsearch",
            "--backend", backend, "-o", os.path.join(WORK, "out.txt"),
            "--tblout", os.path.join(WORK, "out.tbl")]
    if fs:
        args.append("--fs")
    if cpu:
        args += ["--cpu", str(cpu)]
        label = label or f"pfam-{len(Ms)}hmm-{backend}-cpu{cpu}" \
            + ("-fs" if fs else "")
    args += [models, genome]
    t0 = time.perf_counter()
    r = subprocess.run(args, capture_output=True, text=True, cwd=ROOT,
                       timeout=7 * 3600, env=env)
    dt = time.perf_counter() - t0
    assert r.returncode == 0, r.stderr[-3000:]
    nhits = sum(1 for ln in open(os.path.join(WORK, "out.tbl"))
                if not ln.startswith("#"))
    mc = nres * float(np.mean(Ms)) * len(Ms) / dt / 1e6
    print(json.dumps({
        "drive": label or f"pfam-{len(Ms)}hmm-{backend}"
        + ("-fs" if fs else ""),
        "n_models": len(Ms), "genome_MB":
            round(os.path.getsize(genome) / 1e6, 1),
        "wall_s": round(dt, 1),
        "Mb_per_s": round(os.path.getsize(genome) / 1e6 / dt, 3),
        "Mc_per_s": round(mc, 1), "n_hits": nhits}))
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["build", "genome", "run",
                                    "corpus"])
    ap.add_argument("--models", type=int, default=200)
    ap.add_argument("--mb", type=float, default=5.0)
    ap.add_argument("--backend", default="jax")
    ap.add_argument("--fs", action="store_true")
    ap.add_argument("--cpu", type=int, default=0)
    a = ap.parse_args()
    if a.cmd == "build":
        print(build_modelset(a.models))
    elif a.cmd == "genome":
        print(build_genome(a.mb))
    elif a.cmd == "run":
        models = build_modelset(a.models)
        genome = build_genome(a.mb)
        drive(models, genome, a.backend, fs=a.fs, cpu=a.cpu)
    elif a.cmd == "corpus":
        # config 5: multi-genome corpus (3 genomes, distinct seeds)
        models = build_modelset(min(a.models, 50))
        paths = [build_genome(a.mb, seed=13 + i, name=f"g{i}")
                 for i in range(3)]
        corpus = os.path.join(WORK, "corpus.fa")
        with open(corpus, "w") as f:
            for p in paths:
                f.write(open(p).read())
        drive(models, corpus, a.backend, cpu=a.cpu,
              label=f"corpus-3x{a.mb}mb-{a.backend}"
              + (f"-cpu{a.cpu}" if a.cpu else ""))


if __name__ == "__main__":
    main()
