"""Generate tests/data/mesh_target_fs.fa — the multi-window,
hit-bearing fixture for the multi-device --fs byte-identity tests.

Three ~60 kb random-DNA sequences with AMP_N consensus embeds:
clean codon embeds (standard-pipeline hits), 1-nt-deletion embeds
(frameshift-pipeline hits), one reverse-strand embed, and one embed
placed across the 20 kb window boundary the tests use
(--block_length 20000), so sharded window streams carry
boundary-spanning hits in both modes (VERDICT r3 weak #5).

Deterministic (seeded); run from the repo root:
    python tests/data/make_mesh_target_fs.py
"""

import os

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
AA = "ACDEFGHIKLMNPQRSTVWY"


def main():
    import sys
    sys.path.insert(0, ROOT)
    from bath_tpu.gencode import GeneticCode
    from bath_tpu.hmmfile import read_hmm

    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    gcode = GeneticCode.create(1)
    rng = np.random.default_rng(20260820)
    nts = "ACGT"
    codons = {}
    for a in range(4):
        for b in range(4):
            for c in range(4):
                aa = gcode.translate_codon(a, b, c)
                codons.setdefault(aa, []).append(
                    nts[a] + nts[b] + nts[c])
    cons = "".join(AA[int(np.argmax(np.asarray(hmm.mat[k][:20])))]
                   for k in range(1, hmm.M + 1))

    def dna_of(aaseq):
        out = []
        for ch in aaseq:
            opts = codons.get(AA.index(ch))
            out.append(opts[rng.integers(len(opts))])
        return "".join(out)

    comp = str.maketrans("ACGT", "TGCA")
    per = 60_000
    # embed plans per sequence: (offset, kind)
    plans = [
        [(8_000, "std"), (31_000, "fs"), (48_000, "rc")],
        # 19_900: spans the 20 kb window boundary used by the tests
        [(12_000, "fs"), (19_900, "std"), (44_000, "fs_rc")],
        [(5_000, "rc"), (27_000, "std"), (52_000, "fs")],
    ]
    path = os.path.join(ROOT, "tests", "data", "mesh_target_fs.fa")
    with open(path, "w") as f:
        for s, plan in enumerate(plans):
            seq = list(rng.choice(list("ACGT"), per))
            for off, kind in plan:
                dna = dna_of(cons)
                if kind.startswith("fs"):
                    cut = int(rng.integers(30, len(dna) - 30))
                    dna = dna[:cut] + dna[cut + 1:]
                if kind.endswith("rc"):
                    dna = dna.translate(comp)[::-1]
                seq[off:off + len(dna)] = list(dna)
            f.write(f">mfs{s}\n")
            body = "".join(seq[:per])
            for i in range(0, per, 80):
                f.write(body[i:i + 80] + "\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
