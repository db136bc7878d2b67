"""Empirically determine which Easel PB-weighting variant the golden
testsuite models were built with, by building each MSA under a grid of
consensus-column / normalization rules and comparing the resulting
model parameters to the committed golden .bhmm files."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import bath_tpu.builder as B
from bath_tpu.hmmfile import read_hmm
from bath_tpu.msa import MSA, read_msas

TS = "/root/reference/testsuite"

# no-op calibration (params only)
B.calibrate = lambda hmm, ccfg, r=None, bg=None: None


def pb_variant(msa: MSA, cons: str, norm: str,
               fragthresh: float = 0.5, symfrac: float = 0.5):
    K = msa.abc.K
    nseq, alen = msa.nseq, msa.alen
    canon = np.where(msa.ax < K, msa.ax, K)
    is_canon = canon < K
    is_res = msa._is_residue(msa.ax)
    r_all = is_res.sum(axis=0)

    if cons == "rf" and msa.rf:
        use = np.array([c not in ".-_~" for c in msa.rf])
    elif cons == "all":
        use = np.ones(alen, bool)
    elif cons == "occ":
        use = (is_canon.sum(0) / max(nseq, 1)) >= symfrac
    elif cons in ("span_frag", "span_all"):
        spans = []
        for i in range(nseq):
            nz = np.nonzero(is_res[i])[0]
            spans.append((nz[0], nz[-1]) if len(nz) else None)
        n = np.zeros(alen)
        for i, sp in enumerate(spans):
            if sp is None:
                continue
            frag = (sp[1] - sp[0] + 1) < fragthresh * alen
            if cons == "span_all" or frag:
                n[sp[0]:sp[1] + 1] += 1
            else:
                n += 1
        use = (r_all > 0) & (r_all >= symfrac * np.maximum(n, 1e-9))
    else:
        raise ValueError(cons)
    if not use.any():
        use = np.ones(alen, bool)

    w = np.zeros(nseq)
    for apos in np.nonzero(use)[0]:
        col = canon[:, apos]
        mask = col < K
        if not mask.any():
            continue
        ct = np.bincount(col[mask], minlength=K + 1)
        rr = int((ct > 0).sum())
        w[mask] += 1.0 / (rr * ct[col[mask]])
    if norm == "perres":
        nres = (is_canon & use[None, :]).sum(axis=1)
        w = np.where(nres > 0, w / np.maximum(nres, 1), 0.0)
    if w.sum() == 0:
        w[:] = 1.0
    msa.wgt = w * (nseq / w.sum())
    return int(use.sum())


def run(name):
    golden = read_hmm(f"{TS}/{name}.bhmm")
    print(f"== {name}: golden M={golden.M} eff={golden.eff_nseq:.3f} "
          f"maxl={golden.max_length}")
    for cons in ("occ", "all", "span_frag", "span_all", "rf"):
        for norm in ("plain", "perres"):
            msas = read_msas(f"{TS}/{name}.sto")
            msa = msas[0]
            if cons == "rf" and not msa.rf:
                continue
            ncons = pb_variant(msa, cons, norm)
            cfg = B.BuilderConfig()
            cfg.wgt = "given"
            try:
                hmm = B.build(msa, cfg)
            except Exception as e:
                print(f"  {cons:10s}/{norm:6s}: ERROR {e}")
                continue
            if hmm.M != golden.M:
                print(f"  {cons:10s}/{norm:6s}: ncons={ncons:4d} "
                      f"M={hmm.M} != {golden.M}")
                continue
            dm = np.abs(hmm.mat[1:] - golden.mat[1:]).max()
            dt = np.abs(hmm.t[1:] - golden.t[1:]).max()
            print(f"  {cons:10s}/{norm:6s}: ncons={ncons:4d} M={hmm.M} "
                  f"eff={hmm.eff_nseq:.3f} maxl={hmm.max_length} "
                  f"dmat={dm:.2e} dt={dt:.2e}")


for nm in ("Caudal_act", "RRM_1", "2OG-FeII_Oxy_3", "20aa"):
    run(nm)
