"""Final alignment of a spliced exon chain: build the spliced
nucleotide/amino sequence, align to the amino profile, segment the
alignment back into exons with genomic coordinates, and score exons
(ref: p7_splice.c p7_splice_CreateSplicedSequnce,
p7_splice_AlignSplicedSequence, p7_splice_ScoreExons,
p7_alidisplay.c p7_alidisplay_splice_Create).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .. import constants as C
from ..ops.reference import fwdback as fb
from ..stats import exp_logsurv
from .splice import PathSeq, SpliceConfig
from .graph import SplicePath

LOG2 = math.log(2.0)


@dataclass
class ExonInfo:
    hmm_from: int = 0
    hmm_to: int = 0
    seq_from: int = 0       # genomic coords
    seq_to: int = 0
    score: float = 0.0
    lnP: float = 0.0
    pp: float = 0.0
    pid: float = 0.0
    signal: str = "----"    # splice signal of the FOLLOWING intron
    anchor: bool = False
    extend: bool = False


@dataclass
class SpliceAliSegment:
    """One exon's alignment display block."""
    model: str = ""
    mline: str = ""
    aseq: str = ""
    ntseq: list = field(default_factory=list)   # per amino: codon str
    ppline: str = ""
    kfrom: int = 0
    kto: int = 0
    gfrom: int = 0          # genomic nt coords of block
    gto: int = 0
    acc_prefix: str = ""    # e.g. "ag  TA" partial codon after intron
    don_suffix: str = ""    # e.g. "G   gt"


@dataclass
class SplicedHitResult:
    envsc: float = 0.0
    oasc: float = 0.0
    domcorrection: float = 0.0
    ihmm: int = 0
    jhmm: int = 0
    iali: int = 0           # genomic
    jali: int = 0
    ienv: int = 0
    jenv: int = 0
    exons: list = field(default_factory=list)       # ExonInfo
    segments: list = field(default_factory=list)    # SpliceAliSegment
    amino_n: int = 0
    orf_from: int = 0
    orf_to: int = 0


def create_spliced_sequence(spliced_path: SplicePath, path_seq: PathSeq,
                            gcode):
    """Concatenate exon spans into one nucleotide sequence; return
    (nuc_sub_idx [n], amino_dsq [n/3]) or None if not mod 3
    (ref: p7_splice_CreateSplicedSequnce)."""
    subs = []
    for s in range(spliced_path.path_len):
        a = path_seq.to_sub(spliced_path.iali[s])
        b = path_seq.to_sub(spliced_path.jali[s])
        if b < a:
            return None
        subs.extend(range(a, b + 1))
    if len(subs) % 3 != 0:
        spliced_path.frameshift = True
        return None
    nuc_idx = np.array(subs, dtype=np.int64)           # 1-based sub pos
    nts = path_seq.dsq[nuc_idx - 1]
    n_amino = len(subs) // 3
    amino = np.empty(n_amino, dtype=np.int32)
    for a in range(n_amino):
        amino[a] = gcode.translate_codon(int(nts[3 * a]),
                                         int(nts[3 * a + 1]),
                                         int(nts[3 * a + 2]))
    return nuc_idx, amino


def align_spliced_sequence(om, gm, bg, amino_dsq: np.ndarray,
                           nuc_idx: np.ndarray, path_seq: PathSeq,
                           cfg: SpliceConfig,
                           gcode=None) -> SplicedHitResult | None:
    """Unihit alignment of the spliced amino sequence + exon
    segmentation (ref: p7_splice_AlignSplicedSequence)."""
    n = len(amino_dsq)
    om.reconfig_unihit(n)
    bg.set_length(n)
    if cfg.do_biasfilter:
        filtersc = bg.filter_score(amino_dsq)
    else:
        filtersc = bg.null_one(n)

    try:
        oxf, envsc = fb.forward(amino_dsq, om, full=True)
        oxb, _ = fb.backward(amino_dsq, om, oxf, full=True)
        pp = fb.decoding(om, oxf, oxb)
    except fb.RangeError:
        return None
    ox2, oasc = fb.optimal_accuracy(om, pp)
    tr = fb.oa_trace(om, pp, ox2)
    tr.index()

    seq_score = (envsc - filtersc) / LOG2
    P = math.exp(exp_logsurv(seq_score, om.evparam[C.EV_FTAU],
                             om.evparam[C.EV_FLAMBDA]))
    if P > cfg.F3:
        return None

    null2 = fb.null2_by_expectation(om, pp, 20)
    null2 = fb.finish_null2(null2, gm.abc)
    domcorrection = 0.0
    for a in amino_dsq:
        domcorrection += math.log(max(float(null2[int(a)]), 1e-30))
    domcorrection = max(0.0, domcorrection)

    res = SplicedHitResult(envsc=envsc, oasc=oasc,
                           domcorrection=domcorrection, amino_n=n)

    # alignment span (first/last M in the best = only domain)
    z1 = tr.tfrom[0]
    while z1 < tr.N and tr.st[z1] != C.T_M:
        z1 += 1
    z2 = tr.tto[0]
    while z2 >= 0 and tr.st[z2] != C.T_M:
        z2 -= 1
    if z1 >= tr.N or z2 < 0:
        return None
    res.ihmm, res.jhmm = tr.k[z1], tr.k[z2]
    res.orf_from, res.orf_to = tr.i[z1], tr.i[z2]
    res.iali = path_seq.to_global(int(nuc_idx[3 * (tr.i[z1] - 1)]))
    res.jali = path_seq.to_global(int(nuc_idx[3 * tr.i[z2] - 1]))
    res.ienv = path_seq.to_global(int(nuc_idx[0]))
    res.jenv = path_seq.to_global(int(nuc_idx[-1]))

    # --- segment into exons at nucleotide discontinuities ------------
    from ..alidisplay import encode_postprob
    amino_sym = gm.abc.sym
    dna_sym = "ACGT-RYMKSWHBVDN*~"

    segs: list[SpliceAliSegment] = []
    exons: list[ExonInfo] = []
    seg = None
    prev_nt_sub = None          # sub position of last consumed nt

    def nt_char(subpos):
        return dna_sym[int(path_seq.dsq[subpos - 1])].upper()

    def open_seg(k, gfrom):
        s = SpliceAliSegment(kfrom=k, gfrom=gfrom)
        segs.append(s)
        return s

    for z in range(z1, z2 + 1):
        k, i, s = tr.k[z], tr.i[z], tr.st[z]
        if s == C.T_D:
            if seg is None:
                seg = open_seg(k, 0)
            seg.model += gm.consensus[k - 1]
            seg.mline += " "
            seg.aseq += "-"
            seg.ntseq.append(" --- ")
            seg.ppline += "."
            seg.kto = k
            continue
        # M or I: consumes amino i -> nts 3i-2..3i of the spliced seq
        nt_subs = [int(nuc_idx[3 * (i - 1)]), int(nuc_idx[3 * i - 2]),
                   int(nuc_idx[3 * i - 1])]
        # detect junction before this codon or inside it
        splits = []
        if prev_nt_sub is not None and nt_subs[0] != prev_nt_sub + 1:
            splits.append(0)
        if nt_subs[1] != nt_subs[0] + 1:
            splits.append(1)
        if nt_subs[2] != nt_subs[1] + 1:
            splits.append(2)
        if splits and seg is not None:
            sp = splits[0]
            # end current segment; partial codon nts split sp
            if sp > 0:
                seg.don_suffix = "".join(nt_char(p)
                                         for p in nt_subs[:sp])
                seg.gto = path_seq.to_global(nt_subs[sp - 1])
            else:
                seg.gto = path_seq.to_global(prev_nt_sub)
            # intron genomic span for signal
            intr_a = nt_subs[sp - 1] + 1 if sp > 0 else prev_nt_sub + 1
            intr_b = nt_subs[sp] - 1
            sig = "----"
            if intr_b - intr_a >= 3:
                d = (nt_char(intr_a) + nt_char(intr_a + 1)).lower()
                a_ = (nt_char(intr_b - 1) + nt_char(intr_b)).lower()
                sig = d + a_
            seg._pending_signal = sig
            newseg = open_seg(k, path_seq.to_global(nt_subs[sp]))
            if sp > 0:
                newseg.acc_prefix = "".join(nt_char(p)
                                            for p in nt_subs[sp:])
            seg = newseg
        if seg is None:
            seg = open_seg(k, path_seq.to_global(nt_subs[0]))
        if seg.gfrom == 0:
            seg.gfrom = path_seq.to_global(nt_subs[0])
        a = int(amino_dsq[i - 1])
        codon_str = " %c%c%c " % tuple(nt_char(p) for p in nt_subs)
        seg.ppline += encode_postprob(tr.pp[z])
        seg.kto = k
        if s == C.T_M:
            cons = gm.consensus[k - 1]
            seg.model += cons
            seg.aseq += amino_sym[a].upper()
            seg.ntseq.append(codon_str)
            cons_digit = gm.abc.inmap.get(cons, -1)
            if a == cons_digit:
                seg.mline += cons
            elif om.rfv[a, k] > 1.0:
                seg.mline += "+"
            else:
                seg.mline += " "
        else:   # I
            seg.model += "."
            seg.aseq += amino_sym[a].upper()
            seg.ntseq.append(codon_str)
            seg.mline += " "
        prev_nt_sub = nt_subs[2]
    if seg is not None and seg.gto == 0:
        seg.gto = path_seq.to_global(prev_nt_sub)

    if len(segs) == 0:
        return None

    # --- per-exon info + scores (ref: p7_splice_ScoreExons) ----------
    start_i = tr.i[z1] - 1
    scale = float(np.log(np.maximum(oxf.scale[:start_i + 1],
                                    1e-300)).sum()) \
        if start_i >= 0 else 0.0
    if start_i == 0:
        start_score = 0.0
    else:
        start_score = math.log(max(float(oxf.xC[start_i]), 1e-300)) + scale
    remainder = 0
    end_i = start_i
    end_score = start_score
    for e, seg in enumerate(segs):
        exon_nuc_len = abs(seg.gto - seg.gfrom) + 1
        if e > 0:
            if remainder == 1:
                exon_nuc_len += 1
            elif remainder == 2:
                exon_nuc_len -= 1
        remainder = exon_nuc_len % 3
        if remainder == 1:
            exon_nuc_len -= 1
        elif remainder == 2:
            exon_nuc_len += 1
        exon_amino_len = max(1, exon_nuc_len // 3)
        start_i2, start_score2 = end_i, end_score
        end_i = min(start_i2 + exon_amino_len, n)
        for i in range(start_i2 + 1, end_i + 1):
            scale += math.log(max(float(oxf.scale[i]), 1e-300))
        end_score = math.log(max(float(oxf.xC[end_i]), 1e-300)) + scale
        exon_score = end_score - start_score2
        bg.set_length(exon_amino_len)
        nullsc = bg.null_one(exon_amino_len)
        exon_score -= math.log(2.0 / (n + 2.0))
        exon_score += 2 * math.log(2.0 / (exon_amino_len + 2.0))
        score_bits = (exon_score - nullsc) / LOG2
        lnP = exp_logsurv(score_bits, om.evparam[C.EV_FTAU],
                          om.evparam[C.EV_FLAMBDA])
        npos = sum(1 for cch, ach in zip(seg.model, seg.aseq)
                   if cch.upper() == ach and cch != ".")
        nali = max(1, len(seg.aseq.replace("-", "")))
        info = ExonInfo(hmm_from=seg.kfrom, hmm_to=seg.kto,
                        seq_from=seg.gfrom, seq_to=seg.gto,
                        score=score_bits, lnP=lnP,
                        pid=100.0 * npos / nali,
                        signal=getattr(seg, "_pending_signal", "----"))
        # mean posterior over the exon's aminos
        pps = [tr.pp[z] for z in range(z1, z2 + 1)
               if tr.st[z] in (C.T_M, C.T_I)
               and start_i2 < tr.i[z] <= end_i]
        info.pp = float(np.mean(pps)) if pps else 0.0
        exons.append(info)

    res.exons = exons
    res.segments = segs
    return res
