"""Fixed-shape hit records for device->host transfer and cross-host
merges (the TPU equivalent of the reference's hit serialization,
ref: hmmer.h p7_hit_Serialize/Deserialize :1402-1403; SURVEY.md
section 2.4 P4).

Scores/coords of one candidate hit are packed into a flat float32
vector so shards can all_gather a [n_shards, K, REC_WIDTH] tensor of
their local top-K and the host performs the exact canonical merge
(same ordering rules as TopHits.sort_by_sortkey).
"""

from __future__ import annotations

import numpy as np

# record layout (float32 slots)
R_SEQIDX, R_SCORE, R_LNP, R_IALI, R_JALI, R_IHMM, R_JHMM, \
    R_BIAS, R_FS, R_VALID = range(10)
REC_WIDTH = 10


def pack_hits(hits, k: int) -> np.ndarray:
    """Top-K hit records from a list of Hit objects -> [k, REC_WIDTH]
    float32 (invalid rows zeroed with R_VALID=0)."""
    out = np.zeros((k, REC_WIDTH), dtype=np.float32)
    ordered = sorted(hits, key=lambda h: -h.sortkey)[:k]
    for i, h in enumerate(ordered):
        d = h.dcl[0] if h.dcl else None
        out[i, R_SEQIDX] = h.seqidx
        out[i, R_SCORE] = h.score
        out[i, R_LNP] = h.lnP
        if d is not None:
            out[i, R_IALI] = d.iali
            out[i, R_JALI] = d.jali
            out[i, R_IHMM] = d.ihmm
            out[i, R_JHMM] = d.jhmm
            out[i, R_BIAS] = d.dombias
        out[i, R_FS] = 1.0 if h.frameshift else 0.0
        out[i, R_VALID] = 1.0
    return out


def unpack_hits(recs: np.ndarray):
    """[n, REC_WIDTH] -> list of Hit objects (score/coord fields only;
    alignment displays stay shard-local and are fetched lazily)."""
    from ..domaindef import Domain
    from ..tophits import Hit

    out = []
    for row in np.asarray(recs).reshape(-1, REC_WIDTH):
        if row[R_VALID] < 0.5:
            continue
        h = Hit()
        h.seqidx = int(row[R_SEQIDX])
        h.score = float(row[R_SCORE])
        h.lnP = float(row[R_LNP])
        h.sum_lnP = h.lnP
        h.sortkey = -h.lnP
        h.frameshift = bool(row[R_FS] > 0.5)
        d = Domain(iali=int(row[R_IALI]), jali=int(row[R_JALI]),
                   ihmm=int(row[R_IHMM]), jhmm=int(row[R_JHMM]),
                   dombias=float(row[R_BIAS]),
                   bitscore=float(row[R_SCORE]),
                   lnP=float(row[R_LNP]))
        h.dcl = [d]
        out.append(h)
    return out


def merge_gathered(gathered: np.ndarray):
    """[n_shards, K, REC_WIDTH] all_gather result -> canonically
    sorted Hit list (ref: p7_tophits_Merge + SortBySortkey)."""
    hits = unpack_hits(gathered.reshape(-1, REC_WIDTH))
    hits.sort(key=lambda h: (-h.sortkey, h.seqidx,
                             h.dcl[0].iali if h.dcl else 0))
    return hits
