"""Multi-shard merge semantics: hit-record pack/gather/merge is exact
and shard-count invariant (ref: SURVEY.md section 2.4 P3/P4)."""

import numpy as np

from bath_tpu.domaindef import Domain
from bath_tpu.parallel.hitrecord import (REC_WIDTH, merge_gathered,
                                         pack_hits, unpack_hits)
from bath_tpu.tophits import Hit


def _mk(seqidx, score, lnp, iali):
    h = Hit()
    h.seqidx = seqidx
    h.score = score
    h.lnP = lnp
    h.sortkey = -lnp
    h.dcl = [Domain(iali=iali, jali=iali + 99, ihmm=1, jhmm=50)]
    return h


def test_pack_unpack_roundtrip():
    hits = [_mk(0, 47.8, -30.0, 7), _mk(1, 12.0, -5.0, 100)]
    recs = pack_hits(hits, 4)
    assert recs.shape == (4, REC_WIDTH)
    back = unpack_hits(recs)
    assert len(back) == 2
    assert abs(back[0].score - 47.8) < 1e-4
    assert back[0].dcl[0].iali == 7


def test_merge_shard_count_invariant():
    all_hits = [_mk(i % 3, 50.0 - i, -40.0 + i, 10 * i)
                for i in range(12)]
    # 2-shard split vs 4-shard split must merge identically
    def gather(nsh):
        per = len(all_hits) // nsh
        return np.stack([pack_hits(all_hits[s * per:(s + 1) * per], per)
                         for s in range(nsh)])
    a = merge_gathered(gather(2))
    b = merge_gathered(gather(4))
    assert [(round(h.score, 3), h.seqidx, h.dcl[0].iali) for h in a] == \
        [(round(h.score, 3), h.seqidx, h.dcl[0].iali) for h in b]
    assert abs(a[0].score - 50.0) < 1e-4
