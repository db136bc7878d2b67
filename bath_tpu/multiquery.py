"""Multi-query (Pfam-scale) drive: one pass over the target, device
gate batches packed ACROSS models.

The reference re-enters its serial per-query loop for every HMM in
the query file (ref: /root/reference/src/bathsearch.c:737-988),
re-reading and re-translating the whole target each time and running
each model's filter cascade in isolation.  At a few hundred models
per query file that leaves every model with a handful of gate
survivors per target chunk — far too few to amortize device calls on
their own.  The TPU-native restructure:

* the target window stream, digitization, and ORF extraction run
  ONCE and are shared by every query (ORF lists are query-independent:
  they depend only on the genetic code and minlen);
* the host filter family (MSV/bias/Viterbi — the reference's 8/16-bit
  SIMD tier, here the native AVX-512 batch) runs per query over the
  shared ORFs, exactly as the numpy backend does;
* every f32 device stage (Forward F3/F4 gate, fused domain decoding,
  fs3-Forward gate, fused fs domain decoding) batches its survivors
  across ALL queries with the model id as a batch coordinate — the
  lane-packed multi-model kernels of ops/jaxk/multimodel.py;
* output is buffered per query and written in query order, so bytes
  match the serial per-query loop (asserted by
  tests/test_multiquery.py against the numpy backend).

Window-boundary note: the serial loop reads windows with per-query
overlap (om->max_length*3, bathsearch.c:1099); the shared stream uses
the maximum over the query set.  A larger overlap only widens window
context; duplicate hits from overlap regions are removed by the same
RemoveDuplicates discipline either way (SURVEY.md section 5
long-context), and the byte-parity tests pin equality on mixed-M
query sets.  One consequence at database scale: a query whose serial
overlap is smaller than the shared maximum can see a boundary ORF
its serial stream would split, so its per-query FILTER-COUNT
statistics lines may differ by that ORF's residues (observed: one
query of 200 on a 5 Mb drive, +384 of 293k SSV-passing residues);
hits, scores, and alignments remain byte-identical.
"""

from __future__ import annotations

import io
import os
import time

import numpy as np

from . import constants as C
from . import stats
from .bg import Background
from .gencode import extract_orfs
from .oprofile import oprofile_convert
from .pipeline import (DEVICE_GATE_BAND, Pipeline, pipeline_fwd_stage,
                       pipeline_gate_plan, pipeline_gates,
                       statistics_text)
from .profile import profile_config, profile_config_fs
from .scoredata import score_data_create
from .sequence import read_windows
from .tophits import IS_INCLUDED, IS_REPORTED, TopHits

F32 = np.float32

# packed-call geometry: (per-model lane block Mg, models per call G)
# per size class, plus the column ladders.  One compiled executable
# per (kernel, class, B) — keep the set tiny (compiles are
# minutes-slow on tunneled backends, amortized via the persistent
# cache).
_CLASSES = ((256, 8), (512, 4))          # (Mg, G) — fwd/domdec
_CLASSES_FS = ((256, 4), (512, 2))       # fs3 carries 15 rings: fewer lanes
_FWD_L = 512
_FWD_B = (128, 1024)
_DD_L = 512
_DD_B = (128, 512)
_FS3_L = 4096
_FS3_B = (32, 256)
_FS3DD_L = 4096
_FS3DD_B = (8, 64)

# Adaptive device engagement: a stage goes to the device only when
# its pending DP volume exceeds what the host could do in roughly the
# stage's dispatch+pack-shipping cost.  At Pfam scale the std drive's
# f32 volumes are tiny (9721 F2-surviving ORFs ~= 44M cells — host
# milliseconds) while ~25 packed calls cost ~25s over the tunnel
# (measured r4); the fs3 gate is the opposite (10+ Gc vs 0.69 GCUPS
# host).  Volumes in DP cells; override via env for experiments.
_DEV_MIN = {
    "fwd": float(os.environ.get("BATH_MQ_FWD_MIN_CELLS", 2e9)),
    "domdec": float(os.environ.get("BATH_MQ_DD_MIN_CELLS", 2e9)),
    "fs3": float(os.environ.get("BATH_MQ_FS3_MIN_CELLS", 2e8)),
    "fs3dd": float(os.environ.get("BATH_MQ_FSDD_MIN_CELLS", 2e8)),
}


def _stage_cells(items):
    return sum(ln * qs.hmm.M for qs, _d, ln in items)


class QState:
    """Per-query pipeline state for the multi-query drive."""

    def __init__(self, hmm, args, gcode, qi):
        self.hmm = hmm
        self.qi = qi
        self._gcode = gcode
        self.bg = Background()
        self.gm = profile_config(hmm, self.bg, L=100, mode=C.P7_LOCAL)
        self.om = oprofile_convert(self.gm)
        self._gm_fs5 = None      # lazy: only hit display/fs need it
        self.gm_fs3 = None       # fs-gate profile: only built in --fs
        self.om_fs3 = self.om_fs5 = None
        if args.fs or args.fsonly:
            from .ops.reference.fwdback_fs import fs_oprofile_convert
            self.gm_fs3 = profile_config_fs(hmm, self.bg, gcode, 3,
                                            100, C.P7_LOCAL)
            self.om_fs3 = fs_oprofile_convert(self.gm_fs3)
            self.om_fs5 = fs_oprofile_convert(self.gm_fs5)
        self.data = score_data_create(self.om)
        from .cli.bathsearch import make_pipeline
        self.pli = make_pipeline(args)
        self.pli.nmodels = 1
        self.pli.nnodes = hmm.M
        self.pli.W = self.om.max_length
        if self.pli.do_biasfilter:
            self.bg.set_filter(self.om.M, self.om.compo)
        self.th = TopHits()
        self.hit_windows: list = []
        # device-side component dicts, built lazily (multimodel.py)
        self.comps: dict = {}
        # packed domain-decoding caches, reset per flush
        self.dd_cache: dict = {}
        self.fsdd_cache: dict = {}

    @property
    def gm_fs5(self):
        """Built on first use: every query pays ~13ms for the
        5-codon profile, but only queries with F3 survivors (hit
        display) or --fs mode ever read it."""
        if self._gm_fs5 is None:
            self._gm_fs5 = profile_config_fs(
                self.hmm, self.bg, self._gcode, 5, 100, C.P7_LOCAL)
        return self._gm_fs5

    def size_class(self, classes):
        for ci, (Mg, _G) in enumerate(classes):
            if self.hmm.M <= Mg - 1:
                return ci
        return None


class PackedGates:
    """Fixed multi-model packs + batched device calls.

    Queries are assigned to packs per size class in arrival order;
    pack parameters are packed once and stay device-resident, so a
    flush costs only its batch transfers + one fetch per stage."""

    def __init__(self, queries: list[QState], mesh_sharding=None):
        self.queries = queries
        # data-parallel GSPMD mesh (bathsearch --mesh N): packed
        # batches are sharded on the lane dim, pack parameters
        # replicate, results gather — the multi-model analogue of
        # DeviceCascade's mesh_sharding (parallel/mesh.py)
        self.mesh_sharding = mesh_sharding
        # stall watchdog, same contract as DeviceCascade._guard: a
        # flush that exceeds its deadline surrenders the device for
        # the drive and every stage returns its [None]*n host
        # fallback (byte-identical output either way)
        self.surrendered = False
        self.device_blocked_s = 0.0
        # no jax work at construction: the adaptive thresholds may
        # keep the whole drive on host; _enable_compile_cache (which
        # also performs deferred axon registration) runs at the first
        # packed dispatch instead
        # pack membership per (kind-class-geometry)
        self._slots: dict = {}      # (family, qi) -> (class, pack, slot)
        self._packs: dict = {}      # (kind, class, pack) -> pack obj
        self._assign("std", _CLASSES,
                     lambda q: q.size_class(_CLASSES))
        self._assign("fs", _CLASSES_FS,
                     lambda q: q.size_class(_CLASSES_FS)
                     if q.om_fs3 is not None else None)

    def _assign(self, family, classes, class_of):
        counts = [0] * len(classes)
        for q in self.queries:
            ci = class_of(q)
            if ci is None:
                continue
            G = classes[ci][1]
            pos = counts[ci]
            counts[ci] += 1
            self._slots[(family, q.qi)] = (ci, pos // G, pos % G)

    def _pack_members(self, family, classes, ci, pk):
        G = classes[ci][1]
        out = [None] * G
        for q in self.queries:
            s = self._slots.get((family, q.qi))
            if s and s[0] == ci and s[1] == pk:
                out[s[2]] = q
        return out

    def _get_pack(self, kind, family, classes, ci, pk, build, comp):
        key = (kind, ci, pk)
        p = self._packs.get(key)
        if p is None:
            members = self._pack_members(family, classes, ci, pk)
            comps = []
            for q in members:
                if q is None:
                    break
                if kind not in q.comps:
                    q.comps[kind] = comp(q)
                comps.append(q.comps[kind])
            Mg, G = classes[ci]
            p = build(comps, G, Mg)
            self._packs[key] = p
        return p

    # ---- generic packed-batch runner ------------------------------
    def _run(self, items, family, classes, kind, build, comp, call,
             Lb, Bladder, pad_value, out_rows):
        """Watchdog-guarded packed batch: items [(qs, dsq, length)]
        -> aligned result list (None = caller must use its
        host/single-model fallback — also the stall-surrender
        value)."""
        import sys
        import time as _time

        from .device_pipeline import _call_with_deadline
        n = len(items)
        if self.surrendered:
            return [None] * n
        cells = _stage_cells(items)
        base = float(os.environ.get("BATH_DEVICE_FLUSH_TIMEOUT", 300))
        t = None if base <= 0 else base + cells / 1e9
        hang = os.environ.get("BATH_DEVICE_HANG")
        thunk = lambda: self._run_impl(items, family, classes, kind,
                                       build, comp, call, Lb, Bladder,
                                       pad_value, out_rows)
        if hang and hang.split(":")[0] == "mq-" + kind:
            secs = float(hang.split(":")[1]) if ":" in hang else 3600.0
            real = thunk

            def thunk():
                _time.sleep(secs)
                return real()
            t = 1.0 if t is None else min(t, 1.0)
        t0 = _time.perf_counter()
        ok, res = _call_with_deadline(thunk, t)
        if ok:
            return res
        blocked = _time.perf_counter() - t0
        self.surrendered = True
        self.device_blocked_s += blocked
        print(f"# device watchdog: packed stage {kind} exceeded its "
              f"{t:.0f}s flush deadline; surrendered to the host "
              f"path for the rest of the drive "
              f"(device_blocked_s={blocked:.1f})", file=sys.stderr)
        return [None] * n

    def _run_impl(self, items, family, classes, kind, build, comp,
                  call, Lb, Bladder, pad_value, out_rows):
        from .device_pipeline import _enable_compile_cache
        _enable_compile_cache()
        import jax.numpy as jnp
        n = len(items)
        out = [None] * n
        groups: dict = {}
        for i, (qs, dsq, ln) in enumerate(items):
            s = self._slots.get((family, qs.qi))
            if s is None or ln > Lb:
                continue
            groups.setdefault((s[0], s[1]), []).append(i)
        if not groups:
            return out
        plan = []
        for (ci, pk), idxs in groups.items():
            pack = self._get_pack(kind, family, classes, ci, pk,
                                  build, comp)
            Bmax = Bladder[-1]
            for c0 in range(0, len(idxs), Bmax):
                chunk = idxs[c0:c0 + Bmax]
                B = next(b for b in Bladder if len(chunk) <= b)
                batch = np.full((B, Lb), pad_value, np.int8)
                lens = np.ones(B, np.int32)
                slot = np.zeros(B, np.int32)
                for r, i in enumerate(chunk):
                    qs, dsq, ln = items[i]
                    batch[r, :ln] = np.asarray(dsq[:ln], np.int8)
                    lens[r] = ln
                    slot[r] = self._slots[(family, qs.qi)][2]
                res = call(pack, self._put(batch), self._put(lens),
                           self._put(slot))
                if out_rows == 4:
                    # pack the four posterior components into ONE
                    # device array per call so the stage can fetch
                    # once (see below)
                    bt, et, mo, ok = res
                    okb = jnp.broadcast_to(
                        ok.astype(jnp.float32)[:, None], bt.shape)
                    res = jnp.concatenate([bt, et, mo, okb], axis=0)
                plan.append((chunk, res))
        # ONE dependent device concat + ONE fetch for the whole stage:
        # per-array device_get over the tunneled backend costs a full
        # ~0.5s sync round trip EACH (measured: 140 fetches = 80s of a
        # 135s drive) — the same rule device_pipeline.run_bucketed
        # follows.
        if len(plan) == 1:
            fetched = [np.asarray(plan[0][1])]
        else:
            allv = np.asarray(jnp.concatenate([p[1] for p in plan]))
            sizes = [p[1].shape[0] for p in plan]
            fetched = np.split(allv, np.cumsum(sizes)[:-1])
        for (chunk, _), res in zip(plan, fetched):
            if out_rows == 4:
                res = res.reshape(4, -1, res.shape[-1])
            for r, i in enumerate(chunk):
                if out_rows == 1:
                    out[i] = float(res[r])
                else:
                    out[i] = (res[0, r], res[1, r], res[2, r],
                              bool(res[3, r, 0]))
        return out

    def _put(self, arr):
        if self.mesh_sharding is None:
            return arr
        import jax
        return jax.device_put(arr, self.mesh_sharding)

    def fwd_scores(self, items):
        from .ops.jaxk import multimodel as mm
        return self._run(
            items, "std", _CLASSES, "fwd", mm.build_fwd_pack,
            lambda q: mm.fwd_components(q.om),
            lambda p, b, l, s: mm.fwd_pack_scores(p, b, l, s, nj=1.0),
            _FWD_L, _FWD_B, 28, 1)

    def domdec(self, items):
        from .ops.jaxk import multimodel as mm
        return self._run(
            items, "std", _CLASSES, "domdec", mm.build_domdec_pack,
            lambda q: mm.domdec_components(q.om),
            lambda p, b, l, s: mm.domdec_pack_batch(p, b, l, s,
                                                   nj=1.0),
            _DD_L, _DD_B, 28, 4)

    def fs3_scores(self, items):
        from .ops.jaxk import multimodel as mm
        return self._run(
            items, "fs", _CLASSES_FS, "fs3", mm.build_fs3_pack,
            lambda q: mm.fs3_components(q.om_fs3),
            lambda p, b, l, s: mm.fs3_pack_scores(p, b, l, s, nj=1.0),
            _FS3_L, _FS3_B, 17, 1)

    def fs3_domdec(self, items, dec_loop):
        from .ops.jaxk import multimodel as mm
        return self._run(
            items, "fs", _CLASSES_FS, "fs3dd",
            mm.build_fs3_domdec_pack,
            lambda q: mm.fs3_domdec_components(q.om_fs3),
            lambda p, b, l, s: mm.fs3_domdec_pack_batch(
                p, b, l, s, np.full(len(l), dec_loop, np.float32),
                nj=1.0),
            _FS3DD_L, _FS3DD_B, 17, 4)


class MQEntry:
    __slots__ = ("window", "seqid", "complementarity", "orfs", "tid",
                 "nres_at", "orfs_d")

    def __init__(self, window, seqid, complementarity, orfs, tid,
                 nres_at):
        self.window = window
        self.seqid = seqid
        self.complementarity = complementarity
        self.orfs = orfs
        # {d (nt of extra shared context) -> resliced ORF view}:
        # queries whose serial overlap is smaller than the shared
        # stream's see the serial ORF set (gencode.reslice_orfs);
        # same-overlap queries share one view
        self.orfs_d = {}
        self.tid = tid
        # residue count as of this window in the serial stream: the
        # early domain keep-filter reads pli.Z = nres/max_length at
        # domain-definition time (ref p7_pipeline.c:1230-1249 via
        # _postdomaindef_bath), so each entry must see the serial
        # value, not 0 and not the final total
        self.nres_at = nres_at


class _CombinedOrfs:
    """Flat/offs/lens view spanning every entry of a chunk: the
    native MSV/Viterbi batch interfaces take any object with these
    three arrays, so the host filter family runs ONCE per query per
    flush instead of once per (query, window) — per-call OpenMP spawn
    and ctypes marshalling were ~9s of a 200-model drive."""
    __slots__ = ("flat", "offs", "lens")

    def __init__(self, flat, offs, lens):
        self.flat = flat
        self.offs = offs
        self.lens = lens

    def __len__(self):
        return len(self.lens)


def _combine_flat(chunk, skip):
    """One concatenated amino stream + per-entry base offsets for the
    whole chunk.  Every overlap group's ORF views share each entry's
    flat buffer (reslice_orfs only rewrites offs/lens), so the
    expensive concat happens ONCE per flush and groups differ only in
    their metadata arrays.  Returns None when any live entry lacks
    the flat layout (pure-Python extractor)."""
    flats, bases = [], []
    base = 0
    for e, sk in zip(chunk, skip):
        if sk or getattr(e.orfs, "flat", None) is None:
            if not sk and e.orfs is not None and len(e.orfs):
                return None
            bases.append(0)
            continue
        f = np.asarray(e.orfs.flat)     # keep the extractor's dtype
        flats.append(f)
        bases.append(base)
        base += len(f)
    if not flats:
        return None
    return (flats[0] if len(flats) == 1 else np.concatenate(flats),
            bases)


def _combine_orfs(orf_lists, skip, shared):
    """Chunk-wide ORF metadata over one overlap group's per-entry ORF
    lists, against the flush-wide flat stream from _combine_flat;
    returns (combined, spans) with spans[k] = (lo, hi) into the
    combined arrays, or (None, _) when the flat layout is absent."""
    if shared is None:
        return None, None
    flat_all, bases = shared
    offs, lens, spans = [], [], []
    cnt = 0
    for ol, sk, base in zip(orf_lists, skip, bases):
        if sk or getattr(ol, "flat", None) is None:
            spans.append((cnt, cnt))
            continue
        offs.append(np.asarray(ol.offs, np.int64) + base)
        lens.append(np.asarray(ol.lens, np.int32))
        spans.append((cnt, cnt + len(ol)))
        cnt += len(ol)
    if not offs:
        return None, None
    return _CombinedOrfs(flat_all, np.concatenate(offs),
                         np.concatenate(lens)), spans


def _dd_server(cache):
    """domdec_fn facade: serve device posteriors precomputed for the
    predicted survivor set; unknown items report ok=False (host
    Backward fallback — correctness never depends on the cache)."""
    def fn(orfseqs, dec_loop=None):
        btot, etot, mocc, ok = [], [], [], []
        for sq in orfseqs:
            v = cache.get(id(sq))
            if v is None:
                btot.append(None)
                etot.append(None)
                mocc.append(None)
                ok.append(False)
            else:
                btot.append(v[0])
                etot.append(v[1])
                mocc.append(v[2])
                ok.append(bool(v[3]))
        return btot, etot, mocc, ok
    return fn


_MQ_STATS = os.environ.get("BATH_MQ_STATS")


def _phase_clock():
    marks = [("start", time.perf_counter())]

    def mark(name):
        marks.append((name, time.perf_counter()))

    def report(where):
        if not _MQ_STATS:
            return
        import sys
        parts = [f"{n}={t1 - t0:.2f}s" for (_, t0), (n, t1)
                 in zip(marks, marks[1:])]
        print(f"# mq-stats {where}: " + " ".join(parts),
              file=sys.stderr)
    return mark, report


def _entry_views(chunk, skip, ctx_q, gcode, minlen, require_init):
    """Per-entry (orfs, d) for one window-overlap group: d is the
    extra shared context beyond the group's serial overlap <ctx_q>,
    and orfs is the serial ORF set (gencode.reslice_orfs) when d > 0.
    ctx_q < 0 means the shared list verbatim (the largest query, or
    a pinned/disabled configuration)."""
    from .gencode import reslice_orfs
    out = []
    for e, sk in zip(chunk, skip):
        d = 0
        if not sk and ctx_q >= 0:
            d = max(0, (e.window.n - e.window.W) - ctx_q)
        if d <= 0 or d % 3:
            # d % 3 != 0 only under exotic --block_length < overlap
            # configs; keep the shared list there (the pre-r5
            # documented divergence) rather than mis-slice
            out.append((e.orfs, 0))
            continue
        v = e.orfs_d.get(d)
        if v is None:
            v = reslice_orfs(
                e.orfs, d, L=e.window.n,
                is_revcomp=bool(e.complementarity), minlen=minlen,
                require_initiator=require_init, gcode=gcode,
                dsq=e.window.dsq)
            e.orfs_d[d] = v
        out.append((v, d))
    return out


def flush_multi(chunk: list[MQEntry], queries: list[QState],
                pg: PackedGates, gcode, fs_mode: bool,
                minlen: int = 20, require_init: bool = False,
                ctx_pinned: bool = False) -> None:
    """One chunk through the multi-query staged cascade.  Entries are
    processed in stream order within each query at every phase, so
    each query's hit ordering (and output bytes) match its serial
    per-query run.

    Byte parity includes the per-query statistics block: each
    window-overlap group sees its SERIAL ORF set via reslice_orfs
    (+ serial fs-window clamp bounds), so filter-stage residue
    counters match the serial per-query stream exactly (VERDICT r4
    item 7; ref bathsearch.c:1099, p7_pipeline.c:1835).
    <ctx_pinned>: BATH_WINDOW_CONTEXT pinned the overlap for every
    backend — no reslicing."""
    from .pipeline_fs import fs_gate_and_define, fs_prepare
    mark, report = _phase_clock()

    nq = len(queries)
    ne = len(chunk)
    skip = [e.orfs is None or len(e.orfs) == 0 or e.window.n < 15
            for e in chunk]

    # Phase A: host gates (native MSV/bias/Vit + captures) per (q, e)
    gates: dict = {}
    hits_qe = [[TopHits() for _ in range(ne)] for _ in range(nq)]
    wspan = [[None] * ne for _ in range(nq)]
    use_combined = os.environ.get("BATH_MQ_COMBINED", "1") != "0"
    reslice_on = not ctx_pinned and \
        os.environ.get("BATH_MQ_RESLICE", "1") != "0"
    qgroups: dict = {}
    for qi, qs in enumerate(queries):
        # group key = the query's own serial overlap; _entry_views
        # derives d per entry from the window's ACTUAL carried
        # context (n - W), so the stream-wide max query naturally
        # gets d=0 — no shortcut keyed on a local max, which would
        # be wrong for the query-sharded pool's sub-lists
        key = -1 if not reslice_on else qs.om.max_length * 3
        qgroups.setdefault(key, []).append(qi)
    views = [None] * nq                 # per-query per-entry (orfs, d)
    comb_of = [None] * nq
    shared_flat = _combine_flat(chunk, skip) if use_combined else None
    for key, qis in qgroups.items():
        ov = _entry_views(chunk, skip, key, gcode, minlen,
                          require_init)
        cg = _combine_orfs([o for o, _ in ov], skip, shared_flat) \
            if use_combined else (None, None)
        for qi in qis:
            views[qi] = ov
            comb_of[qi] = cg
    from .native import msv_filter_native_batch, vit_filter_score_batch
    for qi, qs in enumerate(queries):
        combined, cspans = comb_of[qi]
        # ONE native MSV call per query over the whole chunk's ORFs
        usc_all = msv_filter_native_batch(combined, qs.om) \
            if combined is not None else None
        plans = [None] * ne
        for k, e in enumerate(chunk):
            if skip[k]:
                continue
            lo, hi = cspans[k] if usc_all is not None else (0, 0)
            plans[k] = pipeline_gate_plan(
                qs.pli, qs.om, qs.bg, e.window, views[qi][k][0],
                usc_pre=None if usc_all is None else usc_all[lo:hi])
        # ONE native ViterbiFilter call per query over the chunk's
        # bias survivors (bit-identical to the per-window batch)
        vslices = [None] * ne
        if combined is not None:
            vidx = []
            for k in range(ne):
                p = plans[k]
                if p is not None and p.vit_idx is not None \
                        and len(p.vit_idx):
                    vidx.append(cspans[k][0] + p.vit_idx)
            if vidx:
                gidx = np.concatenate(vidx)
                vsc = vit_filter_score_batch(combined, gidx, qs.om)
                if vsc is not None:
                    pos = 0
                    for k in range(ne):
                        p = plans[k]
                        nv = len(p.vit_idx) if p is not None and \
                            p.vit_idx is not None else 0
                        if nv:
                            vslices[k] = vsc[pos:pos + nv]
                            pos += nv
        for k, e in enumerate(chunk):
            if skip[k]:
                gates[(qi, k)] = ([], [], [], [])
                wspan[qi][k] = (len(qs.hit_windows),
                                len(qs.hit_windows))
                continue
            lo = len(qs.hit_windows)
            res = pipeline_gates(qs.pli, qs.om, qs.data, qs.bg,
                                 e.window, views[qi][k][0],
                                 qs.hit_windows,
                                 e.seqid, e.complementarity,
                                 plan=plans[k], vitsc=vslices[k])
            gates[(qi, k)] = res
            wspan[qi][k] = (lo, len(qs.hit_windows))

    mark("gates")
    # Phase B: packed Forward gate over every candidate of every query
    items = []
    spans: dict = {}
    for qi, qs in enumerate(queries):
        for k in range(ne):
            cands = gates[(qi, k)][0]
            lo = len(items)
            items.extend((qs, c.orfsq.dsq, c.orfsq.n) for c in cands)
            spans[(qi, k)] = (lo, len(items))
    use_fwd = items and _stage_cells(items) >= _DEV_MIN["fwd"]
    fwd_all = pg.fwd_scores(items) if use_fwd else [None] * len(items)
    mark(f"fwd[{len(items)}{'' if use_fwd else ' host'}]")

    # Phase C (std): predicted F3 survivors -> packed domain decoding
    if not fs_mode:
        dd_items = []
        dd_keys = []
        for qi, qs in enumerate(queries):
            qs.dd_cache = {}
            tau = qs.om.evparam[C.EV_FTAU]
            lam = qs.om.evparam[C.EV_FLAMBDA]
            thr = qs.pli.F3 * DEVICE_GATE_BAND
            for k in range(ne):
                lo, hi = spans[(qi, k)]
                cands = gates[(qi, k)][0]
                for ci, cand in enumerate(cands):
                    sc = fwd_all[lo + ci]
                    if sc is None:
                        continue
                    P = float(stats.exp_surv(
                        (sc - cand.filtersc) / C.CONST_LOG2, tau, lam))
                    if not (P > thr):
                        dd_items.append((qs, cand.orfsq.dsq,
                                         cand.orfsq.n))
                        dd_keys.append((qs, id(cand.orfsq)))
        if dd_items and _stage_cells(dd_items) >= _DEV_MIN["domdec"]:
            for (qs, key), post in zip(dd_keys, pg.domdec(dd_items)):
                if post is not None:
                    qs.dd_cache[key] = post

    mark("domdec")
    # Phase D: host F3/F4 stage + domain definition per (q, e)
    for qi, qs in enumerate(queries):
        dd_fn = _dd_server(qs.dd_cache) \
            if not fs_mode and qs.dd_cache else None
        for k, e in enumerate(chunk):
            if skip[k]:
                continue
            cands, P_orf, fwdsc_arr, oxf_holder = gates[(qi, k)]
            lo, hi = spans[(qi, k)]
            fwd_dev = None
            if use_fwd and hi > lo:
                fwd_dev = np.array(
                    [np.nan if v is None else v
                     for v in fwd_all[lo:hi]], F32)
            qs.pli.nres = e.nres_at
            pipeline_fwd_stage(qs.pli, qs.om, qs.gm, qs.gm_fs5, qs.bg,
                               hits_qe[qi][k], e.seqid, e.window,
                               qs.hit_windows, e.complementarity,
                               cands, P_orf, fwdsc_arr, oxf_holder,
                               fwd_dev=fwd_dev, domdec_fn=dd_fn)

    mark("fwd_stage")
    # Phase E (fs): window prep per (q, e), then the packed fs3 gate
    if fs_mode:
        fs_cands: dict = {}
        fs_widx: dict = {}
        fs_items = []
        fs_spans: dict = {}
        for qi, qs in enumerate(queries):
            for k, e in enumerate(chunk):
                if skip[k]:
                    fs_cands[(qi, k)] = []
                    fs_spans[(qi, k)] = (len(fs_items), len(fs_items))
                    continue
                _, P_orf, fwdsc_arr, _ = gates[(qi, k)]
                widx: dict = {}
                lo0, _hi0 = wspan[qi][k]
                ol, d = views[qi][k]
                # serial fs-window clamp bounds: the serial window is
                # d nt shorter at its context edge (left for forward,
                # right for revcomp — revcomp(x[d:]) is a prefix)
                bnd = None
                if d:
                    bnd = (1, e.window.n - d) if e.complementarity \
                        else (d + 1, e.window.n)
                cs = fs_prepare(qs.pli, qs.om, qs.data, qs.bg, ol,
                                e.window, gcode, P_orf, fwdsc_arr,
                                qs.hit_windows[lo0:],
                                e.complementarity, widx=widx,
                                bounds=bnd)
                fs_cands[(qi, k)] = cs
                fs_widx[(qi, k)] = widx
                lo = len(fs_items)
                fs_items.extend((qs, c.tmpseq.dsq, c.wlen)
                                for c in cs)
                fs_spans[(qi, k)] = (lo, len(fs_items))
        use_fs3 = fs_items and \
            _stage_cells(fs_items) / 3 >= _DEV_MIN["fs3"]
        fs3_all = pg.fs3_scores(fs_items) if use_fs3 \
            else [None] * len(fs_items)
        mark(f"fs3[{len(fs_items)}{'' if use_fs3 else ' host'}]")

        # Phase F: predicted fs survivors -> packed fs domain decoding
        fsdd_items = []
        fsdd_keys = []
        for qi, qs in enumerate(queries):
            qs.fsdd_cache = {}
            tau = qs.om_fs3.evparam[C.EV_FTAUFS3]
            lam = qs.om_fs3.evparam[C.EV_FLAMBDA]
            thr = qs.pli.F3 * DEVICE_GATE_BAND
            for k in range(ne):
                lo, hi = fs_spans[(qi, k)]
                for ci, cand in enumerate(fs_cands[(qi, k)]):
                    sc = fs3_all[lo + ci]
                    if sc is None:
                        continue
                    P = float(stats.exp_surv(
                        (sc - cand.filtersc) / C.CONST_LOG2, tau, lam))
                    if not (P > thr):
                        fsdd_items.append((qs, cand.tmpseq.dsq,
                                           cand.wlen))
                        fsdd_keys.append((qs, id(cand.tmpseq)))
        if fsdd_items and \
                _stage_cells(fsdd_items) / 3 >= _DEV_MIN["fs3dd"]:
            for (qs, key), post in zip(
                    fsdd_keys,
                    pg.fs3_domdec(fsdd_items, 100.0 / 103.0)):
                if post is not None:
                    qs.fsdd_cache[key] = post

        # Phase G: arbitration + fs domain definition per (q, e)
        for qi, qs in enumerate(queries):
            fsdd_fn = _dd_server(qs.fsdd_cache) \
                if qs.fsdd_cache else None
            for k, e in enumerate(chunk):
                if skip[k]:
                    continue
                _, P_orf, _fw, oxf_holder = gates[(qi, k)]
                lo, hi = fs_spans[(qi, k)]
                fs3_dev = None
                if use_fs3 and hi > lo:
                    fs3_dev = np.array(
                        [np.nan if v is None else v
                         for v in fs3_all[lo:hi]], F32)

                def _fsdd(seqs, dec_loop, _fn=fsdd_fn):
                    return _fn(seqs)
                if fsdd_fn is None:
                    _fsdd = None
                qs.pli.nres = e.nres_at
                fs_gate_and_define(
                    qs.pli, qs.om, qs.gm, qs.om_fs3, qs.om_fs5,
                    qs.gm_fs5, qs.bg, hits_qe[qi][k], e.seqid,
                    views[qi][k][0], e.window, gcode, P_orf,
                    oxf_holder, e.complementarity, fs_cands[(qi, k)],
                    fs3_dev=fs3_dev, fs_domdec_fn=_fsdd,
                    widx=fs_widx[(qi, k)])

    mark("fs_define" if fs_mode else "tail")
    report(f"flush[{ne}e]")
    # hits flow into each query's global list in entry (stream) order
    for qi, qs in enumerate(queries):
        for k in range(ne):
            qs.th.unsrt.extend(hits_qe[qi][k].unsrt)
    chunk.clear()


# ---------------------------------------------------------------------
# Query-sharded fork pool (bathsearch --cpu N on a multi-HMM query
# file).  The per-query work of a flush — host gates, Forward stage,
# fs branch — is independent across queries, so N workers each take a
# contiguous query slice (balanced by sum-of-M) and run flush_multi
# for the SAME chunk on their fork-copied QStates; hits and counter
# deltas return to the canonical QStates in query order, so bytes
# equal the serial drive.  The shared window stream and ORF
# extraction still happen ONCE (the whole point of the mq drive — the
# reference's per-query loop re-reads the target per model, and the
# naive per-query pool pays 200 pool setups: measured 76 s vs the
# serial loop's 55 s on 200 models x 5 Mb; this pool runs the same
# drive in ~a quarter of the host-forced mq wall).  Device stages are
# disabled inside workers (the packed batching is cross-query, which
# a query-sharded pool forgoes; plain --backend jax keeps it).
# ---------------------------------------------------------------------
_MQCTX = None

_MQ_COUNTERS = ("n_past_msv", "n_past_bias", "n_past_vit",
                "n_past_fwd", "n_output", "pos_past_msv",
                "pos_past_bias", "pos_past_vit", "pos_past_fwd",
                "pos_output")


def _mq_pool_init(wthreads):
    from .native import set_native_threads
    set_native_threads(wthreads)
    for k in _DEV_MIN:                 # never device-dispatch in a worker
        _DEV_MIN[k] = float("inf")


def _mq_pool_task(task):
    chunk, lo, hi = task
    c = _MQCTX
    queries = c["queries"][lo:hi]
    before_n = [len(q.th.unsrt) for q in queries]
    before_c = [{f: getattr(q.pli, f) for f in _MQ_COUNTERS}
                for q in queries]
    flush_multi(list(chunk), queries, c["pg"], c["gcode"],
                c["fs_mode"], minlen=c["minlen"],
                require_init=c["require_init"],
                ctx_pinned=c["ctx_pinned"])
    out = []
    for q, bn, cb in zip(queries, before_n, before_c):
        out.append((q.qi, q.th.unsrt[bn:],
                    {f: getattr(q.pli, f) - cb[f]
                     for f in _MQ_COUNTERS}))
    return out


def _balance_slices(weights, n):
    """Contiguous [lo, hi) query slices with ~equal total weight."""
    total = float(sum(weights)) or 1.0
    bounds = [0]
    acc = 0.0
    target = total / n
    for i, w in enumerate(weights):
        acc += w
        if acc >= target * len(bounds) and len(bounds) < n:
            bounds.append(i + 1)
    while len(bounds) < n + 1:
        bounds.append(len(weights))
    bounds[-1] = len(weights)
    return [(bounds[i], bounds[i + 1]) for i in range(n)
            if bounds[i] < bounds[i + 1]]


def run_multiquery(args, hmms, gcode, require_init, ofp, tblfp,
                   fstblfp) -> None:
    """The multi-query driver: shared window stream + packed device
    gates; per-query output buffered and written in query order."""
    t_start = time.time()
    queries = [QState(h, args, gcode, qi)
               for qi, h in enumerate(hmms)]
    mesh_sharding = None
    if getattr(args, "mesh", 0) and args.mesh > 1:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from .parallel.mesh import make_mesh
        mesh_sharding = NamedSharding(make_mesh(args.mesh), P("dp"))
    pg = PackedGates(queries, mesh_sharding=mesh_sharding)
    fs_mode = bool(args.fs or args.fsonly)

    ctx_pinned = bool(int(os.environ.get("BATH_WINDOW_CONTEXT", 0)))
    context = int(os.environ.get("BATH_WINDOW_CONTEXT", 0)) \
        or max(q.om.max_length for q in queries) * 3
    id_lengths: dict = {}
    nres = 0
    nseqs = 0
    seqidx = 0
    db_started = args.restrictdb_stkey is None
    db_seqs_done = 0
    strands = queries[0].pli.strands
    block_length = queries[0].pli.block_length

    CHUNK_ORFS = int(os.environ.get("BATH_CHUNK_ORFS", 1 << 20))
    chunk: list = []
    pending = 0
    tid = 0

    ncpu = max(0, int(getattr(args, "cpu", 0) or 0))
    pool = None
    slices = None
    if ncpu > 1:
        import multiprocessing as mp
        global _MQCTX
        _MQCTX = dict(queries=queries, pg=pg, gcode=gcode,
                      fs_mode=fs_mode, minlen=args.minlen,
                      require_init=require_init,
                      ctx_pinned=ctx_pinned)
        wthreads = max(1, (os.cpu_count() or 1) // ncpu)
        pool = mp.get_context("fork").Pool(
            ncpu, initializer=_mq_pool_init, initargs=(wthreads,))
        slices = _balance_slices([q.hmm.M for q in queries], ncpu)

    def _flush():
        if pool is not None:
            tasks = [pool.apply_async(_mq_pool_task,
                                      ((chunk, lo, hi),))
                     for lo, hi in slices]
            for t in tasks:
                for qi, hits, deltas in t.get():
                    queries[qi].th.unsrt.extend(hits)
                    qp = queries[qi].pli
                    for f, v in deltas.items():
                        setattr(qp, f, getattr(qp, f) + v)
            chunk.clear()
            return
        flush_multi(chunk, queries, pg, gcode, fs_mode,
                    minlen=args.minlen, require_init=require_init,
                    ctx_pinned=ctx_pinned)

    for window, is_last in read_windows(args.dbfile, context=context,
                                        block_length=block_length):
        if not db_started:
            if window.name == args.restrictdb_stkey:
                db_started = True
            else:
                continue
        if args.restrictdb_n > 0 and db_seqs_done >= args.restrictdb_n:
            break
        if is_last:
            db_seqs_done += 1
        if window.n < 15:
            if is_last:
                id_lengths[window.idx] = window.start + window.n - 1
                nseqs += 1
                seqidx += 1
            continue
        window.L = window.n
        seqid_for_hits = nseqs
        # serial nres semantics: both strands counted BEFORE the
        # window is processed (cli window_specs increments then
        # yields), so both entries carry the post-increment value
        if strands != C.STRAND_BOTTOMONLY:
            nres += window.W
        if strands != C.STRAND_TOPONLY:
            nres += window.W
        if strands != C.STRAND_BOTTOMONLY:
            orfs = extract_orfs(gcode, window.dsq, minlen=args.minlen,
                                require_initiator=require_init)
            chunk.append(MQEntry(window, seqid_for_hits,
                                 C.NOCOMPLEMENT, orfs, tid, nres))
            pending += len(orfs)
        if strands != C.STRAND_TOPONLY:
            rc = window.reverse_complement()
            orfs = extract_orfs(gcode, rc.dsq, minlen=args.minlen,
                                is_revcomp=True,
                                require_initiator=require_init)
            chunk.append(MQEntry(rc, seqid_for_hits, C.COMPLEMENT,
                                 orfs, tid, nres))
            pending += len(orfs)
        tid += 1
        if is_last:
            id_lengths[window.idx] = window.start + window.n - 1
            nseqs += 1
            seqidx += 1
        if pending >= CHUNK_ORFS:
            _flush()
            pending = 0
    if chunk:
        _flush()
    if pool is not None:
        pool.close()
        pool.join()
        _MQCTX = None

    # per-query E-values / merge / output, in query order
    # (ref: bathsearch.c:869-921 + output block :960-968)
    for nquery, qs in enumerate(queries, 1):
        pli, th, om, hmm = qs.pli, qs.th, qs.om, qs.hmm
        pli.nres = nres
        pli.nseqs = nseqs
        if args.Z is not None:
            res_cnt = int(1000000 * args.Z)
            if pli.strands == C.STRAND_BOTH:
                res_cnt *= 2
        else:
            res_cnt = pli.nres
        th.compute_evalues_bath(res_cnt, om.max_length * 3)
        th.sort_by_seqidx_and_alipos()
        for h in th.unsrt:
            if h.seqidx in id_lengths:
                h.target_len = id_lengths[h.seqidx]
                if h.dcl and h.dcl[0].ad is not None:
                    h.dcl[0].ad.L = id_lengths[h.seqidx]
        th.remove_duplicates(pli.use_bit_cutoffs)
        th.sort_by_sortkey()
        pli.Z = 1.0
        th.threshold(pli)

        pli.n_output = pli.pos_output = 0
        for h in th.hit:
            if h.flags & (IS_REPORTED | IS_INCLUDED):
                pli.n_output += 1
                for d in h.dcl:
                    pli.pos_output += 1 + abs(d.jali - d.iali)

        textw = 0 if args.notextw else args.textw
        ofp.write("Query:       %s  [M=%d]\n" % (hmm.name, hmm.M))
        if hmm.acc:
            ofp.write("Accession:   %s\n" % hmm.acc)
        if hmm.desc:
            ofp.write("Description: %s\n" % hmm.desc)
        ofp.write(th.targets_text(pli, textw))
        ofp.write("\n\n")
        ofp.write(th.domains_text(pli, textw))
        ofp.write("\n\n")
        if tblfp:
            tblfp.write(th.tabular_targets_text(
                hmm.name, hmm.acc, pli, nquery == 1))
        if fstblfp:
            fstblfp.write(th.tabular_frameshifts_text(
                hmm.name, hmm.acc, pli, nquery == 1))
        ofp.write(statistics_text(pli, time.time() - t_start))
        ofp.write("//\n")
