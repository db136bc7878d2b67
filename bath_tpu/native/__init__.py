"""ctypes bindings for the native C++ host runtime (native/src/
bathio.cpp): digitization, reverse complement, six-frame ORF
extraction, frame translation.

The native library is optional: every entry point has a pure-Python
fallback (see gencode.extract_orfs), and the loader builds the .so on
demand with g++ when it is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO = os.path.join(_ROOT, "native", "libbathio.so")
_SRC = os.path.join(_ROOT, "native", "src", "bathio.cpp")

I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
I8P = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    try:
        # -ffp-contract=off: the float parsers are bit-exactness
        # contracts (FMA contraction under -march=native would change
        # results); integer filters are unaffected either way
        subprocess.run(["g++", "-O3", "-march=native",
                        "-ffp-contract=off", "-fopenmp", "-shared",
                        "-fPIC", "-o", _SO, _SRC], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    stale = (os.path.exists(_SO) and os.path.exists(_SRC)
             and os.path.getmtime(_SO) < os.path.getmtime(_SRC))
    if (not os.path.exists(_SO) or stale) and not _build():
        if not os.path.exists(_SO):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.bio_digitize.restype = ctypes.c_int
    lib.bio_digitize.argtypes = [ctypes.c_char_p, ctypes.c_int64, I8P,
                                 I32P]
    lib.bio_revcomp.restype = None
    lib.bio_revcomp.argtypes = [I32P, ctypes.c_int64, I32P, I32P]
    lib.bio_extract_orfs.restype = ctypes.c_int
    lib.bio_extract_orfs.argtypes = [
        I32P, ctypes.c_int64, I32P, U8P, U8P, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        I32P, I32P]
    lib.bio_translate_frame.restype = None
    lib.bio_translate_frame.argtypes = [
        I32P, ctypes.c_int64, ctypes.c_int, I32P, U8P, ctypes.c_int,
        I32P, ctypes.POINTER(ctypes.c_int64)]
    _LIB = lib
    return lib


def available() -> bool:
    return get_lib() is not None


# --- cached per-gencode native tables --------------------------------
_MASKS_CACHE: dict[int, np.ndarray] = {}


def nt_masks(abc) -> np.ndarray:
    """[Kp] 4-bit masks of compatible canonical nucleotides."""
    key = id(abc)
    if key not in _MASKS_CACHE:
        m = np.zeros(abc.Kp, dtype=np.uint8)
        for x in range(abc.Kp):
            bits = 0
            for a in range(4):
                if abc.degen[x, a]:
                    bits |= 1 << a
            m[x] = bits
        _MASKS_CACHE[key] = m
    return _MASKS_CACHE[key]


def extract_orfs_native(gcode, dsq: np.ndarray, *, minlen: int = 20,
                        is_revcomp: bool = False,
                        require_initiator: bool = False):
    """Native six-frame ORF extraction; returns list[Orf] identical to
    gencode.extract_orfs, or None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from ..gencode import Orf
    dsq = np.ascontiguousarray(dsq, dtype=np.int32)
    L = len(dsq)
    basic = np.ascontiguousarray(gcode.basic, dtype=np.int32)
    masks = nt_masks(gcode.nt_abc)
    is_init = np.ascontiguousarray(
        gcode.is_initiator.astype(np.uint8))
    stop = gcode.aa_abc.Kp - 2
    anyaa = gcode.aa_abc.Kp - 3
    aa_out = np.empty(max(L, 4), dtype=np.int32)
    meta = np.empty(4 * (L // 3 + 4), dtype=np.int32)
    n = lib.bio_extract_orfs(dsq, L, basic, masks, is_init, stop,
                             anyaa, minlen, int(require_initiator),
                             int(is_revcomp), aa_out, meta)
    from ..gencode import OrfList
    mv = meta[:4 * n].reshape(n, 4)
    lens = mv[:, 3].astype(np.int64)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:]) if n else None
    flat = aa_out[:int(lens.sum())].copy()
    orfs = OrfList(
        Orf(flat[offs[i]:offs[i] + lens[i]], int(mv[i, 0]),
            int(mv[i, 1]), int(mv[i, 2])) for i in range(n))
    # flat layout kept for batch filter calls (no re-concatenation)
    orfs.flat, orfs.offs, orfs.lens = flat, offs, lens.astype(np.int32)
    return orfs


def _bind_filters(lib):
    F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.bio_bg_hmm_forward.restype = None
    lib.bio_bg_hmm_forward.argtypes = [
        I32P, ctypes.c_int64, F32P, F32P, F32P, F32P,
        ctypes.POINTER(ctypes.c_float)]
    lib.bio_f32_seq_sum.restype = ctypes.c_float
    lib.bio_f32_seq_sum.argtypes = [F32P, ctypes.c_int64]
    lib.bio_msv_filter.restype = ctypes.c_int
    lib.bio_msv_filter.argtypes = [
        I32P, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"),
        I32P, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float)]
    # raw-pointer bindings: these run once per DP row, so the
    # ndpointer validation cost matters — callers guarantee
    # C-contiguous float32
    VP = ctypes.c_void_p
    lib.bio_dd_closure_f32.restype = None
    lib.bio_dd_closure_f32.argtypes = [VP, VP, ctypes.c_int]
    lib.bio_bwd_d_fs_f32.restype = None
    lib.bio_bwd_d_fs_f32.argtypes = [VP, VP, VP, VP,
                                     ctypes.c_float, ctypes.c_int]
    lib.bio_bwd_dd_f32.restype = None
    lib.bio_bwd_dd_f32.argtypes = [VP, VP, ctypes.c_int]
    F32C = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.bio_fs3_parser_score.restype = ctypes.c_int
    lib.bio_fs3_parser_score.argtypes = (
        [I32P, I32P, I32P, ctypes.c_int64, F32C, ctypes.c_int]
        + [F32C] * 8
        + [F32C, F32C, ctypes.POINTER(ctypes.c_float)])
    lib.bio_fwd_parser_score.restype = ctypes.c_int
    lib.bio_fwd_parser_score.argtypes = (
        [I32P, ctypes.c_int64, F32C, ctypes.c_int]
        + [F32C] * 8
        + [F32C, F32C, ctypes.POINTER(ctypes.c_float)])
    lib.bio_fs5_forward_score.restype = ctypes.c_int
    lib.bio_fs5_forward_score.argtypes = (
        [I32P, I32P, I32P, I32P, I32P, ctypes.c_int64, F32C,
         ctypes.c_int]
        + [F32C] * 8
        + [F32C, F32C, ctypes.POINTER(ctypes.c_float)])
    lib.bio_msv_filter_batch.restype = None
    lib.bio_msv_filter_batch.argtypes = [
        I32P, np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        I32P, I32P, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"),
        I32P, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
    lib.bio_vit_filter.restype = ctypes.c_int
    lib.bio_vit_filter.argtypes = [
        I32P, ctypes.c_int64, I32P, I32P, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float)]


_FILTER_CACHE: dict = {}


def _packed_filters(om):
    key = id(om)
    ent = _FILTER_CACHE.get(key)
    if ent is None or ent[0] is not om.sbv:
        sbv = np.ascontiguousarray(om.sbv.astype(np.int16))
        rbv = np.ascontiguousarray(om.rbv.astype(np.int32))
        rwv = np.ascontiguousarray(om.rwv.astype(np.int32))
        twv = np.ascontiguousarray(om.twv.astype(np.int32))
        ent = (om.sbv, sbv, rbv, rwv, twv)
        _FILTER_CACHE[key] = ent
    return ent[1], ent[2], ent[3], ent[4]


def msv_filter_native(dsq: np.ndarray, om) -> float | None:
    """Bit-exact native MSV filter; None if the library is absent."""
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "_filters_bound"):
        _bind_filters(lib)
        lib._filters_bound = True
    sbv, rbv, _, _ = _packed_filters(om)
    out = ctypes.c_float()
    dsq = np.ascontiguousarray(dsq, dtype=np.int32)
    st = lib.bio_msv_filter(dsq, len(dsq), sbv, rbv, om.Kp, om.M,
                            int(om.base_b), int(om.tec_b),
                            int(om.tjb_b), int(om.tbm_b),
                            int(om.bias_b), float(om.scale_b),
                            ctypes.byref(out))
    return float("inf") if st == 1 else float(out.value)


_DD_FNS = None


def _dd_fns():
    global _DD_FNS
    if _DD_FNS is None:
        lib = get_lib()
        if lib is None:
            _DD_FNS = False
        else:
            if not hasattr(lib, "_filters_bound"):
                _bind_filters(lib)
                lib._filters_bound = True
            _DD_FNS = (lib.bio_dd_closure_f32, lib.bio_bwd_d_fs_f32,
                       lib.bio_bwd_dd_f32)
    return _DD_FNS


def dd_closure_native(dc: np.ndarray, tdd: np.ndarray, M: int) -> bool:
    """In-place sequential DD closure in C, bit-identical to the
    Python loop.  Returns False if the library is absent."""
    fns = _dd_fns()
    if not fns:
        return False
    fns[0](dc.ctypes.data, tdd.ctypes.data, M)
    return True


def bwd_d_fs_native(nd, tdm, iv1, tdd, xE, M: int) -> bool:
    """new_d[k] = tdm[k]*iv1[k] + tdd[k]*new_d[k+1] + xE, k=M-1..1."""
    fns = _dd_fns()
    if not fns:
        return False
    fns[1](nd.ctypes.data, tdm.ctypes.data, iv1.ctypes.data,
           tdd.ctypes.data, float(xE), M)
    return True


def bwd_dd_native(dc, tdd, M: int) -> bool:
    """dc[k] = dc[k] + dc[k+1]*tdd[k+1], k=M-1..1."""
    fns = _dd_fns()
    if not fns:
        return False
    fns[2](dc.ctypes.data, tdd.ctypes.data, M)
    return True


_FWD_VIEWS_CACHE: dict = {}


def fwd_parser_score_native(dsq: np.ndarray, om):
    """Bit-exact standard Forward parser score (F3/F4 gate path);
    same contract as fs3_parser_score_native."""
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "_filters_bound"):
        _bind_filters(lib)
        lib._filters_bound = True
    from .. import constants as C
    from ..ops.reference.fwdback import RangeError, _trans_views
    key = id(om)
    ent = _FWD_VIEWS_CACHE.get(key)
    if ent is None or ent[0] is not om.tfv:
        tv = tuple(np.ascontiguousarray(v, dtype=np.float32)
                   for v in _trans_views(om))
        rfv = np.ascontiguousarray(om.rfv, dtype=np.float32)
        ent = (om.tfv, tv, rfv)
        _FWD_VIEWS_CACHE[key] = ent
    _, tv, rfv = ent
    L = len(dsq)
    xf = om.xf
    xff = np.array([xf[C.X_N, C.LOOP], xf[C.X_N, C.MOVE],
                    xf[C.X_J, C.LOOP], xf[C.X_J, C.MOVE],
                    xf[C.X_C, C.LOOP], xf[C.X_C, C.MOVE],
                    xf[C.X_E, C.LOOP], xf[C.X_E, C.MOVE]],
                   dtype=np.float32)
    scales = np.empty(L + 1, dtype=np.float32)
    xctot = ctypes.c_float()
    dsq = np.ascontiguousarray(dsq, dtype=np.int32)
    st = lib.bio_fwd_parser_score(dsq, L, rfv, om.M, *tv, xff,
                                  scales, ctypes.byref(xctot))
    if st != 0:
        raise RangeError("forward score over/underflow")
    totscale = 0.0
    for s in scales[scales != np.float32(1.0)]:
        totscale += float(np.log(s))
    return totscale + float(np.log(np.float32(xctot.value)))


_FS3_VIEWS_CACHE: dict = {}


def fs3_parser_score_native(dsq: np.ndarray, om_fs):
    """Bit-exact frameshift 3-codon Forward parser score (gate path):
    the C DP replicates the numpy reference including its pairwise
    reductions; the log-space finish uses numpy's own log semantics.
    Returns the score (float), raises the reference's RangeError on
    over/underflow, or returns None if the library is absent."""
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "_filters_bound"):
        _bind_filters(lib)
        lib._filters_bound = True
    from .. import constants as C
    from ..ops.reference.fwdback import RangeError
    from ..ops.reference.fwdback_fs import (_trans_views_fs,
                                            codon_indices)
    key = id(om_fs)
    ent = _FS3_VIEWS_CACHE.get(key)
    if ent is None or ent[0] is not om_fs.tfv:
        tv = tuple(np.ascontiguousarray(v, dtype=np.float32)
                   for v in _trans_views_fs(om_fs))
        rfv = np.ascontiguousarray(om_fs.rfv, dtype=np.float32)
        ent = (om_fs.tfv, tv, rfv)
        _FS3_VIEWS_CACHE[key] = ent
    _, tv, rfv = ent
    ci = codon_indices(dsq, 3)
    ci2 = np.ascontiguousarray(ci[2], dtype=np.int32)
    ci3 = np.ascontiguousarray(ci[3], dtype=np.int32)
    ci4 = np.ascontiguousarray(ci[4], dtype=np.int32)
    L = len(dsq)
    M = om_fs.M
    xf = om_fs.xf
    xff = np.array([xf[C.X_N, C.LOOP], xf[C.X_N, C.MOVE],
                    xf[C.X_J, C.LOOP], xf[C.X_J, C.MOVE],
                    xf[C.X_C, C.LOOP], xf[C.X_C, C.MOVE],
                    xf[C.X_E, C.LOOP], xf[C.X_E, C.MOVE]],
                   dtype=np.float32)
    scales = np.empty(L + 1, dtype=np.float32)
    xctot = ctypes.c_float()
    st = lib.bio_fs3_parser_score(ci2, ci3, ci4, L, rfv, M, *tv, xff,
                                  scales, ctypes.byref(xctot))
    if st != 0:
        raise RangeError("fs forward parser over/underflow")
    # numpy-log finish, same accumulation order as the reference
    totscale = 0.0
    for s in scales[scales != np.float32(1.0)]:
        totscale += float(np.log(s))
    return totscale + float(np.log(np.float32(xctot.value)))


def fs5_forward_score_native(dsq: np.ndarray, om_fs):
    """Bit-exact frameshift 5-codon full-Forward score (calibration
    path); same contract as fs3_parser_score_native."""
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "_filters_bound"):
        _bind_filters(lib)
        lib._filters_bound = True
    from .. import constants as C
    from ..ops.reference.fwdback import RangeError
    from ..ops.reference.fwdback_fs import (_trans_views_fs,
                                            codon_indices)
    key = (id(om_fs), 5)
    ent = _FS3_VIEWS_CACHE.get(key)
    if ent is None or ent[0] is not om_fs.tfv:
        tv = tuple(np.ascontiguousarray(v, dtype=np.float32)
                   for v in _trans_views_fs(om_fs))
        rfv = np.ascontiguousarray(om_fs.rfv, dtype=np.float32)
        ent = (om_fs.tfv, tv, rfv)
        _FS3_VIEWS_CACHE[key] = ent
    _, tv, rfv = ent
    ci = codon_indices(dsq, 5)
    cis = [np.ascontiguousarray(ci[c], dtype=np.int32)
           for c in (1, 2, 3, 4, 5)]
    L = len(dsq)
    xf = om_fs.xf
    xff = np.array([xf[C.X_N, C.LOOP], xf[C.X_N, C.MOVE],
                    xf[C.X_J, C.LOOP], xf[C.X_J, C.MOVE],
                    xf[C.X_C, C.LOOP], xf[C.X_C, C.MOVE],
                    xf[C.X_E, C.LOOP], xf[C.X_E, C.MOVE]],
                   dtype=np.float32)
    scales = np.empty(L + 1, dtype=np.float32)
    xctot = ctypes.c_float()
    st = lib.bio_fs5_forward_score(*cis, L, rfv, om_fs.M, *tv, xff,
                                   scales, ctypes.byref(xctot))
    if st != 0:
        raise RangeError("fs forward over/underflow")
    totscale = 0.0
    for s in scales[scales != np.float32(1.0)]:
        totscale += float(np.log(s))
    return totscale + float(np.log(np.float32(xctot.value)))


def msv_filter_native_batch(orf_dsqs: list, om) -> np.ndarray | None:
    """One native call scoring every ORF of a window batch
    (bit-identical to per-ORF msv_filter_native); None if the library
    is absent.  tjb is recomputed per ORF length exactly as
    reconfig_msv_length does.  An OrfList (native extractor output)
    supplies the flat concatenated layout directly."""
    lib = get_lib()
    if lib is None or not len(orf_dsqs):
        return None
    if not hasattr(lib, "_filters_bound"):
        _bind_filters(lib)
        lib._filters_bound = True
    sbv, rbv, _, _ = _packed_filters(om)
    n = len(orf_dsqs)
    flat = getattr(orf_dsqs, "flat", None)
    if flat is not None:
        cat, offs, lens = flat, orf_dsqs.offs, orf_dsqs.lens
    else:
        if hasattr(orf_dsqs[0], "dsq"):
            orf_dsqs = [o.dsq for o in orf_dsqs]
        lens = np.array([len(d) for d in orf_dsqs], dtype=np.int32)
        offs = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        cat = np.concatenate([np.ascontiguousarray(d, dtype=np.int32)
                              for d in orf_dsqs])
    tcache = om.__dict__.setdefault("_tjb_cache", {})

    def tjb_of(L):
        v = tcache.get(L)
        if v is None:
            v = om._unbiased_byteify(np.log(3.0 / (L + 3.0)))
            tcache[L] = v
        return v

    tjbs = np.array([tjb_of(int(L)) for L in lens], dtype=np.int32)
    out = np.empty(n, dtype=np.float32)
    lib.bio_msv_filter_batch(cat, offs, lens, tjbs, n, sbv, rbv,
                             om.Kp, om.M, int(om.base_b),
                             int(om.tec_b), int(om.tbm_b),
                             int(om.bias_b), float(om.scale_b), out)
    return out


def bg_hmm_forward_native(dsq: np.ndarray, eo, pi, t) -> float | None:
    """Bit-exact native 2-state bias-filter forward (ref: bg.py
    _hmm_forward): the f32 recurrence runs in C, the per-step max
    rescales come back for numpy's own f32 log (1-ulp different from
    libm), and the log sum is a strict sequential f32 accumulation."""
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "_filters_bound"):
        _bind_filters(lib)
        lib._filters_bound = True
    L = len(dsq)
    if L == 0:
        return 0.0
    dsq = np.ascontiguousarray(dsq, dtype=np.int32)
    scales = np.empty(L, dtype=np.float32)
    end = ctypes.c_float()
    lib.bio_bg_hmm_forward(dsq, L, np.ascontiguousarray(eo),
                           np.ascontiguousarray(pi),
                           np.ascontiguousarray(t), scales,
                           ctypes.byref(end))
    ls = np.log(scales)
    logsc = np.float32(lib.bio_f32_seq_sum(ls, L))
    return float(logsc + np.float32(np.log(np.float32(end.value))))


def vit_filter_native(dsq: np.ndarray, om) -> float | None:
    """Bit-exact native ViterbiFilter score (no window capture);
    None if the library is absent."""
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "_filters_bound"):
        _bind_filters(lib)
        lib._filters_bound = True
    _, _, rwv, twv = _packed_filters(om)
    out = ctypes.c_float()
    dsq = np.ascontiguousarray(dsq, dtype=np.int32)
    from .. import constants as C
    st = lib.bio_vit_filter(dsq, len(dsq), rwv, twv, om.Kp, om.M,
                            int(om.base_w), float(om.scale_w),
                            int(om.xw[C.X_N, C.MOVE]),
                            int(om.xw[C.X_E, C.MOVE]),
                            int(om.xw[C.X_E, C.LOOP]),
                            ctypes.byref(out))
    return float("inf") if st == 1 else float(out.value)
