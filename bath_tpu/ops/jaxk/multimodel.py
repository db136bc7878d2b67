"""Lane-packed multi-model device gates for the multi-query drive.

The Pfam-scale workload (a few hundred profile HMMs vs one genome,
ref: /root/reference/src/bathsearch.c:737-988 per-query loop) leaves
each model with only a handful of gate survivors per flush — far too
few to amortize a per-model device call on a tunneled backend.  The
TPU-native answer is to make the model id a batch coordinate:

* G models are packed side by side along the kernel's lane (model
  position) axis, each in its own block of Mg sublanes, with at least
  one zero-parameter pad lane at every block end (so the k+-1 lane
  shifts cannot leak across models);
* each batch column carries a model-slot id.  Residues (standard
  kernels) / codon-table indices (fs3 kernels) are offset into the
  column's own model's block of the packed emission table, so the
  one-hot emission matmuls zero every cross-model term — no masks,
  no extra VPU work;
* the DD-closure operators (W3/UT/UB) become [G, Mg, Mg] stacks
  applied as one batched MXU matmul (kernels._gdot), keeping closure
  cost linear in the packed lane count instead of quadratic.

Packed scores/posteriors are identical to the per-model single calls
(the only arithmetic difference is added exact zeros in one-hot dot
products), verified by tests/test_multimodel.py; end-to-end bytes are
additionally protected by the DEVICE_GATE_BAND re-scoring contract.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import numpy as np

from . import kernels as jk

F32 = np.float32


def _cpu_device():
    import jax
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def _np_params(builder, *args, **kw):
    """Run a per-model param builder host-side (multi-query drives
    build hundreds of models' components; only the packed call arrays
    ever ship to the TPU).  Builders that accept to_dev=False build
    pure numpy (no jnp dispatch at all — a default_device override
    costs ~10ms per jnp op on plugin backends); others are pinned to
    the CPU backend."""
    if kw.get("to_dev") is False:
        p = builder(*args, **kw)
    else:
        import jax
        dev = _cpu_device()
        if dev is None:
            p = builder(*args, **kw)
        else:
            with jax.default_device(dev):
                p = builder(*args, **kw)
    out = {}
    for f in fields(p):
        v = getattr(p, f.name)
        out[f.name] = np.asarray(v) if hasattr(v, "shape") else v
    return out


def fwd_components(om):
    """Host-side (numpy) per-model Forward-gate components."""
    return _np_params(jk.fwd_mb_params, om, to_dev=False)


def domdec_components(om):
    c = _np_params(jk.domdec_params, om)
    c["fwd"] = {f.name: np.asarray(getattr(c["fwd"], f.name))
                if hasattr(getattr(c["fwd"], f.name), "shape")
                else getattr(c["fwd"], f.name)
                for f in fields(type(c["fwd"]))}
    return c


def fs3_components(om_fs):
    return _np_params(jk.fs3_params, om_fs, to_dev=False)


def fs3_domdec_components(om_fs):
    c = _np_params(jk.fs3_domdec_params, om_fs)
    c["fs3"] = {f.name: np.asarray(getattr(c["fs3"], f.name))
                if hasattr(getattr(c["fs3"], f.name), "shape")
                else getattr(c["fs3"], f.name)
                for f in fields(type(c["fs3"]))}
    return c


# ---------------------------------------------------------------------
# Packing: place per-model components into G lane blocks of Mg
# ---------------------------------------------------------------------
def _pack_vectors(comps, keys, G, Mg, fill=0.0):
    out = {k: np.full(G * Mg, fill, F32) if fill else
           np.zeros(G * Mg, F32) for k in keys}
    for g, c in enumerate(comps):
        Mt = c["Mt"]
        for k in keys:
            v = c[k]
            out[k][g * Mg:g * Mg + Mt] = v[:Mt]
    return out


def _pack_closure(comps, key, G, Mg):
    W = np.zeros((G, Mg, Mg), F32)
    for g, c in enumerate(comps):
        Mt = c["Mt"]
        W[g, :Mt, :Mt] = c[key]
    return W


def _pack_table(comps, key, ncols, G, Mg):
    T = np.zeros((G * Mg, G * ncols), F32)
    for g, c in enumerate(comps):
        Mt = c["Mt"]
        T[g * Mg:g * Mg + Mt, g * ncols:(g + 1) * ncols] = c[key]
    return T


def _check_fit(comps, Mg):
    for c in comps:
        if c["M"] > Mg - 1:
            raise ValueError(
                f"model M={c['M']} needs Mg >= {c['M'] + 1} "
                "(one pad lane per block)")


def _dev(pack):
    """One-time host->device conversion of a pack's parameter arrays
    (cached in place: jnp.asarray of a committed device array is a
    no-op, so repeated calls reuse the resident copies)."""
    import jax.numpy as jnp
    a = pack.arrays
    for k in a:
        a[k] = jnp.asarray(a[k])
    return a


@dataclass
class FwdPack:
    G: int
    Mg: int
    Kp: int
    arrays: dict             # packed np arrays


def build_fwd_pack(comps: list[dict], G: int, Mg: int) -> FwdPack:
    """comps: per-model fwd_components(), len <= G (empty slots stay
    zero — no column may point at them)."""
    _check_fit(comps, Mg)
    Kp = comps[0]["rfvT"].shape[1]
    a = _pack_vectors(comps, ("tBM", "tMM", "tIM", "tMI", "tII"),
                      G, Mg)
    u = np.ones(G * Mg, F32)
    for g, c in enumerate(comps):
        u[g * Mg:g * Mg + c["Mt"]] = c["u"][:c["Mt"]]
    a["u"] = u
    a["rfvT"] = _pack_table(comps, "rfvT", Kp, G, Mg)
    a["W3"] = _pack_closure(comps, "W3", G, Mg)
    return FwdPack(G=G, Mg=Mg, Kp=Kp, arrays=a)


def fwd_pack_scores(pack: FwdPack, dsq, lens, slot, nj=1.0,
                    put=None):
    """Forward gate scores for a packed batch: dsq [B, L] raw amino
    digits (int8), slot [B] model-slot ids in [0, G).  Returns [B]
    device array of nats."""
    import jax.numpy as jnp
    enc = dsq.astype(np.int16) + (slot.astype(np.int16)[:, None]
                                  * np.int16(pack.Kp))
    put = put or (lambda x: x)
    a = _dev(pack)
    return jk._fwd_mb_impl(
        put(enc), put(lens.astype(np.int32)), jnp.asarray(a["rfvT"]),
        jnp.asarray(a["tBM"]), jnp.asarray(a["tMM"]),
        jnp.asarray(a["tIM"]), jnp.asarray(a["tMI"]),
        jnp.asarray(a["tII"]), jnp.asarray(a["W3"]),
        jnp.asarray(a["u"]), float(nj), pack.G * pack.Mg, ng=pack.G)


@dataclass
class DomDecPack:
    G: int
    Mg: int
    Kp: int
    arrays: dict


def build_domdec_pack(comps: list[dict], G: int, Mg: int
                      ) -> DomDecPack:
    fwd = [c["fwd"] for c in comps]
    _check_fit(fwd, Mg)
    Kp = fwd[0]["rfvT"].shape[1]
    a = _pack_vectors(fwd, ("tBM", "tMM", "tIM", "tMI", "tII"),
                      G, Mg)
    u = np.ones(G * Mg, F32)
    for g, c in enumerate(fwd):
        u[g * Mg:g * Mg + c["Mt"]] = c["u"][:c["Mt"]]
    a["u"] = u
    a["rfvT"] = _pack_table(fwd, "rfvT", Kp, G, Mg)
    a["W3"] = _pack_closure(fwd, "W3", G, Mg)
    for k in ("tIM_next", "tMM_next", "tDM_next", "vMD", "mask"):
        a[k] = _pack_vectors(
            [{"Mt": c["fwd"]["Mt"], k: c[k]} for c in comps],
            (k,), G, Mg)[k]
    a["UB"] = _pack_closure(
        [{"Mt": c["fwd"]["Mt"], "UB": c["UB"]} for c in comps],
        "UB", G, Mg)
    return DomDecPack(G=G, Mg=Mg, Kp=Kp, arrays=a)


def domdec_pack_batch(pack: DomDecPack, dsq, lens, slot, nj=1.0,
                      put=None):
    """Fused backward-parser + domain decoding for a packed batch.
    Returns (btot, etot, mocc, ok) device arrays."""
    import jax.numpy as jnp
    enc = dsq.astype(np.int16) + (slot.astype(np.int16)[:, None]
                                  * np.int16(pack.Kp))
    put = put or (lambda x: x)
    a = _dev(pack)
    return jk._domdec_mb_impl(
        put(enc), put(lens.astype(np.int32)), jnp.asarray(a["rfvT"]),
        jnp.asarray(a["tBM"]), jnp.asarray(a["tMM"]),
        jnp.asarray(a["tIM"]), jnp.asarray(a["tMI"]),
        jnp.asarray(a["tII"]), jnp.asarray(a["W3"]),
        jnp.asarray(a["u"]), jnp.asarray(a["tIM_next"]),
        jnp.asarray(a["tMM_next"]), jnp.asarray(a["tDM_next"]),
        jnp.asarray(a["vMD"]), jnp.asarray(a["UB"]),
        jnp.asarray(a["mask"]), float(nj), pack.G * pack.Mg,
        ng=pack.G)


@dataclass
class FS3Pack:
    G: int
    Mg: int
    arrays: dict


def build_fs3_pack(comps: list[dict], G: int, Mg: int) -> FS3Pack:
    _check_fit(comps, Mg)
    a = _pack_vectors(comps, ("tBM", "tMM", "tIM", "tDM", "tMDs",
                              "tMI", "tII"), G, Mg)
    u = np.ones(G * Mg, F32)
    for g, c in enumerate(comps):
        u[g * Mg:g * Mg + c["Mt"]] = c["u"][:c["Mt"]]
    a["u"] = u
    a["T2"] = _pack_table(comps, "T2", 17, G, Mg)
    a["T3"] = _pack_table(comps, "T3", 65, G, Mg)
    a["T4"] = _pack_table(comps, "T4", 257, G, Mg)
    a["UT"] = _pack_closure(comps, "UT", G, Mg)
    return FS3Pack(G=G, Mg=Mg, arrays=a)


def fs3_pack_scores(pack: FS3Pack, dsq, lens, slot, nj=1.0,
                    put=None):
    """fs3-Forward gate scores for a packed DNA-window batch:
    dsq [B, L] nucleotide digits (int8), slot [B] model-slot ids."""
    import jax.numpy as jnp
    put = put or (lambda x: x)
    a = _dev(pack)
    return jk._fs3_score_impl(
        put(dsq), put(lens.astype(np.int32)), jnp.asarray(a["T2"]),
        jnp.asarray(a["T3"]), jnp.asarray(a["T4"]),
        jnp.asarray(a["tBM"]), jnp.asarray(a["tMM"]),
        jnp.asarray(a["tIM"]), jnp.asarray(a["tDM"]),
        jnp.asarray(a["tMDs"]), jnp.asarray(a["tMI"]),
        jnp.asarray(a["tII"]), float(nj), pack.G * pack.Mg,
        jnp.asarray(a["UT"]), jnp.asarray(a["u"]), ng=pack.G,
        goff=put(slot.astype(np.int32)))


@dataclass
class FS3DomDecPack:
    G: int
    Mg: int
    arrays: dict


def build_fs3_domdec_pack(comps: list[dict], G: int, Mg: int
                          ) -> FS3DomDecPack:
    fs3 = [c["fs3"] for c in comps]
    _check_fit(fs3, Mg)
    a = _pack_vectors(fs3, ("tBM", "tMM", "tIM", "tDM", "tMDs",
                            "tMI", "tII"), G, Mg)
    u = np.ones(G * Mg, F32)
    for g, c in enumerate(fs3):
        u[g * Mg:g * Mg + c["Mt"]] = c["u"][:c["Mt"]]
    a["u"] = u
    a["T2"] = _pack_table(fs3, "T2", 17, G, Mg)
    a["T3"] = _pack_table(fs3, "T3", 65, G, Mg)
    a["T4"] = _pack_table(fs3, "T4", 257, G, Mg)
    a["UT"] = _pack_closure(fs3, "UT", G, Mg)
    for k in ("tIM_next", "tMM_next", "tDM_next", "vMD", "mask"):
        a[k] = _pack_vectors(
            [{"Mt": c["fs3"]["Mt"], k: c[k]} for c in comps],
            (k,), G, Mg)[k]
    a["UB"] = _pack_closure(
        [{"Mt": c["fs3"]["Mt"], "UB": c["UB"]} for c in comps],
        "UB", G, Mg)
    return FS3DomDecPack(G=G, Mg=Mg, arrays=a)


def fs3_domdec_pack_batch(pack: FS3DomDecPack, dsq, lens, slot,
                          dec_loop, nj=1.0, put=None):
    """Fused fs3 backward-parser + fs domain decoding for a packed
    batch.  <dec_loop>: per-item N/J/C LOOP prob ([B] — per-model in
    a packed batch)."""
    import jax.numpy as jnp
    put = put or (lambda x: x)
    a = _dev(pack)
    return jk._fs3_domdec_impl(
        put(dsq), put(lens.astype(np.int32)), jnp.asarray(a["T2"]),
        jnp.asarray(a["T3"]), jnp.asarray(a["T4"]),
        jnp.asarray(a["tBM"]), jnp.asarray(a["tMM"]),
        jnp.asarray(a["tIM"]), jnp.asarray(a["tDM"]),
        jnp.asarray(a["tMDs"]), jnp.asarray(a["tMI"]),
        jnp.asarray(a["tII"]), jnp.asarray(a["UT"]),
        jnp.asarray(a["u"]), jnp.asarray(a["tIM_next"]),
        jnp.asarray(a["tMM_next"]), jnp.asarray(a["tDM_next"]),
        jnp.asarray(a["vMD"]), jnp.asarray(a["UB"]),
        jnp.asarray(a["mask"]),
        put(np.asarray(dec_loop, np.float32)), float(nj),
        pack.G * pack.Mg, ng=pack.G,
        goff=put(slot.astype(np.int32)))
