"""Multi-chip data parallelism for the search pipeline.

The reference parallelizes with a pthread work queue over target
blocks and merges per-worker tophits/statistics afterwards
(ref: bathsearch.c thread_loop :1118, p7_tophits_Merge,
p7_pipeline_Merge; SURVEY.md section 2.4).  The TPU-native equivalent:

  * profiles replicated on every chip;
  * DNA window batches sharded over a device mesh ('dp' axis);
  * per-shard counters (nres, filter survivors) reduced with psum —
    mirroring p7_pipeline_Merge semantics exactly;
  * hit records gathered to host, then deduplicated/sorted exactly as
    in the single-chip path, preserving the determinism contract
    (E-values computed from the global residue count after the scan,
    ref: bathsearch.c:869-884).
"""

from __future__ import annotations


import numpy as np

from ..ops import jaxk as _jaxk  # noqa: F401  (applies the
# BATH_JAX_PLATFORM override before any backend init here — without
# it make_mesh's jax.devices() freezes the env-default platform and
# a virtual-CPU mesh can never form)
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)}; set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                "JAX_PLATFORMS=cpu for a virtual mesh")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, arr, axis: str = "dp"):
    """Place a host batch with its leading dim sharded over the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))


def make_pipeline_step(mesh: Mesh, fwd_params, msv_params, fs3_params,
                       axis: str = "dp"):
    """The full data-parallel pipeline gate step over a window shard:
    MSV + Forward + frameshift Forward scores (profiles replicated,
    batch sharded) plus psum-reduced pipeline counters.

    This is the TPU analogue of one worker pass of
    p7_Pipeline_BATH's filter cascade followed by
    p7_pipeline_Merge (ref: p7_pipeline.c:735, :1583).
    """
    from ..ops.jaxk import kernels as jk

    fp, mp, p3 = fwd_params, msv_params, fs3_params

    def local_step(adsq, alens, ndsq, nlens, tjb):
        """adsq: amino ORF shard [b, La]; ndsq: DNA window shard."""
        fwd = jk._forward_score_perlen_impl(
            adsq, alens, fp.rfv, fp.tBM, fp.tMM, fp.tIM, fp.tDM,
            fp.tMD, fp.tDD, fp.tMI, fp.tII, nj=1.0, Mp=fp.Mp, U=fp.U)
        msv = jk._msv_score_impl(
            adsq, alens, mp.rbv, mp.Mp, mp.bias, mp.base, mp.tbm,
            mp.tec, mp.scale, tjb)
        fs3 = jk._fs3_score_impl(
            ndsq, nlens, p3.T2, p3.T3, p3.T4, p3.tBM, p3.tMM, p3.tIM,
            p3.tDM, p3.tMDs, p3.tMI, p3.tII, nj=1.0, Mt=p3.Mt,
            UT=p3.UT, u=p3.u)
        # pipeline counter reduction (p7_pipeline_Merge semantics)
        nres = jax.lax.psum(alens.sum() + nlens.sum(), axis)
        npass = jax.lax.psum((fwd > 0).sum() + (fs3 > 0).sum(), axis)
        return fwd, msv, fs3, jnp.stack([nres, npass])

    mapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis, None), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P()),
        check_vma=False)
    return jax.jit(mapped)
