"""Multi-host data parallelism for bathsearch.

The reference's parallel unit is a pthread worker pulling target
blocks from a work queue, with per-worker tophits/stat merges at the
end of the scan (ref: /root/reference/src/bathsearch.c thread_loop
:1118-1291, :887-892; p7_pipeline.c p7_pipeline_Merge :735).  Across
hosts the TPU-native equivalent is SPMD processes over a
jax.distributed cluster:

  * every process streams the SAME window sequence (host-side reading
    is cheap and keeps nres/nseqs/target-length bookkeeping global
    and identical everywhere — the reference's determinism contract
    computes E-values from the global residue count after the scan,
    bathsearch.c:869-884);
  * each process runs the pipeline only for windows with
    tid % nprocs == proc_id, on its local devices;
  * per-window results (hits, hit windows, counter deltas) are
    serialized and all-gathered, then every process rebuilds the
    global result in window-stream order — so output bytes are
    identical to the single-process run for any host count (the
    reference's thread-count invariance, i2-search-variation.sh).

The gather rides the same fixed-shape-array discipline as the device
kernels: one [max_len] uint8 payload per process (two allgather
rounds: lengths, then padded payloads).
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def init_distributed(coordinator: str, nprocs: int, proc_id: int,
                     local_device_ids=None) -> None:
    """Join the jax.distributed cluster (must run before any backend
    init).  <coordinator>: 'host:port' of process 0."""
    import jax
    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nprocs,
                               process_id=proc_id, **kwargs)


def allgather_bytes(payload: bytes) -> list[bytes]:
    """All-gather one bytes payload per process; returns the list
    indexed by process id, identical on every process."""
    import jax
    from jax.experimental import multihost_utils

    n = jax.process_count()
    if n == 1:
        return [payload]
    ln = np.array([len(payload)], dtype=np.int64)
    lens = np.asarray(multihost_utils.process_allgather(ln)) \
        .reshape(n)
    mx = int(lens.max())
    buf = np.zeros(mx, dtype=np.uint8)
    buf[:len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    gathered = gathered.reshape(n, mx)
    return [gathered[i, :int(lens[i])].tobytes() for i in range(n)]


def merge_results(parts: list[list]) -> list:
    """Combine per-process result lists of (tid, hits, hit_windows,
    counter_deltas) tuples into global window-stream order (sorted by
    tid) — so downstream stable sorts see exactly the serial path's
    hit ordering (ref: p7_tophits_Merge preserving worker block
    order).  tids are unique across ranks (windows are sharded
    tid % nprocs), so the result is independent of rank count and
    rank arrival order."""
    combined = []
    for p in parts:
        combined.extend(p)
    combined.sort(key=lambda t: t[0])
    return combined


def allgather_results(results: list) -> list:
    """All-gather a per-process list of (tid, hits, hit_windows,
    counter_deltas) tuples and return the merged global list (hit
    serialization for the cross-host merge: pickled tuples — hits
    carry ragged alignment displays, so the fixed-shape discipline
    lives in allgather_bytes' padded transport, not the record)."""
    mine = pickle.dumps(results, protocol=pickle.HIGHEST_PROTOCOL)
    parts = allgather_bytes(mine)
    return merge_results([pickle.loads(p) for p in parts])


def psum_counters(deltas: dict) -> dict:
    """Reduce pipeline bean counters across processes (ref:
    p7_pipeline_Merge :735).  Implemented on the gather path so the
    values are exact integers."""
    import jax

    if jax.process_count() == 1:
        return dict(deltas)
    parts = allgather_bytes(pickle.dumps(deltas))
    out = {k: 0 for k in deltas}
    for p in parts:
        for k, v in pickle.loads(p).items():
            out[k] = out.get(k, 0) + v
    return out


def maybe_init_from_args(args) -> tuple[int, int]:
    """CLI/env plumbing: returns (nprocs, proc_id); initializes the
    cluster when nprocs > 1.  Env fallbacks allow launchers to avoid
    per-rank argv edits (BATH_NPROCS/BATH_PROC_ID/BATH_COORDINATOR)."""
    nprocs = int(getattr(args, "hosts", 0)
                 or os.environ.get("BATH_NPROCS", 1))
    if nprocs <= 1:
        return 1, 0
    proc_id = int(getattr(args, "host_id", -1)
                  if getattr(args, "host_id", -1) >= 0
                  else os.environ.get("BATH_PROC_ID", 0))
    coord = (getattr(args, "coordinator", None)
             or os.environ.get("BATH_COORDINATOR",
                               "localhost:9377"))
    init_distributed(coord, nprocs, proc_id)
    return nprocs, proc_id
