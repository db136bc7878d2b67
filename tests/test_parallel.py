"""Multi-shard merge semantics: the production cross-host hit
serialization (pickled result tuples, hosts.merge_results stream-order
combine) is exact and shard-count invariant (ref: SURVEY.md section
2.4 P3/P4)."""

import pickle

import numpy as np

from bath_tpu.domaindef import Domain
from bath_tpu.parallel.hosts import merge_results
from bath_tpu.tophits import Hit


def _mk(seqidx, score, lnp, iali):
    h = Hit()
    h.seqidx = seqidx
    h.score = score
    h.lnP = lnp
    h.sortkey = -lnp
    h.dcl = [Domain(iali=iali, jali=iali + 99, ihmm=1, jhmm=50)]
    return h


def test_result_serialization_roundtrip():
    """The production payload (tid, hits, windows, counter deltas)
    survives the pickle transport with full hit/domain fields."""
    hits = [_mk(0, 47.8, -30.0, 7), _mk(1, 12.0, -5.0, 100)]
    results = [(3, hits, [], {"n_past_msv": 2})]
    back = pickle.loads(pickle.dumps(results))
    (tid, bh, _, deltas), = back
    assert tid == 3 and deltas == {"n_past_msv": 2}
    assert abs(bh[0].score - 47.8) < 1e-12
    assert bh[0].dcl[0].iali == 7 and bh[1].seqidx == 1


def test_merge_results_shard_count_invariant():
    """merge_results output is independent of how windows were
    sharded across ranks and of rank arrival order."""
    stream = [(tid, [_mk(tid % 3, 50.0 - tid, -40.0 + tid, 10 * tid)],
               [], {}) for tid in range(12)]

    def split(nsh):
        return [[r for r in stream if r[0] % nsh == s]
                for s in range(nsh)]
    a = merge_results(split(2))
    b = merge_results(split(4))
    c = merge_results(list(reversed(split(4))))
    assert a == stream and b == stream and c == stream


def test_sharded_pipeline_step_shard_count_invariant():
    """The determinism contract on device: the same window batch run
    on a 1-device and an 8-device mesh produces identical scores and
    identical psum-reduced counters (ref: SURVEY.md section 2.4 P2/P3,
    i2-search-variation.sh thread-count invariance)."""
    import jax
    import numpy as np

    from bath_tpu.bg import Background
    from bath_tpu.gencode import GeneticCode
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.ops.jaxk import kernels as jk
    from bath_tpu.ops.reference.fwdback_fs import fs_oprofile_convert
    from bath_tpu.parallel.mesh import (make_mesh, make_pipeline_step,
                                        replicate, shard_batch)
    from bath_tpu.profile import profile_config, profile_config_fs

    assert len(jax.devices()) >= 8, "conftest must provide 8 devices"
    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    bg = Background()
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    gm = profile_config(hmm, bg, L=100)
    om = oprofile_convert(gm)
    fp = jk.fwd_params(om)
    mp = jk.msv_params(om)
    p3 = jk.fs3_params(fs_oprofile_convert(
        profile_config_fs(hmm, bg, gcode, 3, 100)))

    rng = np.random.default_rng(11)
    B, La, Ln = 16, 60, 180
    adsq = rng.integers(0, 20, (B, La)).astype(np.int32)
    alens = np.full(B, La, np.int32)
    ndsq = rng.integers(0, 4, (B, Ln)).astype(np.int32)
    nlens = np.full(B, Ln, np.int32)
    tjb = np.full(B, om.tjb_b, np.int32)

    outs = {}
    for nd in (1, 8):
        mesh = make_mesh(nd)
        step = make_pipeline_step(mesh, fp, mp, p3)
        args = [shard_batch(mesh, a) for a in
                (adsq, alens, ndsq, nlens, tjb)]
        fwd, msv, fs3, ctr = step(*args)
        outs[nd] = (np.asarray(fwd), np.asarray(msv),
                    np.asarray(fs3), np.asarray(ctr))
    for a, b in zip(outs[1], outs[8]):
        assert np.array_equal(a, b)
    # counters reflect the global batch, not the shard
    assert outs[8][3][0] == alens.sum() + nlens.sum()


def test_end_to_end_shard_gather_merge():
    """Integrated multi-chip flow on a virtual 8-device mesh: sharded
    device gates -> per-shard pickled result payloads -> stream-order
    merge (the production hosts.py path).  The merged hit list is
    identical for 2- and 8-way shardings (ref: the merge discipline
    of bathsearch.c :887-892 re-imagined as collectives)."""
    import jax
    import jax.numpy as jnp

    from bath_tpu.bg import Background
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.oprofile import oprofile_convert
    from bath_tpu.ops.jaxk import kernels as jk
    from bath_tpu.profile import profile_config

    hmm = read_hmm("/root/reference/tutorial/AMP_N.bhmm")
    bg = Background()
    om = oprofile_convert(profile_config(hmm, bg, L=100))
    fp = jk.fwd_params(om)
    rng = np.random.default_rng(6)
    B, L = 16, 120
    batch = rng.integers(0, 20, (B, L)).astype(np.int32)
    lens = np.full(B, L, np.int32)
    # embed near-consensus ORFs in a few slots so some "hits" exist
    cons = np.argmax(hmm.mat[1:, :20], axis=1).astype(np.int32)
    for slot in (3, 9, 12):
        batch[slot, :min(L, len(cons))] = cons[:min(L, len(cons))]

    scores = np.asarray(jk.forward_score_perlen(
        jnp.asarray(batch), jnp.asarray(lens), fp, nj=1.0))

    def run(n_shards):
        parts = []
        for s in range(n_shards):
            mine = []
            for i in range(B):
                if i % n_shards == s and scores[i] > 0:
                    mine.append((i, [_mk(i, float(scores[i]),
                                         -float(scores[i]), 1)],
                                 [], {}))
            parts.append(pickle.loads(pickle.dumps(mine)))
        merged = merge_results(parts)
        return [h for _, hs, _, _ in merged for h in hs]

    a = run(2)
    b = run(8)
    key = lambda hs: [(h.seqidx, round(h.score, 4)) for h in hs]
    assert key(a) == key(b)
    assert {h.seqidx for h in a} >= {3, 9, 12}


def test_multihost_device_cascade_byte_identical(tmp_path):
    """--hosts 2 combined with --backend jax (the combination that
    runs on a pod slice: sharded device gate batches per rank +
    cross-host allgather merge) produces output byte-identical to the
    single-process numpy run.  Ranks run the DeviceCascade on the cpu
    platform (BATH_JAX_PLATFORM pin, same as the jax golden tests)."""
    import os
    import re
    import socket
    import subprocess
    import sys

    target = "/root/repo/tests/data/mesh_target.fa"
    hmm = "/root/reference/tutorial/AMP_N.bhmm"

    def norm(path):
        text = open(path).read()
        return re.sub(r"# (CPU time|Mc/sec):.*", "", text)

    base = dict(os.environ, JAX_PLATFORMS="cpu",
                BATH_JAX_PLATFORM="cpu")
    single = tmp_path / "single.out"
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch",
         "--backend", "numpy", "-o", str(single), hmm, target],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo", env=base)
    assert r.returncode == 0, r.stderr[-2000:]

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    n = 2
    procs = []
    for i in range(n):
        out = tmp_path / f"mhj_{i}.out"
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "bath_tpu.cli.bathsearch",
             "--backend", "jax",
             "--hosts", str(n), "--host-id", str(i),
             "--coordinator", f"localhost:{port}",
             "-o", str(out), hmm, target],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd="/root/repo", env=base))
    for p in procs:
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-2000:].decode()
    assert norm(tmp_path / "mhj_0.out") == norm(single)


def _run_bathsearch(out, extra, env, timeout=900):
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch",
         "-o", str(out), *extra],
        capture_output=True, text=True, timeout=timeout,
        cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]


def _norm(path):
    import re
    return re.sub(r"# (CPU time|Mc/sec):.*", "", open(path).read())


def test_mesh_fs_byte_identical(tmp_path):
    """--fs under --mesh 8: the frameshift cascade (fs3 gate + fused
    fs domain decoding) sharded over an 8-device mesh must produce
    output byte-identical to the single-device jax cascade and the
    numpy backend, on a multi-window target whose embeds include
    clean, frameshifted, reverse-strand, and window-boundary-spanning
    hits (the reference's determinism contract covers --fs:
    /root/reference/testsuite/i2-search-variation.sh)."""
    import os
    target = "/root/repo/tests/data/mesh_target_fs.fa"
    hmm = "/root/reference/tutorial/AMP_N.bhmm"
    env = dict(os.environ, BATH_JAX_PLATFORM="cpu")
    outs = {}
    for name, extra in (("numpy", ["--backend", "numpy"]),
                        ("jax1", ["--backend", "jax"]),
                        ("jax8", ["--backend", "jax", "--mesh", "8"])):
        out = tmp_path / f"{name}.out"
        _run_bathsearch(out, [*extra, "--fs", "--block_length",
                              "20000", hmm, target], env)
        outs[name] = _norm(out)
    assert "shifts" in outs["numpy"]      # fs hits actually present
    assert outs["jax8"] == outs["jax1"] == outs["numpy"]


def test_mesh_splice_byte_identical(tmp_path):
    """--splice under --mesh 8 (device gate cascade sharded, splice
    graph post-pass on host) must be byte-identical to the numpy
    backend on the tutorial splice fixture (exon hits + SSI
    subsequence fetches)."""
    import os
    target = "/root/reference/tutorial/target-PTHR37536.fa"
    hmm = "/root/reference/tutorial/PTHR37536.bhmm"
    env = dict(os.environ, BATH_JAX_PLATFORM="cpu")
    outs = {}
    for name, extra in (("numpy", ["--backend", "numpy"]),
                        ("jax8", ["--backend", "jax", "--mesh", "8"])):
        out = tmp_path / f"{name}.out"
        _run_bathsearch(out, [*extra, "--splice", hmm, target], env)
        outs[name] = _norm(out)
    assert "exon" in outs["numpy"].lower()
    assert outs["jax8"] == outs["numpy"]


def test_multihost_fs_byte_identical(tmp_path):
    """--fs with --hosts 2 (jax.distributed SPMD, windows sharded
    across ranks, fs hits all-gathered) is byte-identical to the
    single-process numpy run on the fs-hit-bearing multi-window
    target."""
    import os
    import socket
    import subprocess
    import sys
    target = "/root/repo/tests/data/mesh_target_fs.fa"
    hmm = "/root/reference/tutorial/AMP_N.bhmm"
    env = dict(os.environ, JAX_PLATFORMS="cpu", BATH_BACKEND="numpy")
    single = tmp_path / "single.out"
    _run_bathsearch(single, ["--fs", "--block_length", "20000",
                             hmm, target], env)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for i in range(2):
        out = tmp_path / f"mhfs_{i}.out"
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "bath_tpu.cli.bathsearch",
             "--fs", "--block_length", "20000",
             "--hosts", "2", "--host-id", str(i),
             "--coordinator", f"localhost:{port}",
             "-o", str(out), hmm, target],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd="/root/repo", env=env))
    for p in procs:
        _, err = p.communicate(timeout=900)
        assert p.returncode == 0, err[-2000:].decode()
    assert "shifts" in _norm(single)
    assert _norm(tmp_path / "mhfs_0.out") == _norm(single)


def test_multihost_byte_identical(tmp_path):
    """bathsearch --hosts N (jax.distributed SPMD over N processes,
    windows sharded tid %% N, hits/stats all-gathered and merged in
    stream order) produces output byte-identical to a single-process
    run — the reference's thread-count invariance contract
    (i2-search-variation.sh) lifted across hosts."""
    import os
    import re
    import socket
    import subprocess
    import sys

    target = "/root/repo/tests/data/mesh_target.fa"
    hmm = "/root/reference/tutorial/AMP_N.bhmm"

    def norm(path):
        text = open(path).read()
        return re.sub(r"# (CPU time|Mc/sec):.*", "", text)

    env = dict(os.environ, JAX_PLATFORMS="cpu", BATH_BACKEND="numpy")
    single = tmp_path / "single.out"
    r = subprocess.run(
        [sys.executable, "-m", "bath_tpu.cli.bathsearch",
         "-o", str(single), hmm, target],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    for n in (2, 3):
        procs = []
        for i in range(n):
            out = tmp_path / f"mh_{n}_{i}.out"
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "bath_tpu.cli.bathsearch",
                 "--hosts", str(n), "--host-id", str(i),
                 "--coordinator", f"localhost:{port}",
                 "-o", str(out), hmm, target],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                cwd="/root/repo", env=env))
        for p in procs:
            _, err = p.communicate(timeout=600)
            assert p.returncode == 0, err[-2000:].decode()
        assert norm(tmp_path / f"mh_{n}_0.out") == norm(single), n
        port += 1


def test_hybrid_cpu_device_byte_identical(tmp_path):
    """--backend jax --cpu N composes forked host workers with the
    device cascade (VERDICT r4 item 2; ref thread_loop
    bathsearch.c:1118-1291): the dynamic worker/device window split
    must produce output byte-identical to the numpy backend, std and
    --fs, with the device stages forced to engage."""
    import os
    target = "/root/repo/tests/data/mesh_target_fs.fa"
    hmm = "/root/reference/tutorial/AMP_N.bhmm"
    env = dict(os.environ, BATH_JAX_PLATFORM="cpu",
               JAX_PLATFORMS="cpu")
    for mode in ([], ["--fs"]):
        a = tmp_path / f"np{len(mode)}.out"
        b = tmp_path / f"hy{len(mode)}.out"
        args = [*mode, "--block_length", "20000", hmm, target]
        _run_bathsearch(a, ["--backend", "numpy", *args], env)
        envh = dict(env, BATH_DEVICE_MIN_CELLS="0",
                    BATH_FS_MIN_CELLS="0")
        _run_bathsearch(b, ["--backend", "jax", "--cpu", "3", *args],
                        envh)
        assert _norm(a) == _norm(b)


def test_hybrid_cpu_device_splice_byte_identical(tmp_path):
    """--backend jax --cpu N with --splice: the worker/device window
    split composes with the splice post-pass (seeds + graphs built
    from the tid-ordered merged hit windows) byte-identically."""
    import os
    hmm = "/root/reference/tutorial/PTHR37536.bhmm"
    target = "/root/reference/tutorial/target-PTHR37536.fa"
    env = dict(os.environ, BATH_JAX_PLATFORM="cpu",
               JAX_PLATFORMS="cpu")
    a, b = tmp_path / "np.out", tmp_path / "hy.out"
    _run_bathsearch(a, ["--backend", "numpy", "--splice", hmm,
                        target], env)
    _run_bathsearch(b, ["--backend", "jax", "--cpu", "3", "--splice",
                        hmm, target], env)
    assert "exon" in _norm(a)
    assert _norm(a) == _norm(b)
