"""Benchmark: frameshift-Forward gate kernel GCUPS on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: billions of DP cells (nres x model nodes, the reference's
Mc/sec unit, ref p7_pipeline.c:1877) per second through the batched
frameshift 3-codon Forward parser — the pipeline's north-star kernel
(BASELINE.json).  vs_baseline is against the best Mc/sec the reference
ships in its committed tutorial outputs (310.18 Mc/s = 0.31018 GCUPS,
tutorial/MET-ct4.out:103; the reference publishes no larger-scale
numbers in-repo).

Driver-budget-proof structure (VERDICT r4 item 1 — the r4 artifact was
lost to an axon-tunnel stall, rc=124 with no JSON line):

  parent (this process, no flags)
    ├ hard overall deadline (BATH_BENCH_BUDGET, default 225 s) via
    │   SIGALRM; SIGTERM/SIGINT/SIGHUP all flush the best JSON line
    │   seen so far before exiting, so a kill at ANY moment yields a
    │   parseable artifact
    ├ CPU child (--cpu), started IMMEDIATELY and run concurrently:
    │   prints a quick single-worker line (~15 s) then the full
    │   4-worker line (~40 s) — the floor under any tunnel weather
    └ device child (--_device), deadline ≤110 s, retried once while
        budget remains: prints a JSON line after EVERY timed
        iteration, so even a mid-iteration kill keeps the completed
        measurements

The parent keeps the max-value line across all children and prints
exactly one JSON line on stdout at exit.
"""

import json
import os
import signal
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REF_BASELINE_GCUPS = 0.31018
HMM_PATH = "/root/reference/tutorial/AMP_N.bhmm"

_CPU_STATE = {}
_LOCK = threading.Lock()
_BEST = {"value": -1.0, "line": None}
_CHILDREN = []
_FLUSHED = threading.Event()


def _emit(metric, gcups, extra=None):
    d = {"metric": metric, "value": round(float(gcups), 3),
         "unit": "GCUPS",
         "vs_baseline": round(float(gcups) / REF_BASELINE_GCUPS, 2)}
    if extra:
        d.update(extra)
    print(json.dumps(d), flush=True)


def _note(msg):
    sys.stderr.write(msg + "\n")
    sys.stderr.flush()


# ---------------------------------------------------------------------
# CPU tier (the weather-proof floor; also the explicit --cpu mode)
# ---------------------------------------------------------------------

def _load_om3():
    from bath_tpu.bg import Background
    from bath_tpu.gencode import GeneticCode
    from bath_tpu.hmmfile import read_hmm
    from bath_tpu.ops.reference.fwdback_fs import fs_oprofile_convert
    from bath_tpu.profile import profile_config_fs
    hmm = read_hmm(HMM_PATH)
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    gm3 = profile_config_fs(hmm, Background(), gcode, 3, 100)
    return hmm, fs_oprofile_convert(gm3)


def _cpu_init(hmm_path):
    _CPU_STATE["om3"] = _load_om3()[1]


def _cpu_work(seqs):
    from bath_tpu.native import fs3_parser_score_native
    om3 = _CPU_STATE["om3"]
    return [fs3_parser_score_native(s, om3) for s in seqs]


def _cpu_main():
    """Two phases, each printing a JSON line: a quick single-process
    measurement (a number exists within ~15 s of process start), then
    the full 4-worker pool number (the production CPU path: bit-exact
    native C fs3 gate over forked workers — jnp-on-CPU would
    understate the framework ~10x)."""
    import multiprocessing as mp
    from bath_tpu.native import fs3_parser_score_native
    hmm, om3 = _load_om3()
    if fs3_parser_score_native(np.zeros(48, np.int32), om3) is None:
        _emit("fs3-forward-gate GCUPS (native lib unavailable)", 0.0)
        return
    rng = np.random.default_rng(0)
    L = 1536
    # quick: one worker, ~1.6e9 cells (lands < ~15 s even when the
    # machine is contended — this line is the kill-at-60s guarantee)
    seqs = [rng.integers(0, 4, L).astype(np.int32) for _ in range(8)]
    fs3_parser_score_native(seqs[0], om3)          # warm
    t0 = time.perf_counter()
    for s in seqs:
        fs3_parser_score_native(s, om3)
    dt = time.perf_counter() - t0
    _emit("fs3-forward-gate GCUPS (native, 1 CPU worker, quick)",
          len(seqs) * L * hmm.M / dt / 1e9)
    # full: 4 forked workers
    B, W = 256, 4
    seqs = [rng.integers(0, 4, L).astype(np.int32) for _ in range(B)]
    chunks = [seqs[i::W] for i in range(W)]
    ctx = mp.get_context("fork")
    with ctx.Pool(W, initializer=_cpu_init, initargs=(HMM_PATH,)) \
            as pool:
        pool.map(_cpu_work, [c[:1] for c in chunks])    # warm forks
        t0 = time.perf_counter()
        pool.map(_cpu_work, chunks)
        dt = time.perf_counter() - t0
    _emit("fs3-forward-gate GCUPS (native, 4 CPU workers)",
          B * L * hmm.M / dt / 1e9)


# ---------------------------------------------------------------------
# Device tier
# ---------------------------------------------------------------------

def _tpu_alive(timeout_s: float = 45.0) -> bool:
    """Probe the TPU in a subprocess (the axon tunnel can stall with
    jax blocked at 0% CPU — a hang here would lose the whole bench
    run).  Probing out-of-process keeps this process's jax clean."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); import jax.numpy as jnp; "
             "float(jnp.ones(8).sum())"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _device_main(argv):
    """Measure the production fs3 kernel (ops/jaxk/fs3_v3.py) on the
    chip.  Emits a JSON line after EVERY timed iteration so the
    parent keeps completed measurements even if the tunnel stalls and
    this child is killed mid-iteration.  Explicit kernel modes
    (--v2/--sub/--pallas/--v1) select the parity-oracle tiers instead
    (ops/pallas/ is retired from the default race — VERDICT r4 item
    10: the jnp kernels win every race; see README)."""
    # --_noprobe (attempt 0): go straight to the measurement — the
    # tunnel's up-windows can be shorter than the probe itself, and
    # the parent's deadline already bounds a hung child; the retry
    # attempt probes first so a downed tunnel fails fast there
    if "--_noprobe" not in argv and not _tpu_alive(45.0):
        _note("# device: TPU probe failed (tunnel down)")
        sys.exit(3)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    from bath_tpu.ops.jaxk import kernels as jk

    hmm, om3 = _load_om3()
    rng = np.random.default_rng(0)

    mode = "v4"                 # the production kernel (fs3_v4.py)
    for m in ("v2", "sub", "pallas", "v1", "v3"):
        if f"--{m}" in argv:
            mode = m
    if mode == "v4":
        from bath_tpu.ops.jaxk.fs3_v4 import (fs3_params_v4,
                                              fs3_score_batch_v4)
        ps = fs3_params_v4(om3)
        B, L = 4096, 8184

        def run(d, lens):
            return fs3_score_batch_v4(d, lens, ps, nj=1.0)
    elif mode == "v3":
        from bath_tpu.ops.jaxk.fs3_v3 import (fs3_params_v3,
                                              fs3_score_batch_v3)
        ps = fs3_params_v3(om3)
        B, L = 4096, 8184

        def run(d, lens):
            return fs3_score_batch_v3(d, lens, ps, nj=1.0)
    elif mode == "v1":
        ps = jk.fs3_params(om3)
        B, L = 4096, 8184

        def run(d, lens):
            return jk.fs3_score_batch(d, lens, ps, nj=1.0)
    elif mode == "v2":
        from bath_tpu.ops.pallas.fs3v2 import fs3_params_v2, fs3_score_v2
        ps = fs3_params_v2(om3)
        B, L = 1024, 8184
        bt = int(argv[argv.index("--btile") + 1]) \
            if "--btile" in argv else 512
        lb = int(argv[argv.index("--lblk") + 1]) \
            if "--lblk" in argv else 96

        def run(d, lens):
            return fs3_score_v2(d, lens, ps, nj=1.0, btile=bt, lblk=lb)
    elif mode == "sub":
        from bath_tpu.ops.pallas.fs3_sub import (fs3_params_sub,
                                                 fs3_score_sub)
        ps = fs3_params_sub(om3)
        B, L = 1024, 8184

        def run(d, lens):
            return fs3_score_sub(d, lens, ps, nj=1.0)
    else:  # pallas v1
        from bath_tpu.ops.pallas.fs3 import (codon_indices_fs3,
                                             fs3_params_pallas,
                                             fs3_score_pallas)
        rfv_p, tr_p, Mp = fs3_params_pallas(om3)
        B, L = 1024, 4092
        pmove = jnp.full(B, 3.0 / (L // 3 + 3.0), jnp.float32)

        def run(d, lens):
            c = tuple(jnp.asarray(x)
                      for x in codon_indices_fs3(np.asarray(d)))
            return fs3_score_pallas(c, lens, pmove, rfv_p, tr_p, Mp,
                                    nj=1.0, btile=256)

    if "--B" in argv:
        B = int(argv[argv.index("--B") + 1])
    if "--L" in argv:
        L = int(argv[argv.index("--L") + 1])
    label = f"fs3-forward-gate GCUPS/chip [jnp-{mode}]" \
        if mode in ("v3", "v4") \
        else f"fs3-forward-gate GCUPS/chip [{mode}]"
    lens = jnp.asarray(np.full(B, L, np.int32))
    # pre-upload the measurement batches (int8, kernels upcast): a
    # tunneled upload runs at 50-260 MB/s and must not be timed
    K = 6
    batches = [jnp.asarray(rng.integers(0, 4, (B, L)).astype(np.int8))
               for _ in range(K)]
    jax.block_until_ready(batches)
    t0 = time.perf_counter()
    np.asarray(run(batches[0], lens))       # compile + warm
    _note(f"# device: compile+warm {time.perf_counter()-t0:.1f}s")
    # K dispatches per timed round with ONE materialization at the
    # end (in-order device execution): the ~0.3-0.5s tunnel fetch
    # round trip amortizes over K * B * L * M cells instead of
    # dominating a single call's wall
    best = 0.0
    for it in range(3):
        t0 = time.perf_counter()
        out = None
        for d in batches:
            out = run(d, lens)
        np.asarray(out)
        g = K * B * L * hmm.M / (time.perf_counter() - t0) / 1e9
        best = max(best, g)
        _emit(label, best, {"B": B, "L": L, "iter": it})


# ---------------------------------------------------------------------
# Parent orchestration
# ---------------------------------------------------------------------

def _consume(proc, tag):
    for raw in proc.stdout:
        line = raw.decode(errors="replace").strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
            except ValueError:
                continue
            with _LOCK:
                if d.get("value", 0.0) > _BEST["value"]:
                    _BEST["value"] = d["value"]
                    _BEST["line"] = d
            _note(f"# [{tag}] {d.get('metric')}: {d.get('value')}")
        elif line:
            _note(f"# [{tag}] {line}")


def _flush_best():
    if _FLUSHED.is_set():
        return
    _FLUSHED.set()
    with _LOCK:
        line = _BEST["line"]
    if line is None:
        line = {"metric": "fs3-forward-gate GCUPS "
                          "(no measurement completed before deadline)",
                "value": 0.0, "unit": "GCUPS", "vs_baseline": 0.0}
    for k in ("iter", "B", "L"):
        line.pop(k, None)
    print(json.dumps(line), flush=True)


def _reap():
    for p in _CHILDREN:
        if p.poll() is None:
            try:
                p.terminate()
            except OSError:
                pass
    time.sleep(0.5)
    for p in _CHILDREN:
        if p.poll() is None:
            try:
                p.kill()
            except OSError:
                pass


def _on_signal(signum, frame):
    _note(f"# parent: signal {signum}; flushing best-so-far")
    _flush_best()
    _reap()
    os._exit(0)


def _spawn(args, tag):
    proc = subprocess.Popen([sys.executable,
                             os.path.abspath(__file__)] + args,
                            stdout=subprocess.PIPE, stderr=sys.stderr)
    _CHILDREN.append(proc)
    t = threading.Thread(target=_consume, args=(proc, tag), daemon=True)
    t.start()
    return proc


def _parent(argv):
    budget = float(os.environ.get("BATH_BENCH_BUDGET", "225"))
    t_end = time.monotonic() + budget
    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        signal.signal(sig, _on_signal)
    signal.signal(signal.SIGALRM, _on_signal)
    signal.alarm(max(1, int(budget)))

    cpu = _spawn(["--cpu"], "cpu")
    got_device = False
    no_dev = os.environ.get("BATH_BENCH_NO_DEVICE") == "1"
    for attempt in range(0 if no_dev else 2):
        remaining = t_end - time.monotonic()
        if remaining < 70.0:
            break
        dev = _spawn(["--_device"]
                     + (["--_noprobe"] if attempt == 0 else [])
                     + argv, "device")
        deadline = time.monotonic() + min(110.0, remaining - 12.0)
        while dev.poll() is None and time.monotonic() < deadline:
            time.sleep(0.5)
        if dev.poll() is None:
            _note(f"# parent: device attempt {attempt} hit deadline; "
                  "killing child")
            dev.terminate()
            time.sleep(2.0)
            if dev.poll() is None:
                dev.kill()
            dev.wait()
        with _LOCK:
            got_device = (_BEST["line"] is not None
                          and "/chip" in _BEST["line"].get("metric", ""))
        if dev.returncode == 0 and got_device:
            break
        _note(f"# parent: device attempt {attempt} "
              f"rc={dev.returncode} got_device={got_device}")
    # make sure the CPU floor lands (it is usually done already)
    while cpu.poll() is None and time.monotonic() < t_end - 3.0:
        time.sleep(0.5)
    if not got_device:
        with _LOCK:
            if _BEST["line"] is not None:
                _BEST["line"]["metric"] += \
                    " (DEVICE FALLBACK: TPU tunnel unreachable)"
    signal.alarm(0)
    _flush_best()
    _reap()


# ---------------------------------------------------------------------
# (M, B) sweep — bench_artifacts/sweep artifact generator
# ---------------------------------------------------------------------

def _sweep_hmm(M_target):
    """An HMM of roughly M_target nodes: bundled models where one
    fits, else built once from a sampled long MSA (cached)."""
    from bath_tpu.hmmfile import read_hmm
    if M_target <= 150:
        return read_hmm(HMM_PATH)
    if M_target <= 500:
        return read_hmm("/root/reference/tutorial/MET.bhmm")  # M=409
    path = f"/tmp/bench_sweep_M{M_target}.bhmm"
    if not os.path.exists(path):
        amp = read_hmm(HMM_PATH)
        rng = np.random.default_rng(3)
        AA = "ACDEFGHIKLMNPQRSTVWY"
        reps = (M_target + amp.M - 1) // amp.M
        seqs = []
        for s in range(6):
            cols = []
            for _ in range(reps):
                for k in range(1, amp.M + 1):
                    p = np.asarray(amp.mat[k][:20], np.float64)
                    cols.append(AA[rng.choice(20, p=p / p.sum())])
            seqs.append("".join(cols[:M_target]))
        sto = f"/tmp/bench_sweep_M{M_target}.sto"
        with open(sto, "w") as f:
            f.write("# STOCKHOLM 1.0\n#=GF ID SWEEP\n")
            for i, s in enumerate(seqs):
                f.write(f"seq{i}  {s}\n")
            f.write("//\n")
        r = subprocess.run(
            [sys.executable, "-m", "bath_tpu.cli.bathbuild", path, sto],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        assert r.returncode == 0, r.stderr[-2000:]
    return read_hmm(path)


def _sweep():
    """Per-(M, B) GCUPS table for the production fs3 v3 kernel
    (VERDICT r4 item 6: Pfam-realistic model sizes + the lane-cap
    cliff shown flat).  Prints one JSON line per combo, best-of-2
    timed iterations."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from bath_tpu.bg import Background
    from bath_tpu.gencode import GeneticCode
    from bath_tpu.ops.jaxk import kernels as jk
    from bath_tpu.ops.jaxk.fs3_v4 import fs3_params_v4, fs3_score_batch_v4
    from bath_tpu.ops.reference.fwdback_fs import fs_oprofile_convert
    from bath_tpu.profile import profile_config_fs

    bg = Background()
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    rng = np.random.default_rng(0)
    L = 8184
    for M_target in (134, 409, 1000):
        hmm = _sweep_hmm(M_target)
        om3 = fs_oprofile_convert(
            profile_config_fs(hmm, bg, gcode, 3, 100))
        p3 = fs3_params_v4(om3)           # the production default
        for B in (1024, 4096, 8192):
            # bench methodology: pre-uploaded batches (uploads run at
            # tunnel speed, 50-260 MB/s, and must not be timed), K
            # dispatches per round with ONE materialization so the
            # fetch round trip amortizes
            K = max(2, min(6, int(4e10 / (B * L * hmm.M))))
            lens = jnp.asarray(np.full(B, L, np.int32))
            bats = [jnp.asarray(
                rng.integers(0, 4, (B, L)).astype(np.int8))
                for _ in range(K)]
            jax.block_until_ready(bats)
            np.asarray(fs3_score_batch_v4(bats[0], lens, p3,
                                          nj=1.0))   # compile+warm
            best = 0.0
            for _ in range(2):
                t0 = time.perf_counter()
                out = None
                for d in bats:
                    out = fs3_score_batch_v4(d, lens, p3, nj=1.0)
                np.asarray(out)
                dt = time.perf_counter() - t0
                best = max(best, K * B * L * hmm.M / dt / 1e9)
            print(json.dumps({
                "metric": "fs3-gate GCUPS [v4]", "M": hmm.M, "B": B,
                "L": L, "K": K, "value": round(best, 2),
                "lane_cap": jk.fs3_max_lanes(p3.base.Mt)}), flush=True)


def main():
    argv = sys.argv[1:]
    if "--sweep" in argv:
        _sweep()
    elif "--cpu" in argv:
        _cpu_main()
    elif "--_device" in argv:
        _device_main(argv)
    else:
        _parent(argv)


if __name__ == "__main__":
    main()
