"""Multi-query drive byte parity: the shared-stream, cross-model
packed device cascade (bath_tpu/multiquery.py) must produce output
byte-identical to the serial per-query numpy loop — the multi-model
analogue of the backend byte-parity contract."""

import os
import re
import subprocess
import sys

TUT = "/root/reference/tutorial"


def _run(out, extra, env_extra=None, tbl=None):
    env = dict(os.environ, JAX_PLATFORMS="cpu", BATH_JAX_PLATFORM="cpu")
    env.update(env_extra or {})
    cmd = [sys.executable, "-m", "bath_tpu.cli.bathsearch",
           "-o", str(out)]
    if tbl:
        cmd += ["--tblout", str(tbl)]
    r = subprocess.run(cmd + extra, capture_output=True, text=True,
                       timeout=1800, cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]


def _norm(path):
    return re.sub(r"# (CPU time|Mc/sec):.*", "", open(path).read())


def test_multiquery_met_byte_identical(tmp_path):
    """2-query MET drive: jax multi-query == numpy serial, including
    the tabular output (modulo the cmdline/date tail)."""
    a, b = tmp_path / "np.out", tmp_path / "jx.out"
    ta, tb = tmp_path / "np.tbl", tmp_path / "jx.tbl"
    args = [f"{TUT}/MET.bhmm", f"{TUT}/target-MET.fa"]
    _run(a, ["--backend", "numpy"] + args, tbl=ta)
    _run(b, ["--backend", "jax"] + args, tbl=tb)
    assert _norm(a) == _norm(b)
    strip = lambda p: [l for l in open(p) if not l.startswith(
        ("# Option settings:", "# Date:", "# Current dir:"))]
    assert strip(ta) == strip(tb)


def test_multiquery_fs_byte_identical(tmp_path):
    """Multi-query --fs on the fs-hit fixture (clean + frameshifted +
    reverse-strand + boundary-spanning embeds): jax multi-query ==
    numpy serial."""
    q = tmp_path / "two.bhmm"
    q.write_text(open(f"{TUT}/AMP_N.bhmm").read()
                 + open(f"{TUT}/PTH2.bhmm").read())
    target = "/root/repo/tests/data/mesh_target_fs.fa"
    a, b = tmp_path / "np.out", tmp_path / "jx.out"
    args = ["--fs", "--block_length", "20000", str(q), target]
    _run(a, ["--backend", "numpy"] + args)
    _run(b, ["--backend", "jax"] + args)
    assert "shifts" in _norm(a)
    assert _norm(a) == _norm(b)


def test_multiquery_wider_context_hits_identical(tmp_path):
    """The shared stream's window context is the MAX over the query
    set; a query co-searched with a much larger model therefore sees
    wider windows than its serial stream.  Hits/scores/alignments
    must stay byte-identical regardless (RemoveDuplicates absorbs
    overlap-region duplicates); only per-query filter-count
    statistics lines are allowed to move (a boundary ORF the serial
    stream would split — see multiquery.py window-boundary note)."""
    q = tmp_path / "two.bhmm"
    q.write_text(open(f"{TUT}/AMP_N.bhmm").read()
                 + open(f"{TUT}/PTH2.bhmm").read())
    target = "/root/repo/tests/data/mesh_target_fs.fa"
    a, b = tmp_path / "np.out", tmp_path / "wide.out"
    args = ["--block_length", "20000", str(q), target]
    _run(a, ["--backend", "numpy"] + args)
    # 8x the natural shared context: simulates co-searching with a
    # much larger model
    _run(b, ["--backend", "jax"] + args,
         env_extra={"BATH_WINDOW_CONTEXT": "12800"})
    drop = lambda text: "\n".join(
        l for l in text.splitlines()
        if not l.startswith("Residues passing"))
    assert drop(_norm(a)) == drop(_norm(b))


def test_multiquery_twelve_models_byte_identical(tmp_path):
    """12-query drive (tRNA-proteins.bhmm, mixed M 56..459) vs the
    PTH2 target: exercises multiple size-class packs and queries with
    and without hits."""
    a, b = tmp_path / "np.out", tmp_path / "jx.out"
    args = [f"{TUT}/tRNA-proteins.bhmm", f"{TUT}/target-PTH2.fa"]
    _run(a, ["--backend", "numpy"] + args)
    _run(b, ["--backend", "jax"] + args)
    assert "PTH2" in _norm(a)
    assert _norm(a) == _norm(b)


def test_multiquery_disable_env(tmp_path):
    """BATH_MULTIQUERY=0 forces the serial per-query loop; bytes are
    identical either way (the contract both paths share)."""
    a, b = tmp_path / "mq.out", tmp_path / "ser.out"
    args = ["--backend", "jax", f"{TUT}/MET.bhmm",
            f"{TUT}/target-MET.fa"]
    _run(a, args)
    _run(b, args, env_extra={"BATH_MULTIQUERY": "0"})
    assert _norm(a) == _norm(b)

def _mk_boundary_fixture(tmp_path):
    """Target engineered to provoke the window-overlap stats
    divergence: MET's overlap is 1410 nt, AMP_N's 501, so co-searched
    windows give AMP_N 909 nt of extra left context.  Stop-free
    AMP_N-consensus embeds cross a window boundary AND the smaller
    serial window's start (block_length 6000: plus-strand embed spans
    ~5280..6084 over boundary 6000, minus-strand ~11280..12084 over
    boundary 12000), so the shared stream sees a longer ORF than
    AMP_N's serial stream and 'Residues passing' counters move unless
    the per-query reslicing is active."""
    import numpy as np
    sys.path.insert(0, "/root/repo")
    from bath_tpu.hmmfile import read_hmm
    rng = np.random.default_rng(7)
    L = 18000
    nt = rng.choice(np.array(list("ACGT")), L)
    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    CODON = {"A": "GCT", "C": "TGT", "D": "GAT", "E": "GAA",
             "F": "TTT", "G": "GGT", "H": "CAT", "I": "ATT",
             "K": "AAA", "L": "CTG", "M": "ATG", "N": "AAT",
             "P": "CCT", "Q": "CAA", "R": "CGT", "S": "TCT",
             "T": "ACT", "V": "GTT", "W": "TGG", "Y": "TAT"}
    AA = "ACDEFGHIKLMNPQRSTVWY"
    aas = [AA[int(np.argmax(np.asarray(hmm.mat[k][:20])))]
           for k in range(1, hmm.M + 1)]
    coding = "".join(CODON[a] for a in aas) * 2       # 804 nt, no stops
    nt[5280:5280 + len(coding)] = np.array(list(coding))
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = np.array([comp[c] for c in coding[::-1]])
    nt[11280:11280 + len(rc)] = rc
    tgt = tmp_path / "boundary.fa"
    tgt.write_text(">t1 boundary fixture\n" + "".join(nt) + "\n")
    q = tmp_path / "mix.bhmm"
    q.write_text(open(f"{TUT}/MET.bhmm").read()
                 + open(f"{TUT}/AMP_N.bhmm").read())
    return q, tgt


def test_multiquery_stats_block_byte_identical(tmp_path):
    """Full-file byte identity INCLUDING the per-query statistics
    block (VERDICT r4 item 7): mixed-overlap queries over a
    boundary-crossing target, std and --fs.  The per-query ORF
    reslicing (gencode.reslice_orfs) gives each overlap group its
    serial ORF set, so filter-stage residue counters match the serial
    stream exactly (ref bathsearch.c:1099, p7_pipeline.c:1835)."""
    q, tgt = _mk_boundary_fixture(tmp_path)
    for extra in ([], ["--fs"]):
        a = tmp_path / f"np{len(extra)}.out"
        b = tmp_path / f"jx{len(extra)}.out"
        args = extra + ["--block_length", "6000", str(q), str(tgt)]
        _run(a, ["--backend", "numpy"] + args)
        _run(b, ["--backend", "jax"] + args)
        assert _norm(a) == _norm(b)


def test_multiquery_stats_parity_has_teeth(tmp_path):
    """The fixture really provokes the divergence: with reslicing
    disabled (BATH_MQ_RESLICE=0, the pre-r5 behavior) the statistics
    lines MUST move while hits stay identical — i.e. the test above
    fails without the fix."""
    q, tgt = _mk_boundary_fixture(tmp_path)
    a, b = tmp_path / "np.out", tmp_path / "off.out"
    args = ["--block_length", "6000", str(q), str(tgt)]
    _run(a, ["--backend", "numpy"] + args)
    _run(b, ["--backend", "jax"] + args,
         env_extra={"BATH_MQ_RESLICE": "0"})
    drop = lambda text: "\n".join(
        l for l in text.splitlines()
        if not l.startswith("Residues passing"))
    assert _norm(a) != _norm(b)
    assert drop(_norm(a)) == drop(_norm(b))

def test_multiquery_watchdog_stall_surrenders(tmp_path):
    """Packed-gate stall watchdog: a hanging device flush in the
    multi-query fwd stage (BATH_DEVICE_HANG=mq-fwd fault injection)
    must surrender to the per-item host fallback with byte-identical
    output."""
    a, b = tmp_path / "np.out", tmp_path / "jx.out"
    args = [f"{TUT}/MET.bhmm", f"{TUT}/target-MET.fa"]
    _run(a, ["--backend", "numpy"] + args)
    _run(b, ["--backend", "jax"] + args,
         env_extra={"BATH_DEVICE_HANG": "mq-fwd:3600",
                    "BATH_MQ_FWD_MIN_CELLS": "0"})
    assert _norm(a) == _norm(b)

def test_reslice_orfs_matches_reextraction():
    """Ground-truth property: reslice_orfs(shared, d) must equal
    extract_orfs on the d-truncated window — same amino content,
    coordinates shifted by d, same frames, same emission order —
    across strands, overlap depths, minlen values, and initiator
    modes (the serial-window derivation the multi-query stats parity
    rests on)."""
    import numpy as np

    from bath_tpu.gencode import (GeneticCode, extract_orfs,
                                  reslice_orfs)
    from bath_tpu.sequence import revcomp

    g_any = GeneticCode.create(1)
    g_any.set_initiator_any()
    g_init = GeneticCode.create(1)
    checked = 0
    for seed in range(6):
        rng = np.random.default_rng(seed)
        L0 = int(rng.integers(400, 2200))
        dsq = rng.integers(0, 4, L0).astype(np.int32)
        dsq[rng.integers(0, L0, L0 // 60)] = 15   # degenerates
        for d in (3, 30, 300):
            for minlen in (1, 20):
                for req, gc in ((False, g_any), (True, g_init)):
                    for rc in (False, True):
                        win = revcomp(dsq) if rc else dsq
                        sub = revcomp(dsq[d:]) if rc else dsq[d:]
                        shared = extract_orfs(
                            gc, win, minlen=minlen, is_revcomp=rc,
                            require_initiator=req)
                        serial = extract_orfs(
                            gc, sub, minlen=minlen, is_revcomp=rc,
                            require_initiator=req)
                        view = reslice_orfs(
                            shared, d, L=L0, is_revcomp=rc,
                            minlen=minlen, require_initiator=req,
                            gcode=gc, dsq=win)
                        assert len(view) == len(serial), \
                            (seed, d, minlen, req, rc)
                        for v, s in zip(view, serial):
                            assert (np.array_equal(v.dsq, s.dsq)
                                    and v.start == s.start + d
                                    and v.end == s.end + d
                                    and v.frame == s.frame), \
                                (seed, d, minlen, req, rc)
                        checked += 1
    assert checked == 6 * 3 * 2 * 2 * 2

def test_multiquery_query_pool_byte_identical(tmp_path):
    """--cpu N on a multi-HMM query file runs the query-sharded mq
    pool (workers take balanced query slices of the shared window
    stream); output must equal the serial loop byte-for-byte,
    including statistics blocks and overlap reslicing, for both
    backends, std and --fs."""
    q, tgt = _mk_boundary_fixture(tmp_path)
    args0 = ["--block_length", "6000", str(q), str(tgt)]
    for extra in ([], ["--fs"]):
        a = tmp_path / f"ser{len(extra)}.out"
        _run(a, ["--backend", "numpy"] + extra + args0)
        for backend in ("numpy", "jax"):
            b = tmp_path / f"pool{backend}{len(extra)}.out"
            _run(b, ["--backend", backend, "--cpu", "3"]
                 + extra + args0)
            assert _norm(a) == _norm(b), (backend, extra)
