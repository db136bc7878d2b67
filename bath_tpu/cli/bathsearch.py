"""bathsearch: search protein profile HMM(s) against a DNA database.

Re-provides the reference's bathsearch driver
(ref: /root/reference/src/bathsearch.c serial_master :478,
serial_loop :1052): windowed target streaming, 6-frame translation,
per-window pipeline, E-values from global residue count, merge, dedup,
threshold, and output.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from .. import constants as C
from ..alphabet import dna
from ..bg import Background
from ..gencode import GeneticCode, extract_orfs
from ..hmmfile import read_hmms
from ..oprofile import oprofile_convert
from ..pipeline import Pipeline, pipeline_bath, statistics_text
from ..profile import profile_config, profile_config_fs
from ..scoredata import score_data_create
from ..sequence import read_windows
from ..tophits import IS_INCLUDED, IS_REPORTED, TopHits


# ---------------------------------------------------------------------
# Multi-worker host path (ref: bathsearch.c thread_loop/pipeline_thread
# :1118-1291 — the pthread work queue over target blocks).  Workers are
# forked processes that inherit the per-query profile state copy-on-
# write; results stream back in window order, so output is byte-
# identical to the serial path for any worker count (the reference's
# determinism contract, tested by i2-search-variation.sh).
# ---------------------------------------------------------------------
_WCTX: dict | None = None

_PLI_COUNTERS = ("n_past_msv", "n_past_bias", "n_past_vit",
                 "n_past_fwd", "n_output", "pos_past_msv",
                 "pos_past_bias", "pos_past_vit", "pos_past_fwd",
                 "pos_output")


def _pool_task(spec):
    """One window, both strands, in a forked worker."""
    tid, window, seqid, nres_at = spec
    c = _WCTX
    pli = c["pli"]
    # serial-stream residue count as of this window: the early domain
    # keep-filter reads pli.Z = nres/max_length at domain-definition
    # time (ref p7_pipeline.c:1230-1249); the forked copy's counter
    # is frozen at fork time, so restore the serial value per window
    pli.nres = nres_at
    before = [getattr(pli, f) for f in _PLI_COUNTERS]
    th = TopHits()
    hws: list = []
    if pli.strands != C.STRAND_BOTTOMONLY:
        orfs = extract_orfs(c["gcode"], window.dsq,
                            minlen=c["minlen"],
                            require_initiator=c["require_init"])
        pipeline_bath(pli, c["om"], c["gm"], c["om_fs3"], c["om_fs5"],
                      c["gm_fs5"], c["data"], c["bg"], th, seqid,
                      window, orfs, c["gcode"], hws, C.NOCOMPLEMENT,
                      c["fs_funcs"])
    if pli.strands != C.STRAND_TOPONLY:
        rc = window.reverse_complement()
        orfs = extract_orfs(c["gcode"], rc.dsq, minlen=c["minlen"],
                            is_revcomp=True,
                            require_initiator=c["require_init"])
        pipeline_bath(pli, c["om"], c["gm"], c["om_fs3"], c["om_fs5"],
                      c["gm_fs5"], c["data"], c["bg"], th, seqid,
                      rc, orfs, c["gcode"], hws, C.COMPLEMENT,
                      c["fs_funcs"])
    deltas = {f: getattr(pli, f) - b
              for f, b in zip(_PLI_COUNTERS, before)}
    return tid, th.unsrt, hws, deltas


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bathsearch",
        description="search protein profile(s) against DNA sequence "
                    "database (TPU-native bath_tpu)")
    p.add_argument("queryfile")
    p.add_argument("dbfile")
    p.add_argument("-o", dest="outfile", default=None)
    p.add_argument("--tblout", default=None)
    p.add_argument("--fstblout", default=None)
    p.add_argument("--exontblout", default=None)
    p.add_argument("--qformat", default=None)
    p.add_argument("--splice", action="store_true")
    p.add_argument("--min_intron", type=int, default=13)
    p.add_argument("--max_intron", type=int, default=200000)
    p.add_argument("--fs", action="store_true")
    p.add_argument("--fsonly", action="store_true")
    p.add_argument("--acc", action="store_true")
    p.add_argument("--noali", action="store_true")
    p.add_argument("--notrans", action="store_true")
    p.add_argument("--frameline", action="store_true")
    p.add_argument("--cigar", action="store_true")
    p.add_argument("--notextw", action="store_true")
    p.add_argument("--textw", type=int, default=150)
    p.add_argument("--ct", type=int, default=1)
    p.add_argument("-l", dest="minlen", type=int, default=20)
    p.add_argument("-m", dest="aug_only", action="store_true")
    p.add_argument("-M", dest="init_any_codon", action="store_true")
    p.add_argument("--strand", default="both",
                   choices=["both", "plus", "minus"])
    p.add_argument("-E", type=float, default=10.0)
    p.add_argument("-T", type=float, default=None)
    p.add_argument("--incE", type=float, default=0.01)
    p.add_argument("--incT", type=float, default=None)
    p.add_argument("--max", action="store_true")
    p.add_argument("--F1", type=float, default=C.F1_DEFAULT)
    p.add_argument("--F2", type=float, default=C.F2_DEFAULT)
    p.add_argument("--F3", type=float, default=C.F3_DEFAULT)
    p.add_argument("--F4", type=float, default=C.F4_DEFAULT)
    p.add_argument("--nobias", action="store_true")
    p.add_argument("--nonull2", action="store_true")
    p.add_argument("-Z", type=float, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mx", default="BLOSUM62",
                   help="substitution score matrix for single-seq "
                        "queries (built-in choices)")
    p.add_argument("--mxfile", default=None,
                   help="read substitution score matrix from file <f>")
    p.add_argument("--crick", action="store_true",
                   help="only translate top strand")
    p.add_argument("--watson", action="store_true",
                   help="only translate bottom strand")
    p.add_argument("--nodeinfo", action="store_true",
                   help="additional info on node types for "
                        "--exontblout")
    p.add_argument("--ssifile", default=None,
                   help="override the restrictdb index file to <s>")
    # accepted for reference cmdline compatibility; unused there too
    # (ref: bathsearch.c options marked "Not used")
    p.add_argument("--domE", type=float, default=10.0,
                   help=argparse.SUPPRESS)
    p.add_argument("--domT", type=float, default=None,
                   help=argparse.SUPPRESS)
    p.add_argument("--domZ", type=float, default=None,
                   help=argparse.SUPPRESS)
    p.add_argument("--incdomE", type=float, default=0.01,
                   help=argparse.SUPPRESS)
    p.add_argument("--incdomT", type=float, default=None,
                   help=argparse.SUPPRESS)
    p.add_argument("--block_length", type=int,
                   default=C.BLOCK_LENGTH_DEFAULT)
    p.add_argument("--restrictdb_stkey", default=None,
                   help="search starts at the sequence named <key> "
                        "(ref: bathsearch.c :143)")
    p.add_argument("--restrictdb_n", type=int, default=-1,
                   help="search at most <n> sequences from stkey")
    p.add_argument("--hmmout", default=None,
                   help="save HMMs built from MSA/seq queries to <f>")
    p.add_argument("--tformat", default=None)
    p.add_argument("--singlemx", action="store_true")
    p.add_argument("--popen", type=float, default=0.02)
    p.add_argument("--pextend", type=float, default=0.4)
    p.add_argument("--w_beta", type=float, default=1e-7)
    p.add_argument("--w_length", type=int, default=0)
    import os as _os
    p.add_argument("--cpu", type=int,
                   default=int(_os.environ.get("HMMER_NCPU", 0)),
                   help="number of parallel workers over target "
                        "windows (forked processes; output is "
                        "byte-identical for any worker count). "
                        "0/1 = serial")
    p.add_argument("--backend",
                   default=_os.environ.get("BATH_BACKEND", "auto"),
                   choices=["auto", "numpy", "jax"],
                   help="filter-cascade backend: jax runs the "
                        "MSV/Forward/fs3 gates as chunked device "
                        "batches (output is byte-identical to numpy; "
                        "survivors are re-scored by the bit-exact "
                        "host kernels); numpy is the scalar host "
                        "path. auto picks jax when an accelerator "
                        "is visible")
    p.add_argument("--mesh", type=int, default=0,
                   help="with --backend jax: shard device gate "
                        "batches over an N-device data-parallel mesh "
                        "(profiles replicated; output is identical "
                        "for any N)")
    p.add_argument("--hosts", type=int,
                   default=int(_os.environ.get("BATH_NPROCS", 0)),
                   help="total process count of a jax.distributed "
                        "data-parallel run: windows are sharded "
                        "tid %% hosts == host-id, hits/stats are "
                        "all-gathered and merged in stream order, so "
                        "output is byte-identical for any host count "
                        "(run one process per host)")
    p.add_argument("--host-id", type=int, default=-1,
                   help="this process's rank (0..hosts-1); host 0 "
                        "writes the output")
    p.add_argument("--coordinator", default=None,
                   help="host:port of rank 0's jax.distributed "
                        "coordinator (default localhost:9377)")
    return p


def resolve_backend(choice: str) -> str:
    """'auto' picks the device cascade iff an accelerator is visible
    without paying a jax import/init on pure-CPU boxes: JAX_PLATFORMS
    pinned to cpu (the test environment) or no TPU marker -> numpy."""
    if choice != "auto":
        return choice
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return "numpy"
    has_tpu = (any(os.path.exists(f"/dev/accel{i}") for i in range(4))
               or os.environ.get("PALLAS_AXON_POOL_IPS")
               or os.environ.get("TPU_NAME"))
    return "jax" if has_tpu else "numpy"


def make_pipeline(args) -> Pipeline:
    pli = Pipeline()
    pli.fs_pipe = args.fs or args.fsonly
    pli.std_pipe = not args.fsonly
    pli.spliced = args.splice
    pli.E = args.E
    if args.T is not None:
        pli.T = args.T
        pli.by_E = False
    pli.incE = args.incE
    if args.incT is not None:
        pli.incT = args.incT
        pli.inc_by_E = False
    pli.F1 = min(1.0, args.F1)
    pli.F2 = min(1.0, args.F2)
    pli.F3 = min(1.0, args.F3)
    pli.F4 = min(1.0, args.F4)
    if args.max:
        pli.do_max = True
        pli.do_biasfilter = False
        pli.F1 = pli.F2 = pli.F3 = pli.F4 = 1.0
    if args.nobias:
        pli.do_biasfilter = False
    if args.nonull2:
        pli.do_null2 = False
    pli.show_alignments = not args.noali
    pli.show_accessions = args.acc
    pli.show_frameline = args.frameline
    pli.show_trans = not args.notrans
    pli.show_cigar = args.cigar
    pli.strands = {"both": C.STRAND_BOTH, "plus": C.STRAND_TOPONLY,
                   "minus": C.STRAND_BOTTOMONLY}[args.strand]
    pli.block_length = args.block_length
    return pli


def output_header(ofp, args):
    ofp.write("# bathsearch :: search protein profile(s) against DNA "
              "sequence database\n")
    ofp.write("# bath_tpu (TPU-native framework)\n")
    ofp.write("# - - - - - - - - - - - - - - - - - - - - - - - - - - - "
              "- - - - - - - -\n")
    ofp.write("# query HMM file:                                %s\n"
              % args.queryfile)
    ofp.write("# target sequence database:                      %s\n"
              % args.dbfile)
    ofp.write("# codon translation table:                       %d\n"
              % args.ct)
    ofp.write("# - - - - - - - - - - - - - - - - - - - - - - - - - - - "
              "- - - - - - - -\n\n")


def load_queries(path, args):
    """Query open/autodetect: profile HMM file, MSA, or sequence(s)
    (ref: bathsearch.c :552-632, p7_search_builder.c :98 — MSA/seq
    queries are built + calibrated on the fly)."""
    from ..sequence import _open_text
    with _open_text(path) as fh:
        head = fh.read(256)
    qfmt = getattr(args, "qformat", None)
    if head.startswith(("BATH", "HMMER")):
        yield from read_hmms(path)
        return
    from ..builder import BuilderConfig, build, single_build
    from ..msa import read_stockholm
    cfg = BuilderConfig(fs=True, ct=args.ct,
                        popen=getattr(args, "popen", 0.02),
                        pextend=getattr(args, "pextend", 0.4),
                        w_beta=getattr(args, "w_beta", 1e-7),
                        w_len=getattr(args, "w_length", 0),
                        mx=getattr(args, "mx", "BLOSUM62"),
                        mxfile=getattr(args, "mxfile", None))
    hmmout = getattr(args, "hmmout", None)
    hfp = open(hmmout, "w") if hmmout else None

    def emit(h):
        if hfp is not None:
            from ..hmmfile import write_hmm
            write_hmm(hfp, h)
            hfp.flush()
        return h
    if head.startswith("# STOCKHOLM") or qfmt in ("stockholm", "sto"):
        for msa in read_stockholm(path):
            if not msa.name:
                msa.name = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
            yield emit(build(msa, cfg))
        return
    if not head.lstrip().startswith(">"):
        raise SystemExit(f"can't autodetect query format of {path}")
    body = "".join(ln for ln in head.splitlines()[1:]
                   if not ln.startswith(">"))
    is_aligned = any(c in body for c in "-.")
    if qfmt in ("afa",) or (is_aligned and qfmt is None):
        from ..msa import read_afa
        for msa in read_afa(path):
            if not msa.name:
                msa.name = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
            yield emit(build(msa, cfg))
        return
    from ..alphabet import amino
    from ..sequence import read_fasta
    for sq in read_fasta(path, amino()):
        h = single_build(sq.dsq, sq.name, cfg)
        if sq.desc:
            h.desc = sq.desc
        yield emit(h)
    if hfp is not None:
        hfp.close()


def run(argv=None) -> int:
    args = build_parser().parse_args(argv)
    args.backend = resolve_backend(args.backend)
    if args.crick:
        args.strand = "plus"
    elif args.watson:
        args.strand = "minus"
    if args.queryfile == "-" and args.dbfile == "-":
        print("Either <hmmfile> or <seqdb> may be '-' (stdin), "
              "but not both", file=sys.stderr)
        return 1
    # option incompatibilities (ref: bathsearch.c option table
    # :75-76, :81, :156)
    if args.fs and args.splice:
        print("Failed to parse command line: Option --fs is "
              "incompatible with option --splice", file=sys.stderr)
        return 1
    if getattr(args, "fsonly", False) and args.splice:
        print("Failed to parse command line: Option --fsonly is "
              "incompatible with option --splice", file=sys.stderr)
        return 1
    for opt in ("exontblout", "min_intron", "max_intron"):
        if getattr(args, opt, None) not in (None, False) \
                and not args.splice \
                and f"--{opt}" in (argv or sys.argv[1:]):
            print(f"Failed to parse command line: Option --{opt} "
                  "requires (or has no effect without) option "
                  "--splice", file=sys.stderr)
            return 1
    if args.queryfile == "-":
        from ._io import spool_stdin
        args.queryfile = spool_stdin(".bhmm")
    if args.dbfile == "-":
        from ._io import spool_stdin
        args.dbfile = spool_stdin(".fa")
    import os
    for path, what in ((args.queryfile, "query file"),
                       (args.dbfile, "target sequence database")):
        if not os.path.exists(path):
            print(f"Failed to open {what} {path} for reading",
                  file=sys.stderr)
            return 1
    # multi-host SPMD (ref discipline: bathsearch.c thread merge
    # :887-892 lifted across hosts; see parallel/hosts.py)
    from ..parallel.hosts import (allgather_results,
                                  maybe_init_from_args, psum_counters)
    nprocs, proc_id = maybe_init_from_args(args)

    if proc_id:
        # every rank computes the merged result (it is deterministic);
        # only rank 0 writes it
        devnull = open(os.devnull, "w")
        ofp = tblfp = fstblfp = extblfp = None
        ofp = devnull
        tblfp = devnull if args.tblout else None
        fstblfp = devnull if args.fstblout else None
        extblfp = devnull if args.exontblout else None
    else:
        ofp = open(args.outfile, "w") if args.outfile else sys.stdout
        tblfp = open(args.tblout, "w") if args.tblout else None
        fstblfp = open(args.fstblout, "w") if args.fstblout else None
        extblfp = open(args.exontblout, "w") if args.exontblout \
            else None
    textw = 0 if args.notextw else args.textw

    gcode = GeneticCode.create(args.ct)
    if args.aug_only:
        gcode.set_initiator_only_aug()
    require_init = args.aug_only or args.init_any_codon
    if not require_init:
        gcode.set_initiator_any()

    output_header(ofp, args)

    # Multi-query device drive (Pfam-scale): one pass over the target,
    # device gate batches packed across models (bath_tpu/multiquery.py).
    # Byte-identical to the serial per-query loop; engaged for the jax
    # backend when several HMMs share one query file and no mode that
    # needs the per-query stream (splice post-pass, forked workers,
    # multi-host sharding) is active.  BATH_MULTIQUERY=0 forces the
    # serial loop.
    # jax always; numpy joins when --cpu N asks for workers (the
    # query-sharded mq pool beats the per-query loop's 200 pool
    # setups ~5x at Pfam scale; byte-identical either way)
    if (nprocs <= 1 and not args.splice
            and (args.backend == "jax"
                 or max(0, int(args.cpu or 0)) > 1)
            and os.environ.get("BATH_MULTIQUERY", "1") != "0"):
        hmms = []
        for hmm in load_queries(args.queryfile, args):
            if args.fs or args.fsonly:
                if not (hmm.fsprob and hmm.ct):
                    raise SystemExit(
                        f"HMM file {args.queryfile} not formatted for "
                        "frameshift search; run bathconvert first.")
            else:
                hmm.fs = False
                hmm.fsprob = 0.0
            if hmm.ct and hmm.ct != args.ct:
                raise SystemExit(
                    f"--ct {args.ct} does not match HMM codon table "
                    f"{hmm.ct}")
            if hmm.max_length == -1:
                hmm.set_max_length()
            hmms.append(hmm)
        if len(hmms) > 1:
            from ..multiquery import run_multiquery
            run_multiquery(args, hmms, gcode, require_init, ofp,
                           tblfp, fstblfp)
            from ..tophits import tabular_tail
            cmdline = "bathsearch " + " ".join(
                argv if argv is not None else sys.argv[1:])
            for fp in (tblfp, fstblfp, extblfp):
                if fp:
                    fp.write(tabular_tail("bathsearch", args.queryfile,
                                          args.dbfile, cmdline))
                    fp.close()
            ofp.write("[ok]\n")
            if ofp is not sys.stdout:
                ofp.close()
            return 0
        queries_iter = iter(hmms)
    else:
        queries_iter = load_queries(args.queryfile, args)

    nquery = 0
    for hmm in queries_iter:
        nquery += 1
        t0 = time.time()
        if args.fs or args.fsonly:
            if not (hmm.fsprob and hmm.ct):
                raise SystemExit(
                    f"HMM file {args.queryfile} not formatted for "
                    "frameshift search; run bathconvert first.")
        else:
            hmm.fs = False
            hmm.fsprob = 0.0
        if hmm.ct and hmm.ct != args.ct:
            raise SystemExit(
                f"--ct {args.ct} does not match HMM codon table {hmm.ct}")
        if hmm.max_length == -1:
            hmm.set_max_length()

        bg = Background()
        gm = profile_config(hmm, bg, L=100, mode=C.P7_LOCAL)
        om = oprofile_convert(gm)
        gm_fs5 = profile_config_fs(hmm, bg, gcode, 5, 100, C.P7_LOCAL)
        gm_fs3 = profile_config_fs(hmm, bg, gcode, 3, 100, C.P7_LOCAL)
        om_fs3 = om_fs5 = None
        if args.fs or args.fsonly:
            from ..ops.reference.fwdback_fs import fs_oprofile_convert
            om_fs3 = fs_oprofile_convert(gm_fs3)
            om_fs5 = fs_oprofile_convert(gm_fs5)
        data = score_data_create(om)

        pli = make_pipeline(args)
        pli.nmodels = 1
        pli.nnodes = hmm.M
        pli.W = om.max_length
        if pli.do_biasfilter:
            bg.set_filter(om.M, om.compo)
        th = TopHits()
        hit_windows = []
        id_lengths = {}

        ofp.write("Query:       %s  [M=%d]\n" % (hmm.name, hmm.M))
        if hmm.acc:
            ofp.write("Accession:   %s\n" % hmm.acc)
        if hmm.desc:
            ofp.write("Description: %s\n" % hmm.desc)

        fs_funcs = None
        if pli.fs_pipe:
            from ..pipeline_fs import pli_frameshift
            fs_funcs = pli_frameshift

        cascade = None
        if args.backend == "jax":
            mesh_sharding = None
            if args.mesh and args.mesh > 1:
                # data-parallel device mesh: batches sharded on the
                # leading dim, profiles replicated — GSPMD partitions
                # the gate kernels across chips (SURVEY §2.4 P2)
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                from ..parallel.mesh import make_mesh
                _mesh = make_mesh(args.mesh)
                mesh_sharding = NamedSharding(_mesh, P("dp"))
            from ..device_pipeline import DeviceCascade
            cascade = DeviceCascade(om, om_fs3,
                                    mesh_sharding=mesh_sharding)

        seqidx = 0
        db_started = args.restrictdb_stkey is None
        db_seqs_done = 0

        def window_specs():
            """Window stream + database bookkeeping; yields
            (tid, window, seqid_for_hits, nres_at).  Bookkeeping side
            effects (id_lengths, nseqs, nres) stay on the main
            process.  nres_at is the serial-stream residue count AS
            OF this window (post-increment): the hybrid jax+workers
            path reads windows ahead of processing, so the deferred
            early keep-filter cannot read live pli.nres (ref
            p7_pipeline.c:1230-1249 via _postdomaindef_bath)."""
            nonlocal seqidx, db_started, db_seqs_done
            tid = 0
            # BATH_WINDOW_CONTEXT pins the window overlap (nt) — used
            # to prove byte-identity between the serial per-query loop
            # and the multi-query shared stream, whose overlap is the
            # max over the query set (multiquery.py)
            ctx = int(os.environ.get("BATH_WINDOW_CONTEXT", 0)) \
                or om.max_length * 3
            for window, is_last in read_windows(
                    args.dbfile, context=ctx,
                    block_length=pli.block_length):
                # --restrictdb: search a database slice (ref: :143-145)
                if not db_started:
                    if window.name == args.restrictdb_stkey:
                        db_started = True
                    else:
                        continue
                if args.restrictdb_n > 0 \
                        and db_seqs_done >= args.restrictdb_n:
                    break
                if is_last:
                    db_seqs_done += 1
                if window.n < 15:
                    if is_last:
                        # the last window always ends at the source's
                        # final residue, so this is the true length
                        id_lengths[window.idx] = \
                            window.start + window.n - 1
                        pli.nseqs += 1
                        seqidx += 1
                    continue
                window.L = window.n  # window-local L (ref: serial_loop)
                seqid_for_hits = pli.nseqs
                if pli.strands != C.STRAND_BOTTOMONLY:
                    pli.nres += window.W
                if pli.strands != C.STRAND_TOPONLY:
                    pli.nres += window.W
                yield tid, window, seqid_for_hits, pli.nres
                tid += 1
                if is_last:
                    # true source length for assign_Lengths
                    id_lengths[window.idx] = window.start + window.n - 1
                    pli.nseqs += 1
                    seqidx += 1

        ncpu = max(0, int(args.cpu or 0))
        # --backend jax --cpu N composes (VERDICT r4 item 2; ref
        # thread_loop bathsearch.c:1118-1291): N-1 forked workers run
        # the bit-exact host pipeline per window while this process
        # drives the chunked device cascade over overflow windows;
        # results merge in stream (tid) order, so bytes equal the
        # serial loop regardless of the dynamic split.
        hybrid = (args.backend == "jax" and ncpu > 1 and nprocs <= 1
                  and cascade is not None)
        if args.backend == "jax" and not hybrid:
            ncpu = 0            # the device path is already batched

        results = [] if (nprocs > 1 or hybrid) else None
        ctr0 = {f: getattr(pli, f) for f in _PLI_COUNTERS} \
            if nprocs > 1 else None

        def shard(specs):
            """Window sharding across hosts: every rank walks the
            full stream (global nres/nseqs/length bookkeeping), only
            its own windows are processed."""
            for spec in specs:
                if spec[0] % nprocs == (proc_id if nprocs > 1 else 0):
                    yield spec

        global _WCTX
        if hybrid:
            import multiprocessing as mp
            from collections import deque

            from ..device_pipeline import (ChunkEntry,
                                           flush_downstream,
                                           flush_gates,
                                           staged_fwd_cells)
            _WCTX = dict(pli=pli, om=om, gm=gm, om_fs3=om_fs3,
                         om_fs5=om_fs5, gm_fs5=gm_fs5, data=data,
                         bg=bg, gcode=gcode, minlen=args.minlen,
                         require_init=require_init, fs_funcs=fs_funcs)
            from ..native import set_native_threads
            # N full workers (the reference's thread_loop also keeps
            # its reader thread out of the count, bathsearch.c:183);
            # the cascade main is a bonus consumer that only takes
            # windows the saturated workers cannot — measured: with
            # N-1 workers the main is a half-speed worker (it also
            # submits/collects) and the hybrid lost ~25% to the
            # plain pool on host-decided drives
            nworkers = max(1, ncpu)
            _wthreads = max(1, (os.cpu_count() or 1) // nworkers)
            set_native_threads(_wthreads)   # main's own OpenMP share
            # small chunks: the main must return to the submission
            # loop between windows or the saturated workers starve
            # during a multi-second batched flush (gate batching is
            # per-window in the host path anyway; the device
            # downstream still batches across chunks via <staged>)
            CHUNK_ORFS = int(os.environ.get("BATH_CHUNK_ORFS", 4096))
            DEV_MIN = float(os.environ.get("BATH_DEVICE_MIN_CELLS",
                                           2e8))
            FS_MIN_CELLS = float(os.environ.get("BATH_FS_MIN_CELLS",
                                                5e8))
            chunk: list = []
            staged: list = []
            pending_orfs = 0

            def _down_flush(use_device):
                flush_downstream(staged, cascade, pli, om, gm,
                                 om_fs3, om_fs5, gm_fs5, data, bg,
                                 th, gcode, hit_windows,
                                 use_device=use_device)
                for e in staged:
                    results.append(
                        (e.tid, list(e.hits.unsrt),
                         hit_windows[e.win_start:e.win_end]))
                staged.clear()

            def _maybe_down(final=False):
                cells = staged_fwd_cells(staged, om.M)
                ncand = sum(len(e.cands or ()) for e in staged)
                fs_cells = ncand * 2.0 * om.max_length * om.M
                engage = (cells >= DEV_MIN
                          or (pli.fs_pipe
                              and fs_cells >= FS_MIN_CELLS))
                if final:
                    _down_flush(engage)
                elif engage:
                    _down_flush(True)

            def _take(spec):
                """Main-side window: into the device cascade chunk."""
                nonlocal pending_orfs
                _tid, window, seqid_for_hits, nres_at = spec
                if pli.strands != C.STRAND_BOTTOMONLY:
                    orfs = extract_orfs(
                        gcode, window.dsq, minlen=args.minlen,
                        require_initiator=require_init)
                    chunk.append(ChunkEntry(window, seqid_for_hits,
                                            C.NOCOMPLEMENT, orfs,
                                            tid=_tid,
                                            nres_at=nres_at))
                    pending_orfs += len(orfs)
                if pli.strands != C.STRAND_TOPONLY:
                    rc = window.reverse_complement()
                    orfs = extract_orfs(
                        gcode, rc.dsq, minlen=args.minlen,
                        is_revcomp=True,
                        require_initiator=require_init)
                    chunk.append(ChunkEntry(rc, seqid_for_hits,
                                            C.COMPLEMENT, orfs,
                                            tid=_tid,
                                            nres_at=nres_at))
                    pending_orfs += len(orfs)
                if pending_orfs >= CHUNK_ORFS:
                    staged.extend(flush_gates(chunk, cascade, pli,
                                              om, data, bg,
                                              hit_windows))
                    pending_orfs = 0
                    _maybe_down()

            def _collect(res):
                _tid, hits, hws, deltas = res
                results.append((_tid, hits, hws))
                for f, v in deltas.items():
                    setattr(pli, f, getattr(pli, f) + v)

            spec_iter = shard(window_specs())
            pend: deque = deque()
            MAXQ = int(os.environ.get("BATH_HYBRID_MAXQ",
                                      3 * nworkers))
            n_main = n_pool = 0
            # Main-compute policy (BATH_HYBRID_MAIN=auto|0|1): the
            # cascade main only takes windows when the host has a
            # core to spare (nworkers < cores) — on a fully
            # subscribed host a fifth compute stream is pure
            # contention (measured: -15% vs the plain pool), and the
            # per-stage device-volume thresholds keep main's share
            # host-bound on small drives anyway.  --cpu <cores>
            # therefore matches the pool; --cpu with headroom (or
            # =1 forced) adds the device stream.
            hmain = os.environ.get("BATH_HYBRID_MAIN", "auto")
            take_ok = (nworkers < (os.cpu_count() or 1)
                       if hmain == "auto" else hmain != "0")
            done_stream = False
            final_done = False
            try:
                with mp.get_context("fork").Pool(
                        nworkers, initializer=set_native_threads,
                        initargs=(_wthreads,)) as pool:
                    while True:
                        while pend and pend[0].ready():
                            _collect(pend.popleft().get())
                        if not done_stream:
                            spec = next(spec_iter, None)
                            if spec is None:
                                done_stream = True
                            elif len(pend) < MAXQ:
                                # keep the workers saturated first
                                pend.append(pool.apply_async(
                                    _pool_task, (spec,)))
                                n_pool += 1
                            elif take_ok:
                                # overflow: the device cascade's share
                                _take(spec)
                                n_main += 1
                            else:
                                # host saturated: hold the spec until
                                # a worker slot frees
                                while len(pend) >= MAXQ:
                                    pend[0].wait(0.02)
                                    while pend and pend[0].ready():
                                        _collect(pend.popleft().get())
                                pend.append(pool.apply_async(
                                    _pool_task, (spec,)))
                                n_pool += 1
                            continue
                        if not final_done:
                            if chunk:
                                staged.extend(flush_gates(
                                    chunk, cascade, pli, om, data,
                                    bg, hit_windows))
                            _maybe_down(final=True)
                            final_done = True
                        if not pend:
                            break
                        pend[0].wait(0.05)
            finally:
                _WCTX = None
            if os.environ.get("BATH_DEVICE_STATS"):
                print(f"# hybrid split: {n_pool} windows -> workers, "
                      f"{n_main} -> device cascade main",
                      file=sys.stderr)
        elif ncpu > 1:
            # forked worker pool (ref: thread_loop); imap preserves
            # window order, so output is byte-identical to serial
            import multiprocessing as mp
            _WCTX = dict(pli=pli, om=om, gm=gm, om_fs3=om_fs3,
                         om_fs5=om_fs5, gm_fs5=gm_fs5, data=data,
                         bg=bg, gcode=gcode, minlen=args.minlen,
                         require_init=require_init, fs_funcs=fs_funcs)
            # N workers share the machine: cap each worker's OpenMP
            # team so the native batch kernels don't oversubscribe
            from ..native import set_native_threads
            _wthreads = max(1, (os.cpu_count() or 1) // ncpu)
            try:
                with mp.get_context("fork").Pool(
                        ncpu, initializer=set_native_threads,
                        initargs=(_wthreads,)) as pool:
                    for _tid, hits, hws, deltas in pool.imap(
                            _pool_task, shard(window_specs()),
                            chunksize=1):
                        th.unsrt.extend(hits)
                        hit_windows.extend(hws)
                        if results is not None:
                            results.append((_tid, hits, hws))
                        for f, v in deltas.items():
                            setattr(pli, f, getattr(pli, f) + v)
            finally:
                _WCTX = None
        elif cascade is not None:
            # adaptive chunked device cascade: host gates stream per
            # chunk; downstream (Forward/fs3 gates + domain
            # definition) accumulates staged entries ACROSS chunks
            # and engages the device only when the pending DP volume
            # amortizes dispatch — otherwise the bit-exact host path
            # finishes the work (identical bytes either way by the
            # DEVICE_GATE_BAND contract).  A high-information model
            # that rejects nearly everything at the host filters
            # (the r3 M=409 regression) therefore never pays device
            # init or per-flush tunnel latency.
            from ..device_pipeline import (ChunkEntry, flush_downstream,
                                           flush_gates,
                                           staged_fwd_cells)
            CHUNK_ORFS = int(os.environ.get("BATH_CHUNK_ORFS", 65536))
            # ~0.3s of host f32 work; device dispatch only pays for
            # itself above this
            DEV_MIN = float(os.environ.get("BATH_DEVICE_MIN_CELLS",
                                           2e8))
            # fs mode: the fs3 windows (built downstream) dwarf the
            # fwd volume; engage the device once the PROJECTED fs3
            # DP volume amortizes device init + per-flush latency
            # (a candidate-count trigger engaged the device on
            # hit-sparse drives whose host fs3 work was milliseconds
            # — the r4 e2e regression)
            FS_MIN_CELLS = float(os.environ.get("BATH_FS_MIN_CELLS",
                                                5e8))
            chunk: list = []
            staged: list = []
            pending_orfs = 0

            def _down_flush(use_device):
                flush_downstream(staged, cascade, pli, om, gm,
                                 om_fs3, om_fs5, gm_fs5, data, bg,
                                 th, gcode, hit_windows,
                                 use_device=use_device)
                if results is not None:
                    for e in staged:
                        results.append(
                            (e.tid, list(e.hits.unsrt),
                             hit_windows[e.win_start:e.win_end]))
                staged.clear()

            def _maybe_down(final=False):
                cells = staged_fwd_cells(staged, om.M)
                ncand = sum(len(e.cands or ()) for e in staged)
                # projected fs3 gate volume: each candidate becomes a
                # window of up to 2*W aminos * 3 nt; fs cells follow
                # the multiquery nt/3 convention (multiquery._DEV_MIN)
                fs_cells = ncand * 2.0 * om.max_length * om.M
                engage = (cells >= DEV_MIN
                          or (pli.fs_pipe
                              and fs_cells >= FS_MIN_CELLS))
                if final:
                    _down_flush(engage)
                elif engage:
                    _down_flush(True)

            for _tid, window, seqid_for_hits, _nres_at in \
                    shard(window_specs()):
                if pli.strands != C.STRAND_BOTTOMONLY:
                    orfs = extract_orfs(gcode, window.dsq,
                                        minlen=args.minlen,
                                        require_initiator=require_init)
                    chunk.append(ChunkEntry(window, seqid_for_hits,
                                            C.NOCOMPLEMENT, orfs,
                                            tid=_tid,
                                            nres_at=_nres_at))
                    pending_orfs += len(orfs)
                if pli.strands != C.STRAND_TOPONLY:
                    rc = window.reverse_complement()
                    orfs = extract_orfs(gcode, rc.dsq,
                                        minlen=args.minlen,
                                        is_revcomp=True,
                                        require_initiator=require_init)
                    chunk.append(ChunkEntry(rc, seqid_for_hits,
                                            C.COMPLEMENT, orfs,
                                            tid=_tid,
                                            nres_at=_nres_at))
                    pending_orfs += len(orfs)
                if pending_orfs >= CHUNK_ORFS:
                    staged.extend(flush_gates(chunk, cascade, pli, om,
                                              data, bg, hit_windows))
                    pending_orfs = 0
                    _maybe_down()
            if chunk:
                staged.extend(flush_gates(chunk, cascade, pli, om,
                                          data, bg, hit_windows))
            _maybe_down(final=True)
        else:
            for _tid, window, seqid_for_hits, _nres_at in \
                    shard(window_specs()):
                th_w = th if results is None else TopHits()
                hws_w = hit_windows if results is None else []
                if pli.strands != C.STRAND_BOTTOMONLY:
                    orfs = extract_orfs(gcode, window.dsq,
                                        minlen=args.minlen,
                                        require_initiator=require_init)
                    pipeline_bath(pli, om, gm, om_fs3, om_fs5, gm_fs5,
                                  data, bg, th_w, seqid_for_hits,
                                  window, orfs, gcode, hws_w,
                                  C.NOCOMPLEMENT, fs_funcs)
                if pli.strands != C.STRAND_TOPONLY:
                    rc = window.reverse_complement()
                    orfs = extract_orfs(gcode, rc.dsq,
                                        minlen=args.minlen,
                                        is_revcomp=True,
                                        require_initiator=require_init)
                    pipeline_bath(pli, om, gm, om_fs3, om_fs5, gm_fs5,
                                  data, bg, th_w, seqid_for_hits, rc,
                                  orfs, gcode, hws_w,
                                  C.COMPLEMENT, fs_funcs)
                if results is not None:
                    results.append((_tid, th_w.unsrt, hws_w))

        if nprocs > 1:
            # cross-host merge (ref: p7_tophits_Merge +
            # p7_pipeline_Merge at bathsearch.c:887-892): every rank
            # rebuilds the identical global result in stream order
            combined = allgather_results(results)
            th.unsrt = [h for _, hs, _ in combined for h in hs]
            hit_windows[:] = [w for _, _, hws in combined
                              for w in hws]
            delta = {f: getattr(pli, f) - ctr0[f]
                     for f in _PLI_COUNTERS}
            red = psum_counters(delta)
            for f in _PLI_COUNTERS:
                setattr(pli, f, ctr0[f] + red[f])
        elif hybrid:
            # worker/device results interleave by completion; rebuild
            # the serial stream (tid) order — the same merge
            # discipline as the cross-host path above.  sort is
            # stable, so a tid's entries (forward then revcomp) keep
            # their order.
            results.sort(key=lambda r: r[0])
            th.unsrt = [h for _, hs, _ in results for h in hs]
            hit_windows[:] = [w for _, _, hws in results for w in hws]

        # E-values from global residue count (ref: bathsearch.c:869-884)
        if args.Z is not None:
            res_cnt = int(1000000 * args.Z)
            if pli.strands == C.STRAND_BOTH:
                res_cnt *= 2
        else:
            res_cnt = pli.nres
        th.compute_evalues_bath(res_cnt, om.max_length * 3)

        th.sort_by_seqidx_and_alipos()
        # assign true target lengths (ref: assign_Lengths)
        for h in th.unsrt:
            if h.seqidx in id_lengths:
                h.target_len = id_lengths[h.seqidx]
                if h.dcl and h.dcl[0].ad is not None:
                    h.dcl[0].ad.L = id_lengths[h.seqidx]
        th.remove_duplicates(pli.use_bit_cutoffs)
        th.sort_by_sortkey()
        pli.Z = 1.0
        th.threshold(pli)

        # --splice post-pass (ref: bathsearch.c :925-947)
        if args.splice and th.N:
            from ..splice.pipeline import splice_hits
            from ..splice.splice import SpliceConfig
            gm_tr = profile_config_fs(hmm, bg, gcode, 1, 100,
                                      C.P7_UNILOCAL)
            gm_tr.evparam = hmm.evparam.copy()
            from ..sequence import LazySeqLookup
            from ..alphabet import dna as dna_abc
            seq_lookup = LazySeqLookup(args.dbfile, dna_abc())
            pli.qname = hmm.name
            scfg = SpliceConfig(min_intron=args.min_intron,
                                max_intron=args.max_intron,
                                E=pli.E,
                                T=None if pli.by_E else pli.T,
                                F1=pli.F1, F2=pli.F2, F3=pli.F3,
                                do_null2=pli.do_null2,
                                do_biasfilter=pli.do_biasfilter)
            # seed recovery (ref: bathsearch.c :930-933)
            from ..splice.seeds import (get_seed_hits,
                                        remove_duplicate_windows)
            th.sort_by_seqidx_and_alipos()
            ws = remove_duplicate_windows(hit_windows, th, pli.F3)
            seeds = get_seed_hits(ws, th, gm_fs5, seq_lookup, pli.F3,
                                  args.max_intron)
            splice_hits(th, seeds, om, gm, gm_tr, bg, gcode,
                        seq_lookup, res_cnt, scfg)
            for h in th.unsrt:
                if h.seqidx in id_lengths:
                    h.target_len = id_lengths[h.seqidx]
            th.sort_by_seqidx_and_alipos()
            th.remove_duplicates(pli.use_bit_cutoffs)
            th.sort_by_sortkey()

        pli.n_output = pli.pos_output = 0
        for h in th.hit:
            if h.flags & (IS_REPORTED | IS_INCLUDED):
                pli.n_output += 1
                for d in h.dcl:
                    pli.pos_output += 1 + abs(d.jali - d.iali)

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
        if extblfp:
            extblfp.write(th.tabular_exons_text(
                hmm.name, hmm.acc, pli, nquery == 1,
                node_info=args.nodeinfo))
        elapsed = time.time() - t0
        ofp.write(statistics_text(pli, elapsed))
        ofp.write("//\n")

    from ..tophits import tabular_tail
    cmdline = "bathsearch " + " ".join(argv if argv is not None
                                       else sys.argv[1:])
    if tblfp:
        tblfp.write(tabular_tail("bathsearch", args.queryfile, args.dbfile,
                                 cmdline))
        tblfp.close()
    if fstblfp:
        fstblfp.write(tabular_tail("bathsearch", args.queryfile,
                                   args.dbfile, cmdline))
        fstblfp.close()
    if extblfp:
        extblfp.write(tabular_tail("bathsearch", args.queryfile,
                                   args.dbfile, cmdline))
        extblfp.close()
    ofp.write("[ok]\n")
    if ofp is not sys.stdout:
        ofp.close()
    if nprocs > 1:
        # leave the coordination service cleanly (otherwise rank 0's
        # exit logs a cancelled-watch grpc error on the others)
        import jax
        try:
            jax.distributed.shutdown()
        except Exception:
            pass
    return 0


def main():
    try:
        sys.exit(run())
    except ValueError as e:
        # clean CLI errors, no traceback (ref: p7_Fail on eslEFORMAT,
        # bathsearch.c:642)
        if "unrecognized sequence file format" in str(e):
            print(f"Sequence file is empty or misformatted: {e}",
                  file=sys.stderr)
        else:
            print(f"Error: {e}", file=sys.stderr)
        sys.exit(1)
    except (KeyError, OSError) as e:
        print(f"Error: {e}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
