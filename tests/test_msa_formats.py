"""MSA format readers beyond Stockholm/afa: clustal, a2m, phylip,
psiblast (the esl_msafile_EncodeFormat names bathbuild --informat
accepts, ref /root/reference/src/bathbuild.c:119,381-388).

Strategy: render the 20aa.sto fixture into each format and assert
the digitized alignment matrix and names round-trip identically to
the Stockholm read."""

import numpy as np
import pytest

from bath_tpu.msa import (read_a2m, read_clustal, read_msas,
                          read_phylip, read_psiblast, read_stockholm)

TS = "/root/reference/testsuite"


@pytest.fixture(scope="module")
def ref_msa():
    return read_stockholm(f"{TS}/20aa.sto")[0]


def _rows(msa):
    """Alignment rows as text, '-' for gaps, '.' normalized to '-'."""
    abc = msa.abc
    out = []
    for i in range(msa.nseq):
        row = "".join(abc.sym[x] for x in msa.ax[i])
        out.append(row.replace(".", "-").upper())
    return out


def _check(got, ref):
    assert got.names == ref.names
    assert _rows(got) == _rows(ref)


def test_clustal_roundtrip(tmp_path, ref_msa):
    rows = _rows(ref_msa)
    p = tmp_path / "a.clu"
    with open(p, "w") as fh:
        fh.write("CLUSTAL W (1.83) multiple sequence alignment\n\n")
        for c0 in range(0, ref_msa.alen, 60):
            for nm, row in zip(ref_msa.names, rows):
                fh.write(f"{nm:<16s}{row[c0:c0 + 60]}\n")
            fh.write(" " * 16 + "*" * min(60, ref_msa.alen - c0) + "\n\n")
    _check(read_clustal(str(p))[0], ref_msa)
    # autodetect picks clustal from the header token
    _check(read_msas(str(p))[0], ref_msa)


def test_psiblast_roundtrip(tmp_path, ref_msa):
    rows = _rows(ref_msa)
    p = tmp_path / "a.pb"
    with open(p, "w") as fh:
        for c0 in range(0, ref_msa.alen, 60):
            for nm, row in zip(ref_msa.names, rows):
                fh.write(f"{nm:<16s}{row[c0:c0 + 60]}\n")
            fh.write("\n")
    _check(read_psiblast(str(p))[0], ref_msa)
    # explicit --informat path
    _check(read_msas(str(p), fmt="psiblast")[0], ref_msa)


def test_phylip_interleaved_roundtrip(tmp_path, ref_msa):
    rows = _rows(ref_msa)
    p = tmp_path / "a.phy"
    with open(p, "w") as fh:
        fh.write(f" {ref_msa.nseq} {ref_msa.alen}\n")
        first = True
        for c0 in range(0, ref_msa.alen, 50):
            for nm, row in zip(ref_msa.names, rows):
                lead = f"{nm:<10s}" if first else " " * 10
                fh.write(f"{lead}{row[c0:c0 + 50]}\n")
            first = False
            fh.write("\n")
    _check(read_phylip(str(p))[0], ref_msa)
    # autodetect: 'nseq alen' integer header
    _check(read_msas(str(p))[0], ref_msa)


def test_phylip_sequential_roundtrip(tmp_path, ref_msa):
    rows = _rows(ref_msa)
    p = tmp_path / "a.phys"
    with open(p, "w") as fh:
        fh.write(f"{ref_msa.nseq} {ref_msa.alen}\n")
        for nm, row in zip(ref_msa.names, rows):
            fh.write(f"{nm:<10s}{row}\n")
    _check(read_phylip(str(p))[0], ref_msa)
    _check(read_msas(str(p), fmt="phylips")[0], ref_msa)


def test_a2m_roundtrip_with_inserts(tmp_path):
    """A2M ragged inserts pad with '.' per region and synthesize RF
    ('x' on consensus columns)."""
    p = tmp_path / "a.a2m"
    with open(p, "w") as fh:
        # 3 match cols; seq2 has a 2-residue insert after col 1,
        # seq3 a deletion at col 2 and a leading insert
        fh.write(">s1\nACD\n>s2\nAghCD\n>s3\nmA-D\n")
    msa = read_a2m(str(p))[0]
    assert msa.names == ["s1", "s2", "s3"]
    # digitization normalizes '.'->gap sym and lowercase->upper
    rows = ["".join(msa.abc.sym[x] for x in msa.ax[i])
            for i in range(3)]
    assert rows[0] == "-A--CD"
    assert rows[1] == "-AGHCD"
    assert rows[2] == "MA---D"
    assert msa.rf == ".x..xx"
    # informat path through read_msas
    assert read_msas(str(p), fmt="a2m")[0].names == msa.names


def test_a2m_consensus_mismatch_raises(tmp_path):
    p = tmp_path / "bad.a2m"
    p.write_text(">s1\nACD\n>s2\nAC\n")
    with pytest.raises(ValueError, match="consensus columns"):
        read_a2m(str(p))


def test_bathbuild_informat_clustal(tmp_path, ref_msa):
    """bathbuild --informat clustal builds the same model core as the
    Stockholm build (names/M; calibration is seeded identically)."""
    from bath_tpu.cli import bathbuild
    from bath_tpu.hmmfile import read_hmms
    rows = _rows(ref_msa)
    clu = tmp_path / "20aa.clu"
    with open(clu, "w") as fh:
        fh.write("CLUSTAL multiple sequence alignment\n\n")
        for nm, row in zip(ref_msa.names, rows):
            fh.write(f"{nm:<16s}{row}\n")
    out_c = tmp_path / "c.bhmm"
    out_s = tmp_path / "s.bhmm"
    assert bathbuild.main([str(out_c), str(clu), "--informat",
                           "clustal", "-o", "/dev/null"]) == 0
    assert bathbuild.main([str(out_s), f"{TS}/20aa.sto",
                           "-o", "/dev/null"]) == 0
    hc = next(read_hmms(str(out_c)))
    hs = next(read_hmms(str(out_s)))
    assert hc.M == hs.M
    np.testing.assert_allclose(hc.mat, hs.mat, rtol=0, atol=1e-4)
    np.testing.assert_allclose(hc.t, hs.t, rtol=0, atol=1e-4)


def test_bathbuild_informat_unknown(tmp_path):
    from bath_tpu.cli import bathbuild
    with pytest.raises((SystemExit, ValueError)):
        rc = bathbuild.main([str(tmp_path / "x.bhmm"),
                             f"{TS}/20aa.sto", "--informat", "nexus",
                             "-o", "/dev/null"])
        if rc != 0:
            raise SystemExit(rc)
