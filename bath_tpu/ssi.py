"""Simple sequence/HMM file indexing (the role of Easel's SSI indexes,
ref: bathfetch.c create_ssi_index :166, p7_splice.c GetSubSequence
:3720 SSI usage).

The reference writes binary Easel .ssi files; that format lives in the
absent Easel submodule, so bath_tpu defines its own JSON index with
the same capabilities: name/accession -> byte offset (+ sequence
lengths for FASTA).  Files are named <path>.bsi.
"""

from __future__ import annotations

import json
import os


def index_hmm_file(path: str) -> str:
    """Index HMM records by NAME (and ACC) -> byte offset of the
    format-tag line.  Returns index path."""
    keys: dict[str, int] = {}
    with open(path, "rb") as fh:
        off = 0
        rec_off = None
        for line in fh:
            txt = line.decode("ascii", "replace")
            if txt.startswith(("BATH", "HMMER")):
                rec_off = off
            elif txt.startswith("NAME") and rec_off is not None:
                nm = txt.split(None, 1)[1].strip()
                if nm in keys:
                    raise ValueError(f"duplicate key {nm}")
                keys[nm] = rec_off
            elif txt.startswith("ACC") and rec_off is not None:
                acc = txt.split(None, 1)[1].strip()
                keys.setdefault(acc, rec_off)
            off += len(line)
    out = path + ".bsi"
    with open(out, "w") as fh:
        json.dump({"type": "hmm", "keys": keys}, fh)
    return out


def index_fasta_file(path: str) -> str:
    """Index FASTA records: name -> (header offset, seq length)."""
    keys: dict[str, list] = {}
    with open(path, "rb") as fh:
        off = 0
        cur = None
        for line in fh:
            if line.startswith(b">"):
                nm = line[1:].split()[0].decode()
                cur = nm
                keys[nm] = [off, 0]
            elif cur is not None:
                keys[cur][1] += len(line.strip())
            off += len(line)
    out = path + ".bsi"
    with open(out, "w") as fh:
        json.dump({"type": "fasta", "keys": keys}, fh)
    return out


def load_index(path: str) -> dict | None:
    ix = path + ".bsi"
    if not os.path.exists(ix):
        return None
    with open(ix) as fh:
        return json.load(fh)


def fetch_hmm_text(path: str, key: str, index: dict | None = None) -> str:
    """Return the raw text of one HMM record by key (builds/loads the
    index as needed)."""
    index = index or load_index(path)
    if index is None:
        index_hmm_file(path)
        index = load_index(path)
    if key not in index["keys"]:
        raise KeyError(f"key {key} not found in {path}")
    with open(path) as fh:
        fh.seek(index["keys"][key])
        out = []
        for line in fh:
            out.append(line)
            if line.strip() == "//":
                break
        return "".join(out)
