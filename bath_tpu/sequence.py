"""Digital sequences and FASTA I/O with windowed reading.

Re-provides the Easel sequence-layer functionality bathsearch depends
on: FASTA parsing, digital sequences, reverse complement, and the
overlapping window stream of esl_sqio_ReadWindow (ref:
bathsearch.c:1060-1108 serial_loop; context C = max_length*3 carried
between windows, eslEOD at the end of each sequence).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import numpy as np

from .alphabet import Alphabet, dna, revcomp


@dataclass
class Sequence:
    """A (window of a) digital sequence.

    Attributes mirror the ESL_SQ fields the pipeline uses:
      name/acc/desc  - annotation
      dsq            - digital residues (numpy int32, 0-based, no sentinels)
      start, end     - 1-based coords of this window in the source sequence;
                       start > end after reverse complementation
      L              - source sequence length if known, else -1
      W              - number of *new* (non-context) residues in this window
      C              - number of context (overlap) residues carried over
      idx            - index of the source sequence in the database
    """
    name: str
    dsq: np.ndarray
    acc: str = ""
    desc: str = ""
    start: int = 1
    end: int = 0
    L: int = -1
    W: int = 0
    C: int = 0
    idx: int = -1
    abc: Alphabet | None = None

    def __post_init__(self):
        if self.end == 0:
            self.end = self.start + len(self.dsq) - 1
        if self.W == 0:
            self.W = len(self.dsq)

    @property
    def n(self) -> int:
        return len(self.dsq)

    def reverse_complement(self) -> "Sequence":
        """Return the reverse complement window; start/end swap so that
        start > end, matching esl_sq_ReverseComplement."""
        return Sequence(name=self.name, dsq=revcomp(self.dsq), acc=self.acc,
                        desc=self.desc, start=self.end, end=self.start,
                        L=self.L, W=self.W, C=self.C, idx=self.idx,
                        abc=self.abc)


def parse_fasta(path: str, abc: Alphabet) -> Iterator[tuple[str, str, str]]:
    """Yield (name, desc, seqtext) records from a FASTA file."""
    name = None
    desc = ""
    chunks: list[str] = []
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if name is not None:
                    yield name, desc, "".join(chunks)
                hdr = line[1:].strip()
                parts = hdr.split(None, 1)
                name = parts[0] if parts else ""
                desc = parts[1] if len(parts) > 1 else ""
                chunks = []
            elif line and name is not None:
                chunks.append(line.strip())
    if name is not None:
        yield name, desc, "".join(chunks)


def read_fasta(path: str, abc: Alphabet) -> list[Sequence]:
    out = []
    for i, (name, desc, text) in enumerate(parse_fasta(path, abc)):
        dsq = abc.digitize(text)
        out.append(Sequence(name=name, desc=desc, dsq=dsq, L=len(dsq),
                            idx=i, abc=abc))
    return out


def read_windows(path: str, *, context: int,
                 block_length: int) -> Iterator[tuple[Sequence, bool]]:
    """Stream (window, is_last_window_of_seq) pairs over a DNA FASTA file,
    replicating esl_sqio_ReadWindow semantics (ref: bathsearch.c:1060,
    1099): the first window of each sequence has no context; subsequent
    windows carry the trailing <context> residues of the previous
    window; W counts only the new residues."""
    abc = dna()
    for idx, (name, desc, text) in enumerate(parse_fasta(path, abc)):
        full = abc.digitize(text)
        L = len(full)
        pos = 0              # residues consumed so far
        first = True
        while pos < L:
            if first:
                c = 0
                s = 0
            else:
                c = min(context, pos)
                s = pos - c
            e = min(L, pos + block_length)
            w = Sequence(name=name, desc=desc, dsq=full[s:e].copy(),
                         start=s + 1, end=e, L=L, W=e - pos, C=c,
                         idx=idx, abc=abc)
            pos = e
            first = False
            yield w, pos >= L
