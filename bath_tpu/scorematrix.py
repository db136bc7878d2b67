"""Substitution score matrices and their probabilistic inversion
(ref: p7_builder.c p7_builder_SetScoreSystem :286; easel
esl_scorematrix ProbifyGivenBG / JointToConditionalOnQuery semantics).

Used by the single-sequence builder: BLOSUM62 scores are
back-calculated into conditional substitution probabilities
P(b | a) given background frequencies.  BLOSUM62 is public data
(Henikoff & Henikoff 1992).
"""

from __future__ import annotations

import numpy as np

# BLOSUM62, rows/cols in Easel amino order ACDEFGHIKLMNPQRSTVWY
_BLOSUM62 = """
 4  0 -2 -1 -2  0 -2 -1 -1 -1 -1 -2 -1 -1 -1  1  0  0 -3 -2
 0  9 -3 -4 -2 -3 -3 -1 -3 -1 -1 -3 -3 -3 -3 -1 -1 -1 -2 -2
-2 -3  6  2 -3 -1 -1 -3 -1 -4 -3  1 -1  0 -2  0 -1 -3 -4 -3
-1 -4  2  5 -3 -2  0 -3  1 -3 -2  0 -1  2  0  0 -1 -2 -3 -2
-2 -2 -3 -3  6 -3 -1  0 -3  0  0 -3 -4 -3 -3 -2 -2 -1  1  3
 0 -3 -1 -2 -3  6 -2 -4 -2 -4 -3  0 -2 -2 -2  0 -2 -3 -2 -3
-2 -3 -1  0 -1 -2  8 -3 -1 -3 -2  1 -2  0  0 -1 -2 -3 -2  2
-1 -1 -3 -3  0 -4 -3  4 -3  2  1 -3 -3 -3 -3 -2 -1  3 -3 -1
-1 -3 -1  1 -3 -2 -1 -3  5 -2 -1  0 -1  1  2  0 -1 -2 -3 -2
-1 -1 -4 -3  0 -4 -3  2 -2  4  2 -3 -3 -2 -2 -2 -1  1 -2 -1
-1 -1 -3 -2  0 -3 -2  1 -1  2  5 -2 -2  0 -1 -1 -1  1 -1 -1
-2 -3  1  0 -3  0  1 -3  0 -3 -2  6 -2  0  0  1  0 -3 -4 -2
-1 -3 -1 -1 -4 -2 -2 -3 -1 -3 -2 -2  7 -1 -2 -1 -1 -2 -4 -3
-1 -3  0  2 -3 -2  0 -3  1 -2  0  0 -1  5  1  0 -1 -2 -2 -1
-1 -3 -2  0 -3 -2  0 -3  2 -2 -1  0 -2  1  5 -1 -1 -3 -3 -2
 1 -1  0  0 -2  0 -1 -2  0 -2 -1  1 -1  0 -1  4  1 -2 -3 -2
 0 -1 -1 -1 -2 -2 -2 -1 -1 -1 -1  0 -1 -1 -1  1  5  0 -2 -2
 0 -1 -3 -2 -1 -3 -3  3 -2  1  1 -3 -2 -2 -3 -2  0  4 -3 -1
-3 -2 -4 -3  1 -2 -2 -3 -3 -2 -1 -4 -4 -2 -3 -3 -2 -3 11  2
-2 -2 -3 -2  3 -3  2 -1 -2 -1 -1 -2 -3 -1 -2 -2 -2 -1  2  7
"""


def blosum62() -> np.ndarray:
    """[20, 20] int scores in Easel amino order."""
    rows = [r.split() for r in _BLOSUM62.strip().split("\n")]
    return np.array(rows, dtype=np.float64)


def probify_given_bg(S: np.ndarray, f: np.ndarray
                     ) -> tuple[float, np.ndarray]:
    """Solve sum_ab f_a f_b exp(lambda s_ab) = 1 for lambda > 0, and
    return (lambda, joint q_ab) (ref: esl_scorematrix_ProbifyGivenBG
    semantics)."""
    f = np.asarray(f, dtype=np.float64)
    ff = np.outer(f, f)

    def g(lam):
        return (ff * np.exp(lam * S)).sum() - 1.0

    lo, hi = 1e-6, 1.0
    while g(hi) < 0:
        hi *= 2.0
        if hi > 100:
            raise ValueError("no lambda solution for score matrix")
    for _ in range(100):
        mid = 0.5 * (lo + hi)
        if g(mid) > 0:
            hi = mid
        else:
            lo = mid
    lam = 0.5 * (lo + hi)
    q = ff * np.exp(lam * S)
    return lam, q / q.sum()


def blosum62_conditionals(f: np.ndarray) -> np.ndarray:
    """P(b | a) matrix [20, 20] from BLOSUM62 given background <f>
    (ref: esl_scorematrix_JointToConditionalOnQuery)."""
    _, q = probify_given_bg(blosum62(), f)   # lambda absorbs the
    return q / q.sum(axis=1, keepdims=True)  # half-bit score units
