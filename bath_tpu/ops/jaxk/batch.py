"""Fixed-shape batching of ragged ORFs/windows for TPU kernels.

The reference streams ragged ORFs one at a time through pthread
workers (ref: bathsearch.c thread_loop).  The TPU-native design packs
them into (B, Lmax) buckets with per-item lengths; all gate logic
becomes masked batched selects (SURVEY.md section 7, stage 5).
"""

from __future__ import annotations

import numpy as np


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_sequences(dsqs: list[np.ndarray], pad_value: int,
                   length_multiple: int = 128,
                   batch_multiple: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Pack ragged digital sequences into a padded (B, Lmax) int32
    array plus lengths.  Pad residue must be one whose emission odds
    are 0 in every profile row (the missing-data residue Kp-1)."""
    B = len(dsqs)
    if B == 0:
        return (np.zeros((0, length_multiple), np.int32),
                np.zeros(0, np.int32))
    Lmax = round_up(max(len(d) for d in dsqs), length_multiple)
    Bp = round_up(B, batch_multiple)
    out = np.full((Bp, Lmax), pad_value, dtype=np.int32)
    lens = np.zeros(Bp, dtype=np.int32)
    for i, d in enumerate(dsqs):
        out[i, :len(d)] = d
        lens[i] = len(d)
    return out, lens


def length_buckets(dsqs: list[np.ndarray], max_bucket_cells: int = 1 << 22):
    """Group sequence indices into buckets of similar length so padding
    waste stays bounded.  Returns list of index lists."""
    order = sorted(range(len(dsqs)), key=lambda i: len(dsqs[i]))
    buckets = []
    cur = []
    cur_max = 0
    for i in order:
        L = len(dsqs[i])
        new_max = max(cur_max, L)
        if cur and new_max * (len(cur) + 1) > max_bucket_cells:
            buckets.append(cur)
            cur, cur_max = [], 0
            new_max = L
        cur.append(i)
        cur_max = new_max
    if cur:
        buckets.append(cur)
    return buckets
