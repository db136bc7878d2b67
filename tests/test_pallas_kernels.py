"""Pallas TPU kernel vs jnp reference parity (interpreter mode so the
test runs on CPU; the same kernel compiles via Mosaic on TPU —
exercised by bench.py --pallas)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from bath_tpu.bg import Background
from bath_tpu.gencode import GeneticCode
from bath_tpu.hmmfile import read_hmm
from bath_tpu.ops.jaxk import kernels as jk
from bath_tpu.ops.pallas.fs3 import (codon_indices_fs3, fs3_params_pallas,
                                     fs3_score_pallas)
from bath_tpu.ops.reference.fwdback_fs import fs_oprofile_convert
from bath_tpu.profile import profile_config_fs

TUT = "/root/reference/tutorial"


def test_fs3_pallas_vs_jnp_interpret():
    hmm = read_hmm(f"{TUT}/AMP_N.bhmm")
    bg = Background()
    gcode = GeneticCode.create(1)
    gcode.set_initiator_any()
    om3 = fs_oprofile_convert(profile_config_fs(hmm, bg, gcode, 3, 100))
    rfv, tr, Mp = fs3_params_pallas(om3)
    rng = np.random.default_rng(0)
    B, L = 8, 120
    dsq = rng.integers(0, 4, (B, L)).astype(np.int32)
    lens_np = np.full(B, L, np.int32)
    lens_np[3] = 96
    ci = tuple(jnp.asarray(c) for c in codon_indices_fs3(dsq))
    lens = jnp.asarray(lens_np)
    pmove = jnp.asarray((3.0 / (lens_np // 3 + 3.0)).astype(np.float32))
    out = fs3_score_pallas(ci, lens, pmove, rfv, tr, Mp, nj=1.0,
                           interpret=True, btile=8, lblk=24)
    ref = jk.fs3_score_batch(jnp.asarray(dsq), lens,
                             jk.fs3_params(om3), nj=1.0)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 0.01
