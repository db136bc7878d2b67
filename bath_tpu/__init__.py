"""bath_tpu: a TPU-native framework for frameshift-aware translated
profile-HMM homology search (the capabilities of TravisWheelerLab/BATH,
re-designed for JAX/XLA/Pallas on TPU).
"""

__version__ = "0.1.0"

# numpy madvise(MADV_HUGEPAGE)s every >=4MB allocation; on VMs with
# lazily-backed (userfaultfd/overlay) guest memory each 2MB huge-page
# fault takes ~100ms, making a 250MB np.full cost ~10s instead of
# ~0.2s (60x).  Large DP matrices (frameshift Forward/Backward fills,
# spliced Viterbi) hit this constantly, so turn it off up front.
try:  # private API; absent/renamed numpy versions just skip it
    from numpy._core.multiarray import _set_madvise_hugepage

    _set_madvise_hugepage(False)
except (ImportError, AttributeError):  # pragma: no cover
    pass
