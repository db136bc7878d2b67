"""bath_tpu: a TPU-native framework for frameshift-aware translated
profile-HMM homology search (the capabilities of TravisWheelerLab/BATH,
re-designed for JAX/XLA/Pallas on TPU).
"""

__version__ = "0.1.0"
