"""Batched JAX device kernels for the filter cascade.

BATH_JAX_PLATFORM overrides the jax platform for every jaxk consumer
(e.g. "cpu" for hermetic tests).  The axon TPU plugin ignores the
JAX_PLATFORMS environment variable, so the override must go through
jax.config.update after import — importing this package (which every
kernel module's `from . import` triggers first) is the one place that
runs before any backend initializes.
"""
import os

_plat = os.environ.get("BATH_JAX_PLATFORM")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)
