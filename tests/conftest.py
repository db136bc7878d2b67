import os

# Run tests on CPU with a virtual 8-device mesh so sharding tests work
# without TPU hardware (bench runs use the real chip instead).
# never let tests or their subprocesses touch the TPU tunnel: the
# sandbox pins JAX_PLATFORMS to the axon plugin, whose registration
# can stall for minutes when the tunnel is busy, and every test is
# CPU-only by design (bench runs use the real chip)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

try:
    # the env may pin JAX_PLATFORMS to the TPU plugin; the config
    # update (pre-backend-init) is what actually wins
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# pin the DEVICE MSV/Vit engines in the jax-backend e2e tests: the
# production default is the hybrid cascade (host-native u8/int16
# filters, device f32 stages — see device_pipeline.flush_chunk),
# which would leave the device MSV/stream/Vit/vitcap kernels
# unexercised end-to-end; the hybrid path has its own explicit test
# (test_device_pipeline.py)
os.environ.setdefault("BATH_MSV_DEVICE", "1")
os.environ.setdefault("BATH_VIT_DEVICE", "1")

import pytest  # noqa: E402

REF = "/root/reference"


@pytest.fixture(scope="session")
def ref_tutorial():
    return os.path.join(REF, "tutorial")


@pytest.fixture(scope="session")
def ref_testsuite():
    return os.path.join(REF, "testsuite")
