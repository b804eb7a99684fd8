"""Test configuration.

JAX tests run on a virtual 8-device CPU mesh so multi-chip sharding logic
is exercised without TPU hardware (the production target).  The env vars
must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

# The axon sitecustomize pre-imports jax and pins the platform to the
# TPU tunnel; the env vars alone are too late.  Force CPU explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURES = "/root/reference/colormipsearch-api/src/test/resources/colormipsearch/api"
MASK_TIF = f"{FIXTURES}/cdsearch/1752016801-LPLC2-RT_18U.tif"
TARGET_TIF = (f"{FIXTURES}/cdsearch/GMR_31G04_AE_01-20190813_66_F3-40x-Brain-"
              "JRC2018_Unisex_20x_HR-2704505419467849826-CH2-07_CDM.tif")


@pytest.fixture(scope="session")
def mask_rgb():
    from colormipsearch_tpu.io.image import read_image
    return read_image(MASK_TIF).as_rgb()


@pytest.fixture(scope="session")
def target_rgb():
    from colormipsearch_tpu.io.image import read_image
    return read_image(TARGET_TIF).as_rgb()


@pytest.fixture(scope="session")
def golden_region(mask_rgb):
    """Excluded label regions used by the reference golden test."""
    h, w = mask_rgb.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w]
    return ((xx >= w - 260) & (yy < 90)) | ((xx < 330) & (yy < 100))
