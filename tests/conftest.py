"""Test bootstrap: run everything on a virtual 8-device CPU mesh.

Tests must be deterministic and runnable without TPU hardware; multi-chip
sharding paths are exercised via XLA's host-platform device trick
(SURVEY.md §4 "multi-chip tests"). Env must be set before jax imports.
"""

import os

# NOTE: in this environment the JAX_PLATFORMS / XLA_FLAGS env vars are ignored
# (a site hook preselects the TPU plugin); only jax.config switches work.
os.environ["JAX_PLATFORMS"] = "cpu"  # harmless; real switch is below

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)  # virtual 8-device mesh for sharding tests

import numpy as np
import pytest

# Persistent compilation cache: repeat test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/tti_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# Reduced "default" matmul/conv precision breaks parity comparisons (observed
# ~6e-3 abs error on one fp32 conv at default); pin true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def ref_intrinsics():
    """The deployment's real intrinsics (values from camera_calibration.json in the
    reference deployment: fx~937.1 fy~884.0 cx~636.1 cy~422.4, 5 dist coeffs)."""
    K = np.array(
        [
            [937.1384518987244, 0.0, 636.148901113533],
            [0.0, 884.022038878419, 422.3901781816556],
            [0.0, 0.0, 1.0],
        ]
    )
    dist = np.array(
        [0.07994929130530135, 0.04758675999900327, -0.04013555042332606,
         -0.005228657034776396, -0.1334157094005971]
    )
    return K, dist


@pytest.fixture(scope="session")
def ref_extrinsics():
    """Real extrinsics from the deployment (extrinsics.json format)."""
    rvec = np.array([-0.8631369244225452, -0.3919482615538663, -1.3591256137314185])
    tvec = np.array([0.005016396186926285, 0.03590342712705542, 0.09382141278570659])
    return rvec, tvec
