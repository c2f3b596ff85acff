"""Shared test fixtures.

Tests run on CPU with a virtual 8-device mesh so that every sharding path is
exercised without TPU hardware (mirrors the reference's hardware-free test
strategy, reference tests/conftest.py:19-52, but with a *real* backend instead
of mocks).
"""

import os

# Must be set before the first jax backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu"
# after import, overriding the env var — override it back. Tests always run
# on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def sample_frame():
    """720p black frame (reference conftest: zeros 720x1280x3)."""
    return np.zeros((720, 1280, 3), dtype=np.uint8)


@pytest.fixture
def sample_detection():
    from office_person_detection_vit_tpu.core.dto import Detection

    return Detection(
        bbox=(900.0, 850.0, 60.0, 140.0),
        confidence=0.92,
        center=(930.0, 920.0),
        foot_point=(930.0, 990.0),
    )


@pytest.fixture
def zones_config():
    """The reference config.yaml zone polygons (config.yaml:225-238)."""
    return [
        {"id": "zone_1", "name": "zone 1", "polygon": [[859, 912], [1095, 912], [1095, 1350], [859, 1350]], "priority": 1},
        {"id": "zone_2", "name": "zone 2", "polygon": [[1095, 912], [1331, 912], [1331, 1350], [1095, 1350]], "priority": 2},
        {"id": "zone_3", "name": "zone 3", "polygon": [[1331, 912], [1567, 912], [1567, 1350], [1331, 1350]], "priority": 3},
    ]


@pytest.fixture
def homography_matrix():
    """The reference's calibrated camera->floormap homography (config.yaml:114-118)."""
    return np.array(
        [
            [-0.8795888447, -2.8974379541, 417.8510123786],
            [-1.5459702925, -3.4570021203, 1054.0107447082],
            [-0.0011928509, -0.0035480452, 1.0000000000],
        ],
        dtype=np.float64,
    )
