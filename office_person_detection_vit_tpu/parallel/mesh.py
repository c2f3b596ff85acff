"""Device-mesh construction (SURVEY.md §2.9 / §5.8).

The reference has no distributed story (single torch device); the TPU-native
framework scales through a ``jax.sharding.Mesh`` with two axes:

* ``data`` — the frame/batch axis (the natural analog of the reference's
  frame loop; DP shards the batch across chips over ICI).
* ``model`` — tensor parallelism over attention heads / FFN hidden dim for
  the DETR transformer (rarely needed at this model size, but the axis is
  designed in so cost-free when sized 1).

``make_mesh`` degrades gracefully to a 1x1 mesh on a single chip
(BASELINE.json: single-chip v5e default).
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices: list | None = None,
) -> Mesh:
    """(data, model) mesh over the first ``n_devices`` devices.

    ``model_parallel`` must divide ``n_devices``; the data axis gets the
    rest. Defaults to all visible devices, pure DP.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if n_devices % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} must divide n_devices={n_devices}"
        )
    data_parallel = n_devices // model_parallel
    grid = np.asarray(devices).reshape(data_parallel, model_parallel)
    mesh = Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    logger.info(
        "mesh: %d devices as (%s=%d, %s=%d)",
        n_devices, DATA_AXIS, data_parallel, MODEL_AXIS, model_parallel,
    )
    return mesh


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up (SURVEY.md §5.8: DCN process groups for
    multi-host). On single-host TPU or CPU this is a no-op; on a multi-host
    pod slice JAX auto-discovers the coordinator from the TPU environment
    when no arguments are given."""
    import jax.distributed

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "jax.distributed initialized: process %d/%d",
            jax.process_index(), jax.process_count(),
        )
    except (RuntimeError, ValueError) as e:
        # Already initialized, or single-process environment.
        logger.debug("jax.distributed.initialize skipped: %s", e)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (frame batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
