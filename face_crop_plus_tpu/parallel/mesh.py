"""Device-mesh helpers: data-parallel scaling of the image pipeline.

The workload is embarrassingly parallel over images (the reference's only
parallelism is a host thread pool over file batches,
``src/face_crop_plus/cropper.py:900-909``), so its TPU-native scaling story
is: shard the image/face batch over a 1-D ``("data",)`` mesh with
``NamedSharding``, replicate the (small) model parameters, and let pjit/XLA
partition every jitted program — no hand-written collectives are required,
and none ride DCN.  Multi-host deployments additionally shard the *file
list* per process (each host feeds its own chips), which composes with this
module unchanged.

Batch sizes must be divisible by the mesh size; :func:`pad_to_multiple`
handles the boundary (validity masks already flow through the pipeline).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """Builds a 1-D data-parallel mesh over the available devices.

    Raises ValueError on impossible requests instead of silently truncating:
    a smaller-than-asked mesh changes padding multiples and halves
    throughput with no visible signal.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices <= 0:
                raise ValueError(f"n_devices must be positive, got {n_devices}")
            if n_devices > len(devices):
                raise ValueError(
                    f"Requested a {n_devices}-device mesh but only "
                    f"{len(devices)} devices are available."
                )
            devices = devices[:n_devices]
    if len(devices) == 0:
        raise ValueError("Cannot build a mesh over zero devices.")
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batch-leading arrays: split dim 0 across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for parameters/constants: replicated on every device."""
    return NamedSharding(mesh, P())


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Replicates a parameter pytree across the mesh."""
    return jax.device_put(params, replicated(mesh))


def shard_batch(x, mesh: Mesh):
    """Places a batch on the mesh, sharded along its leading axis."""
    return jax.device_put(x, batch_sharding(mesh))


def pad_to_multiple(batch: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Pads dim 0 to a multiple (repeating the last row); returns valid len."""
    valid = batch.shape[0]
    rem = (-valid) % multiple
    if rem == 0:
        return batch, valid
    reps = np.repeat(batch[-1:], rem, axis=0)
    return np.concatenate([batch, reps], axis=0), valid
