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


def partition_by_shard(
    shard_ids: np.ndarray,
    local_rows: np.ndarray,
    mesh_size: int,
    chunk: int,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Packs shard-owned row selections into uniform-capacity dispatches.

    The mesh-fused pipeline compacts sparse device rows (kept faces, gated
    images) *within each shard* — faces index intra-shard images, so no
    cross-shard gathers (and no collectives) are ever needed.  XLA still
    requires one static shape per dispatch, so each shard's selection list
    is padded to a shared capacity; capacities above ``chunk`` split into
    several dispatches (bounding the warp/SR working set per program, the
    mesh analog of ``max_warp_chunk``/``enh_batch_size``).

    Args:
        shard_ids: (J,) owning shard of each requested row.
        local_rows: (J,) row index *within its shard's local block* of the
            sharded source array.
        mesh_size: Number of shards S.
        chunk: Per-shard capacity ceiling per dispatch (>= 1).

    Returns:
        List of ``(sel, out_rows)`` pairs, one per dispatch: ``sel`` is the
        (S*C,) int32 local-row selection (padding repeats a real row, or 0
        for shards with nothing to do), and ``out_rows`` is a (J_c,) int64
        array such that request ``j`` served by this dispatch reads its
        result at output row ``out_rows_map[j]``.  Concretely each pair
        also carries which requests it serves: ``out_rows`` is aligned with
        a companion (J_c,) ``req`` array — packed together as a structured
        tuple ``(sel, req, out_rows)``.
    """
    lists: list[list[tuple[int, int]]] = [[] for _ in range(mesh_size)]
    for j, (s, l) in enumerate(zip(shard_ids, local_rows)):
        lists[int(s)].append((int(l), j))
    cmax = max((len(x) for x in lists), default=0)
    out = []
    for p0 in range(0, max(cmax, 1), chunk):
        if p0 >= cmax:
            break
        c = min(chunk, cmax - p0)
        sel = np.zeros((mesh_size, c), np.int32)
        req, rows = [], []
        for s in range(mesh_size):
            seg = lists[s][p0 : p0 + c]
            for p, (l, j) in enumerate(seg):
                sel[s, p] = l
                req.append(j)
                rows.append(s * c + p)
            if seg:
                sel[s, len(seg) : c] = seg[-1][0]
        out.append(
            (
                sel.reshape(-1),
                np.asarray(req, np.int64),
                np.asarray(rows, np.int64),
            )
        )
    return out


def partition_rows_by_shard(
    global_rows: np.ndarray, n_rows: int, mesh_size: int, chunk: int
) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """:func:`partition_by_shard` for rows of a contiguously sharded array.

    ``NamedSharding(mesh, P("data"))`` over ``n_rows`` (divisible by the
    mesh size) gives shard ``s`` the contiguous block
    ``[s*n_rows/S, (s+1)*n_rows/S)``; global row indices therefore split as
    ``(row // block, row % block)``.
    """
    global_rows = np.asarray(global_rows, np.int64)
    block = n_rows // mesh_size
    return partition_by_shard(
        global_rows // block, global_rows % block, mesh_size, chunk
    )
