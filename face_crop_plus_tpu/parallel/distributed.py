"""Multi-host ergonomics: process bootstrap + file-list sharding helpers.

The workload is embarrassingly parallel over files, so multi-host scaling is
pure SPMD bookkeeping: every host runs the same pipeline over its own strided
shard of the directory listing (outputs are distinct files — no collectives,
nothing rides DCN).  This module provides the two pieces users need:

* :func:`init_distributed` — thin wrapper over
  ``jax.distributed.initialize`` for multi-process runs (TPU pods usually
  auto-discover; explicit args serve CPU/GPU clusters and tests).
* :func:`host_shard` — the (shard_index, num_shards) pair for
  ``Cropper.process_dir``, derived from the JAX process topology.

Typical multi-host driver::

    from face_crop_plus_tpu.parallel import host_shard, init_distributed

    init_distributed()  # no-op on single process / auto-configured pods
    shard, num = host_shard()
    Cropper(...).process_dir(in_dir, out_dir,
                             shard_index=shard, num_shards=num)

The CLI exposes the same via ``--shard-index/--num-shards`` (or
``--shard-index auto``, which calls :func:`host_shard`).
"""

from __future__ import annotations


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initializes the JAX distributed runtime for multi-process runs.

    On TPU pods the arguments are auto-discovered and may all be None.  The
    call is idempotent: if the runtime is already initialized (or this is a
    plain single-process run with no coordinator configured), it returns
    False instead of raising, so driver scripts can call it unconditionally.

    Returns:
        True when this call initialized the runtime, False when it was
        already initialized or initialization was not applicable.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except RuntimeError:
        # Already initialized (re-entrant call) — nothing to do.
        return False
    except ValueError:
        # No coordinator/topology configured: single-process run.
        return False


def host_shard() -> tuple[int, int]:
    """Returns this host's (shard_index, num_shards) for file sharding.

    ``jax.process_index()/process_count()`` — (0, 1) on single-process runs,
    so the result can be passed to ``process_dir`` unconditionally.
    """
    import jax

    return jax.process_index(), jax.process_count()
