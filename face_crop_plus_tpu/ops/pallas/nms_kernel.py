"""Pallas TPU kernel: exact greedy NMS over score-sorted candidates.

The XLA implementation (:func:`face_crop_plus_tpu.ops.nms.greedy_nms_mask`)
runs a ``fori_loop`` of (N, K) vector updates against an HBM-resident
(N, K, K) IoU matrix.  This kernel instead keeps everything for one image —
coordinates, the full (K, K) IoU matrix (256 KB at K=256) and the keep mask
— resident in VMEM, so the sequential suppression loop runs at on-chip
latency and the IoU matrix never touches HBM.

Layout notes (TPU tiling): candidate coordinates are passed as (N, 4, K) so
the K axis lands on the 128-wide lane dimension; masks are float32 vectors.

Grid: one program per image.  The kernel is exact — identical keep set to
sequential greedy NMS because candidates arrive score-descending.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, keep_ref, iou_ref, *, threshold: float):
    """One image: boxes (1, 4, K) f32, valid (1, 1, K) → keep (1, 1, K)."""
    k = boxes_ref.shape[2]

    x1 = boxes_ref[0, 0, :]
    y1 = boxes_ref[0, 1, :]
    x2 = boxes_ref[0, 2, :]
    y2 = boxes_ref[0, 3, :]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)  # (K,)

    # Full pairwise IoU in VMEM (the reference's +1 pixel convention).
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    iw = jnp.maximum(0.0, ix2 - ix1 + 1.0)
    ih = jnp.maximum(0.0, iy2 - iy1 + 1.0)
    inter = iw * ih
    union = jnp.maximum(area[:, None] + area[None, :] - inter, 1e-12)
    iou_ref[:, :] = inter / union

    keep_ref[0, 0, :] = valid_ref[0, 0, :]
    col = lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, carry):
        keep = keep_ref[0, 0, :][None, :]  # (1, K)
        # Scalar "is candidate i still alive" via mask-reduce (avoids
        # dynamic lane indexing, which Mosaic does not support).
        alive = jnp.sum(jnp.where(col == i, keep, 0.0))
        row = iou_ref[pl.ds(i, 1), :]  # (1, K) dynamic sublane slice
        suppress = (row > threshold) & (col > i) & (alive > 0.0)
        keep_ref[0, 0, :] = jnp.where(suppress, 0.0, keep)[0, :]
        return carry

    lax.fori_loop(0, k, body, 0)


@partial(jax.jit, static_argnames=("threshold", "interpret"))
def greedy_nms_mask_pallas(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    threshold: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact greedy NMS keep mask via the Pallas kernel.

    Args:
        boxes: (N, K, 4) corner-form boxes of score-descending candidates.
        valid: (N, K) bool candidate validity.
        threshold: Suppression IoU threshold (> threshold suppresses).
        interpret: Run in interpreter mode (CPU testing).

    Returns:
        (N, K) bool keep mask, identical to sequential greedy NMS.
    """
    n, k, _ = boxes.shape
    boxes_t = jnp.swapaxes(boxes.astype(jnp.float32), 1, 2)  # (N, 4, K)
    valid_f = valid.astype(jnp.float32)[:, None, :]  # (N, 1, K)

    out = pl.pallas_call(
        partial(_nms_kernel, threshold=threshold),
        out_shape=jax.ShapeDtypeStruct((n, 1, k), jnp.float32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.float32)],
        interpret=interpret,
    )(boxes_t, valid_f)
    return out[:, 0, :] > 0.5
