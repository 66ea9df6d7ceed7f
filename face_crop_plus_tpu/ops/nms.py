"""Batched, fixed-shape greedy NMS and per-image strategy selection.

The reference filters detections with a Python loop doing per-iteration
tensor indexing (forcing a device sync each step,
``src/face_crop_plus/models/retinaface.py:214-304``) followed by another
Python loop for strategy selection (``:306-408``).  Here both run fully on
device with static shapes:

1. ``lax.top_k`` pre-selects the K highest-scoring candidates per image
   (scores below the visibility threshold are masked to -inf).
2. A (K, K) IoU matrix is computed once (the reference's +1 pixel area
   convention is preserved for output parity).
3. Exact greedy suppression runs as a ``lax.fori_loop`` over K steps of
   (N, K) vector updates — identical keep-set to sequential NMS because
   candidates are score-sorted.
4. Strategy reduction ("all"/"best"/"largest") is a masked argmax / ranked
   scatter over the keep mask, producing padded (N, max_faces) outputs +
   validity masks (XLA-static; compaction happens once at the host boundary).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def iou_matrix_plus1(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU with the reference's +1 area convention.

    Args:
        boxes: (..., K, 4) corner-form boxes (x1, y1, x2, y2).

    Returns:
        (..., K, K) IoU matrix.
    """
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)

    ix1 = jnp.maximum(x1[..., :, None], x1[..., None, :])
    iy1 = jnp.maximum(y1[..., :, None], y1[..., None, :])
    ix2 = jnp.minimum(x2[..., :, None], x2[..., None, :])
    iy2 = jnp.minimum(y2[..., :, None], y2[..., None, :])

    iw = jnp.maximum(0.0, ix2 - ix1 + 1.0)
    ih = jnp.maximum(0.0, iy2 - iy1 + 1.0)
    inter = iw * ih
    union = area[..., :, None] + area[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def greedy_nms_mask(
    iou: jnp.ndarray, valid: jnp.ndarray, threshold: float
) -> jnp.ndarray:
    """Exact greedy NMS over score-sorted candidates.

    Args:
        iou: (N, K, K) pairwise IoU of score-descending candidates.
        valid: (N, K) candidate validity (above visibility threshold).
        threshold: Suppression IoU threshold (> threshold suppresses).

    Returns:
        (N, K) boolean keep mask.
    """
    n, k, _ = iou.shape
    col = jnp.arange(k)

    def body(i, keep):
        alive = keep[:, i] & valid[:, i]  # (N,)
        suppress = (iou[:, i, :] > threshold) & (col[None, :] > i)
        return keep & ~(suppress & alive[:, None])

    keep = lax.fori_loop(0, k, body, jnp.ones_like(valid))
    return keep & valid


@partial(
    jax.jit,
    static_argnames=(
        "vis_threshold",
        "nms_threshold",
        "pre_topk",
        "max_faces",
        "strategy",
        "use_pallas",
    ),
)
def select_faces(
    scores: jnp.ndarray,
    boxes: jnp.ndarray,
    landms: jnp.ndarray,
    vis_threshold: float,
    nms_threshold: float = 0.4,
    pre_topk: int = 256,
    max_faces: int = 64,
    strategy: str = "all",
    use_pallas: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Thresholds, NMS-filters and strategy-selects faces for a whole batch.

    Args:
        scores: (N, A) face confidence per anchor.
        boxes: (N, A, 4) decoded corner-form boxes (pixel units).
        landms: (N, A, 10) decoded landmarks (pixel units).
        vis_threshold: Minimum confidence (reference ``vis``).
        nms_threshold: Greedy IoU suppression threshold.
        pre_topk: Static per-image candidate cap before NMS.
        max_faces: Static per-image output cap (only used for "all").
        strategy: "all" | "best" | "largest".
        use_pallas: Run suppression with the VMEM-resident Pallas kernel
            (:mod:`face_crop_plus_tpu.ops.pallas.nms_kernel`; TPU only,
            validated exact on hardware) instead of the XLA fori_loop.

    Returns:
        Tuple of padded landmarks (N, F, 10) float32, validity mask
        (N, F) bool, where F = ``max_faces`` for "all" and 1 otherwise,
        and int32 cap diagnostics (N, 2): per image, the number of
        candidates above the visibility threshold (column 0 — compare
        against ``pre_topk``) and the raw NMS keep count (column 1 —
        compare against ``max_faces``).  The reference applies neither cap
        (retinaface.py:214-304), so a binding cap means potential output
        divergence; callers use the diagnostics to warn or re-dispatch with
        grown caps.  Valid faces are packed to the front in score-descending
        order (matching the reference's NMS-kept ordering).
    """
    s = jnp.where(scores > vis_threshold, scores, -jnp.inf)
    n_above = (scores > vis_threshold).sum(axis=1).astype(jnp.int32)  # (N,)
    k = min(pre_topk, scores.shape[1])  # static clamp for tiny inputs
    top_s, top_i = lax.top_k(s, k)  # (N, K) score-desc
    valid = jnp.isfinite(top_s)

    b = jnp.take_along_axis(boxes, top_i[..., None], axis=1)  # (N, K, 4)
    lm = jnp.take_along_axis(landms, top_i[..., None], axis=1)  # (N, K, 10)

    if use_pallas:
        from .pallas.nms_kernel import greedy_nms_mask_pallas

        keep = greedy_nms_mask_pallas(b, valid, nms_threshold)
    else:
        keep = greedy_nms_mask(iou_matrix_plus1(b), valid, nms_threshold)

    kept_raw = keep.sum(axis=1).astype(jnp.int32)  # (N,) pre-max_faces
    caps = jnp.stack([n_above, kept_raw], axis=1)  # (N, 2)

    if strategy == "best":
        # First kept candidate per image == highest score (argmax finds the
        # first True in a boolean array).
        idx = jnp.argmax(keep, axis=1)  # (N,)
        any_kept = keep.any(axis=1)
        sel = jnp.take_along_axis(lm, idx[:, None, None], axis=1)  # (N, 1, 10)
        return sel, any_kept[:, None], caps

    if strategy == "largest":
        area = (b[..., 2] - b[..., 0] + 1.0) * (b[..., 3] - b[..., 1] + 1.0)
        area = jnp.where(keep, area, -jnp.inf)
        idx = jnp.argmax(area, axis=1)
        any_kept = keep.any(axis=1)
        sel = jnp.take_along_axis(lm, idx[:, None, None], axis=1)
        return sel, any_kept[:, None], caps

    if strategy == "all":
        # Rank kept candidates (score order) and scatter into fixed slots.
        rank = jnp.cumsum(keep, axis=1) - 1  # (N, K)
        slot = jnp.where(keep & (rank < max_faces), rank, max_faces)
        out = jnp.zeros((scores.shape[0], max_faces + 1, 10), landms.dtype)
        out = jax.vmap(lambda o, sl, v: o.at[sl].set(v))(out, slot, lm)
        counts = jnp.minimum(kept_raw, max_faces)  # (N,)
        mask = jnp.arange(max_faces)[None, :] < counts[:, None]
        return out[:, :max_faces], mask, caps

    raise ValueError(f"Unsupported strategy: {strategy}")
