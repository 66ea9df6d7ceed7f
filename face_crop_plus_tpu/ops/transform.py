"""Batched closed-form alignment-transform estimation (device-side).

The reference estimates one transform per face on the host with
``cv2.estimateAffinePartial2D`` / ``cv2.estimateAffine2D`` inside a Python
loop (``src/face_crop_plus/cropper.py:514-527``, with
``ransacReprojThreshold=np.inf`` these degenerate to plain least squares).
On TPU we instead solve the least-squares problems in closed form for the
whole face batch at once — 5-point fits need no RANSAC, the similarity fit
has an analytic solution, and the full-affine fit is a tiny 3x3 solve.  Both
are pure jnp, jit- and vmap-friendly, and run for thousands of faces in one
fused kernel.

Conventions: transforms are 2x3 matrices ``M = [A | t]`` mapping source
pixel coordinates to destination coordinates, identical to OpenCV.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def estimate_similarity(src: jnp.ndarray, dst: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares 4-DOF similarity transform (rotation+scale+translation).

    Solves ``min_{a,b,t} sum_i || R p_i + t - q_i ||^2`` with
    ``R = [[a, -b], [b, a]]`` — the same objective OpenCV's
    ``estimateAffinePartial2D`` minimizes when RANSAC is disabled.

    Args:
        src: Source points of shape (..., L, 2).
        dst: Destination points of shape (..., L, 2) or (L, 2) (broadcast).

    Returns:
        Tuple of the transform batch of shape (..., 2, 3) and a validity
        mask of shape (...,) that is False where the fit is degenerate
        (all source points coincide).
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.broadcast_to(jnp.asarray(dst, jnp.float32), src.shape)

    src_mean = src.mean(axis=-2)
    dst_mean = dst.mean(axis=-2)
    s = src - src_mean[..., None, :]
    d = dst - dst_mean[..., None, :]

    denom = (s * s).sum(axis=(-1, -2))
    valid = denom > 1e-12
    safe = jnp.where(valid, denom, 1.0)

    a = (s * d).sum(axis=(-1, -2)) / safe
    b = (s[..., 0] * d[..., 1] - s[..., 1] * d[..., 0]).sum(axis=-1) / safe

    tx = dst_mean[..., 0] - (a * src_mean[..., 0] - b * src_mean[..., 1])
    ty = dst_mean[..., 1] - (b * src_mean[..., 0] + a * src_mean[..., 1])

    row0 = jnp.stack([a, -b, tx], axis=-1)
    row1 = jnp.stack([b, a, ty], axis=-1)
    # det(R) = a² + b²: a vanishing rotation-scale (possible with adversarial
    # noise even when the source spread is fine) is as unusable as coincident
    # points — the warp would need to invert a singular transform.
    valid = valid & (a * a + b * b > 1e-12)
    return jnp.stack([row0, row1], axis=-2), valid


@jax.jit
def estimate_affine(src: jnp.ndarray, dst: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares 6-DOF affine transform (allows skew).

    Solves ``min_M sum_i || M [p_i; 1] - q_i ||^2`` via normal equations — the
    same objective as OpenCV's ``estimateAffine2D`` without RANSAC (used when
    ``allow_skew=True`` in the pipeline).

    Args:
        src: Source points of shape (..., L, 2).
        dst: Destination points of shape (..., L, 2) or (L, 2) (broadcast).

    Returns:
        Tuple of the transform batch (..., 2, 3) and validity mask (...,)
        that is False where source points are collinear/degenerate.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.broadcast_to(jnp.asarray(dst, jnp.float32), src.shape)

    # Center both point sets: this decouples the translation column from the
    # linear part (the normal equations become block diagonal), reducing the
    # problem to a well-conditioned 2x2 solve — important because we solve in
    # float32 on TPU while OpenCV uses float64.
    src_mean = src.mean(axis=-2)
    dst_mean = dst.mean(axis=-2)
    s = src - src_mean[..., None, :]
    d = dst - dst_mean[..., None, :]

    # Scale normalization (Hartley-style) for further conditioning.
    scale = jnp.sqrt((s * s).sum(axis=(-1, -2)) / s.shape[-2])
    valid_scale = scale > 1e-6
    safe_scale = jnp.where(valid_scale, scale, 1.0)[..., None, None]
    s = s / safe_scale

    sts = jnp.einsum("...li,...lj->...ij", s, s)  # (..., 2, 2)
    std = jnp.einsum("...li,...lj->...ij", s, d)  # (..., 2, 2), rows=src dims

    det = sts[..., 0, 0] * sts[..., 1, 1] - sts[..., 0, 1] * sts[..., 1, 0]
    valid = valid_scale & (jnp.abs(det) > 1e-8)
    safe_det = jnp.where(valid, det, 1.0)

    inv00 = sts[..., 1, 1] / safe_det
    inv01 = -sts[..., 0, 1] / safe_det
    inv10 = -sts[..., 1, 0] / safe_det
    inv11 = sts[..., 0, 0] / safe_det
    inv = jnp.stack(
        [
            jnp.stack([inv00, inv01], axis=-1),
            jnp.stack([inv10, inv11], axis=-1),
        ],
        axis=-2,
    )

    # A = (S^T S)^-1 (S^T D), transposed to map column vectors; undo scaling.
    a = jnp.swapaxes(jnp.einsum("...ij,...jk->...ik", inv, std), -1, -2)
    a = a / safe_scale

    t = dst_mean - jnp.einsum("...ij,...j->...i", a, src_mean)
    m = jnp.concatenate([a, t[..., None]], axis=-1)  # (..., 2, 3)
    # The fitted linear part must itself be invertible (the warp inverts it);
    # a well-spread source can still produce a singular A when the fit
    # collapses a dimension.
    det_a = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    valid = valid & (jnp.abs(det_a) > 1e-12)
    return m, valid


def estimate_similarity_np(src, dst):
    """Numpy twin of :func:`estimate_similarity` for pure-host runs.

    Identical f32 math with no device dispatch: landmark-only pipelines
    (no models) run entirely on the host, and a jitted estimate would pay
    an upload/compute/fetch round trip per batch on an attached
    accelerator for microseconds of arithmetic.
    """
    import numpy as np

    src = np.asarray(src, np.float32)
    dst = np.broadcast_to(np.asarray(dst, np.float32), src.shape)

    src_mean = src.mean(axis=-2)
    dst_mean = dst.mean(axis=-2)
    s = src - src_mean[..., None, :]
    d = dst - dst_mean[..., None, :]

    denom = (s * s).sum(axis=(-1, -2))
    valid = denom > 1e-12
    safe = np.where(valid, denom, 1.0)

    a = (s * d).sum(axis=(-1, -2)) / safe
    b = (s[..., 0] * d[..., 1] - s[..., 1] * d[..., 0]).sum(axis=-1) / safe

    tx = dst_mean[..., 0] - (a * src_mean[..., 0] - b * src_mean[..., 1])
    ty = dst_mean[..., 1] - (b * src_mean[..., 0] + a * src_mean[..., 1])

    row0 = np.stack([a, -b, tx], axis=-1)
    row1 = np.stack([b, a, ty], axis=-1)
    valid = valid & (a * a + b * b > 1e-12)
    return np.stack([row0, row1], axis=-2), valid


def estimate_affine_np(src, dst):
    """Numpy twin of :func:`estimate_affine` (see estimate_similarity_np)."""
    import numpy as np

    src = np.asarray(src, np.float32)
    dst = np.broadcast_to(np.asarray(dst, np.float32), src.shape)

    src_mean = src.mean(axis=-2)
    dst_mean = dst.mean(axis=-2)
    s = src - src_mean[..., None, :]
    d = dst - dst_mean[..., None, :]

    scale = np.sqrt((s * s).sum(axis=(-1, -2)) / s.shape[-2])
    valid_scale = scale > 1e-6
    safe_scale = np.where(valid_scale, scale, 1.0)[..., None, None]
    s = s / safe_scale

    sts = np.einsum("...li,...lj->...ij", s, s)
    std = np.einsum("...li,...lj->...ij", s, d)

    det = sts[..., 0, 0] * sts[..., 1, 1] - sts[..., 0, 1] * sts[..., 1, 0]
    valid = valid_scale & (np.abs(det) > 1e-8)
    safe_det = np.where(valid, det, 1.0)

    inv = np.stack(
        [
            np.stack([sts[..., 1, 1] / safe_det, -sts[..., 0, 1] / safe_det],
                     axis=-1),
            np.stack([-sts[..., 1, 0] / safe_det, sts[..., 0, 0] / safe_det],
                     axis=-1),
        ],
        axis=-2,
    )

    a = np.swapaxes(np.einsum("...ij,...jk->...ik", inv, std), -1, -2)
    a = a / safe_scale
    t = dst_mean - np.einsum("...ij,...j->...i", a, src_mean)
    m = np.concatenate([a, t[..., None]], axis=-1)
    det_a = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    valid = valid & (np.abs(det_a) > 1e-12)
    return m.astype(np.float32), valid


def invert_affine(m: jnp.ndarray) -> jnp.ndarray:
    """Inverts a batch of 2x3 affine transforms ``[A | t] -> [A^-1 | -A^-1 t]``.

    Used because destination-to-source mapping is what inverse warping needs
    (OpenCV's ``warpAffine`` does the same inversion internally when
    ``WARP_INVERSE_MAP`` is not set).
    """
    a, b, tx = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    c, d, ty = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    det = a * d - b * c
    # Sign-preserving epsilon: replacing a small *negative* det with +1e-12
    # would flip the sign of every inverse coefficient (mirrored output).
    det = jnp.where(
        jnp.abs(det) < 1e-12, jnp.where(det < 0, -1e-12, 1e-12), det
    )
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    row0 = jnp.stack([ia, ib, itx], axis=-1)
    row1 = jnp.stack([ic, id_, ity], axis=-1)
    return jnp.stack([row0, row1], axis=-2)
