"""Batched inverse affine warping with OpenCV-compatible border modes.

Replaces the reference's per-face host loop over ``cv2.warpAffine``
(``src/face_crop_plus/cropper.py:514-547``) with a single fused device
computation over the whole face batch: destination grids are mapped through
the inverse transforms, bilinearly sampled from the source image batch in one
XLA gather, and masked per border mode.  Padding removal (reference
cropper.py:536-539) is folded in algebraically: instead of slicing each image
to its un-padded window on the host, border arithmetic is performed in
un-padded *window coordinates* per face, so the whole batch keeps one static
shape.

Border semantics follow ``cv2.borderInterpolate``:

* ``constant``:     value 0 outside          ``...000|abcdefgh|000...``
* ``replicate``:    clamp                    ``aaaaaa|abcdefgh|hhhhhh``
* ``reflect``:      reflect incl. edge       ``fedcba|abcdefgh|hgfedc``
* ``wrap``:         periodic                 ``cdefgh|abcdefgh|abcdef``
* ``reflect_101``:  reflect excl. edge       ``gfedcb|abcdefgh|gfedcb``
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .transform import invert_affine

BORDER_MODES = ("constant", "replicate", "reflect", "wrap", "reflect_101")


def _map_index(i: jnp.ndarray, n: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Maps (possibly out-of-range) int32 indices into [0, n) per border mode.

    For ``constant`` the index is only clamped for gather safety; the caller
    masks the value separately.
    """
    n = jnp.asarray(n, jnp.int32)
    if mode in ("constant", "replicate"):
        return jnp.clip(i, 0, n - 1)
    if mode == "wrap":
        return jnp.mod(i, n)
    if mode == "reflect":
        p = 2 * n
        j = jnp.mod(i, p)
        return jnp.where(j >= n, p - 1 - j, j)
    if mode == "reflect_101":
        p = jnp.maximum(2 * n - 2, 1)
        j = jnp.mod(i, p)
        return jnp.where(j >= n, p - j, j)
    raise ValueError(f"Unsupported border mode: {mode}")


@partial(jax.jit, static_argnames=("output_size", "border_mode"))
def warp_affine_batch(
    images: jnp.ndarray,
    matrices: jnp.ndarray,
    img_idx: jnp.ndarray,
    output_size: tuple[int, int],
    border_mode: str = "constant",
    windows: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Warps F faces out of an image batch in one fused device op.

    Args:
        images: Source batch of shape (N, H, W, C), any real dtype
            (uint8/float32); compute happens in float32.
        matrices: (F, 2, 3) forward transforms mapping *source* (un-padded
            window) coordinates to *destination* crop coordinates; inverted
            internally (same convention as ``cv2.warpAffine``).
        img_idx: (F,) int32 index of the source image for each face.
        output_size: Destination (width, height) — static.
        border_mode: One of :data:`BORDER_MODES` — static.
        windows: Optional (F, 4) int32 per-face un-padded windows as
            (top, left, height, width) inside the padded source image.  When
            None the full image is the window.

    Returns:
        Float32 crops of shape (F, Ho, Wo, C).
    """
    if border_mode not in BORDER_MODES:
        raise ValueError(f"Unsupported border mode: {border_mode}")

    n, h, w, c = images.shape
    f = matrices.shape[0]
    wo, ho = output_size

    src = jnp.asarray(images, jnp.float32)
    inv = invert_affine(jnp.asarray(matrices, jnp.float32))  # (F, 2, 3)
    img_idx = jnp.asarray(img_idx, jnp.int32)

    if windows is None:
        top = jnp.zeros((f,), jnp.int32)
        left = jnp.zeros((f,), jnp.int32)
        eff_h = jnp.full((f,), h, jnp.int32)
        eff_w = jnp.full((f,), w, jnp.int32)
    else:
        windows = jnp.asarray(windows, jnp.int32)
        top, left, eff_h, eff_w = (windows[:, i] for i in range(4))

    # Destination pixel-center grid (OpenCV convention: integer coords).
    xs = jnp.arange(wo, dtype=jnp.float32)
    ys = jnp.arange(ho, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (Ho, Wo)

    # Source coordinates per face: (F, Ho, Wo).
    sx = inv[:, 0, 0, None, None] * gx + inv[:, 0, 1, None, None] * gy \
        + inv[:, 0, 2, None, None]
    sy = inv[:, 1, 0, None, None] * gx + inv[:, 1, 1, None, None] * gy \
        + inv[:, 1, 2, None, None]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    ew = eff_w[:, None, None]
    eh = eff_h[:, None, None]
    lo = left[:, None, None]
    to = top[:, None, None]
    bidx = jnp.broadcast_to(img_idx[:, None, None], (f, ho, wo))

    out = jnp.zeros((f, ho, wo, c), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            xm = _map_index(xi, ew, border_mode) + lo
            ym = _map_index(yi, eh, border_mode) + to
            val = src[bidx, ym, xm]  # (F, Ho, Wo, C) gather
            wgt = (fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy)
            if border_mode == "constant":
                inside = (xi >= 0) & (xi < ew) & (yi >= 0) & (yi < eh)
                wgt = wgt * inside.astype(jnp.float32)
            out = out + val * wgt[..., None]

    return out


def to_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """Rounds and saturates float image data to uint8 (cv2 saturate_cast)."""
    return jnp.clip(jnp.rint(x), 0, 255).astype(jnp.uint8)
