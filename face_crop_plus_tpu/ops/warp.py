"""Batched inverse affine warping with OpenCV-compatible border modes.

Replaces the reference's per-face host loop over ``cv2.warpAffine``
(``src/face_crop_plus/cropper.py:514-547``) with fused device computation
over the whole face batch.  Padding removal (reference cropper.py:536-539)
is folded in algebraically: border arithmetic happens in un-padded *window
coordinates* per face, so the batch keeps one static shape.

Two sampling strategies (measured on TPU v5e, 8×256² crops from 1024²
sources):

* **window path** (~2× faster): one XLA gather of 2×2×C pixel windows per
  output point.  Exact for border modes whose bilinear extension can be
  expressed by remapping the *continuous* sample coordinate into the valid
  range — ``replicate`` (coordinate clamp), ``reflect_101`` (continuous
  mirror, period 2n−2) — and for ``constant`` without windows (1-pixel
  zero ring + fully-outside mask).
* **per-neighbor path**: four independent gathers with cv2's discrete
  index remapping — required for ``reflect``/``wrap`` (their discrete maps
  have flat zones/seams no continuous remap reproduces) and for
  ``constant`` with per-face windows.

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
from jax import lax

from .transform import invert_affine

BORDER_MODES = ("constant", "replicate", "reflect", "wrap", "reflect_101")


def _map_index(i: jnp.ndarray, n: jnp.ndarray, mode: str) -> jnp.ndarray:
    """cv2 ``borderInterpolate``: maps out-of-range int indices into [0, n).

    For ``constant`` the index is only clamped for gather safety; the
    caller masks the value separately.
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


def _map_coord(s: jnp.ndarray, n: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Continuous-coordinate border remap into [0, n-1] (fast-path modes)."""
    nf = n.astype(jnp.float32)
    if mode == "replicate":
        return jnp.clip(s, 0.0, nf - 1.0)
    if mode == "reflect_101":
        p = jnp.maximum(2.0 * (nf - 1.0), 1.0)
        sm = jnp.mod(s, p)
        # n == 1 collapses every coordinate to 0 (cv2 semantics); without
        # this the mod-by-1 remap could land in (0, 1] and put bilinear
        # weight on a pixel outside the 1-wide window.
        return jnp.where(nf <= 1.0, 0.0, jnp.where(sm > nf - 1.0, p - sm, sm))
    raise ValueError(mode)


def _source_coords(inv, output_size):
    """Per-face source-coordinate grids (F, Ho, Wo) for a dst grid."""
    wo, ho = output_size
    xs = jnp.arange(wo, dtype=jnp.float32)
    ys = jnp.arange(ho, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    sx = inv[:, 0, 0, None, None] * gx + inv[:, 0, 1, None, None] * gy \
        + inv[:, 0, 2, None, None]
    sy = inv[:, 1, 0, None, None] * gx + inv[:, 1, 1, None, None] * gy \
        + inv[:, 1, 2, None, None]
    return sx, sy


def _window_gather(src, starts_nyx):
    """Gathers (1, 2, 2, C) windows: starts (P, 3) = (img, y, x) indices."""
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2),
    )
    return lax.gather(
        src, starts_nyx, dnums, slice_sizes=(1, 2, 2, src.shape[-1])
    )


def _bilinear_from_windows(win, fx, fy):
    """Combines (..., 2, 2, C) windows with fractional offsets."""
    win = win.astype(jnp.float32)
    w00 = ((1 - fx) * (1 - fy))[..., None]
    w01 = (fx * (1 - fy))[..., None]
    w10 = ((1 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]
    return (
        win[..., 0, 0, :] * w00
        + win[..., 0, 1, :] * w01
        + win[..., 1, 0, :] * w10
        + win[..., 1, 1, :] * w11
    )


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

    inv = invert_affine(jnp.asarray(matrices, jnp.float32))
    img_idx = jnp.asarray(img_idx, jnp.int32)
    sx, sy = _source_coords(inv, output_size)  # (F, Ho, Wo)

    if windows is None:
        top = left = None
        eff_h = jnp.full((f,), h, jnp.int32)
        eff_w = jnp.full((f,), w, jnp.int32)
    else:
        windows = jnp.asarray(windows, jnp.int32)
        top, left = windows[:, 0], windows[:, 1]
        eff_h, eff_w = windows[:, 2], windows[:, 3]

    eh = eff_h[:, None, None]
    ew = eff_w[:, None, None]
    to = top[:, None, None] if top is not None else 0
    lo = left[:, None, None] if left is not None else 0
    bidx = jnp.broadcast_to(img_idx[:, None, None], (f, ho, wo))

    fast_ok = border_mode in ("replicate", "reflect_101") or (
        border_mode == "constant" and windows is None
    )

    if fast_ok:
        if border_mode == "constant":
            # 1-pixel zero ring: partial-support edge pixels blend with true
            # zeros; fully-outside pixels are masked to zero afterwards.
            src = jnp.pad(images, ((0, 0), (1, 1), (1, 1), (0, 0)))
            inside = (sx > -1.0) & (sx < w) & (sy > -1.0) & (sy < h)
            sxm, sym = sx, sy
            x0 = jnp.floor(sxm).astype(jnp.int32)
            y0 = jnp.floor(sym).astype(jnp.int32)
            fx = sxm - x0
            fy = sym - y0
            ys = jnp.clip(y0 + 1, 0, h)  # padded range [0, H+1], start ≤ H
            xs = jnp.clip(x0 + 1, 0, w)
        else:
            src = images
            sxm = _map_coord(sx, ew, border_mode)
            sym = _map_coord(sy, eh, border_mode)
            x0 = jnp.minimum(jnp.floor(sxm).astype(jnp.int32), ew - 2)
            y0 = jnp.minimum(jnp.floor(sym).astype(jnp.int32), eh - 2)
            x0 = jnp.maximum(x0, 0)
            y0 = jnp.maximum(y0, 0)
            fx = sxm - x0
            fy = sym - y0
            # A 1-pixel window flush with the image's far edge would start
            # the 2-wide gather at the last row/column (XLA would clamp the
            # start, silently shifting the window); clamp the absolute start
            # ourselves and carry the shift into the bilinear fraction —
            # exact because these modes clamp coordinates into the window
            # (a shift of 1 puts fx at exactly 1.0, i.e. full weight on the
            # intended last pixel).
            ys_raw = y0 + to
            xs_raw = x0 + lo
            ys = jnp.clip(ys_raw, 0, max(h - 2, 0))
            xs = jnp.clip(xs_raw, 0, max(w - 2, 0))
            fy = fy + (ys_raw - ys).astype(fy.dtype)
            fx = fx + (xs_raw - xs).astype(fx.dtype)
            inside = None

        starts = jnp.stack([bidx, ys, xs], axis=-1).reshape(-1, 3)
        win = _window_gather(src, starts).reshape(f, ho, wo, 2, 2, c)
        out = _bilinear_from_windows(win, fx, fy)
        if inside is not None:
            out = out * inside[..., None].astype(jnp.float32)
        return out

    # Exact per-neighbor path (reflect / wrap / constant-with-windows).
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    out = jnp.zeros((f, ho, wo, c), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            xm = _map_index(xi, ew, border_mode) + lo
            ym = _map_index(yi, eh, border_mode) + to
            val = images[bidx, ym, xm].astype(jnp.float32)
            wgt = (fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy)
            if border_mode == "constant":
                ok = (xi >= 0) & (xi < ew) & (yi >= 0) & (yi < eh)
                wgt = wgt * ok.astype(jnp.float32)
            out = out + val * wgt[..., None]

    return out


def to_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """Rounds and saturates float image data to uint8 (cv2 saturate_cast)."""
    return jnp.clip(jnp.rint(x), 0, 255).astype(jnp.uint8)
